"""PDF /Outlines (bookmark) parsing.

Core of the reference's parseOutline
(/root/reference/js/pdf/parseOutline.js:8-373): walk the
/First-/Next-linked sibling tree from the catalog's /Outlines,
normalize destinations to zero-based page indices (direct /Dest arrays,
/A GoTo actions, named destinations via the catalog /Names -> /Dests
name tree or the legacy /Dests dict), keep non-GoTo actions opaque,
break cycles with a visited set.
"""

from __future__ import annotations

import re

from .document import PdfDocument
from .lexer import Name, Ref, StreamObj


def _page_index_map(doc: PdfDocument) -> dict[int, int]:
    """page object number -> zero-based page index."""
    root = doc.resolve(doc.trailer["Root"])
    index: dict[int, int] = {}
    counter = [0]

    def walk(node_ref, depth=0):
        if depth > 64:
            return
        if isinstance(node_ref, Ref):
            num = node_ref.num
        else:
            num = None
        node = doc.resolve(node_ref)
        if node is None:
            return
        ntype = str(node.get("Type", ""))
        if ntype == "Page" or ("Kids" not in node and "Contents" in node):
            if num is not None:
                index[num] = counter[0]
            counter[0] += 1
            return
        for kid in doc.resolve(node.get("Kids", [])) or []:
            walk(kid, depth + 1)

    walk(root.get("Pages"))
    return index


def _build_name_dests(doc: PdfDocument, catalog: dict) -> dict[str, object]:
    """Flatten the /Names -> /Dests name tree (+ legacy /Dests dict)."""
    out: dict[str, object] = {}

    def walk_tree(node_ref, depth=0):
        if depth > 32:
            return
        node = doc.resolve(node_ref)
        if not isinstance(node, dict):
            return
        names = doc.resolve(node.get("Names"))
        if isinstance(names, list):
            for i in range(0, len(names) - 1, 2):
                key = names[i]
                if isinstance(key, bytes):
                    key = key.decode("latin-1")
                out[str(key)] = names[i + 1]
        for kid in doc.resolve(node.get("Kids", [])) or []:
            walk_tree(kid, depth + 1)

    names_dict = doc.resolve(catalog.get("Names"))
    if isinstance(names_dict, dict) and "Dests" in names_dict:
        walk_tree(names_dict["Dests"])
    legacy = doc.resolve(catalog.get("Dests"))
    if isinstance(legacy, dict):
        for k, v in legacy.items():
            out.setdefault(str(k), v)
    return out


def _resolve_dest(doc, dest_obj, name_dests, page_index):
    """Destination object -> (page_index, view) or None."""
    dest_obj = doc.resolve(dest_obj)
    if isinstance(dest_obj, (Name,)) or isinstance(dest_obj, bytes) \
            or isinstance(dest_obj, str) and not isinstance(dest_obj, Name):
        key = dest_obj.decode("latin-1") if isinstance(dest_obj, bytes) \
            else str(dest_obj)
        target = name_dests.get(key)
        if target is None:
            return None
        target = doc.resolve(target)
        if isinstance(target, dict):
            target = target.get("D")
        dest_obj = doc.resolve(target)
    if isinstance(dest_obj, list) and dest_obj:
        page_ref = dest_obj[0]
        if isinstance(page_ref, Ref) and page_ref.num in page_index:
            view = [doc.resolve(v) for v in dest_obj[1:]]
            return page_index[page_ref.num], view
    return None


def parse_outline(data: bytes) -> list[dict]:
    """PDF bytes -> top-level outline nodes
    [{title, page_index, action, open, children}]."""
    doc = PdfDocument(data)
    catalog = doc.resolve(doc.trailer["Root"])
    outlines = doc.resolve(catalog.get("Outlines"))
    if not isinstance(outlines, dict):
        return []
    page_index = _page_index_map(doc)
    name_dests = _build_name_dests(doc, catalog)

    visited: set = set()

    def walk_siblings(first_ref):
        out = []
        cur = first_ref
        while isinstance(cur, Ref) and cur.num not in visited:
            visited.add(cur.num)
            item = doc.resolve(cur)
            if not isinstance(item, dict):
                break
            title = item.get("Title")
            if isinstance(title, bytes):
                # UTF-16BE with BOM or PDFDocEncoding
                if title[:2] == b"\xfe\xff":
                    title = title[2:].decode("utf-16-be", "replace")
                else:
                    title = title.decode("latin-1")
            dest = None
            action = None
            if "Dest" in item:
                dest = _resolve_dest(doc, item["Dest"], name_dests, page_index)
            elif "A" in item:
                a = doc.resolve(item["A"])
                if isinstance(a, dict):
                    if str(doc.resolve(a.get("S", ""))) == "GoTo":
                        dest = _resolve_dest(
                            doc, a.get("D"), name_dests, page_index)
                    else:
                        action = str(doc.resolve(a.get("S", "")))
            count = doc.resolve(item.get("Count", 0)) or 0
            node = {
                "title": str(title) if title is not None else "",
                "page_index": dest[0] if dest else None,
                "action": action,
                "open": not (isinstance(count, (int, float)) and count < 0),
                "children": [],
            }
            if isinstance(item.get("First"), Ref):
                node["children"] = walk_siblings(item["First"])
            out.append(node)
            cur = item.get("Next")
        return out

    first = outlines.get("First")
    if not isinstance(first, Ref):
        return []
    return walk_siblings(first)


# -------------------------------------------- outline heading anchors

#: Producers whose outlines are machine-generated per-paragraph
#: bookmarks, not author headings (structTree.js:16 OCR_PRODUCER_RE).
OCR_PRODUCER_RE = re.compile(
    r"paper\s*capture|luradocument|abbyy|finereader|kofax|readiris"
    r"|omnipage|tesseract|scansoft|\bcapture\b", re.I)

_SENT_END_RE = re.compile(r"[.!?][\"')”’]?$")
_ENUM_NUM_RE = re.compile(r"^\(?\d{1,4}[.)]")
_ENUM_ALPHA_RE = re.compile(r"^\(?[a-z]{1,3}[.)]\s", re.I)
_LEAD_WORDCHAR_RE = re.compile(r"^[^\W_]", re.U)


def normalize_heading_text(s: str) -> str:
    """Whitespace-collapse, lowercase, strip trailing soft punctuation
    only (miscUtils.js:125 normalizeHeadingText) — stripping internal
    punctuation would let distinct lines collide."""
    return re.sub(r"\s+", " ", s or "").strip().lower().rstrip(".,:;")


def heading_shaped(title: str) -> bool:
    """Is a bookmark title shaped like a heading (short label) rather
    than a running paragraph? (outlineIndex.js:44 headingShaped —
    conservative: a missed heading is a no-op, a false anchor is a
    wrong split.)"""
    t = re.sub(r"\s+", " ", title or "").strip()
    if not t:
        return False
    if len(t) > 80 or len(t.split(" ")) > 12:
        return False
    if _SENT_END_RE.search(t):
        return False
    if _ENUM_NUM_RE.match(t) or _ENUM_ALPHA_RE.match(t):
        return False
    if len(re.findall(r"[A-Za-z]", t)) < 2:
        return False
    if not _LEAD_WORDCHAR_RE.match(t):
        return False
    # A real heading's first word carries an uppercase letter; an
    # all-lowercase Latin first word marks a sentence fragment or
    # footnote bookmark. Non-Latin first words are exempt.
    w0 = t.split()[0]
    if re.search(r"[a-z]", w0) and not re.search(r"[A-Z]", w0):
        return False
    return True


def build_outline_heading_index(data: bytes) -> dict[int, set] | None:
    """Page index -> set of normalized heading-anchor titles from the
    document /Outlines (outlineIndex.js:149 buildOutlineHeadingIndex),
    or None when there is no usable outline (none, or an OCR-producer
    document whose bookmarks are machine-generated)."""
    try:
        doc = PdfDocument(data)
        info = doc.resolve(doc.trailer.get("Info"))
        if isinstance(info, dict):
            producer = doc.resolve(info.get("Producer"))
            if isinstance(producer, bytes):
                producer = producer.decode("latin-1", "replace")
            if producer and OCR_PRODUCER_RE.search(str(producer)):
                return None
        nodes = parse_outline(data)
    except Exception:
        return None
    index: dict[int, set] = {}

    def walk(items):
        for node in items:
            if (node["page_index"] is not None
                    and heading_shaped(node["title"])):
                index.setdefault(node["page_index"], set()).add(
                    normalize_heading_text(node["title"]))
            walk(node["children"])

    walk(nodes)
    return index or None
