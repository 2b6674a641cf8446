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
