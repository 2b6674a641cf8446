"""Tagged-PDF structure tree (structTree.js).

Reimplements /root/reference/js/pdf/structTree.js:1-230 over the
parsed-object model: the (page, MCID) -> owning-block-element map from
/StructTreeRoot + /ParentTree, with /RoleMap custom-tag resolution,
inline tags rolled up to the nearest BLOCK ancestor, the OCR-producer
veto (synthetic line-by-line tags carry no paragraph boundaries), and
the docAuthoredByWord producer heuristic (Word tags one element per
paragraph, so element boundaries are paragraph boundaries)."""

from __future__ import annotations

import re

from .lexer import Ref

BLOCK = frozenset([
    "P", "H", "H1", "H2", "H3", "H4", "H5", "H6", "Title", "Caption",
    "BlockQuote", "Note", "Footnote", "Quote", "Code", "TOCI", "Index",
    "LI", "Figure", "Formula",
])
INLINE = frozenset([
    "Span", "Link", "Em", "Strong", "Reference", "Annot", "Sub", "Sup",
    "Ruby", "Warichu", "Lbl", "LBody", "BibEntry", "Artifact",
])

OCR_PRODUCER_RE = re.compile(
    r"paper\s*capture|luradocument|abbyy|finereader|kofax|readiris|"
    r"omnipage|tesseract|scansoft|\bcapture\b", re.I)
WORD_AUTHORED_RE = re.compile(
    r"microsoft\W{0,3}word|pdfmaker\b[^()]*?\bfor\s+word", re.I)


def _info_field(doc, field: str) -> str:
    try:
        info = doc.resolve(doc.trailer.get("Info"))
    except Exception:
        return ""
    if not isinstance(info, dict):
        return ""
    v = doc.resolve(info.get(field))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("latin-1")
    return v if isinstance(v, str) else ""


def read_doc_producer(doc) -> str:
    return _info_field(doc, "Producer")


def doc_authored_by_word(doc) -> bool:
    return bool(WORD_AUTHORED_RE.search(_info_field(doc, "Creator"))
                or WORD_AUTHORED_RE.search(_info_field(doc, "Producer")))


def _number_tree(doc, node_ref, out: dict, depth: int = 0) -> None:
    """/Nums leaves + /Kids internal nodes -> {number: raw value}."""
    if depth > 50:
        return
    node = doc.resolve(node_ref)
    if not isinstance(node, dict):
        return
    nums = doc.resolve(node.get("Nums"))
    if isinstance(nums, list):
        for i in range(0, len(nums) - 1, 2):
            k = doc.resolve(nums[i])
            if isinstance(k, (int, float)):
                out[int(k)] = nums[i + 1]
    kids = doc.resolve(node.get("Kids"))
    if isinstance(kids, list):
        for kid in kids:
            _number_tree(doc, kid, out, depth + 1)


def build_struct_elem_map(doc) -> dict | None:
    """(page_index, mcid) -> {'elem_num', 'tag'} for a tagged PDF, or
    None when the document has no usable authored structure."""
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict) or "StructTreeRoot" not in root:
        return None
    if OCR_PRODUCER_RE.search(read_doc_producer(doc)):
        return None
    st = doc.resolve(root["StructTreeRoot"])
    if not isinstance(st, dict):
        return None

    role_map_raw = doc.resolve(st.get("RoleMap"))
    role_map = {}
    if isinstance(role_map_raw, dict):
        for k, v in role_map_raw.items():
            role_map[str(k)] = str(doc.resolve(v))

    def map_tag(tag: str) -> str:
        cur = tag or "?"
        seen = set()
        while cur in role_map and cur not in seen:
            seen.add(cur)
            cur = role_map[cur]
        return cur

    if "ParentTree" not in st:
        return None
    parent_tree: dict = {}
    _number_tree(doc, st["ParentTree"], parent_tree)
    if not parent_tree:
        return None

    def elem_dict(ref):
        d = doc.resolve(ref)
        return d if isinstance(d, dict) else None

    def tag_of(ref) -> str:
        d = elem_dict(ref)
        if d is None:
            return "?"
        return map_tag(str(doc.resolve(d.get("S", "?"))))

    owner_cache: dict = {}

    def block_owner(ref):
        key = ref.num if isinstance(ref, Ref) else id(ref)
        if key in owner_cache:
            return owner_cache[key]
        cur = ref
        seen = set()
        res = None
        while cur is not None:
            ck = cur.num if isinstance(cur, Ref) else id(cur)
            if ck in seen:
                break
            seen.add(ck)
            tag = tag_of(cur)
            if tag in BLOCK:
                res = {"elem_num": ck, "tag": tag}
                break
            if tag not in INLINE:
                # grouping container: keep the immediate owner
                res = {"elem_num": key, "tag": tag_of(ref)}
                break
            d = elem_dict(cur)
            cur = d.get("P") if d else None
        if res is None:
            res = {"elem_num": key, "tag": tag_of(ref)}
        owner_cache[key] = res
        return res

    out: dict = {}
    for page_idx, page in enumerate(doc.get_pages()):
        sp = doc.resolve(page.get("StructParents"))
        if not isinstance(sp, (int, float)):
            continue
        val = parent_tree.get(int(sp))
        arr = doc.resolve(val)
        if not isinstance(arr, list):
            continue
        for mcid, tk in enumerate(arr):
            if isinstance(tk, Ref):
                out[(page_idx, mcid)] = block_owner(tk)
    return out or None


def pdf_struct_tags(data: bytes) -> list[tuple[int, int, str]]:
    """(page_n, mcid, block tag) rows for every marked-content id that
    carries text, resolved through the structure tree. Empty when the
    document is untagged."""
    from .content import TextMachine
    from .document import PdfDocument
    from .parse import _base_ctm, _page_geometry

    doc = PdfDocument(data)
    elem_map = build_struct_elem_map(doc)
    if not elem_map:
        return []
    rows = []
    for n, page in enumerate(doc.get_pages()):
        box, rotate, w, h, scale = _page_geometry(doc, page)
        machine = TextMachine(doc, page, page_height=h * scale,
                              scale=scale)
        machine.run(doc.page_content(page), page.get("Resources"),
                    base_ctm=_base_ctm(box, rotate))
        seen = set()
        for ch in machine.chars:
            if ch.mcid is None or ch.mcid in seen:
                continue
            seen.add(ch.mcid)
            owner = elem_map.get((n, ch.mcid))
            if owner:
                rows.append((n, ch.mcid, owner["tag"]))
    rows.sort()
    return rows
