"""PDF page subsetting and merging — the cores of the reference's
subsetPdf and mergePdfs
(js/export/pdf/subsetPdf.js): keep an ordered list of pages from an
existing document, rebuild the /Pages tree, and emit only the objects
still reachable from the catalog (dropped pages' content streams,
fonts and images garbage-collect away instead of riding along dead).

Catalog entries that index the full document (/Outlines, /Names,
/StructTreeRoot, /OpenAction, /AcroForm) are dropped from the subset —
their destinations reference removed pages and would resurrect them
through the reachability walk; the reference filters them entry by
entry, this port removes the indexes wholesale (documented subset
semantics). Inherited page attributes (Resources/MediaBox/CropBox/
Rotate) are flattened onto each kept page so the rebuilt flat tree
preserves them.
"""

from __future__ import annotations

from .document import Name, PdfDocument, Ref, StreamObj
from .metadata import serialize_object

_CATALOG_DROP = ("Outlines", "Names", "StructTreeRoot", "OpenAction",
                 "AcroForm", "Dests", "PageLabels")
_INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")


def _page_objnums(doc: PdfDocument) -> list[tuple[int, dict]]:
    """Ordered (objnum, flattened page dict) for every leaf page."""
    root = doc.resolve(doc.trailer["Root"])
    out: list[tuple[int, dict]] = []

    def walk(node_ref, inherited, depth=0):
        if depth > 64 or not isinstance(node_ref, Ref):
            return
        node = doc.resolve(node_ref)
        if node is None:
            return
        inh = dict(inherited)
        for key in _INHERITABLE:
            if key in node:
                inh[key] = node[key]
        ntype = str(node.get("Type", ""))
        if ntype == "Page" or ("Kids" not in node and "Contents" in node):
            page = dict(node)
            for key in _INHERITABLE:
                if key not in page and key in inh:
                    page[key] = inh[key]
            out.append((node_ref.num, page))
            return
        for kid in doc.resolve(node.get("Kids", [])) or []:
            walk(kid, inh, depth + 1)

    walk(root.get("Pages"), {})
    return out


def _collect_refs(doc: PdfDocument, obj, seen: set) -> None:
    if isinstance(obj, Ref):
        if obj.num in seen:
            return
        seen.add(obj.num)
        _collect_refs(doc, doc.get_object(obj.num), seen)
    elif isinstance(obj, StreamObj):
        _collect_refs(doc, obj.dict, seen)
    elif isinstance(obj, dict):
        for v in obj.values():
            _collect_refs(doc, v, seen)
    elif isinstance(obj, list):
        for v in obj:
            _collect_refs(doc, v, seen)


def subset_pdf(data: bytes, page_indices: list[int]) -> bytes:
    """Keep the given 0-based pages, in the given order."""
    doc = PdfDocument(data)
    pages = _page_objnums(doc)
    for i in page_indices:
        if not 0 <= i < len(pages):
            raise ValueError(f"page index {i} out of range 0..{len(pages) - 1}")
    kept = [pages[i] for i in page_indices]

    root_ref = doc.trailer["Root"]
    root_num = root_ref.num
    catalog = dict(doc.resolve(root_ref))
    for key in _CATALOG_DROP:
        catalog.pop(key, None)
        catalog.pop(Name(key), None)

    # new flat pages tree reuses the old pages-root object number
    pages_root_ref = catalog.get("Pages")
    pages_num = pages_root_ref.num if isinstance(pages_root_ref, Ref) \
        else max(n for n, _ in pages) + 1
    catalog[Name("Pages")] = Ref(pages_num, 0)
    overrides: dict[int, object] = {
        root_num: catalog,
        pages_num: {
            Name("Type"): Name("Pages"),
            Name("Count"): len(kept),
            Name("Kids"): [Ref(n, 0) for n, _ in kept],
        },
    }
    for objnum, page in kept:
        page = dict(page)
        page[Name("Parent")] = Ref(pages_num, 0)
        page.pop("Annots", None)       # may point at removed pages
        page.pop(Name("Annots"), None)
        page.pop("StructParents", None)
        page.pop(Name("StructParents"), None)
        overrides[objnum] = page

    # reachability from the (rewritten) catalog
    seen: set[int] = set()

    def collect(obj):
        _collect_refs(doc, obj, seen)

    seen.add(root_num)
    seen.add(pages_num)
    collect(overrides[root_num])
    collect(overrides[pages_num])
    for objnum, _ in kept:
        collect(overrides[objnum])

    bodies: dict[int, bytes] = {}
    for objnum in sorted(seen):
        obj = overrides.get(objnum)
        if obj is None:
            obj = doc.get_object(objnum)
        if obj is None:
            continue
        typ = None
        d = obj.dict if isinstance(obj, StreamObj) else (
            obj if isinstance(obj, dict) else None)
        if d is not None:
            tv = d.get("Type")
            typ = str(doc.resolve(tv)) if tv is not None else None
        if typ in ("ObjStm", "XRef"):
            continue
        if isinstance(obj, StreamObj):
            bodies[objnum] = _emit_stream(doc, obj, dict(obj.dict))
        else:
            bodies[objnum] = serialize_object(obj).encode("latin-1")

    return _assemble(bodies, root_num)


def _emit_stream(doc: PdfDocument, obj: StreamObj, sd: dict) -> bytes:
    """Serialize a stream object: text filters re-applied as one Flate
    layer, image-codec filters kept tagged."""
    import zlib

    filters = doc.resolve(obj.dict.get("Filter"))
    if isinstance(filters, (Name, str)):
        filters = [filters]
    fnames = [str(doc.resolve(f)) for f in (filters or [])]
    body = doc.stream_data(obj)  # decoded through text filters
    consumed = 0
    for fn in fnames:
        if fn in ("FlateDecode", "Fl", "ASCIIHexDecode", "AHx",
                  "ASCII85Decode", "A85", "LZWDecode", "LZW",
                  "RunLengthDecode", "RL"):
            consumed += 1
        else:
            break
    remaining = fnames[consumed:]  # image codecs stay encoded
    for drop in ("Filter", "DecodeParms", "Length"):
        sd.pop(drop, None)
        sd.pop(Name(drop), None)
    body = zlib.compress(body)
    if not remaining:
        sd[Name("Filter")] = Name("FlateDecode")
    else:
        sd[Name("Filter")] = [Name("FlateDecode")] + [
            Name(f) for f in remaining]
    sd[Name("Length")] = len(body)
    return (serialize_object(sd).encode("latin-1")
            + b"\nstream\n" + body + b"\nendstream")


def _assemble(bodies: dict[int, bytes], root_num: int) -> bytes:

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for objnum in sorted(bodies):
        offsets[objnum] = len(out)
        out += f"{objnum} 0 obj\n".encode() + bodies[objnum] + b"\nendobj\n"
    size = (max(bodies) + 1) if bodies else 1
    xref_pos = len(out)
    out += b"xref\n" + f"0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for objnum in range(1, size):
        if objnum in offsets:
            out += f"{offsets[objnum]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {size} /Root {root_num} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def _remap(obj, mapping: dict):
    """Deep-copy an object graph node with every Ref renumbered."""
    if isinstance(obj, Ref):
        return Ref(mapping[obj.num], 0)
    if isinstance(obj, dict):
        return {k: _remap(v, mapping) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_remap(v, mapping) for v in obj]
    return obj


def merge_pdfs(datas: list[bytes]) -> bytes:
    """Concatenate documents (mergePdfs.js core): every input's pages
    append in order under one new Pages tree, each document's reachable
    objects renumbered into a shared space. Document-level indexes drop
    with the same subset semantics."""
    if not datas:
        raise ValueError("merge_pdfs: no inputs")
    bodies: dict[int, bytes] = {}
    kids: list[Ref] = []
    next_num = 3  # 1 = catalog, 2 = pages root
    for data in datas:
        doc = PdfDocument(data)
        pages = _page_objnums(doc)
        if not pages:
            raise ValueError("merge_pdfs: input with no pages")
        flat: dict[int, dict] = {}
        seen: set[int] = set()
        for objnum, page in pages:
            page = dict(page)
            for key in ("Parent", "Annots", "StructParents"):
                page.pop(key, None)
                page.pop(Name(key), None)
            flat[objnum] = page
            seen.add(objnum)
            _collect_refs(doc, page, seen)
        mapping = {old: next_num + i
                   for i, old in enumerate(sorted(seen))}
        next_num += len(seen)
        for old in sorted(seen):
            obj = flat.get(old)
            if obj is None:
                obj = doc.get_object(old)
            if obj is None:
                continue
            d = obj.dict if isinstance(obj, StreamObj) else (
                obj if isinstance(obj, dict) else None)
            typ = None
            if d is not None:
                tv = d.get("Type")
                typ = str(doc.resolve(tv)) if tv is not None else None
            if typ in ("ObjStm", "XRef"):
                continue
            if old in flat:
                page = _remap(flat[old], mapping)
                page[Name("Parent")] = Ref(2, 0)
                bodies[mapping[old]] = serialize_object(page).encode(
                    "latin-1")
            elif isinstance(obj, StreamObj):
                bodies[mapping[old]] = _emit_stream(
                    doc, obj, _remap(dict(obj.dict), mapping))
            else:
                bodies[mapping[old]] = serialize_object(
                    _remap(obj, mapping)).encode("latin-1")
        kids.extend(Ref(mapping[objnum], 0) for objnum, _ in pages)
    bodies[1] = serialize_object(
        {Name("Type"): Name("Catalog"),
         Name("Pages"): Ref(2, 0)}).encode("latin-1")
    bodies[2] = serialize_object(
        {Name("Type"): Name("Pages"), Name("Count"): len(kids),
         Name("Kids"): kids}).encode("latin-1")
    return _assemble(bodies, 1)
