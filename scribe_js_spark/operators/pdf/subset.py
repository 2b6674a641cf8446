"""PDF page subsetting — the core of the reference's subsetPdf
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
            import zlib

            sd = dict(obj.dict)
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
            if not remaining:
                body = zlib.compress(body)
                sd[Name("Filter")] = Name("FlateDecode")
            else:
                names = [Name("FlateDecode")] + [Name(f)
                                                 for f in remaining]
                body = zlib.compress(body)
                sd[Name("Filter")] = names
            sd[Name("Length")] = len(body)
            bodies[objnum] = (
                serialize_object(sd).encode("latin-1")
                + b"\nstream\n" + body + b"\nendstream")
        else:
            bodies[objnum] = serialize_object(obj).encode("latin-1")

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
