"""PDF page subsetting and merging — the cores of the reference's
subsetPdf and mergePdfs
(js/export/pdf/subsetPdf.js): keep an ordered list of pages from an
existing document, rebuild the /Pages tree, and emit only the objects
still reachable from the catalog (dropped pages' content streams,
fonts and images garbage-collect away instead of riding along dead).

Document-wide indexes are handled entry-wise, matching the reference:

- /Outlines is REBUILT: bookmarks whose destination page survives are
  kept (named destinations resolved to explicit /Dest arrays); a node
  whose page is dropped loses itself but its surviving descendants
  are promoted to the nearest surviving ancestor; structural and
  URI/action nodes always survive
  (js/objects/outlineObjects.js:107-133, js/export/pdf/writeOutline.js:15-62).
- page /Annots are FILTERED: an annotation is dropped only when its
  /Dest or GoTo /A targets a removed page (js/export/pdf/subsetPdf.js:73-80).
- /StructTreeRoot + /MarkInfo drop wholesale — the reference does the
  same on a true subset (js/export/pdf/subsetPdf.js:401). /Names and
  /Dests drop because surviving bookmarks carry resolved explicit
  destinations.

Inherited page attributes (Resources/MediaBox/CropBox/Rotate) are
flattened onto each kept page so the rebuilt flat tree preserves them.
"""

from __future__ import annotations

from .document import Name, PdfDocument, Ref, StreamObj
from .metadata import serialize_object
from .outline import _build_name_dests

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


# -------------------------------------------- outline entry filtering


def _dest_page(doc: PdfDocument, dest_obj, name_dests):
    """Destination -> (page_objnum, resolved view list) or None. Like
    outline._resolve_dest but keyed by page OBJECT NUMBER — kept pages
    keep their objnums through a subset, so survival is a set test."""
    dest_obj = doc.resolve(dest_obj)
    if isinstance(dest_obj, bytes) or (
            isinstance(dest_obj, (str, Name))):
        key = dest_obj.decode("latin-1") if isinstance(dest_obj, bytes) \
            else str(dest_obj)
        target = doc.resolve(name_dests.get(key))
        if isinstance(target, dict):
            target = doc.resolve(target.get("D"))
        dest_obj = target
    if isinstance(dest_obj, list) and dest_obj \
            and isinstance(dest_obj[0], Ref):
        view = [doc.resolve(v) for v in dest_obj[1:]]
        return dest_obj[0].num, view
    return None


def _has_refs(obj) -> bool:
    if isinstance(obj, Ref):
        return True
    if isinstance(obj, dict):
        return any(_has_refs(v) for v in obj.values())
    if isinstance(obj, list):
        return any(_has_refs(v) for v in obj)
    return False


def _deep_resolve(doc: PdfDocument, obj, depth=0):
    if depth > 16:
        return obj
    obj = doc.resolve(obj)
    if isinstance(obj, dict):
        return {k: _deep_resolve(doc, v, depth + 1) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_deep_resolve(doc, v, depth + 1) for v in obj]
    return obj


def _parse_outline_nodes(doc: PdfDocument, catalog: dict,
                         name_dests: dict) -> list[dict]:
    """Source /Outlines -> [{title, page, view, action, open, children}]
    with `page` a page objnum (None for structural/action nodes) and
    `action` a ref-free resolved /A dict kept opaque."""
    outlines = doc.resolve(catalog.get("Outlines"))
    if not isinstance(outlines, dict):
        return []
    visited: set[int] = set()

    def walk(first_ref):
        out = []
        cur = first_ref
        while isinstance(cur, Ref) and cur.num not in visited:
            visited.add(cur.num)
            item = doc.resolve(cur)
            if not isinstance(item, dict):
                break
            title = doc.resolve(item.get("Title"))
            if isinstance(title, str):
                title = title.encode("latin-1", "replace")
            elif not isinstance(title, bytes):
                title = b""
            page = view = action = None
            if "Dest" in item:
                hit = _dest_page(doc, item["Dest"], name_dests)
                if hit:
                    page, view = hit
            elif "A" in item:
                a = doc.resolve(item["A"])
                if isinstance(a, dict):
                    if str(doc.resolve(a.get("S", ""))) == "GoTo":
                        hit = _dest_page(doc, a.get("D"), name_dests)
                        if hit:
                            page, view = hit
                    else:
                        resolved = _deep_resolve(doc, a)
                        if not _has_refs(resolved):
                            action = resolved
            count = doc.resolve(item.get("Count", 0)) or 0
            out.append({
                "title": title, "page": page, "view": view or [],
                "action": action,
                "open": not (isinstance(count, (int, float)) and count < 0),
                "children": walk(item.get("First")),
            })
            cur = item.get("Next")
        return out

    return walk(outlines.get("First"))


def _filter_outline_nodes(nodes: list[dict], kept: set) -> list[dict]:
    """remapOutline semantics (outlineObjects.js:114-133): dropped
    node's surviving descendants promote to the nearest surviving
    ancestor; page-less nodes always survive."""
    out = []
    for n in nodes:
        children = _filter_outline_nodes(n["children"], kept)
        if n["page"] is None or n["page"] in kept:
            out.append({**n, "children": children})
        else:
            out.extend(children)
    return out


def _visible_count(nodes: list[dict]) -> int:
    count = 0
    for n in nodes:
        count += 1
        if n["open"]:
            count += _visible_count(n["children"])
    return count


def _emit_outline(nodes: list[dict], start_num: int):
    """Filtered tree -> ({objnum: dict}, root_objnum, next_objnum);
    First/Last/Prev/Next/Parent/Count per writeOutline.js:15-62."""
    root_num = start_num
    next_num = [start_num + 1]

    def assign(lst):
        out = []
        for n in lst:
            num = next_num[0]
            next_num[0] += 1
            out.append((n, num, assign(n["children"])))
        return out

    tree = assign(nodes)
    objs: dict[int, dict] = {}

    def emit(entries, parent_num):
        for k, (n, num, kids) in enumerate(entries):
            d = {Name("Title"): b"\xfe\xff" + n["title"].decode(
                "latin-1").encode("utf-16-be")
                if n["title"][:2] != b"\xfe\xff" else n["title"]}
            d[Name("Parent")] = Ref(parent_num, 0)
            if k > 0:
                d[Name("Prev")] = Ref(entries[k - 1][1], 0)
            if k < len(entries) - 1:
                d[Name("Next")] = Ref(entries[k + 1][1], 0)
            if kids:
                vis = _visible_count(n["children"])
                d[Name("First")] = Ref(kids[0][1], 0)
                d[Name("Last")] = Ref(kids[-1][1], 0)
                d[Name("Count")] = vis if n["open"] else -vis
            if n["page"] is not None:
                view = n["view"] or [Name("Fit")]
                d[Name("Dest")] = [Ref(n["page"], 0)] + list(view)
            elif n["action"] is not None:
                d[Name("A")] = n["action"]
            objs[num] = d
            emit(kids, num)

    emit(tree, root_num)
    objs[root_num] = {
        Name("Type"): Name("Outlines"),
        Name("First"): Ref(tree[0][1], 0),
        Name("Last"): Ref(tree[-1][1], 0),
        Name("Count"): _visible_count(nodes),
    }
    return objs, root_num, next_num[0]


def _filter_annots(doc: PdfDocument, page: dict, kept: set,
                   name_dests: dict) -> list | None:
    """Entry-wise /Annots filter (subsetPdf.js:73-80): drop only
    annotations whose /Dest or GoTo /A targets a removed page."""
    annots = doc.resolve(page.get("Annots") or page.get(Name("Annots")))
    if not isinstance(annots, list):
        return None
    out = []
    for ref in annots:
        ann = doc.resolve(ref)
        if not isinstance(ann, dict):
            continue
        target = None
        if "Dest" in ann:
            target = _dest_page(doc, ann["Dest"], name_dests)
        elif "A" in ann:
            a = doc.resolve(ann["A"])
            if isinstance(a, dict) \
                    and str(doc.resolve(a.get("S", ""))) == "GoTo":
                target = _dest_page(doc, a.get("D"), name_dests)
        if target is not None and target[0] not in kept:
            continue
        out.append(ref)
    return out


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
    src_catalog = dict(doc.resolve(root_ref))
    catalog = dict(src_catalog)
    for key in _CATALOG_DROP:
        catalog.pop(key, None)
        catalog.pop(Name(key), None)

    kept_set = {n for n, _ in kept}
    name_dests = _build_name_dests(doc, src_catalog)
    outline_nodes = _filter_outline_nodes(
        _parse_outline_nodes(doc, src_catalog, name_dests), kept_set)

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
        filtered = _filter_annots(doc, page, kept_set, name_dests)
        page.pop("Annots", None)
        page.pop(Name("Annots"), None)
        if filtered:
            page[Name("Annots")] = filtered
        page.pop("StructParents", None)
        page.pop(Name("StructParents"), None)
        overrides[objnum] = page

    if outline_nodes:
        start = max(max(doc.xref, default=0), root_num, pages_num) + 1
        outline_objs, outline_root, _ = _emit_outline(outline_nodes, start)
        overrides.update(outline_objs)
        catalog[Name("Outlines")] = Ref(outline_root, 0)
        overrides[root_num] = catalog

    # reachability from the (rewritten) catalog
    seen: set[int] = set()

    def collect(obj):
        _collect_refs(doc, obj, seen)

    # overrides (catalog, pages root, kept pages, rebuilt outline) are
    # roots themselves. Seed ALL override objnums before walking any:
    # _collect_refs only walks the SOURCE doc, so an un-seeded Kids ref
    # would recurse into the source page dict and drag its unfiltered
    # /Annots and old /Parent tree back in.
    seen.update(overrides)
    for obj in overrides.values():
        collect(obj)

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
