"""PDF identifying-metadata inspection and scrubbing.

Mirrors the reference's metadata feature:
- js/pdf/metadata/metadataInspect.js:86 (getMetadata): enumerate every
  category of identifying metadata — trailer /Info + /ID + /Encrypt,
  catalog XMP / OpenAction / AA / JavaScript / StructTreeRoot / Lang /
  PageLabels / ViewerPreferences, a per-object sweep for XMP streams,
  /PieceInfo, OCG layer names, embedded-file Filespecs, signatures,
  hidden document-information dicts and markup-annotation authors,
  image-internal JPEG/JPX metadata, and the /Prev revision chain
  (metadataInspect.js:41 countXrefRevisions).
- js/pdf/metadata/imageMetadata.js:70,174 (inspectJpegMetadata /
  inspectJpxMetadata): marker-segment / JP2-box scans — no decode.
- js/pdf/metadata/scrubMetadata.js:106 (rebuildDict + DROP_ALWAYS /
  INFO_FIELDS / ANNOT_IDENTITY): the scrubbing rules. The reference
  applies them during its object-preserving rebuild; here
  ``scrub_metadata`` re-serializes the whole document (classic xref,
  text-layer filters decoded), which also collapses the incremental-
  save /Prev chain — the other leak countXrefRevisions reports.

Unlike the JS (string-regex over object text), this works on the
already-parsed object graph from document.py, so key matching is exact
by construction.
"""

from __future__ import annotations

import hashlib
import re

from .document import PdfDocument, PdfError
from .lexer import Lexer, Name, Ref, StreamObj

# scrubMetadata.js:16 — top-level keys dropped from every object.
DROP_ALWAYS = {"Metadata", "PieceInfo", "AA", "Info", "LastModified"}
# scrubMetadata.js:39 — any of these marks a dict as a document-
# information dictionary (they never appear on functional objects).
INFO_STRONG = ("Author", "Creator", "Producer", "Company", "Manager")
# scrubMetadata.js:42 — fields scrubbed from an info-like dict.
INFO_FIELDS = set(INFO_STRONG) | {
    "Title", "Subject", "Keywords", "CreationDate", "ModDate", "Trapped"}
# scrubMetadata.js:70 — reviewer identity on a markup annotation.
ANNOT_IDENTITY = {"T", "CreationDate", "M", "NM", "RC"}
# scrubMetadata.js:19 — string that looks like a source filename/path.
FILENAME_LIKE = re.compile(
    r"\.(pdf|ai|psd|indd|tiff?|jpe?g|png|docx?|xlsx?|pptx?|eps|svg)\b"
    r"|[A-Za-z]:\\|/(?:Users|home|Volumes)/", re.I)
WEB_URI_SCHEME = re.compile(
    r"^(?:https?|mailto|ftp|ftps|tel|news|geo|sms):", re.I)

_STD_INFO_KEYS = ("Title", "Author", "Subject", "Keywords", "Creator",
                  "Producer", "CreationDate", "ModDate", "Trapped")


def decode_text_string(v) -> str | None:
    """PDF text string -> str (UTF-16BE with BOM, else PDFDocEncoding
    approximated as latin-1 — same fallback as outline.py)."""
    if v is None:
        return None
    if isinstance(v, bytes):
        if v[:2] == b"\xfe\xff":
            return v[2:].decode("utf-16-be", "replace")
        return v.decode("latin-1")
    return str(v)


# ------------------------------------------------------------ image scans


def inspect_jpeg_metadata(data: bytes) -> dict:
    """JPEG marker-segment scan (imageMetadata.js:70): EXIF / XMP APP1,
    IPTC APP13, GPS IFD tag presence. Stops at SOS/EOI; never decodes."""
    res = {"has_exif": False, "has_xmp": False, "has_iptc": False,
           "gps_present": False}
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return res
    i = 2
    while i + 3 < len(data):
        if data[i] != 0xFF:
            break
        m = i + 1
        while m < len(data) and data[m] == 0xFF:
            m += 1
        marker = data[m]
        if marker in (0xDA, 0xD9):
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i = m + 1
            continue
        if m + 2 >= len(data):
            break
        seg_len = (data[m + 1] << 8) | data[m + 2]
        payload = data[m + 3 : min(m + 1 + seg_len, len(data))]
        if marker == 0xE1:
            head = payload[:30]
            if head.startswith(b"Exif"):
                res["has_exif"] = True
                # 0x8825 = GPSInfo IFD tag, either endianness.
                if b"\x88\x25" in payload or b"\x25\x88" in payload:
                    res["gps_present"] = True
            elif b"ns.adobe.com/xap" in head:
                res["has_xmp"] = True
        elif marker == 0xED:
            res["has_iptc"] = True
        if seg_len < 2:
            break
        i = m + 1 + seg_len
    return res


_JPX_DROP_BOXES = {b"xml ", b"uuid", b"uinf", b"ulst", b"url "}


def inspect_jpx_metadata(data: bytes) -> dict:
    """JPEG2000 top-level JP2 box scan (imageMetadata.js:174)."""
    res = {"has_xml": False, "has_uuid": False}
    if len(data) < 8 or (data[0] == 0xFF and data[1] == 0x4F):
        return res  # raw codestream: no boxes
    i = 0
    while i + 8 <= len(data):
        length = int.from_bytes(data[i : i + 4], "big")
        header = 8
        if length == 1:
            length = int.from_bytes(data[i + 8 : i + 16], "big")
            header = 16
        elif length == 0:
            length = len(data) - i
        if length < header or i + length > len(data):
            break
        box = data[i + 4 : i + 8]
        if box == b"xml ":
            res["has_xml"] = True
        elif box == b"uuid":
            res["has_uuid"] = True
        i += length
    return res


# ------------------------------------------------------------- revisions


def count_xref_revisions(data: bytes) -> int:
    """Cross-reference sections in the /Prev chain
    (metadataInspect.js:41). >1 means prior incremental-save revisions
    (with their old metadata) are still recoverable from the file."""
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", data[-2048:], re.S):
        pass
    if not m:
        return 0
    off = int(m.group(1))
    seen: set[int] = set()
    count = 0
    while off and 0 <= off < len(data) and off not in seen and count < 64:
        seen.add(off)
        count += 1
        prev = None
        try:
            if data[off : off + 4] == b"xref":
                t = data.find(b"trailer", off)
                if t != -1:
                    trailer = Lexer(data, t + 7).read_object()
                    prev = trailer.get("Prev") if isinstance(
                        trailer, dict) else None
            else:
                lex = Lexer(data, off)
                lex.skip_ws()
                lex.read_token_word()
                lex.skip_ws()
                lex.read_token_word()
                lex.skip_ws()
                if lex.read_token_word() == b"obj":
                    obj = lex.read_object()
                    d = obj.dict if isinstance(obj, StreamObj) else obj
                    if isinstance(d, dict):
                        prev = d.get("Prev")
        except Exception:
            break
        off = int(prev) if isinstance(prev, (int, float)) else None
    return count


# --------------------------------------------------------------- inspect


def _objects(doc: PdfDocument):
    """(objnum, value, dict) for every xref entry that parses; the dict
    is the object's own dict (stream dict for streams) or None."""
    for objnum in sorted(doc.xref):
        try:
            obj = doc.get_object(objnum)
        except Exception:
            continue
        if obj is None:
            continue
        d = obj.dict if isinstance(obj, StreamObj) else (
            obj if isinstance(obj, dict) else None)
        yield objnum, obj, d


def _name(doc: PdfDocument, v) -> str | None:
    v = doc.resolve(v)
    return str(v) if isinstance(v, Name) else None


def inspect_metadata(data: bytes) -> dict:
    """Full identifying-metadata report for one PDF
    (metadataInspect.js:86 getMetadata). On an unsupported-encryption
    document only the byte-level facts (encrypted, revisions) are
    reported."""
    report = {
        "info": {}, "custom_info_keys": [], "doc_id": None,
        "encrypted": False, "xmp_catalog_bytes": 0, "xmp_objects": 0,
        "piece_info": 0, "ocg_names": [], "embedded_files": [],
        "open_action": False, "aa": False, "javascript": False,
        "struct_tree": False, "lang": None, "page_labels": False,
        "viewer_prefs": False, "signatures": [], "hidden_info": 0,
        "annotation_authors": [], "image_meta": [],
        "prior_revisions": count_xref_revisions(data),
    }
    # Total by design: a corrupt/truncated document degrades to the
    # byte-level facts instead of raising, and each section below is
    # independently guarded so one bad object degrades that section,
    # not the whole report (the reference wraps every metadata read in
    # try/catch — metadataInspect.js throughout).
    try:
        doc = PdfDocument(data)
    except Exception:
        report["encrypted"] = b"/Encrypt" in data
        return report
    report["encrypted"] = "Encrypt" in doc.trailer

    info_num = -1
    cat_meta_num = -1
    try:
        # Trailer: /ID and /Info
        doc_id = doc.resolve(doc.trailer.get("ID"))
        if isinstance(doc_id, list) and doc_id and isinstance(
                doc_id[0], (bytes, bytearray)):
            report["doc_id"] = bytes(doc_id[0]).hex()
        info_ref = doc.trailer.get("Info")
        info_num = info_ref.num if isinstance(info_ref, Ref) else -1
        info = doc.resolve(info_ref)
        if isinstance(info, dict):
            for k, v in info.items():
                report["info"][str(k)] = decode_text_string(doc.resolve(v))
            report["custom_info_keys"] = sorted(
                str(k) for k in info if str(k) not in _STD_INFO_KEYS)
    except Exception:
        pass

    try:
        # Catalog-level keys
        catalog = doc.resolve(doc.trailer.get("Root"))
        cat_meta_num = -1
        if isinstance(catalog, dict):
            meta_ref = catalog.get("Metadata")
            if meta_ref is not None:
                cat_meta_num = meta_ref.num if isinstance(meta_ref, Ref) else -1
                try:
                    report["xmp_catalog_bytes"] = len(
                        doc.stream_data(meta_ref))
                except Exception:
                    report["xmp_catalog_bytes"] = -1  # present but unreadable
            report["open_action"] = "OpenAction" in catalog
            report["aa"] = "AA" in catalog
            report["struct_tree"] = "StructTreeRoot" in catalog
            report["page_labels"] = "PageLabels" in catalog
            report["viewer_prefs"] = "ViewerPreferences" in catalog
            report["lang"] = decode_text_string(
                doc.resolve(catalog.get("Lang")))
            names = doc.resolve(catalog.get("Names"))
            if isinstance(names, dict):
                report["javascript"] = "JavaScript" in names
    except Exception:
        pass

    try:
        # Per-object sweep: XMP, PieceInfo, OCGs, Filespecs, signatures,
        # hidden info dicts, markup-annotation authors, image streams.
        for objnum, obj, d in _objects(doc):
            if d is None:
                continue
            typ = _name(doc, d.get("Type"))
            if typ == "Metadata" and objnum != cat_meta_num:
                report["xmp_objects"] += 1
            if "PieceInfo" in d:
                report["piece_info"] += 1
            if typ == "OCG":
                nm = decode_text_string(doc.resolve(d.get("Name")))
                if nm:
                    report["ocg_names"].append(nm)
            if typ == "Filespec":
                fn = doc.resolve(d.get("UF")) or doc.resolve(d.get("F"))
                report["embedded_files"].append(
                    decode_text_string(fn) or "(unnamed)")
            if typ == "Sig" or ("ByteRange" in d and "Contents" in d
                                and typ in ("Sig", "DocTimeStamp")):
                sub = _name(doc, d.get("SubFilter"))
                report["signatures"].append(sub or "(unknown)")
            # An info-identifying key on a non-trailer, non-functional dict
            # is a hidden custom info dict (metadataInspect.js:183).
            if (objnum != info_num and typ not in ("Metadata", "Catalog")
                    and any(k in d for k in INFO_STRONG)):
                report["hidden_info"] += 1
            # /T is the reviewer's name on a markup annot, the field name
            # on a Widget (metadataInspect.js:192).
            if typ == "Annot" and _name(doc, d.get("Subtype")) != "Widget":
                author = decode_text_string(doc.resolve(d.get("T")))
                if author:
                    report["annotation_authors"].append(author)
            # Image-internal metadata (DCT/JPX streams only).
            if (isinstance(obj, StreamObj)
                    and _name(doc, d.get("Subtype")) == "Image"):
                filters = doc.resolve(d.get("Filter"))
                if isinstance(filters, (Name, str)):
                    filters = [filters]
                fnames = [str(doc.resolve(f)) for f in (filters or [])]
                try:
                    body = doc.stream_data(obj)
                except Exception:
                    continue
                if "DCTDecode" in fnames:
                    j = inspect_jpeg_metadata(body)
                    if j["has_exif"] or j["has_xmp"] or j["has_iptc"]:
                        report["image_meta"].append(
                            {"objnum": objnum, "filter": "DCTDecode", **j})
                elif "JPXDecode" in fnames:
                    x = inspect_jpx_metadata(body)
                    if x["has_xml"] or x["has_uuid"]:
                        report["image_meta"].append(
                            {"objnum": objnum, "filter": "JPXDecode", **x})
    except Exception:
        pass
    return report


# ----------------------------------------------------------- serializer


def _esc_string(v: bytes) -> str:
    out = ["("]
    for b in v:
        ch = chr(b)
        if ch in "\\()":
            out.append("\\" + ch)
        elif 32 <= b <= 126:
            out.append(ch)
        else:
            out.append(f"\\{b:03o}")
    out.append(")")
    return "".join(out)


def _esc_name(v: str) -> str:
    out = ["/"]
    for ch in v:
        o = ord(ch)
        if o <= 32 or o > 126 or ch in "()<>[]{}/%#":
            out.append(f"#{o:02X}")
        else:
            out.append(ch)
    return "".join(out)


def serialize_object(obj) -> str:
    """Python object-graph value -> PDF syntax (inverse of
    lexer.read_object, minus streams — see scrub_metadata)."""
    if obj is None:
        return "null"
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if isinstance(obj, Name):
        return _esc_name(str(obj))
    if isinstance(obj, (int, float)):
        if isinstance(obj, float):
            return f"{obj:.6f}".rstrip("0").rstrip(".")
        return str(obj)
    if isinstance(obj, Ref):
        return f"{obj.num} {obj.gen} R"
    if isinstance(obj, (bytes, bytearray)):
        return _esc_string(bytes(obj))
    if isinstance(obj, list):
        return "[" + " ".join(serialize_object(v) for v in obj) + "]"
    if isinstance(obj, dict):
        return ("<< " + " ".join(
            f"{_esc_name(str(k))} {serialize_object(v)}"
            for k, v in obj.items()) + " >>")
    if isinstance(obj, str):  # plain str (shouldn't occur, be safe)
        return _esc_string(obj.encode("latin-1", "replace"))
    raise PdfError(f"unserializable {type(obj).__name__}")


# ------------------------------------------------------------------ scrub


def _leaky(doc: PdfDocument, v) -> bool:
    s = decode_text_string(doc.resolve(v))
    return bool(s) and bool(FILENAME_LIKE.search(s))


def _scrub_dict(doc: PdfDocument, d: dict, is_catalog: bool,
                state: dict) -> dict:
    """One dict through the scrubMetadata.js:106 rebuildDict rules."""
    keys = {str(k) for k in d}
    info_like = bool(keys & set(INFO_STRONG))
    typ = _name(doc, d.get("Type"))
    is_markup_annot = (
        typ == "Annot" and _name(doc, d.get("Subtype")) != "Widget"
        and bool(keys & {"T", "CreationDate"}))
    out = {}
    for k, v in d.items():
        ks = str(k)
        if ks in DROP_ALWAYS:
            continue
        if info_like and ks in INFO_FIELDS:
            continue
        if is_markup_annot and ks in ANNOT_IDENTITY:
            continue
        # Catalog: OpenAction / Names (JavaScript) are identifying
        # behaviors the reference's rebuild drops by not keeping them
        # (scrubMetadata.js:215 catalogKeepEntries keeps structure only).
        if is_catalog and ks in ("OpenAction", "Names"):
            continue
        if typ == "OCG" and ks == "Name" and _leaky(doc, v):
            state["ocg_n"] += 1
            out[k] = f"Layer {state['ocg_n']}".encode("latin-1")
            continue
        if ks in ("Alt", "ActualText") and _leaky(doc, v):
            continue
        if ks == "URI" and _leaky(doc, v):
            s = decode_text_string(doc.resolve(v)) or ""
            if not WEB_URI_SCHEME.match(s.strip()):
                out[k] = b""
                continue
        if ks in ("D", "Dest") and isinstance(
                doc.resolve(v), (bytes, bytearray)) and _leaky(doc, v):
            out[k] = b""
            continue
        out[k] = v
    return out


_TEXT_FILTERS = {"FlateDecode", "Fl", "ASCIIHexDecode", "AHx",
                 "ASCII85Decode", "A85"}


def scrub_metadata(data: bytes) -> bytes:
    """Rewrite a PDF with identifying metadata removed. Whole-document
    re-serialization: every object passes the rebuildDict rules, XMP /
    Info / PieceInfo objects orphan (not emitted), JPEG/JPX image
    streams are losslessly stripped (imageMetadata.js:28), and the
    output has a single revision (collapsing the /Prev chain) with a
    content-derived /ID. Encrypted input is emitted decrypted."""
    doc = PdfDocument(data)
    root_ref = doc.trailer.get("Root")
    root_num = root_ref.num if isinstance(root_ref, Ref) else None
    info_ref = doc.trailer.get("Info")
    info_num = info_ref.num if isinstance(info_ref, Ref) else -1
    # XMP streams referenced from anywhere orphan once /Metadata keys
    # drop; skip them (and container/crypto machinery) at emission.
    state = {"ocg_n": 0}
    bodies: dict[int, bytes] = {}
    for objnum, obj, d in _objects(doc):
        typ = _name(doc, d.get("Type")) if d else None
        if typ in ("ObjStm", "XRef"):
            continue  # members re-emitted individually; xref rebuilt
        if typ == "Metadata" or objnum == info_num:
            continue
        if isinstance(obj, StreamObj):
            sd = _scrub_dict(doc, obj.dict, objnum == root_num, state)
            filters = doc.resolve(obj.dict.get("Filter"))
            if isinstance(filters, (Name, str)):
                filters = [filters]
            fnames = [str(doc.resolve(f)) for f in (filters or [])]
            body = doc.stream_data(obj)  # decoded through text filters
            consumed = 0
            for fn in fnames:
                if fn in _TEXT_FILTERS:
                    consumed += 1
                else:
                    break
            remaining = fnames[consumed:]
            if remaining and remaining[0] == "DCTDecode":
                body = _strip_jpeg(body)
            elif remaining and remaining[0] == "JPXDecode":
                body = _strip_jpx(body)
            for drop in ("Filter", "DecodeParms", "Length"):
                sd.pop(drop, None)
                sd.pop(Name(drop), None)
            sd[Name("Length")] = len(body)
            if remaining:
                sd[Name("Filter")] = [Name(f) for f in remaining] if len(
                    remaining) > 1 else Name(remaining[0])
            bodies[objnum] = (
                serialize_object(sd).encode("latin-1")
                + b"\nstream\n" + body + b"\nendstream")
        elif d is not None:
            sd = _scrub_dict(doc, d, objnum == root_num, state)
            bodies[objnum] = serialize_object(sd).encode("latin-1")
        else:
            bodies[objnum] = serialize_object(obj).encode("latin-1")

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for objnum in sorted(bodies):
        offsets[objnum] = len(out)
        out += f"{objnum} 0 obj\n".encode() + bodies[objnum] + b"\nendobj\n"
    size = (max(bodies) + 1) if bodies else 1
    xref_pos = len(out)
    out += b"xref\n"
    out += f"0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for objnum in range(1, size):
        if objnum in offsets:
            out += f"{offsets[objnum]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    new_id = hashlib.md5(bytes(out)).hexdigest()
    out += (
        f"trailer\n<< /Size {size} /Root {root_num} 0 R "
        f"/ID [<{new_id}> <{new_id}>] >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def _strip_jpeg(data: bytes) -> bytes:
    """Drop metadata-only marker segments (imageMetadata.js:28)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return data
    drop = {0xE1, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xEB,
            0xEC, 0xED, 0xEF, 0xFE}
    out = bytearray(data[:2])
    i = 2
    dropped = False
    while i + 1 < len(data):
        if data[i] != 0xFF:
            return bytes(out + data[i:]) if dropped else data
        m = i + 1
        while m < len(data) and data[m] == 0xFF:
            m += 1
        marker = data[m]
        if marker == 0xDA:  # SOS: scan copied verbatim
            out += data[i:]
            break
        if marker == 0xD8 or marker == 0xD9 or 0xD0 <= marker <= 0xD7 \
                or marker == 0x01:
            out += data[i : m + 1]
            i = m + 1
            continue
        if m + 2 >= len(data):
            out += data[i:]
            break
        seg_len = (data[m + 1] << 8) | data[m + 2]
        seg_end = m + 1 + seg_len
        if seg_len < 2 or seg_end > len(data):
            return bytes(out + data[i:]) if dropped else data
        if marker in drop:
            dropped = True
        else:
            out += data[i:seg_end]
        i = seg_end
    return bytes(out) if dropped else data


def _strip_jpx(data: bytes) -> bytes:
    """Drop top-level JP2 metadata boxes (imageMetadata.js:143)."""
    if len(data) < 8 or (data[0] == 0xFF and data[1] == 0x4F):
        return data
    out = bytearray()
    i = 0
    dropped = False
    while i + 8 <= len(data):
        length = int.from_bytes(data[i : i + 4], "big")
        header = 8
        if length == 1:
            length = int.from_bytes(data[i + 8 : i + 16], "big")
            header = 16
        elif length == 0:
            length = len(data) - i
        if length < header or i + length > len(data):
            return bytes(out + data[i:]) if dropped else data
        if data[i + 4 : i + 8] in _JPX_DROP_BOXES:
            dropped = True
        else:
            out += data[i : i + length]
        i += length
    if i < len(data):
        out += data[i:]
    return bytes(out) if dropped else data
