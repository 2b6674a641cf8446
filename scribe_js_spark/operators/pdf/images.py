"""PDF image-XObject inventory.

Mirrors js/pdf/parsePdfImages.js:199 (extractImages) and :257
(parseImageObject) at the metadata/inventory level: every image object
in the document with dimensions, bit depth, mask flag, resolved color
space (Indexed palette hival, ICCBased folded to its device analogue
by /N), filter chain + codec extension (imageFilterToExt :1075),
/Decode inversion, /SMask and /Interpolate flags, and the raw stream
size. Pixel decode stays in the codec layer (PNG in
textops/multimodal.py and baseline+progressive DCT/JPEG in
textops/jpeg.py are real; JPX stays an honest stub — the inventory is
what a multimodal pipeline partitions on).
"""

from __future__ import annotations

from .document import PdfDocument
from .lexer import Name, Ref, StreamObj

_CODECS = ("DCTDecode", "JPXDecode", "CCITTFaxDecode", "JBIG2Decode")


def _filter_names(doc, d: dict) -> list[str]:
    filters = doc.resolve(d.get("Filter"))
    if filters is None:
        return []
    if isinstance(filters, (Name, str)):
        return [str(filters)]
    if isinstance(filters, list):
        return [str(doc.resolve(f)) for f in filters]
    return []


def codec_ext(filters: list[str]) -> str:
    """Container extension for the image codec in a filter chain
    (imageFilterToExt, parsePdfImages.js:1075)."""
    for f in filters:
        if f == "DCTDecode":
            return "jpg"
        if f == "JPXDecode":
            return "jp2"
    return "raw"


def _icc_name(doc, stream) -> str:
    stream = doc.resolve(stream)
    n = 3
    if isinstance(stream, StreamObj):
        try:
            n = int(doc.resolve(stream.dict.get("N", 3)))
        except (TypeError, ValueError):
            n = 3
    return {1: "DeviceGray", 4: "DeviceCMYK"}.get(n, "DeviceRGB")


def _colorspace(doc, d: dict) -> tuple[str, int]:
    """(name, indexed hival or -1). ImageMask images are DeviceGray by
    definition (parsePdfImages.js:265)."""
    if doc.resolve(d.get("ImageMask")) is True:
        return "DeviceGray", -1
    cs = doc.resolve(d.get("ColorSpace"))
    if cs is None:
        return "DeviceRGB", -1  # reference default (:510)
    if isinstance(cs, (Name, str)):
        return str(cs), -1
    if isinstance(cs, list) and cs:
        kind = str(doc.resolve(cs[0]))
        if kind == "Indexed":
            hival = -1
            if len(cs) >= 3:
                try:
                    hival = int(doc.resolve(cs[2]))
                except (TypeError, ValueError):
                    hival = -1
            return "Indexed", hival
        if kind == "ICCBased":
            return _icc_name(doc, cs[1] if len(cs) > 1 else None), -1
        return kind, -1
    return "DeviceRGB", -1


def parse_image_object(doc: PdfDocument, objnum: int,
                       obj: StreamObj) -> dict | None:
    """Inventory record for one image XObject
    (parseImageObject, parsePdfImages.js:257)."""
    d = obj.dict

    def _int(key, dflt):
        try:
            v = doc.resolve(d.get(key))
            return int(v) if v is not None else dflt
        except (TypeError, ValueError):
            return dflt

    width = _int("Width", 0)
    height = _int("Height", 0)
    if width == 0 or height == 0:
        return None
    image_mask = doc.resolve(d.get("ImageMask")) is True
    colorspace, hival = _colorspace(doc, d)
    filters = _filter_names(doc, d)
    decode = doc.resolve(d.get("Decode"))
    decode_invert = (isinstance(decode, list) and len(decode) >= 2
                     and float(doc.resolve(decode[0]))
                     > float(doc.resolve(decode[1])))
    try:
        length = int(doc.resolve(d.get("Length", 0)))
    except (TypeError, ValueError):
        length = 0
    return {
        "objnum": objnum,
        "width": width,
        "height": height,
        "bpc": _int("BitsPerComponent", 8),
        "image_mask": image_mask,
        "colorspace": colorspace,
        "palette_hival": hival,
        "filter": ",".join(filters),
        "ext": codec_ext(filters),
        "decode_invert": decode_invert,
        "has_smask": isinstance(d.get("SMask"), (Ref, StreamObj)),
        "interpolate": doc.resolve(d.get("Interpolate")) is True,
        "n_raw_bytes": length,
    }


def extract_images(data: bytes) -> list[dict]:
    """Every image XObject in the document, in object-number order
    (extractImages, parsePdfImages.js:199 — doc-wide xref sweep, so
    unreferenced/orphaned images are inventoried too). Total: corrupt
    documents yield the empty inventory rather than raising."""
    try:
        doc = PdfDocument(data)
    except Exception:
        return []
    out = []
    for objnum in sorted(doc.xref):
        try:
            obj = doc.get_object(objnum)
        except Exception:
            continue
        if not isinstance(obj, StreamObj):
            continue
        try:
            if str(doc.resolve(obj.dict.get("Subtype", ""))) != "Image":
                continue
            info = parse_image_object(doc, objnum, obj)
        except Exception:
            continue
        if info:
            out.append(info)
    return out
