"""PDF image-XObject inventory.

Mirrors js/pdf/parsePdfImages.js:199 (extractImages) and :257
(parseImageObject) at the metadata/inventory level: every image object
in the document with dimensions, bit depth, mask flag, resolved color
space (Indexed palette hival, ICCBased folded to its device analogue
by /N), filter chain + codec extension (imageFilterToExt :1075),
/Decode inversion, /SMask and /Interpolate flags, and the raw stream
size. Pixel decode (``decode_image_pixels``) covers the real codecs:
CCITTFaxDecode (all four T.4/T.6 modes through textops/ccitt — the
classic scanned-PDF shape), JBIG2Decode generic regions (arithmetic
templates 0-3 + TPGDON + MMR through textops/jbig2, with
/JBIG2Globals honored), DCTDecode (baseline + progressive JPEG
through textops/jpeg), JPXDecode (JPEG 2000 through textops/jpx —
JP2 boxes and bare codestreams, all five progression orders,
reversible 5/3 and irreversible 9/7, RCT/ICT, palettes with the
PDF /Indexed override), JBIG2Decode (generic + symbol/text +
halftone + refinement through textops/jbig2), uncompressed/Flate
8-bpc gray/RGB samples, and raw 1-bpc bilevel — the inventory is
what a multimodal pipeline partitions on.
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
        "inline": False,
    }


def decode_image_pixels(doc: PdfDocument, obj: StreamObj):
    """Image XObject -> grayscale-equivalent uint8 array (h, w) or
    (h, w, 3), or raise NotImplementedError for unsupported layouts.
    ``doc.stream_data`` applies the text filters and leaves codec
    bytes untouched, so the fax/JPEG/JPX payload arrives intact."""
    return _decode_pixels(doc, obj.dict, doc.stream_data(obj))


def _decode_pixels(doc: PdfDocument, d: dict, data: bytes):
    """Decode core over a plain image dict + text-filtered payload
    (shared by XObjects and inline BI/ID/EI images)."""
    import numpy as np

    width = int(doc.resolve(d.get("Width")))
    height = int(doc.resolve(d.get("Height")))
    bpc = int(doc.resolve(d.get("BitsPerComponent", 8)) or 8)
    filters = _filter_names(doc, d)
    codec = next((f for f in filters if f in _CODECS), None)
    if codec == "CCITTFaxDecode":
        from ...textops.ccitt import (decode_g3_2d, decode_g4,
                                      decode_mh)

        parms = doc.resolve(d.get("DecodeParms"))
        if isinstance(parms, list):
            parms = next((doc.resolve(p) for p in parms
                          if isinstance(doc.resolve(p), dict)), {})
        parms = parms if isinstance(parms, dict) else {}
        k = int(doc.resolve(parms.get("K", 0)) or 0)
        cols = int(doc.resolve(parms.get("Columns", 1728)) or 1728)
        rows = int(doc.resolve(parms.get("Rows", height)) or height)
        black_is_1 = doc.resolve(parms.get("BlackIs1")) is True
        # PDF default is a continuous bitstream; /EncodedByteAlign
        # opts into per-line byte alignment (decodeCCITT.js:477).
        byte_align = doc.resolve(parms.get("EncodedByteAlign")) is True
        eols = doc.resolve(parms.get("EndOfLine")) is True
        if k < 0:
            bits = decode_g4(data, cols, rows, byte_align=byte_align)
        elif k == 0:
            bits = decode_mh(data, cols, rows, eols=eols,
                             byte_align=byte_align)
        else:
            bits = decode_g3_2d(data, cols, rows,
                                byte_align=byte_align)
        # the decoder returns 1 = black ink. Sample value of ink is
        # BlackIs1 (default false -> ink sample 0); /Decode [1 0]
        # inverts the sample->gray mapping. Net gray of ink is the XOR
        # of the two flags: both defaulted or both set -> ink renders
        # black (0); exactly one set -> ink renders white (255).
        decode = doc.resolve(d.get("Decode"))
        decode_invert = (isinstance(decode, list) and len(decode) >= 2
                         and float(doc.resolve(decode[0]))
                         > float(doc.resolve(decode[1])))
        ink = np.array(bits, dtype=np.uint8)
        if black_is_1 != decode_invert:
            ink = 1 - ink
        return (1 - ink) * 255
    if codec == "DCTDecode":
        from ...textops.jpeg import decode_jpeg

        # /Decode [1 0 ...] inversion is consumed by the CMYK path
        # only, mirroring the reference's decodeInvert parameter
        # (decodeJPEG.js:767-780).
        decode = doc.resolve(d.get("Decode"))
        decode_invert = (isinstance(decode, list) and len(decode) >= 2
                         and float(doc.resolve(decode[0]))
                         > float(doc.resolve(decode[1])))
        return decode_jpeg(data, decode_invert=decode_invert)
    if codec == "JPXDecode":
        from ...textops.jpx import decode_jpx

        # PDF 32000 7.4.9: with JPXDecode the image dictionary's
        # /ColorSpace (when present) overrides the codestream's; an
        # /Indexed space consumes the raw index samples, so the
        # internal pclr palette must NOT be applied (the reference
        # threads the same flag, decodeJPX.js:18-30).
        cs, _hival = _colorspace(doc, d)
        out = decode_jpx(data, apply_internal_palette=cs != "Indexed")
        ncomp = int(out["components"])
        h2, w2 = int(out["height"]), int(out["width"])
        arr = np.asarray(out["pixel_data"], dtype=np.uint8)
        if ncomp == 1:
            return arr.reshape(h2, w2)
        if ncomp == 3:
            return arr.reshape(h2, w2, 3)
        if ncomp == 4:
            # CMYK codestream (DeviceCMYK JPX): same conversion tail
            # as 4-component DCT, honoring a /Decode inversion. JPX
            # has no Adobe YCCK marker, so the transform is None.
            from ...textops.jpeg import _cmyk_to_rgb

            decode = doc.resolve(d.get("Decode"))
            invert = (isinstance(decode, list) and len(decode) >= 2
                      and float(doc.resolve(decode[0]))
                      > float(doc.resolve(decode[1])))
            planes = arr.reshape(h2, w2, 4)
            return _cmyk_to_rgb(
                [planes[:, :, i] for i in range(4)], None, invert)
        raise NotImplementedError(f"jpx components={ncomp}")
    if codec == "JBIG2Decode":
        from ...textops.jbig2 import decode_jbig2

        parms = doc.resolve(d.get("DecodeParms"))
        if isinstance(parms, list):
            parms = next((doc.resolve(p) for p in parms
                          if isinstance(doc.resolve(p), dict)), {})
        parms = parms if isinstance(parms, dict) else {}
        gstream = doc.resolve(parms.get("JBIG2Globals"))
        gdata = doc.stream_data(gstream) \
            if isinstance(gstream, StreamObj) else b""
        ink = decode_jbig2(data, gdata)
        # the filter emits ink as sample 0 (JBIG2's 1=black inverted,
        # PDF 7.4.7); only a /Decode [1 0] flips that
        decode = doc.resolve(d.get("Decode"))
        if (isinstance(decode, list) and len(decode) >= 2
                and float(doc.resolve(decode[0]))
                > float(doc.resolve(decode[1]))):
            ink = 1 - ink
        return ((1 - ink) * 255).astype(np.uint8)
    if codec is not None:
        raise NotImplementedError(f"image codec {codec}")
    cs, _hival = _colorspace(doc, d)
    if bpc == 8 and cs in ("DeviceGray", "DeviceRGB"):
        spp = 3 if cs == "DeviceRGB" else 1
        need = width * height * spp
        if len(data) < need:
            raise ValueError("image: truncated samples")
        arr = np.frombuffer(data[:need], dtype=np.uint8)
        return arr.reshape(
            (height, width, 3) if spp == 3 else (height, width))
    if bpc == 1:
        row_bytes = (width + 7) // 8
        if len(data) < row_bytes * height:
            raise ValueError("image: truncated bilevel samples")
        bits = np.unpackbits(
            np.frombuffer(data[:row_bytes * height], dtype=np.uint8)
            .reshape(height, row_bytes), axis=1)[:, :width]
        decode = doc.resolve(d.get("Decode"))
        inverted = (isinstance(decode, list) and len(decode) >= 2
                    and float(doc.resolve(decode[0]))
                    > float(doc.resolve(decode[1])))
        if inverted:
            bits = 1 - bits
        return (bits * 255).astype(np.uint8)
    raise NotImplementedError(f"image layout bpc={bpc} cs={cs}")


# Inline-image (BI/ID/EI) abbreviations, PDF 32000-1 Table 93/94.
_INLINE_KEYS = {
    "W": "Width", "H": "Height", "BPC": "BitsPerComponent",
    "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
    "IM": "ImageMask", "D": "Decode", "I": "Interpolate",
    "L": "Length",
}
_INLINE_FILTERS = {
    "AHx": "ASCIIHexDecode", "A85": "ASCII85Decode", "LZW": "LZWDecode",
    "Fl": "FlateDecode", "RL": "RunLengthDecode",
    "CCF": "CCITTFaxDecode", "DCT": "DCTDecode",
}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB",
              "CMYK": "DeviceCMYK", "I": "Indexed"}


def _normalize_inline_dict(dict_text: bytes) -> dict | None:
    """BI..ID dict text -> image dict with the full (XObject) key and
    value spellings, so the shared inventory/decode paths apply."""
    from .lexer import Lexer

    try:
        obj = Lexer(b"<< " + dict_text + b" >>", 0).read_object()
    except Exception:
        return None
    if not isinstance(obj, dict):
        return None
    nd = {str(k): v for k, v in obj.items()}
    nd = {_INLINE_KEYS.get(k, k): v for k, v in nd.items()}
    f = nd.get("Filter")
    if f is not None:
        names = f if isinstance(f, list) else [f]
        nd["Filter"] = [_INLINE_FILTERS.get(str(x), str(x))
                        for x in names]
    cs = nd.get("ColorSpace")
    if isinstance(cs, (Name, str)):
        nd["ColorSpace"] = _INLINE_CS.get(str(cs), str(cs))
    elif isinstance(cs, list) and cs:
        cs = list(cs)
        cs[0] = _INLINE_CS.get(str(cs[0]), str(cs[0]))
        if len(cs) >= 2 and isinstance(cs[1], (Name, str)):
            cs[1] = _INLINE_CS.get(str(cs[1]), str(cs[1]))
        nd["ColorSpace"] = cs
    return nd


def _inline_record(doc: PdfDocument, dict_text: bytes, payload: bytes,
                   with_pixels: bool) -> dict | None:
    nd = _normalize_inline_dict(dict_text)
    if nd is None:
        return None

    def _int(key, dflt):
        try:
            v = doc.resolve(nd.get(key))
            return int(v) if v is not None else dflt
        except (TypeError, ValueError):
            return dflt

    width, height = _int("Width", 0), _int("Height", 0)
    if width <= 0 or height <= 0:
        return None
    colorspace, hival = _colorspace(doc, nd)
    filters = [str(f) for f in nd.get("Filter") or []]
    decode = nd.get("Decode")
    decode_invert = (isinstance(decode, list) and len(decode) >= 2
                     and float(decode[0]) > float(decode[1]))
    rec = {
        "objnum": None,  # not an indirect object
        "width": width,
        "height": height,
        "bpc": _int("BitsPerComponent", 8),
        "image_mask": nd.get("ImageMask") is True,
        "colorspace": colorspace,
        "palette_hival": hival,
        "filter": ",".join(filters),
        "ext": codec_ext(filters),
        "decode_invert": decode_invert,
        "has_smask": False,  # /SMask is not an inline-image key
        "interpolate": nd.get("Interpolate") is True,
        "n_raw_bytes": len(payload),
        "inline": True,
    }
    if with_pixels:
        try:
            import math

            px = _decode_pixels(doc, nd, doc._decode(payload, nd))
            rec["pixels_mean_e6"] = int(
                math.floor(float(px.mean()) * 1e6))
        except Exception:
            rec["pixels_mean_e6"] = None
    return rec


def extract_inline_images(data: bytes,
                          with_pixels: bool = False) -> list[dict]:
    """Inline (BI/ID/EI) images from page content streams and Form
    XObjects, in stream order. The reference inventories XObjects only
    (parsePdfImages.js:199 sweeps the xref); inline images are the
    small-bitmap shape real-world scanned/composited PDFs also carry,
    so the training-data inventory lists them too — same record schema,
    ``objnum`` None. Never fatal: corrupt documents/streams yield what
    was parseable."""
    from .content import ContentTokenizer

    try:
        doc = PdfDocument(data)
    except Exception:
        return []
    streams: list[bytes] = []
    try:
        for page in doc.get_pages():
            try:
                streams.append(doc.page_content(page))
            except Exception:
                continue
    except Exception:
        pass
    for objnum in sorted(doc.xref):
        try:
            obj = doc.get_object(objnum)
            if (isinstance(obj, StreamObj) and str(doc.resolve(
                    obj.dict.get("Subtype", ""))) == "Form"):
                streams.append(doc.stream_data(obj))
        except Exception:
            continue
    out = []
    for content in streams:
        if b"BI" not in content:
            continue
        tok = ContentTokenizer(content)
        try:
            for _ in tok:
                pass
        except Exception:
            pass
        for dict_text, payload in tok.inline_images:
            try:
                rec = _inline_record(doc, dict_text, payload,
                                     with_pixels)
            except Exception:
                continue
            if rec:
                out.append(rec)
    return out


def extract_images(data: bytes,
                   with_pixels: bool = False) -> list[dict]:
    """Every image XObject in the document, in object-number order
    (extractImages, parsePdfImages.js:199 — doc-wide xref sweep, so
    unreferenced/orphaned images are inventoried too). Total: corrupt
    documents yield the empty inventory rather than raising.

    With ``with_pixels`` each record gains ``pixels_mean_e6`` — the
    decoded mean pixel value in micro-units through
    :func:`decode_image_pixels` (fax/JPEG/raw), or None where the
    codec is stubbed or the payload is broken (never fatal)."""
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
            if with_pixels:
                try:
                    px = decode_image_pixels(doc, obj)
                    import math

                    info["pixels_mean_e6"] = int(
                        math.floor(float(px.mean()) * 1e6))
                except Exception:
                    info["pixels_mean_e6"] = None
            out.append(info)
    return out
