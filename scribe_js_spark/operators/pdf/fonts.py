"""PDF font dictionaries: encodings, ToUnicode CMaps, widths, style flags.

Covers the text-required subset of the reference's font stack
(/root/reference/js/pdf/fonts/parsePdfFonts.js): BaseFont name ->
bold/italic/small-caps flags, /Widths + /FirstChar, /Encoding base +
/Differences, ToUnicode CMap (bfchar + bfrange), CID fonts with
Identity-H and /W, ascent/descent from the descriptor. Embedded font
*program* parsing (CID-keyed CFF charset walk, TrueType glyf presence)
lives in fontprog.py and feeds validCIDs / blank-glyph remaps back
into the emit path (reference: js/pdf/parsePdfDoc.js:1884).

Encoding tables are public Adobe/Unicode facts: WinAnsiEncoding is
cp1252 over the defined range; StandardEncoding differs in the quote
glyphs and high range (compact subset here); glyph names resolve via a
compact Adobe Glyph List subset + the uniXXXX rule.
"""

from __future__ import annotations

import re

# Compact AGL subset: names that appear in practice in /Differences for
# text documents. Letters/digits resolve by rule below.
GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ",
    "ffi": "ﬃ", "ffl": "ﬄ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "ntilde": "ñ",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "dagger": "†", "daggerdbl": "‡",
    "section": "§", "paragraph": "¶", "ellipsis": "…",
    "minus": "−", "multiply": "×", "divide": "÷",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "euro": "€", "sterling": "£", "yen": "¥",
    "cent": "¢", "florin": "ƒ",
    # Latin-1 / Mac-order completions (AGL values) so the Mac standard
    # glyph order fallback resolves every non-.notdef name it can hit.
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â", "Atilde": "Ã",
    "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë", "Igrave": "Ì",
    "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï", "Eth": "Ð",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú",
    "Ucircumflex": "Û", "Yacute": "Ý", "Thorn": "Þ", "agrave": "à",
    "aacute": "á", "acircumflex": "â", "atilde": "ã", "aring": "å",
    "ae": "æ", "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï", "eth": "ð",
    "ograve": "ò", "oacute": "ó", "ocircumflex": "ô", "otilde": "õ",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "yacute": "ý", "thorn": "þ", "ydieresis": "ÿ", "Ydieresis": "Ÿ",
    "OE": "Œ", "oe": "œ", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "Lslash": "Ł", "lslash": "ł",
    "Gbreve": "Ğ", "gbreve": "ğ", "Idotaccent": "İ", "dotlessi": "ı",
    "Scedilla": "Ş", "scedilla": "ş", "Cacute": "Ć", "cacute": "ć",
    "Ccaron": "Č", "ccaron": "č", "dcroat": "đ",
    "exclamdown": "¡", "questiondown": "¿", "ordfeminine": "ª",
    "ordmasculine": "º", "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "quotesinglbase": "‚", "quotedblbase": "„", "perthousand": "‰",
    "periodcentered": "·", "nonbreakingspace": " ",
    "brokenbar": "¦", "logicalnot": "¬", "plusminus": "±",
    "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
    "onequarter": "¼", "onehalf": "½", "threequarters": "¾",
    "currency": "¤", "acute": "´", "dieresis": "¨", "macron": "¯",
    "cedilla": "¸", "circumflex": "ˆ", "tilde": "˜", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛", "hungarumlaut": "˝",
    "caron": "ˇ", "fraction": "⁄", "franc": "₣", "lozenge": "◊",
    "notequal": "≠", "infinity": "∞", "lessequal": "≤",
    "greaterequal": "≥", "partialdiff": "∂", "summation": "∑",
    "product": "∏", "pi": "π", "integral": "∫", "radical": "√",
    "approxequal": "≈", "Delta": "∆", "Omega": "Ω", "mu": "µ",
    "apple": "",
}
_DIGIT_NAMES = {v: k for k, v in GLYPH_NAMES.items()}


def glyph_name_to_unicode(name: str) -> str | None:
    """AGL resolution with the reference's extra rules
    (standardEncodings.js aglLookup:4582): dot-suffix strip
    ("one.oldstyle"), multi-group uniXXXXYYYY, the producer "C0065"
    charCode prefix, and underscore ligatures ("f_f_i")."""
    if len(name) == 1 and (name.isalpha() or name.isdigit()):
        return name
    if name in GLYPH_NAMES:
        return GLYPH_NAMES[name]
    dot = name.find(".")
    if dot > 0:
        base = name[:dot]
        if len(base) == 1 and (base.isalpha() or base.isdigit()):
            return base
        if base in GLYPH_NAMES:
            return GLYPH_NAMES[base]
    m = re.match(r"^uni([0-9A-Fa-f]{4,})$", name)
    if m and len(m.group(1)) % 4 == 0:
        h = m.group(1)
        return "".join(chr(int(h[i:i + 4], 16))
                       for i in range(0, len(h), 4))
    m = re.match(r"^uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.match(r"^u([0-9A-Fa-f]{4,6})$", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.match(r"^C(\d{1,5})$", name)
    if m and 32 <= int(m.group(1)) <= 255:
        return chr(int(m.group(1)))
    if "_" in name:
        parts = name.split("_")
        out = []
        for p in parts:
            v = (p if len(p) == 1 and (p.isalpha() or p.isdigit())
                 else GLYPH_NAMES.get(p))
            if v is None:
                return None
            out.append(v)
        return "".join(out)
    return None


def _base_encoding_map(name: str | None) -> dict[int, str]:
    enc: dict[int, str] = {}
    if name == "MacRomanEncoding":
        for code in range(32, 256):
            try:
                enc[code] = bytes([code]).decode("mac-roman")
            except UnicodeDecodeError:
                pass
        return enc
    if name == "StandardEncoding":
        for code in range(32, 127):
            enc[code] = chr(code)
        enc[0x27] = "’"  # quoteright
        enc[0x60] = "‘"  # quoteleft
        return enc
    # WinAnsiEncoding (default for simple western fonts) == cp1252.
    for code in range(32, 256):
        try:
            enc[code] = bytes([code]).decode("cp1252")
        except UnicodeDecodeError:
            pass
    return enc


def _is_ascii_letter(s: str) -> bool:
    return "A" <= s <= "Z" or "a" <= s <= "z"


class PdfFont:
    """Resolved font state for the text machine."""

    __slots__ = (
        "base_name", "family_name", "bold", "italic", "small_caps",
        "widths", "default_width", "cid", "two_byte", "to_unicode",
        "encoding", "ascent", "descent", "type3", "font_matrix",
        "valid_cids", "type3_glyph_hash", "broken_cached",
        "prefer_encoding_case", "codespace_ranges", "code_to_cid",
        "cjk_codec",
    )

    def __init__(self):
        self.base_name = ""
        self.family_name = ""
        self.bold = False
        self.italic = False
        self.small_caps = False
        self.widths: dict[int, float] = {}
        self.default_width = 500.0
        self.cid = False
        self.two_byte = False
        self.to_unicode: dict[int, str] = {}
        self.encoding: dict[int, str] = {}
        self.ascent = 0.718   # Helvetica defaults (public AFM values)
        self.descent = -0.207
        self.type3 = False
        self.font_matrix = None
        # CIDs the embedded CID-keyed CFF actually defines (charset
        # keys + implicit 0), or None when no program constrains them.
        self.valid_cids: set[int] | None = None
        # Type3 only: charCode -> CharProc content hash. Codes sharing
        # one hash across >=3 charCodes are producer filler stamps
        # (parsePdfDoc.js:523-534 pathHash analog).
        self.type3_glyph_hash: dict[int, str] | None = None
        # Memoized broken-ToUnicode verdict (the reference caches per
        # font in a WeakMap; an id()-keyed global dict would serve
        # stale verdicts after address reuse).
        self.broken_cached: bool | None = None
        # Broken OCR ToUnicode maps can flip ASCII letter case while
        # mapping to the same underlying letter; when >=2 consistent
        # conflicts exist, the encoding's case wins per code
        # (parsePdfFonts.js:2247-2265, parsePdfDoc.js:1867-1879).
        self.prefer_encoding_case = False
        # Type0 CMaps beyond Identity-H: an embedded encoding CMap's
        # codespace ranges (list of (n_bytes, low, high), 1-byte ranges
        # first) + charCode -> CID map; predefined Adobe CJK CMaps set
        # a byte-charset codec (Shift-JIS/GBK/Big5/EUC-KR) instead
        # (parsePdfFonts.js:873-1025, pdfPrimitives decodeTextCodes).
        self.codespace_ranges: list[tuple[int, int, int]] | None = None
        self.code_to_cid: dict[int, int] | None = None
        self.cjk_codec: str | None = None

    def unicode_for(self, code: int) -> str | None:
        if code in self.to_unicode:
            u = self.to_unicode[code]
            if self.prefer_encoding_case and len(u) == 1:
                e = self.encoding.get(code)
                if (e is not None and len(e) == 1 and e != u
                        and _is_ascii_letter(u) and _is_ascii_letter(e)
                        and u.lower() == e.lower()):
                    return e
            return u
        if code in self.encoding:
            return self.encoding[code]
        if self.cjk_codec is not None:
            u = None
            try:
                if code > 0xFF:
                    u = bytes((code >> 8, code & 0xFF)).decode(
                        self.cjk_codec)
                elif code >= 0x80:
                    u = bytes((code,)).decode(self.cjk_codec)
                else:
                    u = chr(code)
            except UnicodeDecodeError:
                pass
            if u:
                self.to_unicode[code] = u  # memoize the charset decode
                return u
        if not self.cid and 0 <= code < 0x110000:
            return chr(code)
        return None

    def width_for(self, code: int) -> float:
        # A CID font's /W advances are keyed by CID, which equals the
        # content-stream code only under Identity encoding
        # (parsePdfDoc.js:1893 widthKey).
        if self.code_to_cid is not None:
            code = self.code_to_cid.get(code, code)
        return self.widths.get(code, self.default_width)


_BFCHAR_RE = re.compile(
    rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(
    rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16be_to_str(hexstr: bytes) -> str:
    raw = bytes.fromhex(hexstr.decode("latin-1"))
    if len(raw) % 2:
        raw += b"\x00"
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return ""


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """bfchar + bfrange sections -> code -> unicode string
    (reference parseToUnicodeCMap, parsePdfFonts.js:2537)."""
    mapping: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(data):
        toks = _HEX_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            code = int(toks[i], 16)
            mapping[code] = _utf16be_to_str(toks[i + 1])
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        # two forms: <lo> <hi> <dst>  |  <lo> <hi> [<dst> <dst> ...]
        pos = 0
        while True:
            mm = re.match(
                rb"\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*", body[pos:])
            if not mm:
                break
            lo = int(mm.group(1), 16)
            hi = int(mm.group(2), 16)
            pos += mm.end()
            if pos < len(body) and body[pos : pos + 1] == b"[":
                end = body.find(b"]", pos)
                dsts = _HEX_RE.findall(body[pos:end])
                for i, d in enumerate(dsts):
                    mapping[lo + i] = _utf16be_to_str(d)
                pos = end + 1
            else:
                mm2 = re.match(rb"<([0-9A-Fa-f]+)>\s*", body[pos:])
                if not mm2:
                    break
                base_hex = mm2.group(1)
                base = int(base_hex, 16)
                for i in range(hi - lo + 1):
                    # increment the last UTF-16 code unit
                    s = _utf16be_to_str(base_hex)
                    if s:
                        mapping[lo + i] = s[:-1] + chr(ord(s[-1]) + i)
                pos += mm2.end()
    return mapping


_BOLD_NAME_RE = re.compile(r"bold|black|heavy", re.I)
_ITALIC_NAME_RE = re.compile(r"italic|oblique", re.I)
_SMALLCAPS_NAME_RE = re.compile(r"(small\W?cap)|(sc$)", re.I)


def load_font_cached(doc, ref, sibling_fonts=None) -> PdfFont:
    """Document-scoped font cache (reference objCache.fontCache:796):
    a font referenced from many pages or Form XObjects pays the parse
    cost once per document, and the cross-font passes (sibling
    FontFile2 search, family ToUnicode inheritance) can resolve
    donors without reparsing. Cycles between mutually-referencing
    siblings load bare (uncached, no sibling context)."""
    from .lexer import Ref

    cache = getattr(doc, "_font_cache", None)
    if cache is None:
        cache = doc._font_cache = {}
    key = ref.num if isinstance(ref, Ref) else id(ref)
    f = cache.get(key)
    if f is not None:
        return f
    loading = getattr(doc, "_font_loading", None)
    if loading is None:
        loading = doc._font_loading = set()
    if key in loading:
        return load_font(doc, ref)
    loading.add(key)
    try:
        f = load_font(doc, ref, sibling_fonts=sibling_fonts)
    except Exception:
        f = PdfFont()
    finally:
        loading.discard(key)
    cache[key] = f
    return f


def load_font(doc, font_dict, sibling_fonts=None) -> PdfFont:
    """Resolve one /Font resource into a PdfFont. ``sibling_fonts``
    is the page's full /Font dict; when a CIDFontType2 has no embedded
    program, a sibling entry with the same (subset-stripped) BaseFont
    may carry the FontFile2 the GID->Unicode recovery needs
    (parsePdfFonts.js:1812-1836 — the Word-export pattern of one font
    embedded once but referenced under two tags)."""
    font_dict = doc.resolve(font_dict)
    f = PdfFont()
    base_v = doc.resolve(font_dict.get("BaseFont", ""))
    if isinstance(base_v, bytes):
        # /BaseFont as a hex STRING (<feff0041...>): UTF-16BE when
        # BOM'd, latin-1 otherwise (parsePdfFonts.js:809-840).
        if base_v[:2] == b"\xfe\xff":
            base = base_v[2:].decode("utf-16-be", "replace")
        else:
            base = base_v.decode("latin-1", "replace")
    else:
        base = str(base_v or "")
    f.base_name = re.sub(r"^[A-Z]{6}\+", "", base)
    f.family_name = re.sub(r"[-,].*$", "", f.base_name)
    f.bold = bool(_BOLD_NAME_RE.search(f.base_name))
    f.italic = bool(_ITALIC_NAME_RE.search(f.base_name))
    f.small_caps = bool(_SMALLCAPS_NAME_RE.search(f.base_name))

    subtype = str(doc.resolve(font_dict.get("Subtype", "")))
    cid_font_file2 = None
    type0_enc_name = ""
    named_auth = False
    has_named_enc = False
    desc_subtype = ""
    cid_registry = ""
    cid_ordering = ""
    cff_charset_names: dict[int, str] | None = None
    simple_cff_fill = None
    if subtype == "Type0":
        f.cid = True
        f.two_byte = True  # Identity-H / standard CMaps; 2-byte codes
        enc0 = doc.resolve(font_dict.get("Encoding"))
        if isinstance(enc0, str):
            type0_enc_name = str(enc0)
        else:
            # Embedded encoding CMap stream: charCode -> CID ranges +
            # codespace byte widths (parsePdfFonts.js:873-890).
            try:
                cmap_bytes = doc.stream_data(enc0)
                m = _parse_cid_encoding_cmap(cmap_bytes)
                if m:
                    f.code_to_cid = m
                f.codespace_ranges = _parse_codespace_ranges(cmap_bytes)
            except Exception:
                pass
        desc_fonts = doc.resolve(font_dict.get("DescendantFonts", []))
        desc = doc.resolve(desc_fonts[0]) if desc_fonts else {}
        desc_subtype = str(doc.resolve(desc.get("Subtype", "")))
        # /Registry and /Ordering gate the no-ToUnicode recovery paths
        # below; producers emit them inline, as indirect refs, or (in
        # encrypted files) as per-object-encrypted strings — resolve()
        # handles all three (parsePdfFonts.js:1773-1802 re-derives the
        # decryption by hand; our object layer decrypts at parse).
        sysinfo = doc.resolve(desc.get("CIDSystemInfo"))
        if isinstance(sysinfo, dict):
            cid_registry = _pdf_text(doc.resolve(sysinfo.get("Registry")))
            cid_ordering = _pdf_text(doc.resolve(sysinfo.get("Ordering")))
        f.default_width = float(doc.resolve(desc.get("DW", 1000)))
        w_arr = doc.resolve(desc.get("W"))
        if w_arr:
            _parse_cid_widths(doc, w_arr, f.widths)
        fd = doc.resolve(desc.get("FontDescriptor"))
        _apply_descriptor(doc, fd, f)
        # Embedded font programs: a CID-keyed CFF (FontFile3) yields
        # the set of CIDs the subset actually defines; a TrueType
        # program (FontFile2) is kept for the blank-glyph remap below.
        if isinstance(fd, dict):
            if fd.get("FontFile3") is not None:
                try:
                    from .fontprog import parse_cff_summary

                    summary = parse_cff_summary(
                        doc.stream_data(fd["FontFile3"]))
                    if summary["ok"] and summary["is_cid"] \
                            and summary["cid_to_gid"] is not None:
                        # CID 0 (.notdef) is implicit in the charset
                        # (parsePdfFonts.js:1746).
                        f.valid_cids = {0, *summary["cid_to_gid"]}
                    elif summary["ok"] and not summary["is_cid"]:
                        # Non-CID CFF inside a Type0: glyph names from
                        # the explicit charset fill ToUnicode gaps via
                        # AGL after the CMap parse below
                        # (parsePdfFonts.js:1747-1760).
                        cff_charset_names = summary["charset_names"]
                except Exception:
                    pass
            elif fd.get("FontFile2") is not None:
                try:
                    cid_font_file2 = doc.stream_data(fd["FontFile2"])
                except Exception:
                    pass
    else:
        if subtype == "Type3":
            f.type3 = True
            fm = doc.resolve(font_dict.get("FontMatrix"))
            if fm:
                f.font_matrix = [float(doc.resolve(x)) for x in fm]
            _hash_type3_charprocs(doc, font_dict, f)
        widths = doc.resolve(font_dict.get("Widths"))
        fc = doc.resolve(font_dict.get("FirstChar"))
        if fc is None and widths:
            # /FirstChar is required by the spec but some generators
            # omit it while supplying /Widths + /LastChar; anchor the
            # array at LastChar - len + 1 (parsePdfFonts.js:1451-1456).
            lc = doc.resolve(font_dict.get("LastChar"))
            fc = (max(0, int(lc) - len(widths) + 1)
                  if lc is not None else 0)
        first_char = int(fc or 0)
        if widths:
            vals = [float(doc.resolve(w)) for w in widths]
            for i, w in enumerate(vals):
                f.widths[first_char + i] = w
            if vals:
                f.default_width = sum(vals) / len(vals)
        enc_obj = doc.resolve(font_dict.get("Encoding"))
        base_enc = None
        diffs = None
        if isinstance(enc_obj, str):
            base_enc = str(enc_obj)
        elif isinstance(enc_obj, dict):
            be = doc.resolve(enc_obj.get("BaseEncoding"))
            base_enc = str(be) if be else None
            diffs = doc.resolve(enc_obj.get("Differences"))
        symbolic = False
        flags = 0
        fd = doc.resolve(font_dict.get("FontDescriptor"))
        if isinstance(fd, dict):
            flags = int(doc.resolve(fd.get("Flags", 0)) or 0)
            symbolic = bool(flags & 4) and not bool(flags & 32)
            try:
                weight = float(doc.resolve(fd.get("FontWeight", 0)) or 0)
            except (TypeError, ValueError):
                weight = 0.0
            if flags & 0x40000 or weight >= 700:
                f.bold = True
            try:
                angle = float(doc.resolve(fd.get("ItalicAngle", 0)) or 0)
            except (TypeError, ValueError):
                angle = 0.0
            if flags & 0x40 or 0 < abs(angle) < 45:
                f.italic = True
            # /Widths present + descriptor: codes outside the array
            # take /MissingWidth (PDF 32000-1 9.8.1, default 0) —
            # overriding the array average (parsePdfFonts.js:1986-1991).
            if f.widths:
                try:
                    mw = doc.resolve(fd.get("MissingWidth", 0)) or 0
                    f.default_width = float(mw)
                except (TypeError, ValueError):
                    f.default_width = 0.0
        if not symbolic or base_enc:
            f.encoding = _base_encoding_map(base_enc)
        # No /BaseEncoding: the spec's implicit base is the font's own
        # built-in encoding. For an embedded Type1 the cleartext PFA
        # header carries it as `dup N /name put` lines
        # (parsePdfFonts.js:1136-1146 via parseType1PFAEncoding:101);
        # /Differences below still override per code.
        if base_enc is None and subtype == "Type1" \
                and isinstance(fd, dict) \
                and fd.get("FontFile") is not None:
            try:
                pfa = doc.stream_data(fd["FontFile"])
                for code, gname in _parse_type1_pfa_encoding(pfa):
                    u = glyph_name_to_unicode(gname)
                    if u is not None:
                        f.encoding[code] = u
            except Exception:
                pass
        # PDF 32000-1 9.6.6.4: a nonsymbolic font's named /Encoding is
        # authoritative; a symbolic font's is ignored (gates the
        # Symbol/Wingdings chart repairs below).
        has_named_enc = base_enc in ("WinAnsiEncoding",
                                     "MacRomanEncoding")
        named_auth = has_named_enc and not (flags & 4)
        diff_names: dict[int, str] = {}
        if diffs:
            code = 0
            for item in diffs:
                item = doc.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    diff_names[code] = str(item)
                    u = glyph_name_to_unicode(str(item))
                    if u is not None:
                        f.encoding[code] = u
                    code += 1
        if not f.widths:
            _apply_standard_metrics(f, base_enc, diff_names)
        _apply_dingbats_differences(f, diff_names)
        # Simple Type1C: some generators emit sparse /Differences or
        # omit /ToUnicode, relying on the embedded CFF's own custom
        # Encoding table for the rest (parsePdfFonts.js:2133-2177);
        # applied after the ToUnicode parse below.
        if isinstance(fd, dict) and fd.get("FontFile3") is not None:
            try:
                from .fontprog import parse_cff_summary

                s3 = parse_cff_summary(doc.stream_data(fd["FontFile3"]))
                if s3["ok"] and not s3["is_cid"] \
                        and s3["encoding_map"] and s3["charset_names"]:
                    simple_cff_fill = (s3, base_enc, diff_names)
            except Exception:
                pass
        _apply_descriptor(doc, fd, f)

    tu = font_dict.get("ToUnicode")
    if tu is not None:
        resolved_tu = doc.resolve(tu)
        if isinstance(resolved_tu, str):
            # /ToUnicode /Identity-H as a NAME: charCodes are Unicode
            # codepoints directly; with an embedded encoding CMap the
            # map materializes from charCode -> CID pairs
            # (parsePdfFonts.js:861-871, 1760-1766). Without one, the
            # emit-time chr(code) fallback is already exact.
            if "Identity" in resolved_tu and f.code_to_cid:
                for code in f.code_to_cid:
                    if 0 < code <= 0x10FFFF:
                        f.to_unicode[code] = chr(code)
        else:
            try:
                f.to_unicode = parse_tounicode_cmap(doc.stream_data(tu))
            except Exception:
                pass
    if simple_cff_fill is not None:
        _apply_simple_cff_encoding(f, *simple_cff_fill)
    if f.type3:
        _apply_type3_charproc_metrics(doc, font_dict, f)
    if cff_charset_names:
        for gid, gname in cff_charset_names.items():
            if gid not in f.to_unicode:
                u = glyph_name_to_unicode(gname)
                if u:
                    f.to_unicode[gid] = u
    if f.cid and type0_enc_name == "Identity-H":
        sibling_file2 = None
        if cid_font_file2 is None and desc_subtype == "CIDFontType2" \
                and sibling_fonts and cid_registry == "Adobe" \
                and cid_ordering == "Identity":
            sibling_file2 = _sibling_font_file2(
                doc, sibling_fonts, font_dict, f.base_name)
        _apply_identity_cid_recovery(
            f, cid_registry, cid_ordering, desc_subtype, cid_font_file2,
            sibling_file2=sibling_file2)
    if cid_font_file2 is not None and f.to_unicode:
        _remap_blank_glyphs(cid_font_file2, f)
    from .symbolenc import apply_symbolic_font_charts

    apply_symbolic_font_charts(f, named_auth,
                               has_named_base_encoding=has_named_enc)
    if not f.cid and not f.type3 \
            and re.match(r"cm", f.base_name, re.I) \
            and not re.search(r"CMSY|CMEX", f.base_name, re.I):
        # TeX Computer Modern TEXT fonts use OT1 encoding: charCodes
        # 11-15 are the ff/fi/fl/ffi/ffl ligatures. Symbol (CMSY) and
        # extension (CMEX) faces use different low-code layouts
        # (parsePdfFonts.js:2114-2131).
        for code, ch in ((11, "ﬀ"), (12, "ﬁ"), (13, "ﬂ"),
                         (14, "ﬃ"), (15, "ﬄ")):
            if code not in f.to_unicode:
                f.to_unicode[code] = ch
                f.encoding[code] = ch
    if not f.cid and not f.type3 and f.to_unicode and f.encoding:
        _detect_case_flipped_tounicode(f)
    if f.cid and not f.to_unicode:
        _apply_predefined_cjk_cmap(f, type0_enc_name)
    if not f.type3:
        _clamp_insane_widths(f)
    if f.cid:
        _repair_dominant_offset_tounicode(f)
    if not f.to_unicode and not f.type3 and sibling_fonts:
        _inherit_family_tounicode(doc, f, font_dict, subtype,
                                  sibling_fonts)
    return f


_PFA_DUP_RE = re.compile(rb"dup\s+(\d+)\s+/([^\s/<>\[\]]+)\s+put")


def _parse_type1_pfa_encoding(font_file: bytes):
    """(code, glyphname) pairs from the cleartext `/Encoding ... dup N
    /name put` block at the start of a Type1 PFA
    (parsePdfFonts.js parseType1PFAEncoding:101-121)."""
    head = font_file[:16384]
    start = head.find(b"/Encoding")
    if start < 0:
        return []
    end = head.find(b"currentfile eexec", start)
    block = head[start:end] if end > 0 else head[start:]
    out = []
    for m in _PFA_DUP_RE.finditer(block):
        code = int(m.group(1))
        if 0 <= code <= 255:
            out.append((code, m.group(2).decode("latin-1")))
    return out


def _pdf_text(v) -> str:
    """A resolved PDF string value as text ('' when absent)."""
    if isinstance(v, bytes):
        return v.decode("latin-1", "replace")
    return str(v) if v is not None else ""


# The 258 Macintosh standard glyph names (public TrueType spec, `post`
# table format 2.0 / Apple TrueType Reference Manual). Under
# Adobe-Identity CIDFontType2 with no embedded program, CID == GID and
# most TrueType fonts place their low glyphs in this order, so
# CID -> standardNames[CID] -> AGL recovers the text
# (parsePdfFonts.js:1859-1869).
_MAC_GLYPH_ORDER = (
    ".notdef .null nonmarkingreturn space exclam quotedbl numbersign "
    "dollar percent ampersand quotesingle parenleft parenright "
    "asterisk plus comma hyphen period slash zero one two three four "
    "five six seven eight nine colon semicolon less equal greater "
    "question at A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore grave "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z braceleft "
    "bar braceright asciitilde Adieresis Aring Ccedilla Eacute Ntilde "
    "Odieresis Udieresis aacute agrave acircumflex adieresis atilde "
    "aring ccedilla eacute egrave ecircumflex edieresis iacute igrave "
    "icircumflex idieresis ntilde oacute ograve ocircumflex odieresis "
    "otilde uacute ugrave ucircumflex udieresis dagger degree cent "
    "sterling section bullet paragraph germandbls registered "
    "copyright trademark acute dieresis notequal AE Oslash infinity "
    "plusminus lessequal greaterequal yen mu partialdiff summation "
    "product pi integral ordfeminine ordmasculine Omega ae oslash "
    "questiondown exclamdown logicalnot radical florin approxequal "
    "Delta guillemotleft guillemotright ellipsis nonbreakingspace "
    "Agrave Atilde Otilde OE oe endash emdash quotedblleft "
    "quotedblright quoteleft quoteright divide lozenge ydieresis "
    "Ydieresis fraction currency guilsinglleft guilsinglright fi fl "
    "daggerdbl periodcentered quotesinglbase quotedblbase perthousand "
    "Acircumflex Ecircumflex Aacute Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Oacute Ocircumflex apple Ograve "
    "Uacute Ucircumflex Ugrave dotlessi circumflex tilde macron breve "
    "dotaccent ring cedilla hungarumlaut ogonek caron Lslash lslash "
    "Scaron scaron Zcaron zcaron brokenbar Eth eth Yacute yacute "
    "Thorn thorn minus multiply onesuperior twosuperior threesuperior "
    "onehalf onequarter threequarters franc Gbreve gbreve Idotaccent "
    "Scedilla scedilla Cacute cacute Ccaron ccaron dcroat"
).split()


def _cid_overridable(f: PdfFont, cid: int) -> bool:
    """A ToUnicode entry yields to recovery only when absent or a
    single non-text control char (parsePdfFonts.js:1839-1846) —
    broken OCR producers map real glyphs to control codes."""
    existing = f.to_unicode.get(cid)
    if existing is None:
        return True
    if len(existing) != 1:
        return False
    cp = ord(existing)
    return cp < 0x20 and cp not in (0x09, 0x0A, 0x0D)


def _sibling_font_file2(doc, sibling_fonts, own_dict,
                        base_name: str) -> bytes | None:
    """FontFile2 bytes from another page font whose subset-stripped
    /BaseFont matches (parsePdfFonts.js:1812-1836): the descriptor is
    read from the sibling directly (simple TrueType) or through its
    first descendant (Type0)."""
    try:
        own_dict = doc.resolve(own_dict)
        for sib_ref in dict(sibling_fonts).values():
            sib = doc.resolve(sib_ref)
            if not isinstance(sib, dict) or sib is own_dict:
                continue
            sib_base = re.sub(
                r"^[A-Z]{6}\+", "",
                str(doc.resolve(sib.get("BaseFont", "")) or ""))
            if sib_base != base_name:
                continue
            fd = doc.resolve(sib.get("FontDescriptor"))
            if not isinstance(fd, dict):
                desc_fonts = doc.resolve(sib.get("DescendantFonts", []))
                desc = (doc.resolve(desc_fonts[0])
                        if desc_fonts else {})
                fd = doc.resolve(desc.get("FontDescriptor"))
            if isinstance(fd, dict) and fd.get("FontFile2") is not None:
                data = doc.stream_data(fd["FontFile2"])
                if data[:4] in (b"\x00\x01\x00\x00", b"true"):
                    return data
    except Exception:
        pass
    return None


def _apply_identity_cid_recovery(f: PdfFont, registry: str,
                                 ordering: str, desc_subtype: str,
                                 font_file2: bytes | None,
                                 sibling_file2: bytes | None = None,
                                 ) -> None:
    """Identity-H no/partial-ToUnicode recovery ladder
    (parsePdfFonts.js:1770-1869). Adobe-Identity + CIDFontType2 means
    CIDs are GIDs in the TrueType program, so the font's own cmap
    reverse-maps GID -> Unicode; with no embedded program, the Mac
    standard glyph order stands in; a CID-keyed CFF charset fills
    CIDs-as-codepoints. The Adobe-Japan1/GB1/CNS1/Korea1 published
    CID->Unicode tables (reference fonts/cidToUnicode.js) are NOT
    bundled — those orderings fall through to the predefined-CMap
    charset decode / emit-time codepoint fallback."""
    if registry != "Adobe" or ordering != "Identity":
        return
    is_type2 = desc_subtype == "CIDFontType2"
    gid_map = None
    if is_type2 and (font_file2 or sibling_file2):
        from .fontprog import truetype_gid_to_unicode

        gid_map = truetype_gid_to_unicode(font_file2 or sibling_file2)
    if gid_map:
        cid_set = (f.valid_cids if f.valid_cids is not None
                   else f.widths.keys())
        for cid in cid_set:
            if not _cid_overridable(f, cid):
                continue
            u = gid_map.get(cid)
            if u:
                f.to_unicode[cid] = chr(u)
    elif f.valid_cids is not None:
        for cid in f.valid_cids:
            if not _cid_overridable(f, cid):
                continue
            if 0 < cid <= 0xFFFF:
                f.to_unicode[cid] = chr(cid)
    elif is_type2 and not font_file2:
        for cid in f.widths:
            if not (0 <= cid < 258) or not _cid_overridable(f, cid):
                continue
            name = _MAC_GLYPH_ORDER[cid]
            if name.startswith("."):
                continue
            u = glyph_name_to_unicode(name)
            if u:
                f.to_unicode[cid] = u


_SYMBOL_NAME_RE = re.compile(r"sym|ding|wing", re.I)


def _apply_simple_cff_encoding(f: PdfFont, summary: dict,
                               base_enc, diff_names) -> None:
    """Fill ToUnicode gaps from a simple Type1C's custom Encoding
    table: code -> gid -> charset glyph name -> AGL
    (parsePdfFonts.js:2150-2174). A named /BaseEncoding covers every
    code, and /Differences entries stay authoritative; symbol /
    decoration faces often reuse Latin glyph names for bullets, so
    their ASCII codepoints are skipped rather than extracted as
    letters."""
    if base_enc is not None:
        return
    names = summary["charset_names"]
    sym = bool(_SYMBOL_NAME_RE.search(f.base_name)
               or _SYMBOL_NAME_RE.search(f.family_name))
    for code, gid in summary["encoding_map"].items():
        if code in f.to_unicode or code in diff_names:
            continue
        name = names.get(gid)
        if not name:
            continue
        u = glyph_name_to_unicode(name)
        if not u:
            continue
        if len(u) == 1:
            cp = ord(u)
            if cp <= 0x1F or cp == 0x7F:
                continue
            if sym and cp <= 0x7F:
                continue
        f.to_unicode[code] = u


def _repair_dominant_offset_tounicode(f: PdfFont) -> None:
    """Some producers write identity-mapped ToUnicode entries where
    glyph-name lookup failed, even when the rest of the CMap follows
    a consistent non-zero shift: when >= 80% of >= 10 single-char
    entries share one offset, the identity entries take it too
    (parsePdfFonts.js:2411-2449; Type0 only — simple/Type3 charCodes
    legitimately identity-map)."""
    singles = [(cc, ord(s)) for cc, s in f.to_unicode.items()
               if isinstance(s, str) and len(s) == 1]
    if len(singles) < 10:
        return
    counts: dict[int, int] = {}
    for cc, cp in singles:
        counts[cp - cc] = counts.get(cp - cc, 0) + 1
    off, n = max(counts.items(), key=lambda kv: kv[1])
    if off == 0 or n / len(singles) < 0.8:
        return
    for cc, cp in singles:
        if cp != cc:
            continue
        corrected = cc + off
        if 0x20 <= corrected <= 0x10FFFF:
            f.to_unicode[cc] = chr(corrected)


def _norm_family(name: str) -> str:
    return re.sub(r"(psmt|ps|mt)$", "", (name or "").lower())


def _families_compatible(a: str, b: str) -> bool:
    if not a or not b:
        return False
    return a == b or a.startswith(b) or b.startswith(a)


def _type0_style_key(base_name: str) -> str:
    clean = re.sub(r"^[A-Z]{6}\+", "", base_name or "")
    parts = [p for p in clean.split("-") if p]
    if len(parts) >= 2:
        return f"{parts[0]}-{parts[1]}".lower()
    return clean.lower()


def _width_compat(target: PdfFont, donor: PdfFont) -> tuple[int, float]:
    overlap = equal = 0
    for cid, w in target.widths.items():
        dw = donor.widths.get(cid)
        if dw is None:
            continue
        overlap += 1
        if abs(dw - w) < 0.01:
            equal += 1
    return overlap, (equal / overlap if overlap else 0.0)


def _inherit_family_tounicode(doc, f: PdfFont, own_dict, subtype: str,
                              sibling_fonts) -> None:
    """A producer that emits a ToUnicode CMap for only some style
    variants of a family: the mapless font inherits from a sibling
    (parsePdfFonts.js:2452-2527). Type0 inheritance is gated tightly
    — two Type0 fonts sharing a family can assign entirely different
    CIDs — on an identical codespace plus either >= 98% width
    equality over >= 64 shared CIDs, or a same-style-key donor with
    >= 95% mutual /W coverage whose candidates agree with each
    other."""
    try:
        own_dict = doc.resolve(own_dict)
        donors = []
        fam = _norm_family(f.family_name)
        for sib_ref in dict(sibling_fonts).values():
            sib_dict = doc.resolve(sib_ref)
            if not isinstance(sib_dict, dict) or sib_dict is own_dict:
                continue
            sib = load_font_cached(doc, sib_ref,
                                   sibling_fonts=sibling_fonts)
            if sib is f or not sib.to_unicode:
                continue
            if not _families_compatible(fam,
                                        _norm_family(sib.family_name)):
                continue
            donors.append(sib)
        if not donors:
            return
        if not f.cid:
            # Broad branch: only fonts of unrecognized subtype reach
            # here mapless (reference skips type1Info carriers, which
            # every parsed Type1/TrueType has).
            if subtype in ("Type1", "TrueType", "MMType1"):
                return
            for sib in donors:
                for cid, uni in sib.to_unicode.items():
                    f.to_unicode.setdefault(cid, uni)
            return
        best = None
        best_ratio = 0.0
        best_overlap = 0
        for sib in donors:
            if not sib.cid:
                continue
            if sib.codespace_ranges != f.codespace_ranges:
                continue
            overlap, ratio = _width_compat(f, sib)
            if overlap < 64 or ratio < 0.98:
                continue
            if ratio > best_ratio or (ratio == best_ratio
                                      and overlap > best_overlap):
                best, best_ratio, best_overlap = sib, ratio, overlap
        if best is None:
            key = _type0_style_key(f.base_name)
            cands = []
            for sib in donors:
                if not sib.cid \
                        or sib.codespace_ranges != f.codespace_ranges \
                        or _type0_style_key(sib.base_name) != key \
                        or not f.widths or not sib.widths:
                    continue
                overlap = sum(1 for cid in f.widths
                              if cid in sib.widths)
                if overlap / len(f.widths) >= 0.95 \
                        and overlap / len(sib.widths) >= 0.95:
                    cands.append(sib)
            if not cands:
                return
            ref0 = cands[0]
            for sib in cands[1:]:
                overlap = conflicts = 0
                for cid, uni in ref0.to_unicode.items():
                    su = sib.to_unicode.get(cid)
                    if su is None:
                        continue
                    overlap += 1
                    if su != uni:
                        conflicts += 1
                if overlap >= 64 and conflicts / overlap > 0.02:
                    return
            best = ref0
        for cid, uni in best.to_unicode.items():
            f.to_unicode.setdefault(cid, uni)
    except Exception:
        pass


# Adobe's predefined CJK CMaps: fixed codespace ranges per the public
# CMap definitions; text decodes through the matching byte charset
# (parsePdfFonts.js:891-1025 — the reference eagerly fills toUnicode
# via TextDecoder; here the charset decode is lazy per code in
# PdfFont.unicode_for, memoized).
_CJK_CMAPS = (
    # (name test, codec, codespace ranges)
    (re.compile(r"RKSJ"), "cp932", [
        (1, 0x00, 0x80), (1, 0xA0, 0xDF), (1, 0xFD, 0xFF),
        (2, 0x8140, 0x9FFC), (2, 0xE040, 0xFCFC)]),
    (re.compile(r"GBK|GB-EUC|GBpc-EUC"), "gbk", [
        (1, 0x00, 0x80), (2, 0x8140, 0xFEFE)]),
    (re.compile(r"^(?:B5|ETen|ETenms|HKscs)"), "big5hkscs", [
        (1, 0x00, 0x80), (2, 0xA140, 0xFEFE)]),
    (re.compile(r"^(?:KSC|UniKS)"), "cp949", [
        (1, 0x00, 0x80), (2, 0x8141, 0xFDFE)]),
)


def _fill_halfwidth_latin(f: PdfFont) -> None:
    """Predefined Adobe CJK CMaps standardize the half-width Latin
    glyphs in the ROS, so producers omit them from /W; without the
    500-em fill they hit /DW (~1000) and mixed CJK/Latin indentation
    comes out ~2x too wide (parsePdfFonts.js:1733-1740; keys are
    charCodes, matching the code-keyed width lookup)."""
    for cc in range(0x20, 0x7F):
        f.widths.setdefault(cc, 500.0)


def _apply_predefined_cjk_cmap(f: PdfFont, name: str) -> None:
    if not name or "Identity" in name:
        return
    if re.search(r"UCS2|UTF16", name):
        _fill_halfwidth_latin(f)
        # Uni*-UCS2/UTF16: charCodes are Unicode codepoints already
        # (the chr() fallback is exact); Adobe CJK collections map
        # printable ASCII to CIDs 1-95, so half-width /W entries need
        # the synthesized map (parsePdfFonts.js:2230-2240).
        if f.code_to_cid is None:
            f.code_to_cid = {u: u - 0x1F for u in range(0x20, 0x7F)}
        return
    for name_re, codec, ranges in _CJK_CMAPS:
        if name_re.search(name):
            f.cjk_codec = codec
            if f.codespace_ranges is None:
                f.codespace_ranges = list(ranges)
            break
    else:
        return
    _fill_halfwidth_latin(f)
    if name.startswith(("B5", "ETen", "HKscs")):
        # ETen-B5 sends 1-byte ASCII to the Adobe-CNS1 half-width
        # Latin block (space = CID 13648) — without the mapping the
        # byte itself keys /W and misses (parsePdfFonts.js:996-1003).
        if f.code_to_cid is None:
            f.code_to_cid = {}
        for code in range(0x20, 0x7F):
            f.code_to_cid.setdefault(code, 13616 + code)
            if code > 0x20 and code not in f.to_unicode:
                f.to_unicode[code] = chr(code)


_CIDCHAR_RE = re.compile(rb"begincidchar(.*?)endcidchar", re.S)
_CIDRANGE_RE = re.compile(rb"begincidrange(.*?)endcidrange", re.S)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S)
_HEX_DEC_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s+(\d+)")
_HEX_HEX_DEC_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s+(\d+)")
_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEX_TRIPLE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_MAX_CMAP_ENTRIES = 1 << 20  # allocation-bomb guard for fuzzed CMaps


def _parse_cid_encoding_cmap(data: bytes) -> dict[int, int]:
    """Embedded encoding CMap -> charCode -> CID. cidchar/cidrange are
    the standard forms; some producers use bfchar/bfrange syntax with
    hex CIDs (parseCIDEncodingCMap, parsePdfFonts.js:2612-2656)."""
    out: dict[int, int] = {}
    for m in _CIDCHAR_RE.finditer(data):
        for e in _HEX_DEC_RE.finditer(m.group(1)):
            out[int(e.group(1), 16)] = int(e.group(2))
    for m in _CIDRANGE_RE.finditer(data):
        for e in _HEX_HEX_DEC_RE.finditer(m.group(1)):
            start, end = int(e.group(1), 16), int(e.group(2), 16)
            cid = int(e.group(3))
            end = min(end, start + _MAX_CMAP_ENTRIES)
            for code in range(start, end + 1):
                out[code] = cid
                cid += 1
            if len(out) > _MAX_CMAP_ENTRIES:
                return out
    for m in _BFCHAR_RE.finditer(data):
        for e in _HEX_PAIR_RE.finditer(m.group(1)):
            out[int(e.group(1), 16)] = int(e.group(2), 16)
    for m in _BFRANGE_RE.finditer(data):
        for e in _HEX_TRIPLE_RE.finditer(m.group(1)):
            start, end = int(e.group(1), 16), int(e.group(2), 16)
            cid = int(e.group(3), 16)
            end = min(end, start + _MAX_CMAP_ENTRIES)
            for code in range(start, end + 1):
                out[code] = cid
                cid += 1
            if len(out) > _MAX_CMAP_ENTRIES:
                return out
    return out


def _parse_codespace_ranges(
        data: bytes) -> list[tuple[int, int, int]] | None:
    """codespacerange blocks -> [(n_bytes, low, high)], 1-byte ranges
    first; None for uniformly-2-byte (callers default to 2-byte pairs)
    (parseCIDCodespaceRanges, parsePdfFonts.js:2663-2680)."""
    ranges: list[tuple[int, int, int]] = []
    for m in _CODESPACE_RE.finditer(data):
        for e in _HEX_PAIR_RE.finditer(m.group(1)):
            nb = (len(e.group(1)) + 1) // 2
            ranges.append((nb, int(e.group(1), 16), int(e.group(2), 16)))
    ranges.sort(key=lambda r: r[0])
    if not ranges:
        return None
    if ranges[0][0] == 2 and ranges[-1][0] == 2:
        return None
    return ranges


def _clamp_insane_widths(f: PdfFont) -> None:
    """Some producers emit widths as 32-bit packed values (e.g.
    0x00020002 = 131074) or negatives, far outside any real 1/1000-em
    advance — unclamped they poison every downstream bbox computation.
    Clamp offenders to the average of the sane entries; Type3 is exempt
    because its widths scale by FontMatrix
    (parsePdfFonts.js:2291-2305, SANE_MAX_WIDTH = 4000)."""
    import math as _m

    SANE_MAX = 4000.0
    sane_sum = 0.0
    sane_n = 0
    for w in f.widths.values():
        if _m.isfinite(w) and 0 <= w <= SANE_MAX:
            sane_sum += w
            sane_n += 1
    fallback = round(sane_sum / sane_n) if sane_n else 1000.0
    clamped = False
    for code, w in f.widths.items():
        if not (_m.isfinite(w) and 0 <= w <= SANE_MAX):
            f.widths[code] = float(fallback)
            clamped = True
    if clamped and not (_m.isfinite(f.default_width)
                        and 0 <= f.default_width <= SANE_MAX):
        f.default_width = float(fallback)


def _detect_case_flipped_tounicode(f: PdfFont) -> None:
    """>=2 single-letter ToUnicode-vs-encoding conflicts that all flip
    case in the same direction mark a broken OCR ToUnicode; per-code
    lookups then prefer the encoding's case
    (parsePdfFonts.js:2247-2265)."""
    conflicts = 0
    direction = 0
    consistent = True
    for code in range(65, 123):
        if 90 < code < 97:
            continue
        tu = f.to_unicode.get(code)
        eu = f.encoding.get(code)
        if (not tu or not eu or len(tu) != 1 or len(eu) != 1
                or not _is_ascii_letter(tu) or not _is_ascii_letter(eu)):
            continue
        if tu != eu and tu.lower() == eu.lower():
            conflicts += 1
            d = -1 if tu == tu.lower() else 1
            if direction == 0:
                direction = d
            elif direction != d:
                consistent = False
    f.prefer_encoding_case = conflicts >= 2 and consistent


def _apply_standard_metrics(f: PdfFont, base_enc: str | None,
                            diff_names: dict[int, str]) -> None:
    """No /Widths array: fall back to the built-in standard-14 font
    metrics (reference parsePdfFonts.js:1466-1523). The tables are
    WinAnsi-keyed, so a /MacRomanEncoding base or /Differences entries
    re-key the affected codes to the width of the glyph they actually
    map; fi/fl ligature codes take their AFM ligature advance (absent
    from WinAnsi, so the positional table cannot carry them)."""
    from .afm import apply_standard_widths, standard_ligature_width

    avg = apply_standard_widths(f.base_name, f.widths)
    if avg is None:
        return
    f.default_width = avg

    def _unicode_to_width() -> dict[str, float]:
        out: dict[str, float] = {}
        for code in range(32, 256):
            w = f.widths.get(code)
            if w is None:
                continue
            try:
                out[bytes([code]).decode("cp1252")] = w
            except UnicodeDecodeError:
                pass
        return out

    if base_enc == "MacRomanEncoding" and f.widths:
        by_char = _unicode_to_width()
        for code in range(128, 256):
            try:
                ch = bytes([code]).decode("mac-roman")
            except UnicodeDecodeError:
                f.widths.pop(code, None)
                continue
            w = by_char.get(ch)
            if w is not None:
                f.widths[code] = w
            else:
                f.widths.pop(code, None)
    if diff_names and f.widths:
        by_char = _unicode_to_width()
        for code, name in diff_names.items():
            u = glyph_name_to_unicode(name)
            if u:
                w = by_char.get(u[0])
                if w is not None:
                    f.widths[code] = w
    for code, name in diff_names.items():
        lw = standard_ligature_width(f.base_name, name)
        if lw is not None:
            f.widths[code] = float(lw)


def _apply_dingbats_differences(f: PdfFont,
                                diff_names: dict[int, str]) -> None:
    """ZapfDingbats /Differences typically remap charCodes below 32,
    which the positional table (keyed from 32) leaves without widths
    (reference parsePdfFonts.js:1525-1537)."""
    if not diff_names or not re.search(r"ZapfDingbats", f.base_name, re.I):
        return
    from .afm import dingbats_glyph_width
    from .symbolenc import dingbats_name_unicode

    for code, name in diff_names.items():
        u = dingbats_name_unicode(name)
        if u is not None:
            f.encoding[code] = u
        if code in f.widths:
            continue
        w = dingbats_glyph_width(name)
        if w is not None:
            f.widths[code] = float(w)
    if f.widths and f.default_width == 500.0:
        f.default_width = sum(f.widths.values()) / len(f.widths)


def _remap_blank_glyphs(font_file2: bytes, f: PdfFont) -> None:
    """Positive-advance CIDs whose ToUnicode claims a non-text control
    char get remapped to a space when the embedded TrueType shows the
    glyph is structurally blank (zero-length glyf entry) — broken OCR
    ToUnicode maps routinely tag real spacer glyphs as control codes
    (reference parsePdfFonts.js:1866-1887; CID == GID under
    Adobe-Identity CIDFontType2)."""
    candidates = []
    for cid, existing in f.to_unicode.items():
        if len(existing) != 1:
            continue
        cp = ord(existing)
        if cp >= 0x20 or cp in (0x09, 0x0A, 0x0D):
            continue
        if f.widths.get(cid, 0) <= 0:
            continue
        candidates.append(cid)
    if not candidates:
        return
    from .fontprog import truetype_empty_glyphs

    empty = truetype_empty_glyphs(font_file2)
    if not empty:
        return
    for cid in candidates:
        if cid in empty:
            f.to_unicode[cid] = " "


def _hash_type3_charprocs(doc, font_dict, f: PdfFont) -> None:
    """charCode -> md5 of the CharProc stream, via /Encoding
    /Differences glyph names and /CharProcs. Identical stamped outlines
    share identical CharProc content, which is the filler signature the
    broken-font classifier discounts (parsePdfDoc.js:523-534 uses a
    parsed-path hash; content bytes are an equivalent identity here)."""
    import hashlib

    try:
        enc_obj = doc.resolve(font_dict.get("Encoding"))
        char_procs = doc.resolve(font_dict.get("CharProcs"))
        if not isinstance(enc_obj, dict) or not isinstance(char_procs, dict):
            return
        diffs = doc.resolve(enc_obj.get("Differences"))
        if not diffs:
            return
        code_to_name: dict[int, str] = {}
        code = 0
        for item in diffs:
            item = doc.resolve(item)
            if isinstance(item, (int, float)):
                code = int(item)
            else:
                code_to_name[code] = str(item)
                code += 1
        proc_hash: dict[str, str] = {}
        out: dict[int, str] = {}
        for c, name in code_to_name.items():
            if name not in char_procs:
                continue
            if name not in proc_hash:
                proc_hash[name] = hashlib.md5(
                    doc.stream_data(char_procs[name])).hexdigest()
            out[c] = proc_hash[name]
        if out:
            f.type3_glyph_hash = out
    except Exception:
        pass


_T3_D1_RE = re.compile(
    rb"^\s*(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)"
    rb"\s+(-?[\d.]+)\s+(-?[\d.]+)\s+d1\b")
_T3_D0_RE = re.compile(rb"^\s*(-?[\d.]+)\s+(-?[\d.]+)\s+d0\b")
_T3_OP_RE = re.compile(rb"(?<![/\w])[A-Za-z'\"*]+")
# Graphics-state-only operators paint nothing; anything else (paths,
# images, nested text, shadings) might (parsePdfDoc.js:486-487: zero
# path commands does not prove emptiness).
_T3_NONMARKING = {b"q", b"Q", b"cm", b"gs", b"w", b"J", b"j", b"M",
                  b"d", b"ri", b"i", b"d0", b"d1", b"m", b"h", b"n",
                  b"W", b"g", b"rg", b"k", b"cs", b"CS", b"sc", b"scn",
                  b"G", b"RG", b"K", b"SC", b"SCN"}


def _type3_blank(body: bytes) -> bool | None:
    """True when the CharProc provably draws nothing (every operator
    is a known non-marking one), False when something might paint,
    None when unreadable (not provably empty — consumers must keep
    the glyph, parsePdfDoc.js:477-487)."""
    try:
        for op in _T3_OP_RE.findall(body):
            if op not in _T3_NONMARKING:
                return False
        return True
    except Exception:
        return None


def _apply_type3_charproc_metrics(doc, font_dict, f: PdfFont) -> None:
    """Type3 metrics from the CharProc streams themselves
    (parsePdfFonts.js:2179-2222 parseType3Font): each glyph's leading
    `wx wy d0` / `wx wy llx lly urx ury d1` advance, scaled through
    FontMatrix into the shared 1000-em width space, overrides the raw
    /Widths entry (Type3 /Widths are glyph-space units, so a
    non-0.001 FontMatrix makes the raw value wrong); provably-blank
    glyphs map to a space and drawn-but-unmapped ones to a PUA
    placeholder so code 32 is not mistaken for a space; characters
    outside the encoding advance nothing (defaultWidth 0); a sane
    FontBBox supplies ascent/descent."""
    try:
        enc_obj = doc.resolve(font_dict.get("Encoding"))
        char_procs = doc.resolve(font_dict.get("CharProcs"))
        if not isinstance(enc_obj, dict) \
                or not isinstance(char_procs, dict):
            return
        diffs = doc.resolve(enc_obj.get("Differences"))
        if not diffs:
            return
        code_to_name: dict[int, str] = {}
        code = 0
        for item in diffs:
            item = doc.resolve(item)
            if isinstance(item, (int, float)):
                code = int(item)
            else:
                code_to_name[code] = str(item)
                code += 1
        fm = f.font_matrix or [0.001, 0, 0, 0.001, 0, 0]
        parsed_any = False
        body_cache: dict[str, bytes] = {}
        for c, name in code_to_name.items():
            if name not in char_procs:
                continue
            if name not in body_cache:
                try:
                    body_cache[name] = doc.stream_data(char_procs[name])
                except Exception:
                    continue
            body = body_cache[name]
            m = _T3_D1_RE.match(body) or _T3_D0_RE.match(body)
            if m is None:
                continue
            parsed_any = True
            wx = float(m.group(1))
            if wx > 0:
                f.widths[c] = wx * fm[0] * 1000.0
                if c not in f.to_unicode:
                    blank = _type3_blank(body)
                    if blank is True:
                        f.to_unicode[c] = " "
                    elif blank is False:
                        f.to_unicode[c] = chr(0xE000 + c)
        if parsed_any:
            f.default_width = 0.0
        fb = doc.resolve(font_dict.get("FontBBox"))
        fm3 = float(fm[3]) if len(fm) > 3 else 0.001
        if isinstance(fb, list) and len(fb) == 4:
            y0 = float(doc.resolve(fb[1]))
            y1 = float(doc.resolve(fb[3]))
            em_h = abs((y1 - y0) * fm3)
            if 0.2 < em_h < 3:
                f.ascent = y1 * fm3
                f.descent = y0 * fm3
    except Exception:
        pass


def _apply_descriptor(doc, fd, f: PdfFont) -> None:
    if not isinstance(fd, dict):
        return
    try:
        asc = doc.resolve(fd.get("Ascent"))
        desc = doc.resolve(fd.get("Descent"))
        if asc:
            f.ascent = float(asc) / 1000.0
        if desc:
            f.descent = float(desc) / 1000.0
    except (TypeError, ValueError):
        pass


def _parse_cid_widths(doc, w_arr, out: dict[int, float]) -> None:
    """CID /W array: [c [w1 w2 ...] | cFirst cLast w]."""
    items = [doc.resolve(x) for x in w_arr]
    i = 0
    while i < len(items):
        if i + 1 < len(items) and isinstance(items[i + 1], list):
            start = int(items[i])
            for j, w in enumerate(items[i + 1]):
                out[start + j] = float(doc.resolve(w))
            i += 2
        elif i + 2 < len(items):
            for c in range(int(items[i]), int(items[i + 1]) + 1):
                out[c] = float(items[i + 2])
            i += 3
        else:
            break
