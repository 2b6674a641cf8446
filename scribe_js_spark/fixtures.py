"""Deterministic synthetic fixture corpus (FIXTURES.md).

A seeded ground-truth layout model (pages -> paragraphs -> lines -> words
with exact pixel geometry) is rendered into each input dialect the engine
supports; the expected reflowed text is computed **from the model**, not
by running any extractor. The per-row invariant the driver checks:
``extract(render(model)) == expected(model)`` byte-identical.

Everything is a pure function of (seed, doc_id): no wall clock, no
global randomness — required for replay determinism at cluster scale.

Layout-model constraints (why they exist):
- paragraph gaps are 2.0x the in-paragraph line pitch, so the reflow
  heuristics' 'large space (relative)' rule (reflowPars.js:304-308)
  fires exactly at paragraph starts;
- two consecutive single-line paragraphs are never generated for
  spacing-based families (equal consecutive gaps defeat the relative
  rule — mirroring real-document behavior of the reference);
- the word lexicon avoids bullet-regex lookalikes (``i.``, ``1)``...),
  quotes and dashes, so pass3's rewrite rules are exercised only by the
  dedicated style families.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from .functions.textnorm import escape_xml

SEED_DEFAULT = 42

# 64-entry lowercase lexicon; no entry matches the reflow bullet regex,
# none contain quotes/dashes/digits.
LEXICON = [
    "table", "scan", "merge", "join", "order", "batch", "stream", "window",
    "filter", "group", "query", "value", "column", "vector", "spark", "data",
    "hash", "sort", "part", "line", "word", "page", "text", "font",
    "glyph", "token", "layout", "margin", "ratio", "angle", "shape", "frame",
    "model", "layer", "index", "range", "slice", "chunk", "block", "field",
    "label", "point", "curve", "plane", "grid", "array", "stack", "queue",
    "graph", "node", "edge", "path", "tree", "leaf", "root", "branch",
    "weight", "score", "metric", "bound", "limit", "scale", "shift", "pivot",
]

PAGE_W = 1224
PAGE_H = 1584
MARGIN_LEFT = 100
TOP_BASELINE = 120
CHAR_W = 15
WORD_GAP = 10
ASC_H = 31       # baseline - top
DESC_H = 9       # bottom - baseline
LINE_PITCH = 52
PAR_GAP = 104    # 2x pitch
INDENT = 80
MAX_BASELINE = PAGE_H - 120
USABLE_W = PAGE_W - 2 * MARGIN_LEFT

FORMATS = ("hocr", "abbyy", "alto", "text", "stext", "pdf")
# format mix per FIXTURES.md §5; hocr_char = char-level typography
# family, hocr_cjk = per-char CJK family (both render as hOCR).
FORMAT_MIX = (
    ("hocr", 14), ("abbyy", 18), ("alto", 10), ("text", 5),
    ("docx", 3),
    ("stext", 10), ("pdf", 10), ("hocr_char", 5), ("hocr_cjk", 2),
    ("textract", 6), ("google_vision", 4), ("hocr_furniture", 5),
    ("hocr_skew", 2), ("hocr_footnote", 2), ("google_doc_ai", 3),
    ("azure_doc_intel", 3), ("hocr_twocol", 3), ("pdf_twocol", 2),
    ("pdf_cffsub", 3),
)

#: pdf_cffsub family: CIDs the embedded CFF's charset omits (the
#: extractor must skip them with no advance — validCIDs rule) and CIDs
#: present in the charset but absent from ToUnicode (the chr(code)
#: fallback path; under Identity encoding the fallback reproduces the
#: original character, so only the dropped set changes expected text).
CFF_DROP_CODES = frozenset({ord("h"), ord("k")})
CFF_UNMAPPED_CODES = frozenset({ord("a"), ord("o")})


def _doc_rng(seed: int, doc_id: int) -> random.Random:
    return random.Random(seed * 1_000_003 + doc_id)


# ---------------------------------------------------------------- model


#: 40-char Han lexicon for the CJK family (common CJK Unified
#: Ideographs; public Unicode facts).
CJK_LEXICON = (
    "文本分析数据处理系统模型图表页行列字词符语言信息格式结构内容程序计算方法算式样例测试"
)


def _decorate_word(token: str, rng) -> dict:
    """Char-level decoration for the typography family: returns
    {text(html), expected(after pass3), chars[(ch,width)]} exercising
    the smart-quote, dash-width and ligature rules."""
    roll = rng.random()
    quoted = False
    if roll < 0.10:
        # straight quotes -> directional quotes (pass3 :382-401)
        text = f'"{token}"'
        expected = f"“{token}”"
        chars = [('"', 8)] + [(c, CHAR_W) for c in token] + [('"', 8)]
        quoted = True
    elif roll < 0.16:
        # hyphen char 20px wide vs xHeight 19 -> en-dash (pass3 :463-507)
        half = max(1, len(token) // 2)
        text = token[:half] + "-" + token[half:]
        expected = token[:half] + "–" + token[half:]
        chars = ([(c, CHAR_W) for c in token[:half]] + [("-", 20)]
                 + [(c, CHAR_W) for c in token[half:]])
    elif roll < 0.22:
        # ligature codepoint -> component letters (pass3 :512)
        text = "ﬁ" + token  # ﬁ
        expected = "fi" + token
        chars = [("ﬁ", CHAR_W)] + [(c, CHAR_W) for c in token]
    else:
        text = token
        expected = token
        chars = [(c, CHAR_W) for c in token]
    return {"text": text, "expected": expected, "chars": chars,
            "token": token, "quoted": quoted}


def build_doc_model(doc_id: int, seed: int = SEED_DEFAULT,
                    n_pages: int | None = None,
                    indent_family: bool = False,
                    family: str = "base") -> dict:
    """Ground-truth layout model for one document.

    ``family``: 'base' | 'charlevel' (typography decorations, rendered
    char-level) | 'cjk' (Han per-char words, lang chi_sim).
    """
    rng = _doc_rng(seed, doc_id)
    if n_pages is None:
        n_pages = rng.randint(1, 3)

    furniture = family == "furniture"
    skew_slope = 0.02 if family == "skew" else 0.0
    if furniture:
        n_pages = max(n_pages, 2)  # header keys need recurrence
        header_tokens = [rng.choice(LEXICON) for _ in range(3)]

    def _furniture_par(tokens, baseline_y, x0, par_type):
        words = []
        x = x0
        for tok in tokens:
            width = len(tok) * CHAR_W
            words.append({
                "text": tok, "chars": None, "out_words": [tok],
                "left": x, "right": x + width,
                "top": baseline_y - ASC_H, "bottom": baseline_y + DESC_H,
                "conf": 97,
            })
            x += width + WORD_GAP
        return {
            "lines": [{"words": words, "baseline_y": baseline_y, "indent": 0}],
            "type": par_type,
        }

    pages = []
    for page_n in range(n_pages):
        pars = []
        if furniture:
            pars.append(_furniture_par(header_tokens, 60, MARGIN_LEFT, "header"))
        n_pars = rng.randint(2, 5)
        # Body starts a full pitch lower under a running header so the
        # header/body gap (112px) exceeds the 1.5x relative-space rule.
        y = TOP_BASELINE + LINE_PITCH if furniture else TOP_BASELINE
        # Keep body clear of the folio band so the folio's leading gap
        # always exceeds the relative/absolute space rules.
        max_baseline = PAGE_H - 200 if furniture else MAX_BASELINE
        prev_single = False
        for par_n in range(n_pars):
            if y > max_baseline:
                break
            min_lines = 2 if (indent_family or prev_single) else 1
            n_lines = rng.randint(min_lines, 6)
            lines = []
            for line_n in range(n_lines):
                if y > max_baseline:
                    break
                indent = INDENT if (indent_family and line_n == 0) else 0
                x = MARGIN_LEFT + indent
                words = []
                n_words = rng.randint(4, 9)
                for w in range(n_words):
                    if family == "cjk":
                        token = "".join(
                            rng.choice(CJK_LEXICON)
                            for _ in range(rng.randint(2, 4)))
                        dec = {"text": token,
                               "chars": [(c, CHAR_W) for c in token],
                               "out_words": list(token)}
                    elif family == "charlevel":
                        d = _decorate_word(rng.choice(LEXICON), rng)
                        dec = {"text": d["text"], "chars": d["chars"],
                               "out_words": [d["expected"]],
                               "token": d["token"], "quoted": d["quoted"]}
                    else:
                        token = rng.choice(LEXICON)
                        dec = {"text": token, "chars": None,
                               "out_words": [token]}
                    width = (sum(cw for _, cw in dec["chars"])
                             if dec["chars"] else len(dec["text"]) * CHAR_W)
                    if x + width > MARGIN_LEFT + USABLE_W:
                        break
                    conf = rng.randint(40, 74) if rng.random() < 0.05 \
                        else rng.randint(95, 99)
                    words.append({
                        "text": dec["text"],
                        "chars": dec["chars"],
                        "out_words": dec["out_words"],
                        "quoted": dec.get("quoted", False),
                        "token": dec.get("token"),
                        "left": x, "right": x + width,
                        "top": y - ASC_H, "bottom": y + DESC_H,
                        "conf": conf,
                    })
                    x += width + WORD_GAP
                if not words:
                    continue
                # A quote-decorated word at a line edge disables the
                # lowerConnection suppressor in the reflow heuristics
                # (JS /[a-z]/ and /\w/ reject directional quotes), which
                # can legitimately split mid-paragraph. The fixture model
                # keeps quote words strictly line-internal.
                for edge in (0, -1):
                    w_edge = words[edge]
                    if w_edge.get("quoted"):
                        token = w_edge["token"]
                        w_edge["text"] = token
                        w_edge["chars"] = [(c, CHAR_W) for c in token]
                        w_edge["out_words"] = [token]
                        w_edge["quoted"] = False
                        w_edge["right"] = w_edge["left"] + len(token) * CHAR_W
                lines.append({"words": words, "baseline_y": y, "indent": indent})
                y += LINE_PITCH
            if not lines:
                continue
            # Paragraph-final line ends with a period (base families;
            # decorated/cjk words interact with the pass3 quote rules).
            if family == "base":
                last_word = lines[-1]["words"][-1]
                last_word["text"] += "."
                last_word["out_words"] = [last_word["text"]]
                last_word["right"] += CHAR_W
            pars.append({"lines": lines})
            prev_single = len(lines) == 1
            y += PAR_GAP - LINE_PITCH  # total gap between pars = PAR_GAP
        if indent_family and pars and len(pars[-1]["lines"]) == 1:
            pars.pop()  # trailing single-line par is undetectable by indent
        if furniture and pars:
            pars.append(_furniture_par(
                [str(page_n + 1)], PAGE_H - 64, PAGE_W // 2, "pagenum"))
        if pars:
            pages.append({"pars": pars, "width": PAGE_W, "height": PAGE_H})
    if not pages:  # degenerate fallback: one fixed paragraph
        pages = [{
            "pars": [{"lines": [{
                "words": [{
                    "text": "data.", "chars": None, "out_words": ["data."],
                    "left": MARGIN_LEFT,
                    "right": MARGIN_LEFT + 5 * CHAR_W,
                    "top": TOP_BASELINE - ASC_H,
                    "bottom": TOP_BASELINE + DESC_H, "conf": 97,
                }],
                "baseline_y": TOP_BASELINE, "indent": 0,
            }]}],
            "width": PAGE_W, "height": PAGE_H,
        }]
    if family == "footnote":
        # Append one footnote paragraph per page: a leading superscript
        # reference marker then 3-5 body words, low on the page.
        for page in pages:
            fy = PAGE_H - 220
            marker = {
                "text": str(1), "chars": None, "out_words": ["1"],
                "sup": True,
                "left": MARGIN_LEFT, "right": MARGIN_LEFT + CHAR_W,
                "top": fy - ASC_H, "bottom": fy - 12, "conf": 97,
            }
            fx = MARGIN_LEFT + CHAR_W + WORD_GAP
            fwords = [marker]
            for _ in range(rng.randint(3, 5)):
                tok = rng.choice(LEXICON)
                width = len(tok) * CHAR_W
                fwords.append({
                    "text": tok, "chars": None, "out_words": [tok],
                    "left": fx, "right": fx + width,
                    "top": fy - ASC_H, "bottom": fy + DESC_H, "conf": 97,
                })
                fx += width + WORD_GAP
            page["pars"].append({
                "lines": [{"words": fwords, "baseline_y": fy, "indent": 0}],
                "type": "footnote",
            })
    return {"doc_id": doc_id, "pages": pages, "family": family,
            "skew_slope": skew_slope, "indent_family": indent_family}


def _word_out(w: dict) -> list[str]:
    return w.get("out_words") or [w["text"]]


def build_two_column_model(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Two-column page model (FIXTURES.md §2.6(d)): column 1's
    paragraphs then column 2's, in stream/reading order. Exercises the
    backward-x/ big-y line cuts and the 'new column' paragraph rule
    (reflowPars.js:298)."""
    rng = _doc_rng(seed * 7 + 13, doc_id)
    col_w = (USABLE_W - 80) // 2

    def build_column(x0):
        pars = []
        y = TOP_BASELINE
        prev_single = False
        for _ in range(rng.randint(2, 4)):
            if y > MAX_BASELINE:
                break
            n_lines = rng.randint(2 if prev_single else 1, 5)
            lines = []
            for _ in range(n_lines):
                if y > MAX_BASELINE:
                    break
                x = x0
                words = []
                for _ in range(rng.randint(3, 6)):
                    token = rng.choice(LEXICON)
                    width = len(token) * CHAR_W
                    if x + width > x0 + col_w:
                        break
                    words.append({
                        "text": token, "chars": None, "out_words": [token],
                        "left": x, "right": x + width,
                        "top": y - ASC_H, "bottom": y + DESC_H,
                        "conf": rng.randint(95, 99),
                    })
                    x += width + WORD_GAP
                if words:
                    lines.append(
                        {"words": words, "baseline_y": y, "indent": 0})
                    y += LINE_PITCH
            if lines:
                last = lines[-1]["words"][-1]
                last["text"] += "."
                last["out_words"] = [last["text"]]
                last["right"] += CHAR_W
                pars.append({"lines": lines})
                prev_single = len(lines) == 1
                y += PAR_GAP - LINE_PITCH
        return pars

    pars = build_column(MARGIN_LEFT) + build_column(MARGIN_LEFT + col_w + 80)
    return {"doc_id": doc_id, "family": "twocol",
            "pages": [{"pars": pars, "width": PAGE_W, "height": PAGE_H}]}


def expected_text(model: dict) -> str:
    """Reference writeText({reflowText: true}) semantics applied to the
    model: words joined ' ', lines of one par joined ' ', each par after
    the first prefixed '\\n' (page boundary = paragraph boundary).
    Decorated words contribute their post-pass3 expected form; CJK words
    contribute one output word per character."""
    pars_out = []
    for page in model["pages"]:
        for par in page["pars"]:
            words = [
                out for line in par["lines"] for w in line["words"]
                for out in _word_out(w)]
            pars_out.append(" ".join(words))
    return "\n".join(pars_out)


def expected_counts(model: dict) -> dict:
    n_words = sum(
        len(_word_out(w))
        for page in model["pages"] for par in page["pars"]
        for line in par["lines"] for w in line["words"])
    n_lines = sum(
        len(par["lines"]) for page in model["pages"] for par in page["pars"])
    n_pars = sum(len(page["pars"]) for page in model["pages"])
    return {
        "page_count": len(model["pages"]),
        "par_count": n_pars,
        "line_count": n_lines,
        "word_count": n_words,
    }


def strip_model_chars(model: dict, drop_codes) -> dict:
    """Expected-side transform for the pdf_cffsub family: the embedded
    CFF's charset omits ``drop_codes``, so the extractor skips those
    chars with NO advance (validCIDs rule) — remaining chars of the
    word stay contiguous and the word simply loses the chars. Words /
    lines / pars that would become empty disappear (defensive: the
    lexicon never produces one)."""
    import copy

    drop = {chr(c) for c in drop_codes}
    m = copy.deepcopy(model)
    for page in m["pages"]:
        new_pars = []
        for par in page["pars"]:
            new_lines = []
            for line in par["lines"]:
                new_words = []
                for w in line["words"]:
                    t = "".join(ch for ch in w["text"] if ch not in drop)
                    if not t:
                        continue
                    w["text"] = t
                    if w.get("out_words"):
                        outs = ["".join(ch for ch in ow if ch not in drop)
                                for ow in w["out_words"]]
                        w["out_words"] = [o for o in outs if o]
                    new_words.append(w)
                if new_words:
                    line["words"] = new_words
                    new_lines.append(line)
            if new_lines:
                par["lines"] = new_lines
                new_pars.append(par)
        page["pars"] = new_pars
    m["pages"] = [p for p in m["pages"] if p["pars"]]
    return m


def expected_spans(model: dict, fmt: str, url: str) -> list[dict]:
    """Golden ordered span rows for formats whose word geometry passes
    through the converters unchanged (hocr, alto). Derived from the
    model, not by running the extractor.

    Format-specific baseline semantics:
    - hocr: baseline from the line title ('baseline 0 -9') -> offset -9;
    - alto: offset = median bottom of descender-free words minus line
      bbox bottom; our model gives every word the same bottom -> 0.
    """
    rows = []
    for page_n, page in enumerate(model["pages"]):
        line_counter = 0
        for par_n, par in enumerate(page["pars"]):
            for line in par["lines"]:
                line_n = line_counter
                line_counter += 1
                if fmt == "hocr":
                    baseline_offset = -float(DESC_H)
                else:
                    # ALTO: offset 0 when any word is descender-free
                    # (uniform bottoms), else -round(0.25 * line height).
                    has_desc_free = any(
                        not any(ch in "gjpqy" for ch in w["text"])
                        for w in line["words"])
                    line_h = (
                        max(w["bottom"] for w in line["words"])
                        - min(w["top"] for w in line["words"]))
                    baseline_offset = (
                        0.0 if has_desc_free
                        else -float(round(line_h * 0.25)))
                for word_n, w in enumerate(line["words"]):
                    rows.append({
                        "url": url,
                        "page_n": page_n,
                        "line_n": line_n,
                        "word_n": word_n,
                        "word_id": f"word_{page_n + 1}_{line_n + 1}_{word_n + 1}",
                        "text": w["text"],
                        "left": float(w["left"]),
                        "top": float(w["top"]),
                        "right": float(w["right"]),
                        "bottom": float(w["bottom"]),
                        "conf": float(w["conf"]),
                        "sup": False, "bold": False, "italic": False,
                        "smallCaps": False, "dropcap": False,
                        "baseline_slope": 0.0,
                        "baseline_offset": baseline_offset,
                        "par_n": par_n,
                        "par_type": "body",
                    })
    return rows


# ------------------------------------------------------------- renderers


def _char_box(ch: str, x: int, width: int, baseline_y: int):
    """Char-class-dependent box (same scheme as the ABBYY renderer):
    ascenders/caps/digits/others reach y-31, x-height chars y-19,
    descenders drop to y+9."""
    if ch in "gjpqy":
        return x, baseline_y - 19, x + width, baseline_y + DESC_H
    if ch in "acemnorsuvwxz":
        return x, baseline_y - 19, x + width, baseline_y
    if ch in "-–—":
        return x, baseline_y - 13, x + width, baseline_y - 9
    if ch in "\"'":
        return x, baseline_y - ASC_H, x + width, baseline_y - 12
    return x, baseline_y - ASC_H, x + width, baseline_y


def render_hocr(model: dict) -> str:
    char_level = model.get("family") in ("charlevel", "cjk")
    par_lang = "chi_sim" if model.get("family") == "cjk" else "eng"
    out = [
        "<html><head><meta name='ocr-system' content='tesseract'></head><body>"]
    for page_n, page in enumerate(model["pages"]):
        out.append(
            f"<div class='ocr_page' id='page_{page_n + 1}' "
            f"title='image \"page_{page_n + 1}\"; "
            f"bbox 0 0 {page['width']} {page['height']}; ppageno {page_n}'>")
        line_counter = 0
        for par in page["pars"]:
            out.append(f"<p class='ocr_par' lang='{par_lang}'>")
            for line in par["lines"]:
                line_counter += 1
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = min(w["top"] for w in line["words"])
                b = max(w["bottom"] for w in line["words"])
                # x_size = asc + desc + x-ascender share; mirrors Tesseract:
                # ascHeight = x_size - x_descenders, xHeight = that - x_ascenders
                slope = model.get("skew_slope") or 0
                slope_str = f"{slope}" if slope else "0"
                out.append(
                    f"<span class='ocr_line' title='bbox {l} {t} {r} {b}; "
                    f"baseline {slope_str} -{DESC_H}; x_size {ASC_H + DESC_H}; "
                    f"x_descenders {DESC_H}; x_ascenders 12'>")
                for w_n, w in enumerate(line["words"]):
                    wid = f"word_{page_n + 1}_{line_counter}_{w_n + 1}"
                    if char_level and w.get("chars"):
                        out.append(
                            f"<span class='ocrx_word' id='{wid}' "
                            f"title='bbox {w['left']} {w['top']} "
                            f"{w['right']} {w['bottom']}; "
                            f"x_wconf {w['conf']}'>")
                        x = w["left"]
                        y = line["baseline_y"]
                        for ch, cw in w["chars"]:
                            cl, ct, cr, cb = _char_box(ch, x, cw, y)
                            out.append(
                                f"<span class='ocrx_cinfo' title='x_bboxes "
                                f"{cl} {ct} {cr} {cb}'>"
                                f"{escape_xml(ch)}</span>")
                            x += cw
                        out.append("</span>")
                    else:
                        body = escape_xml(w["text"])
                        if w.get("sup"):
                            body = f"<sup>{body}</sup>"
                        out.append(
                            f"<span class='ocrx_word' id='{wid}' "
                            f"title='bbox {w['left']} {w['top']} {w['right']} "
                            f"{w['bottom']}; x_wconf {w['conf']}'>"
                            f"{body}</span>")
                out.append("</span>")
            out.append("</p>")
        out.append("</div>")
    out.append("</body></html>")
    return "".join(out)


def render_abbyy(model: dict) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<document xmlns="http://www.abbyy.com/FineReader_xml/FineReader10-schema-v1.xml" version="1.0" producer="synthetic">',
    ]
    for page in model["pages"]:
        out.append(
            f'<page width="{page["width"]}" height="{page["height"]}" '
            f'resolution="144" rotation="Normal">')
        out.append('<block blockType="Text"><text>')
        for par in page["pars"]:
            out.append("<par>")
            for line in par["lines"]:
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = min(w["top"] for w in line["words"])
                b = max(w["bottom"] for w in line["words"])
                out.append(
                    f'<line baseline="{line["baseline_y"]}" l="{l}" t="{t}" '
                    f'r="{r}" b="{b}">')
                out.append('<formatting ff="Times New Roman" fs="10.">')
                for w_n, w in enumerate(line["words"]):
                    if w_n > 0:
                        prev = line["words"][w_n - 1]
                        out.append(
                            f'<charParams l="{prev["right"]}" t="{w["top"]}" '
                            f'r="{w["left"]}" b="{w["bottom"]}"> </charParams>')
                    susp = ' suspicious="1"' if w["conf"] < 75 else ""
                    x = w["left"]
                    for ch in w["text"]:
                        cw = CHAR_W
                        ch_top = w["top"]
                        ch_bottom = (
                            line["baseline_y"] + DESC_H
                            if ch in "gjpqy" else line["baseline_y"])
                        if ch in "acemnorsuvwxz.":
                            ch_top = line["baseline_y"] - 19
                        out.append(
                            f'<charParams l="{x}" t="{ch_top}" r="{x + cw}" '
                            f'b="{ch_bottom}"{susp}>{escape_xml(ch)}</charParams>')
                        x += cw
                out.append("</formatting></line>")
            out.append("</par>")
        out.append("</text></block>")
        for tbl in page.get("abbyy_tables", []):
            out.append(
                f'<block blockType="Table" l="{tbl["l"]}" t="{tbl["t"]}" '
                f'r="{tbl["r"]}" b="{tbl["b"]}">')
            for row in tbl["rows"]:
                out.append("<row>")
                for cell in row:
                    out.append(f'<cell width="{cell["width"]}">')
                    out.append("<text><par>")
                    y = cell["baseline_y"]
                    out.append(
                        f'<line baseline="{y}" l="{cell["left"]}" '
                        f't="{y - ASC_H}" r="{cell["right"]}" '
                        f'b="{y + DESC_H}">')
                    out.append(
                        '<formatting ff="Times New Roman" fs="10.">')
                    x = cell["left"]
                    for ch in cell["text"]:
                        ch_top = (y - 19 if ch in "acemnorsuvwxz."
                                  else y - ASC_H)
                        ch_bottom = y + DESC_H if ch in "gjpqy" else y
                        out.append(
                            f'<charParams l="{x}" t="{ch_top}" '
                            f'r="{x + CHAR_W}" b="{ch_bottom}">'
                            f"{escape_xml(ch)}</charParams>")
                        x += CHAR_W
                    out.append("</formatting></line></par></text></cell>")
                out.append("</row>")
            out.append("</block>")
        out.append("</page>")
    out.append("</document>")
    return "".join(out)


def render_abbyy_rotated(model: dict) -> str:
    """ABBYY XML with ``rotation="RotatedClockwise"``: charParams are
    emitted in rotated raw coordinates chosen so the converter's
    orientation-3 transform (convertPageAbbyy.js:266-272) restores the
    model geometry exactly. Exercises the rotation path end to end
    (cf. reference tests/module/importAbbyy.spec.js:59-68)."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<document xmlns="http://www.abbyy.com/FineReader_xml/FineReader10-schema-v1.xml" version="1.0" producer="synthetic">',
    ]
    for page in model["pages"]:
        W, H = page["width"], page["height"]
        out.append(
            f'<page width="{W}" height="{H}" resolution="144" '
            f'rotation="RotatedClockwise">')
        out.append('<block blockType="Text"><text>')

        def raw(L, T, R, B):
            # inverse of the orientation-3 transform:
            # final (L,T,R,B) = (H - b_raw, l_raw, H - t_raw, r_raw)
            return (T, H - R, B, H - L)

        for par in page["pars"]:
            out.append("<par>")
            for line in par["lines"]:
                y = line["baseline_y"]
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = min(w["top"] for w in line["words"])
                b = max(w["bottom"] for w in line["words"])
                rl, rt, rr, rb = raw(l, t, r, b)
                out.append(
                    f'<line baseline="0" l="{rl}" t="{rt}" r="{rr}" b="{rb}">')
                out.append('<formatting ff="Times New Roman" fs="10.">')
                for w_n, w in enumerate(line["words"]):
                    if w_n > 0:
                        prev = line["words"][w_n - 1]
                        srl, srt, srr, srb = raw(
                            prev["right"], w["top"], w["left"], w["bottom"])
                        out.append(
                            f'<charParams l="{srl}" t="{srt}" r="{srr}" '
                            f'b="{srb}"> </charParams>')
                    x = w["left"]
                    for ch in w["text"]:
                        ch_top = w["top"]
                        ch_bottom = y + DESC_H if ch in "gjpqy" else y
                        if ch in "acemnorsuvwxz.":
                            ch_top = y - 19
                        crl, crt, crr, crb = raw(x, ch_top, x + CHAR_W, ch_bottom)
                        out.append(
                            f'<charParams l="{crl}" t="{crt}" r="{crr}" '
                            f'b="{crb}">{escape_xml(ch)}</charParams>')
                        x += CHAR_W
                out.append("</formatting></line>")
            out.append("</par>")
        out.append("</text></block></page>")
    out.append("</document>")
    return "".join(out)


def render_alto(model: dict) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">',
        "<Styles>"
        '<TextStyle ID="TS1" FONTFAMILY="Times New Roman" FONTSIZE="10"/>'
        "</Styles>",
        "<Layout>",
    ]
    for page_n, page in enumerate(model["pages"]):
        out.append(
            f'<Page ID="P{page_n + 1}" WIDTH="{page["width"]}" '
            f'HEIGHT="{page["height"]}" PHYSICAL_IMG_NR="{page_n + 1}">'
            "<PrintSpace>")
        for par_n, par in enumerate(page["pars"]):
            out.append(f'<TextBlock ID="B{page_n + 1}_{par_n + 1}" STYLEREFS="TS1">')
            for line in par["lines"]:
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = min(w["top"] for w in line["words"])
                b = max(w["bottom"] for w in line["words"])
                out.append(
                    f'<TextLine HPOS="{l}" VPOS="{t}" WIDTH="{r - l}" '
                    f'HEIGHT="{b - t}">')
                for w in line["words"]:
                    wc = w["conf"] / 100.0
                    out.append(
                        f'<String CONTENT="{escape_xml(w["text"])}" '
                        f'HPOS="{w["left"]}" VPOS="{w["top"]}" '
                        f'WIDTH="{w["right"] - w["left"]}" '
                        f'HEIGHT="{w["bottom"] - w["top"]}" WC="{wc:.2f}"/>')
                out.append("</TextLine>")
            out.append("</TextBlock>")
        out.append("</PrintSpace></Page>")
    out.append("</Layout></alto>")
    return "".join(out)


def render_text(model: dict) -> str:
    """One physical line per paragraph, blank line between paragraphs —
    convertPageText re-wraps but reflow restores exactly the paragraph
    word sequence."""
    pars = []
    for page in model["pages"]:
        for par in page["pars"]:
            words = [w["text"] for line in par["lines"] for w in line["words"]]
            pars.append(" ".join(words))
    return "\n\n".join(pars)


RENDERERS = {
    "hocr": render_hocr,
    "abbyy": render_abbyy,
    "alto": render_alto,
    "text": render_text,
}


def render_stext(model: dict) -> str:
    from .render_stext import render_stext as _rs
    return _rs(model)


def render_textract(model: dict) -> str:
    from .render_textract import render_textract as _rt
    return _rt(model)


def render_google_vision(model: dict) -> str:
    from .render_google_vision import render_google_vision as _rg
    return _rg(model)


def render_pdf(model: dict, **kwargs) -> bytes:
    from .render_pdf import render_pdf as _rp
    return _rp(model, **kwargs)


def make_corrupt_rows(n: int = 40) -> list[dict]:
    """Deliberately-corrupt family (FIXTURES.md invariant 3): every row
    must produce a non-null parse error without ever failing the job
    (the reference's never-abort contract, scribe.js:291-293)."""
    kinds = []
    for i in range(n):
        k = i % 4
        if k == 0:  # PDF with no parseable structure
            html = b"%PDF-1.4\ngarbage " + bytes([i % 251]) * 200
        elif k == 1:  # hOCR truncated mid-page-div (dims unparseable)
            html = b"<html><body><div class='ocr_page' title='bb"
        elif k == 2:  # ABBYY page missing dimensions
            html = (b'<?xml version="1.0"?><document xmlns="http://www.abbyy.com/x">' +
                    b"<page rotation=\"Normal\"><text></text></page></document>")
        else:  # binary garbage
            html = bytes([(i * 7 + j) % 256 for j in range(300)])
        kinds.append({
            "url": f"https://fixtures.test/corrupt/{i:08d}",
            "html": html,
        })
    return kinds


# --------------------------------------------------------------- corpus


def _mutate_word(text: str, salt: int) -> str:
    """Deterministic same-length substitution (an OCR-style error):
    replace the first letter with a different one. Length is preserved
    so layer geometry (and therefore bbox matching) is unchanged."""
    first = text[0]
    repl = chr((ord(first) - ord("a") + 1 + salt % 7) % 26 + ord("a"))
    if repl == first:
        repl = chr((ord(first) - ord("a") + 9) % 26 + ord("a"))
    return repl + text[1:]


def build_layer_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Multi-layer pair family (FIXTURES.md §2.8): the ground-truth
    model plus two OCR renditions with seeded same-geometry word errors.

    Returns models + the expected eval metrics for (ocr_a vs truth) and
    the expected consensus decisions for base=ocr_a,
    comparators=[truth, ocr_b].
    """
    import copy

    truth = build_doc_model(doc_id, seed=seed)
    rng = _doc_rng(seed + 7777, doc_id)

    def all_words(model):
        return [
            w for page in model["pages"] for par in page["pars"]
            for line in par["lines"] for w in line["words"]]

    words = all_words(truth)
    n_words = len(words)
    k = max(1, n_words // 20)
    subs_a = sorted(rng.sample(range(n_words), min(k, n_words)))
    subs_b = sorted(rng.sample(range(n_words), min(k, n_words)))

    ocr_a = copy.deepcopy(truth)
    words_a = all_words(ocr_a)
    for j, idx in enumerate(subs_a):
        words_a[idx]["text"] = _mutate_word(words_a[idx]["text"], doc_id + j)
        # alternate high/low confidence on errors (exercises
        # incorrectHighConf)
        words_a[idx]["conf"] = 90 if j % 2 == 0 else 50

    ocr_b = copy.deepcopy(truth)
    words_b = all_words(ocr_b)
    for j, idx in enumerate(subs_b):
        words_b[idx]["text"] = _mutate_word(words_b[idx]["text"], doc_id + j + 3)

    # Expected eval metrics for compare(ocr_a, truth): same geometry =>
    # strict 1-1 overlap; errors are exactly the substituted words.
    subs_a_set = set(subs_a)
    correct = n_words - len(subs_a_set)
    correct_low_conf = sum(
        1 for i, w in enumerate(words_a)
        if i not in subs_a_set and w["conf"] <= 75)
    incorrect_high_conf = sum(
        1 for i in subs_a_set if words_a[i]["conf"] > 85)
    eval_expected = {
        "total": n_words, "correct": correct,
        "incorrect": len(subs_a_set), "missed": 0, "extra": 0,
        "correctLowConf": correct_low_conf,
        "incorrectHighConf": incorrect_high_conf,
    }

    # Expected consensus for base=ocr_a, comparators=[truth, ocr_b]:
    # conf 100 when both agree with base, 80 when one does, 50 when none
    # (replace with the comparators' text when both agree on it).
    consensus_expected = []
    word_pos = []
    for page_n, page in enumerate(truth["pages"]):
        line_counter = 0
        for par in page["pars"]:
            for line in par["lines"]:
                line_counter += 1
                for w_n in range(len(line["words"])):
                    word_pos.append((page_n, line_counter, w_n + 1))
    for i in range(n_words):
        base_text = words_a[i]["text"]
        comp_texts = [words[i]["text"], words_b[i]["text"]]
        matches = sum(1 for t in comp_texts if t == base_text)
        out_text = base_text
        if matches == 2:
            conf = 100
        elif matches == 1:
            conf = 80
        else:
            conf = 50
            if comp_texts[0] == comp_texts[1]:
                out_text = comp_texts[0]
        page_n, line_n, w_n = word_pos[i]
        consensus_expected.append({
            "word_id": f"word_{page_n + 1}_{line_n}_{w_n}",
            "text": out_text, "conf": conf,
        })

    # Expected combined-layer values per page, derived from the model
    # dicts (NOT by running the operators): the ocrAddsNewText gate
    # replicated over the planted substitutions, buildCombinedLayer's
    # chosen/keep_ocr from the gate, calcConf tallies from the planted
    # confs, combineOCRPage's line restoration (full line-text listing
    # after remove-middle-line + re-add), and reorderOcrPage's
    # priority-box permutation (first min(4, n) lines reversed).
    import re as _re

    def _gate_norm(t: str) -> str:
        return _re.sub(r"[^0-9a-z]", "", t.lower())

    combined_expected = []
    for page_n, page in enumerate(truth["pages"]):
        t_lines = [ln for par in page["pars"] for ln in par["lines"]]
        a_lines = [ln for par in ocr_a["pages"][page_n]["pars"]
                   for ln in par["lines"]]
        native_stream = " ".join(
            t for t in (_gate_norm(w["text"]) for ln in t_lines
                        for w in ln["words"]) if t)
        new_chars = new_nums = new_text_lines = 0
        for ln in a_lines:
            line_new = 0
            for w in ln["words"]:
                tok = _gate_norm(w["text"])
                if len(tok) < 2 or w["conf"] < 85 \
                        or tok in native_stream:
                    continue
                if _re.match(r"^[a-z]{3,}$", tok) \
                        and _re.search(r"[aeiouy]", tok):
                    new_chars += len(tok)
                    line_new += 1
                elif _re.match(r"^[0-9]{2,}$", tok):
                    new_nums += 1
            if line_new >= 3:
                new_text_lines += 1
        adds = (new_text_lines >= 2 or new_nums >= 10
                or new_chars >= 100)
        line_texts = [" ".join(w["text"] for w in ln["words"])
                      for ln in t_lines]
        m_r = min(4, len(t_lines))
        reorder_idx = list(range(m_r - 1, -1, -1)) + \
            list(range(m_r, len(t_lines)))
        a_words = [w for ln in a_lines for w in ln["words"]]
        combined_expected.append({
            "page_n": page_n,
            "adds_new": adds,
            "chosen": "ocr" if adds else "native",
            "keep_ocr": adds,
            "combined_lines": "\n".join(line_texts),
            "reorder_key": "|".join(
                t_lines[i]["words"][0]["text"] for i in reorder_idx),
            "conf_total": len(a_words),
            "conf_high": sum(1 for w in a_words if w["conf"] > 85),
        })

    return {
        "truth": truth, "ocr_a": ocr_a, "ocr_b": ocr_b,
        "eval_expected": eval_expected,
        "consensus_expected": consensus_expected,
        "combined_expected": combined_expected,
    }


def build_comb_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Comb-merge engine-pair family: a char-level 'Legacy' layer (A)
    and a word-level 'LSTM' layer (B) with planted scenario lines, plus
    the analytically-expected merged words.

    Scenario classes per line (cycled):
    - match:    identical word  -> conf 100, text kept
    - conflict: same-geometry substitution -> LSTM text wins (no-image
                LSTM-prior fallback), conf 0
    - reject:   Legacy letter-digit-letter pattern -> rejectWordLegacy
                forces the LSTM text
    - skip:     Legacy 'eg' -> decision fires but the eg/ie skip list
                keeps the Legacy text
    - split:    one Legacy word vs two LSTM words (box-sum 2-to-1) ->
                LSTM pair wins with char-grafted Legacy bboxes
    - merge:    two Legacy words vs one LSTM word -> LSTM word wins,
                id suffixed 'b'
    """
    if doc_id >= 40:
        return _build_comb_image_models(doc_id, seed)
    rng = _doc_rng(seed + 31337, doc_id)
    scenarios = ("match", "conflict", "reject", "skip", "split", "merge")
    n_lines = rng.randint(6, 12)
    a_lines, b_lines, expected = [], [], []
    y = TOP_BASELINE
    for i in range(n_lines):
        scen = scenarios[i % len(scenarios)]
        x0 = MARGIN_LEFT
        a_words, b_words = [], []

        def _w(text, left, right, chars=None):
            return {"text": text, "chars": chars, "out_words": [text],
                    "left": left, "right": right,
                    "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}

        def _chars(text):
            return [(c, CHAR_W) for c in text]

        if scen == "match":
            tok = rng.choice(LEXICON)
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(tok, x0, r, _chars(tok)))
            b_words.append(_w(tok, x0, r))
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": tok, "conf": 100,
                             "left": x0, "right": r})
        elif scen == "conflict":
            tok = rng.choice(LEXICON)
            mut = _mutate_word(tok, doc_id + i)
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(tok, x0, r, _chars(tok)))
            b_words.append(_w(mut, x0, r))
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": mut, "conf": 0,
                             "left": x0, "right": r})
        elif scen == "reject":
            tok = rng.choice(LEXICON)
            legacy = tok[:1] + "1" + tok[2:]
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(legacy, x0, r, _chars(legacy)))
            b_words.append(_w(tok, x0, r))
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": tok, "conf": 0,
                             "left": x0, "right": r})
        elif scen == "skip":
            r = x0 + 2 * CHAR_W
            a_words.append(_w("eg", x0, r, _chars("eg")))
            b_words.append(_w("ab", x0, r))
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": "eg", "conf": 0,
                             "left": x0, "right": r})
        elif scen == "split":
            t1, t2 = rng.choice(LEXICON), rng.choice(LEXICON)
            full = t1 + t2
            mid = x0 + len(t1) * CHAR_W
            r = x0 + len(full) * CHAR_W
            a_words.append(_w(full, x0, r, _chars(full)))
            b_words.append(_w(t1, x0, mid))
            b_words.append(_w(t2, mid, r))
            # char-grafted bboxes: contiguous CHAR_W slices of the
            # Legacy box (all plain letters -> union spans the slice)
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1b",
                             "text": t1, "conf": 0,
                             "left": x0, "right": mid})
            expected.append({"line_n": i, "word_n": 1,
                             "word_id": f"word_1_{i + 1}_2b",
                             "text": t2, "conf": 0,
                             "left": mid, "right": r})
        else:  # merge
            t1, t2 = rng.choice(LEXICON), rng.choice(LEXICON)
            full = t1 + t2
            mid = x0 + len(t1) * CHAR_W
            r = x0 + len(full) * CHAR_W
            a_words.append(_w(t1, x0, mid, _chars(t1)))
            a_words.append(_w(t2, mid, r, _chars(t2)))
            b_words.append(_w(full, x0, r))
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1b",
                             "text": full, "conf": 0,
                             "left": x0, "right": r})
        a_lines.append({"words": a_words, "baseline_y": y, "indent": 0})
        b_lines.append({"words": b_words, "baseline_y": y, "indent": 0})
        y += LINE_PITCH

    def _model(lines, family):
        return {"doc_id": doc_id, "family": family,
                "pages": [{"pars": [{"lines": lines}],
                           "width": PAGE_W, "height": PAGE_H}]}

    return {"legacy": _model(a_lines, "charlevel"),
            "lstm": _model(b_lines, "base"),
            "expected": expected}


def _build_comb_image_models(doc_id: int, seed: int) -> dict:
    """Image-bearing comb docs (doc_id >= 40): the page's binary scan
    (rendered from the TRUE text with the same 5x7 rasterizer
    evalWords uses) lets the visual metric decide conflicts
    (compareOCRModule.js:203 evalWords; :862-905 comb consumers).

    Scenario classes per line (cycled):
    - image_keep:    Legacy (A) matches the scan, LSTM (B) differs ->
                     WITHOUT the image the LSTM-prior fallback would
                     take B; the visual metric keeps A (decisive);
    - image_replace: the scan matches B -> B's text wins, now on
                     visual evidence instead of the prior;
    - match:         identical words -> conf 100 (family parity);
    - image_twotoone:two gapped Legacy words vs one LSTM word spanning
                     both (box-sum 2-to-1): the LSTM render bleeds
                     into the inter-word gap the scan leaves blank, so
                     the pair is retained (without the image the
                     merged word would win via the prior)."""
    import numpy as np

    from .operators.evalwords import draw_word
    from .textops.multimodal import encode_png_gray

    rng = _doc_rng(seed + 51515, doc_id)
    scenarios = ("image_keep", "image_replace", "match",
                 "image_twotoone")
    n_lines = rng.randint(5, 9)
    a_lines, b_lines, expected, truth_texts = [], [], [], []
    y = TOP_BASELINE
    for i in range(n_lines):
        scen = scenarios[i % len(scenarios)]
        x0 = MARGIN_LEFT
        a_words, b_words = [], []

        def _w(text, left, right, chars=None):
            return {"text": text, "chars": chars, "out_words": [text],
                    "left": left, "right": right,
                    "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}

        def _chars(text):
            return [(c, CHAR_W) for c in text]

        if scen == "image_keep":
            tok = rng.choice(LEXICON)
            mut = _mutate_word(tok, doc_id + i)
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(tok, x0, r, _chars(tok)))
            b_words.append(_w(mut, x0, r))
            truth_texts.append([tok])
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": tok, "conf": 0,
                             "left": x0, "right": r})
        elif scen == "image_replace":
            tok = rng.choice(LEXICON)
            mut = _mutate_word(tok, doc_id + i)
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(mut, x0, r, _chars(mut)))
            b_words.append(_w(tok, x0, r))
            truth_texts.append([tok])
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": tok, "conf": 0,
                             "left": x0, "right": r})
        elif scen == "match":
            tok = rng.choice(LEXICON)
            r = x0 + len(tok) * CHAR_W
            a_words.append(_w(tok, x0, r, _chars(tok)))
            b_words.append(_w(tok, x0, r))
            truth_texts.append([tok])
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": tok, "conf": 100,
                             "left": x0, "right": r})
        else:  # image_twotoone
            t1, t2 = rng.choice(LEXICON), rng.choice(LEXICON)
            gap = 3 * CHAR_W
            m1 = x0 + len(t1) * CHAR_W
            m2 = m1 + gap
            r = m2 + len(t2) * CHAR_W
            a_words.append(_w(t1, x0, m1, _chars(t1)))
            a_words.append(_w(t2, m2, r, _chars(t2)))
            b_words.append(_w(t1 + t2, x0, r))
            truth_texts.append([t1, t2])
            expected.append({"line_n": i, "word_n": 0,
                             "word_id": f"word_1_{i + 1}_1",
                             "text": t1, "conf": 0,
                             "left": x0, "right": m1})
            expected.append({"line_n": i, "word_n": 1,
                             "word_id": f"word_1_{i + 1}_2",
                             "text": t2, "conf": 0,
                             "left": m2, "right": r})
        a_lines.append({"words": a_words, "baseline_y": y, "indent": 0})
        b_lines.append({"words": b_words, "baseline_y": y, "indent": 0})
        y += LINE_PITCH

    def _model(lines, family):
        return {"doc_id": doc_id, "family": family,
                "pages": [{"pars": [{"lines": lines}],
                           "width": PAGE_W, "height": PAGE_H}]}

    legacy = _model(a_lines, "charlevel")
    lstm = _model(b_lines, "base")

    # The scan is rendered at the PARSED Legacy geometry (the same
    # boxes evalWords will render candidates into) — the char-level
    # hOCR parse derives the word bottom from the char boxes
    # (baseline), not the authored descender, and any fixture-side
    # guess would drift from it.
    from .extract import extract_document

    parsed = extract_document(
        render_hocr(legacy).encode("utf-8")).pages[0]
    img = np.full((PAGE_H, PAGE_W), 255, dtype=np.uint8)
    for line, texts in zip(parsed.lines, truth_texts):
        for w, text in zip(line.words, texts):
            draw_word(img, text, w.bbox)

    return {"legacy": legacy,
            "lstm": lstm,
            "expected": expected,
            "page_image": encode_png_gray(img)}


def write_comb_parquet(path: str, n_docs: int = 46,
                       seed: int = SEED_DEFAULT) -> None:
    """comb_layers.parquet (url, html_legacy, html_lstm, page_image) +
    comb.parquet golden merged-word rows for the merge_comb oracle.
    Docs 40+ carry the binarized page scan (PNG) that drives the
    image-based evalWords conflict decisions."""
    import os

    import pandas as pd

    layer_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_comb_models(doc_id, seed=seed)
        url = f"https://fixtures.test/comb/{doc_id:08d}"
        layer_rows.append({
            "url": url,
            "html_legacy": render_hocr(m["legacy"]).encode("utf-8"),
            "html_lstm": render_hocr(m["lstm"]).encode("utf-8"),
            "page_image": m.get("page_image"),
        })
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(layer_rows).to_parquet(
        os.path.join(path, "comb_layers.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "comb.parquet"), index=False)


def build_underline_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """PDF underline/rule family: the base doc model with a
    deterministic subset of words flagged ``underline`` (rendered as
    thin filled bars just below the baseline) and one page-wide
    separator rule per multi-paragraph page (rendered mid paragraph
    gap — its overhang past the line text keeps it out of the
    underline match and it must surface in page.rules instead)."""
    model = build_doc_model(doc_id, seed=seed)
    rng = _doc_rng(seed + 909, doc_id)
    expected = []
    for page_n, page in enumerate(model["pages"]):
        line_n = 0
        for par in page["pars"]:
            for line in par["lines"]:
                for word_n, w in enumerate(line["words"]):
                    und = rng.random() < 0.25
                    if und:
                        w["underline"] = True
                    expected.append({
                        "page_n": page_n, "line_n": line_n,
                        "word_n": word_n, "text": w["text"],
                        "underline": und})
                line_n += 1
        if len(page["pars"]) >= 2:
            first_par = page["pars"][0]
            last_baseline = first_par["lines"][-1]["baseline_y"]
            page["rules"] = [{
                "y": last_baseline + LINE_PITCH,
                "left": MARGIN_LEFT, "right": PAGE_W - MARGIN_LEFT}]
    return {"model": model, "expected": expected}


def write_underline_parquet(path: str, n_docs: int = 40,
                            seed: int = SEED_DEFAULT) -> None:
    """underline_docs.parquet (url, html PDF bytes) + underline.parquet
    golden word rows for the pdf_underline oracle."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_underline_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_underline/{doc_id:08d}"
        # rotate skips rect drawing; keep this family unrotated and
        # outside the Form XObject variant (other variants still cycle)
        from .render_pdf import render_pdf as _render_pdf_raw

        doc_rows.append({
            "url": url,
            "html": _render_pdf_raw(m["model"], rotate=False)})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "underline_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "underline.parquet"), index=False)


def _build_zebra_table_model(doc_id: int, seed: int) -> dict:
    """Row-band (zebra / per-cell-background) table docs: 16 rows x 4
    cols, every row's cells drawn as light-gray filled rects with 6 px
    gaps at column boundaries, NO rule lines anywhere. Even docs carry
    numeric cells (the bands adopt the numeric-cluster candidate,
    detectPdfTables.js:342-368); odd docs carry alpha cells so no text
    candidate forms and the >= 8-band region stands alone (:443-446)."""
    rng = _doc_rng(seed + 6161, doc_id)
    n_rows, n_cols, col_w = 16, 4, 180
    xs = [MARGIN_LEFT + i * col_w for i in range(n_cols + 1)]
    numeric = doc_id % 2 == 0

    pars, expected, y = [], [], TOP_BASELINE
    lead = []
    for i in range(5):
        t = rng.choice(LEXICON)
        lead.append({"text": t, "chars": None, "out_words": [t],
                     "left": MARGIN_LEFT + i * 110,
                     "right": MARGIN_LEFT + i * 110 + 90,
                     "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})
    # below the header-scan lookback horizon (10 row pitches) so the
    # lead paragraph can't be adopted as the table's header band, and
    # with 3-char cells so each cell is its own line (the x-gap
    # exceeds the line-split threshold -> same-top pairs keep Phase 0
    # from bailing; a one-line-per-row alpha zebra is invisible to the
    # reference's Phase 0 too)
    y = 680

    bands, lines = [], []
    for r in range(n_rows):
        words = []
        for c in range(n_cols):
            if numeric:
                val = str(100 * (r + 1) + c)
            else:
                val = (chr(97 + r % 26) + chr(97 + (r + 7) % 26)
                       + chr(97 + c))
            x = xs[c] + 12
            words.append({
                "text": val, "chars": None, "out_words": [val],
                "left": x, "right": x + len(val) * CHAR_W,
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
            expected.append({"table_n": 0, "row_n": r, "col_n": c,
                             "cell": val})
        lines.append({"words": words, "baseline_y": y, "indent": 0})
        bands.append({
            "top": y - ASC_H - 5, "bottom": y + DESC_H + 5,
            "cells": [
                (xs[c] + (3 if c > 0 else 0),
                 xs[c + 1] - (3 if c < n_cols - 1 else 0))
                for c in range(n_cols)]})
        y += LINE_PITCH
    pars.append({"lines": lines})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            "row_bands": bands}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": 1,
            "n_grid_cols": n_cols,
            "regions": [{"table_n": 0, "method": "row-band",
                         "n_cols": n_cols, "header": "none",
                         "title": None}],
            "num_cells": [], "hr_cells": []}


def _build_refine_top_model(doc_id: int, seed: int) -> dict:
    """Phase-5.5 refineTableTop docs (detectPdfTables.js:3095-3352) —
    each exercises one top-refinement mechanism over a borderless
    label+3-numeric-column block whose Phase-2 bbox was expanded by 3
    row heights:

    - 45: a wide prose line inside the expanded region; the chain
      scan rejects it (gap > 0.45x pitch, width > 0.6x candidate) so
      the refined top excludes it — its words must NOT become cells;
    - 46: a stacked 2-row multi-segment header whose cell xs differ
      across rows (Rule 2 misses -> weak); the 2.5x-pitch
      multi-segment chain still reaches both rows;
    - 47: a Rule-2 strong stacked header (matching cell xs) under a
      '...as follows:' prose line that sits inside the expanded
      region; the strong band_top short-circuit takes the top and
      the follows: line stays out;
    - 48: a narrow single-cell header just above a full-width rule;
      the gap to the data exceeds the 0.45x single-segment budget, so
      only the hLine scan anchor (closest rule within 1.5x pitch)
      lets the chain reach it;
    - 49: two stacked sibling blocks 160 px apart; the lower block's
      scan is floored at the upper's bbox.bottom — without the floor
      the multi-segment chain (gap 120 < 2.5x pitch) would swallow
      the upper table's rows."""
    rng = _doc_rng(seed + 7171, doc_id)
    num_xs = [MARGIN_LEFT] + [MARGIN_LEFT + 450 + c * 150
                              for c in range(3)]

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    pars, expected = [], []
    y = TOP_BASELINE
    lead = [_tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})

    def data_rows(y0, n, base, table_n, row0):
        lines = []
        yy = y0
        for r in range(n):
            label = rng.choice(LEXICON)
            words = [_tok(label, num_xs[0], yy)]
            expected.append({"table_n": table_n, "row_n": row0 + r,
                             "col_n": 0, "cell": label})
            for c in range(3):
                val = f"{base + (r + 1) * 1000 + c * 7},{100 + r}"
                words.append(_tok(val, num_xs[c + 1], yy))
                expected.append({"table_n": table_n,
                                 "row_n": row0 + r, "col_n": c + 1,
                                 "cell": val})
            lines.append({"words": words, "baseline_y": yy,
                          "indent": 0})
            yy += LINE_PITCH
        pars.append({"lines": lines})
        return yy

    def header_row(yy, cells, table_n, row_n):
        """cells: list of (col_n, x). Emits the golden row with ''
        for uncovered columns."""
        words = []
        by_col = dict(cells)
        for col in range(4):
            if col in by_col:
                t = rng.choice(LEXICON)
                words.append(_tok(t, by_col[col], yy))
                expected.append({"table_n": table_n, "row_n": row_n,
                                 "col_n": col, "cell": t})
            else:
                expected.append({"table_n": table_n, "row_n": row_n,
                                 "col_n": col, "cell": ""})
        pars.append({"lines": [{"words": words, "baseline_y": yy,
                                "indent": 0}]})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H}
    regions = []
    header = "none"
    n_tables = 1

    if doc_id == 45:
        yd = 800
        # tight 10 px inter-word gaps: the line phrase-merges into ONE
        # wide prose cell (never header-like), and the line itself
        # stays a single OcrLine (single-segment for the chain scan)
        prose, cx = [], MARGIN_LEFT
        for _ in range(8):
            t = rng.choice(LEXICON)
            prose.append(_tok(t, cx, yd - 2 * LINE_PITCH))
            cx += len(t) * CHAR_W + 10
        pars.append({"lines": [{"words": prose,
                                "baseline_y": yd - 2 * LINE_PITCH,
                                "indent": 0}]})
        data_rows(yd, 5, 0, 0, 0)
    elif doc_id == 46:
        # header rows at 2 and 3 pitches up: the outer row's top sits
        # ABOVE the ~2.87-pitch Phase-2 expansion, so only the
        # 2.5x-pitch multi-segment chain can reach it
        yd = 800
        header_row(yd - 3 * LINE_PITCH, [(1, num_xs[1]), (3, num_xs[3])],
                   0, 0)
        header_row(yd - 2 * LINE_PITCH, [(0, num_xs[0]), (2, num_xs[2])],
                   0, 1)
        data_rows(yd, 5, 0, 0, 2)
        header = "weak"
    elif doc_id == 47:
        yd = 800
        yf = yd - 4 * LINE_PITCH
        intro, cx = [], MARGIN_LEFT
        for t in ("results", "were", "as", "follows:"):
            intro.append(_tok(t, cx, yf))
            cx += len(t) * CHAR_W + 10
        pars.append({"lines": [{"words": intro, "baseline_y": yf,
                                "indent": 0}]})
        header_row(yd - 3 * LINE_PITCH,
                   [(1, num_xs[1] + 10), (3, num_xs[3] + 10)], 0, 0)
        header_row(yd - 2 * LINE_PITCH,
                   [(1, num_xs[1] + 10), (3, num_xs[3] + 10)], 0, 1)
        data_rows(yd, 5, 0, 0, 2)
        header = "strong"
    elif doc_id == 48:
        yh = 730
        yd = yh + 70
        header_row(yh, [(1, num_xs[1])], 0, 0)
        page["rules"] = [{"left": MARGIN_LEFT,
                          "right": num_xs[3] + 120, "y": yh + 14}]
        data_rows(yd, 5, 0, 0, 1)
        header = "weak"
    elif doc_id == 49:
        # sibling gap 157: above the Phase-2 run-split threshold
        # (3 x 52-pitch = 156) so two candidates form, yet the chain
        # gap (157 - 28 px rendered line height = 129) stays under the
        # 2.5x-pitch multi-segment budget (130) — only the top floor
        # keeps the lower scan out of the upper table
        y_up = 700
        y_end = data_rows(y_up, 4, 0, 0, 0)
        data_rows(y_end - LINE_PITCH + 157, 5, 50000, 1, 0)
        n_tables = 2
        regions.append({"table_n": 1, "method": "numeric",
                        "n_cols": 4, "header": "none", "title": None})

    regions.insert(0, {"table_n": 0, "method": "numeric", "n_cols": 4,
                       "header": header, "title": None})
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": n_tables,
            "n_grid_cols": 4, "regions": regions, "num_cells": [],
            "hr_cells": []}


def _build_vline_columns_model(doc_id: int, seed: int) -> dict:
    """vLine-first column doc (extractStructure :2739-2748 via
    correlatePathsWithCandidate :1901-1908): the same x-scattered
    numeric blob as doc 50, but the true column geometry comes from
    two interior VERTICAL rules spanning the table — their clustered
    positions become the separators outright. Without the vLine path
    the doc reports 2 columns."""
    rng = _doc_rng(seed + 11515, doc_id)

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    pars, expected = [], []
    y = TOP_BASELINE
    lead = [_tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})

    yd = 700
    lines = []
    for r in range(5):
        label = rng.choice(LEXICON)
        n1 = f"{1000 + r}"
        n2 = f"{2000 + r}"
        x1 = 520 + r * 25             # centers 550..650 (< vline 690)
        x2 = 665 + r * 5              # centers 695..715 (> vline 690)
        # x2 overlaps x1's widest row so word clustering merges the
        # numerics into one blob — only the verticals recover 3 cols
        words = [_tok(label, MARGIN_LEFT, yd),
                 _tok(n1, x1, yd), _tok(n2, x2, yd)]
        expected.append({"table_n": 0, "row_n": r, "col_n": 0,
                         "cell": label})
        expected.append({"table_n": 0, "row_n": r, "col_n": 1,
                         "cell": n1})
        expected.append({"table_n": 0, "row_n": r, "col_n": 2,
                         "cell": n2})
        lines.append({"words": words, "baseline_y": yd, "indent": 0})
        yd += LINE_PITCH
    pars.append({"lines": lines})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            # two interior verticals spanning the data rows; only 2,
            # so no strict grid forms (those need 3+ with horizontals)
            "vrules": [{"x": 480, "top": 700 - ASC_H - 8,
                        "bottom": yd - LINE_PITCH + DESC_H + 8},
                       {"x": 690, "top": 700 - ASC_H - 8,
                        "bottom": yd - LINE_PITCH + DESC_H + 8}]}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": 1,
            "n_grid_cols": 3,
            "regions": [{"table_n": 0, "method": "numeric",
                         "n_cols": 3, "header": "none",
                         "title": None}],
            "num_cells": [], "hr_cells": []}


def _build_multi_region_model(doc_id: int, seed: int) -> dict:
    """Multi-region split doc (detectPdfTables.js:388-440): two banded
    sections whose stripe sets sit 160 px apart — beyond the band
    region's vertical-contiguity tolerance, so TWO regions form — with
    a 2-cell column-header row in the gap. The header row bridges the
    Phase-2 run (section-header bridging), so ONE text candidate spans
    both regions; the header-separated rule then splits it into one
    table per region, the second of which adopts the header row as its
    band via refine_table_top."""
    rng = _doc_rng(seed + 10404, doc_id)
    num_xs = [MARGIN_LEFT, MARGIN_LEFT + 450, MARGIN_LEFT + 600,
              MARGIN_LEFT + 750]

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    pars, expected, bands = [], [], []
    y = TOP_BASELINE
    lead = [_tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})

    y = 600
    lines = []
    heads = [rng.choice(LEXICON), rng.choice(LEXICON)]
    for table_n in range(2):
        if table_n == 1:
            # the separating header row: 2 cells over the numeric
            # columns, midway through the 160 px inter-section gap
            yh = y - 80
            lines.append({"words": [_tok(heads[0], num_xs[1], yh),
                                    _tok(heads[1], num_xs[3], yh)],
                          "baseline_y": yh, "indent": 0})
            expected.append({"table_n": 1, "row_n": 0, "col_n": 0,
                             "cell": ""})
            expected.append({"table_n": 1, "row_n": 0, "col_n": 1,
                             "cell": heads[0]})
            expected.append({"table_n": 1, "row_n": 0, "col_n": 2,
                             "cell": ""})
            expected.append({"table_n": 1, "row_n": 0, "col_n": 3,
                             "cell": heads[1]})
        row0 = 0 if table_n == 0 else 1
        for r in range(5):
            label = rng.choice(LEXICON)
            words = [_tok(label, num_xs[0], y)]
            expected.append({"table_n": table_n, "row_n": row0 + r,
                             "col_n": 0, "cell": label})
            for c in range(3):
                val = f"{(table_n + 1) * 10000 + (r + 1) * 100 + c}"
                words.append(_tok(val, num_xs[c + 1], y))
                expected.append({"table_n": table_n,
                                 "row_n": row0 + r, "col_n": c + 1,
                                 "cell": val})
            lines.append({"words": words, "baseline_y": y,
                          "indent": 0})
            bands.append({
                "top": y - ASC_H - 5, "bottom": y + DESC_H + 5,
                "cells": [(num_xs[0], num_xs[1] - 6),
                          (num_xs[1], num_xs[2] - 6),
                          (num_xs[2], num_xs[3] - 6),
                          (num_xs[3], num_xs[3] + 90)]})
            y += LINE_PITCH
        y += 160 - LINE_PITCH   # inter-section row gap: 160 px
    pars.append({"lines": lines})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            "row_bands": bands}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": 2,
            "n_grid_cols": 4,
            "regions": [
                # 'weak': the lead paragraph splits into an all-text
                # multi-cell row, a Rule-1 candidate with < 4 aligned
                # anchors (the reference's detectHeaders does the same)
                {"table_n": 0, "method": "row-band", "n_cols": 4,
                 "header": "weak", "title": None},
                {"table_n": 1, "method": "row-band", "n_cols": 4,
                 "header": "weak", "title": None}],
            "num_cells": [], "hr_cells": []}


def _build_sibling_split_model(doc_id: int, seed: int) -> dict:
    """Phase-5.4 sibling-split doc (detectPdfTables.js:560-640): two
    banded sections sharing one zebra stripe set, each closing with a
    'Total ...' row, separated by a 110 px gap — wider than 2x the
    52 px row pitch (split trigger) yet inside the band region's
    vertical-contiguity tolerance and the Phase-2 run threshold, so a
    SINGLE adopted candidate splits into two sibling tables. Without
    the split the doc reports one 10-row table."""
    rng = _doc_rng(seed + 9393, doc_id)
    num_xs = [MARGIN_LEFT, MARGIN_LEFT + 450, MARGIN_LEFT + 600,
              MARGIN_LEFT + 750]

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    pars, expected, bands = [], [], []
    y = TOP_BASELINE
    lead = [_tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})

    y = 600
    lines = []
    for table_n in range(2):
        for r in range(5):
            label = "Total" if r == 4 else rng.choice(LEXICON)
            words = [_tok(label, num_xs[0], y)]
            expected.append({"table_n": table_n, "row_n": r,
                             "col_n": 0, "cell": label})
            for c in range(3):
                val = f"{(table_n + 1) * 10000 + (r + 1) * 100 + c}"
                words.append(_tok(val, num_xs[c + 1], y))
                expected.append({"table_n": table_n, "row_n": r,
                                 "col_n": c + 1, "cell": val})
            lines.append({"words": words, "baseline_y": y,
                          "indent": 0})
            bands.append({
                "top": y - ASC_H - 5, "bottom": y + DESC_H + 5,
                "cells": [(num_xs[0], num_xs[1] - 6),
                          (num_xs[1], num_xs[2] - 6),
                          (num_xs[2], num_xs[3] - 6),
                          (num_xs[3], num_xs[3] + 90)]})
            y += LINE_PITCH
        y += 110 - LINE_PITCH   # inter-section gap: 110 px row pitch
    pars.append({"lines": lines})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            "row_bands": bands}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": 2,
            "n_grid_cols": 4,
            "regions": [
                {"table_n": 0, "method": "row-band", "n_cols": 4,
                 "header": "none", "title": None},
                {"table_n": 1, "method": "row-band", "n_cols": 4,
                 "header": "none", "title": None}],
            "num_cells": [], "hr_cells": []}


def _build_rule_cluster_model(doc_id: int, seed: int) -> dict:
    """Phase-5.7 doc (refine_text_columns_from_rules,
    detectPdfTables.js:735-762): a label + two-numeric-column table
    whose numeric cells X-SCATTER row to row so word clustering merges
    them into one blob column (2 columns total), while a 2-segment
    disjoint rule cluster under the table carries the true column
    geometry — its gap midpoint plus a synthesized label separator
    give 3 columns. Without Phase 5.7 the doc reports 2 columns and
    the numeric cells collapse."""
    rng = _doc_rng(seed + 8282, doc_id)

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    pars, expected = [], []
    y = TOP_BASELINE
    lead = [_tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})

    yd = 700
    lines = []
    for r in range(5):
        label = rng.choice(LEXICON)
        n1 = f"{1000 + r}"            # 4 chars -> 60 px wide
        n2 = f"{2000 + r}"
        x1 = 520 + r * 25             # centers 550..650 (< sep 690)
        x2 = 665 + r * 5              # centers 695..715 (> sep 690)
        words = [_tok(label, MARGIN_LEFT, yd),
                 _tok(n1, x1, yd), _tok(n2, x2, yd)]
        expected.append({"table_n": 0, "row_n": r, "col_n": 0,
                         "cell": label})
        expected.append({"table_n": 0, "row_n": r, "col_n": 1,
                         "cell": n1})
        expected.append({"table_n": 0, "row_n": r, "col_n": 2,
                         "cell": n2})
        lines.append({"words": words, "baseline_y": yd, "indent": 0})
        yd += LINE_PITCH
    pars.append({"lines": lines})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            # two disjoint rules under the data: only 2 segments, so
            # the >= 3-segment header-rule detector stays silent and
            # Phase 5.7 is the only consumer
            # both rules stay within the table's x-span (+30): the
            # cluster gating rejects rules that overrun the bbox
            "rules": [{"left": 480, "right": 670, "y": yd - 20},
                      {"left": 700, "right": 745, "y": yd - 20}]}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected, "n_tables": 1,
            "n_grid_cols": 3,
            "regions": [{"table_n": 0, "method": "numeric",
                         "n_cols": 3, "header": "none",
                         "title": None}],
            "num_cells": [], "hr_cells": []}


def _build_phase2_table_model(doc_id: int, seed: int) -> dict:
    """Text-candidate engine docs (Phase 1/2/4): layouts only the full
    row-analysis pipeline detects —

    - 36: all-alpha 'text' table (>= 3-segment rows, zero numerics,
      min_rows=4 regime);
    - 37: two side-by-side tables whose same-y rows split into
      stream-consecutive sub-rows and then into separate candidates by
      x-overlap union-find;
    - 38: column-major stream order (each column its own paragraph;
      >= 3 pure-numeric singleton fragments accept the row) under a
      row-major header row;
    - 39: one table whose halves are separated by a narrow section
      header — the bridge rule keeps them one candidate;
    - 40: ruled grid whose header strip has FEWER verticals (header
      cells spanning data columns — the strict-subset asymmetry
      tryDetectStrictGrid allows);
    - 41: ruled grid with an unstroked label column to its left and a
      Total row below the bottom rule (extendTableToAdjacentContent
      left + bottom extensions);
    - 42: grid drawn as per-cell stroked rectangles (re S) — only the
      edge-decomposing extractGridSegments path sees its lines;
    - 43: numeric table under STACKED 2-cell header rows (the
      annual-report "As at / 31st March" pattern, detectHeaders
      Rule 2 — cross-row x-alignment makes the header strong);
    - 44: financial rows "label ....... $ 1,234 $ 567": leader-dot
      runs absorb into the label phrase and currency glyphs chain
      into their number (extractStructure cell merger) so neither
      forms a spurious column."""
    variant = doc_id - 36
    rng = _doc_rng(seed + 7171, doc_id)

    pars, expected, regions = [], [], []
    page_grids = None

    def tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    y = TOP_BASELINE
    lead = [tok(rng.choice(LEXICON), MARGIN_LEFT + i * 110, y)
            for i in range(5)]
    pars.append({"lines": [{"words": lead, "baseline_y": y,
                            "indent": 0}]})
    y = 680

    if variant == 0:
        # all-alpha text table: 5 rows x 4 cols, 5-char cells wide
        # enough to clear the tiny-fragment rejection (>= 70 px)
        xs = [MARGIN_LEFT + i * 200 for i in range(4)]
        lines = []
        for r in range(5):
            words = []
            for c in range(4):
                val = f"t{chr(97 + r)}{chr(97 + c)}xy"
                words.append(tok(val, xs[c] + 12, y))
                expected.append({"table_n": 0, "row_n": r, "col_n": c,
                                 "cell": val})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            y += LINE_PITCH
        pars.append({"lines": lines})
        regions.append({"table_n": 0, "method": "text", "n_cols": 4,
                        "header": "none", "title": None})
    elif variant == 1:
        # side-by-side: each table a separate paragraph (column-major
        # stream BETWEEN tables, row-major within), 5 rows of
        # label + 3 numbers per side
        for side, x0 in enumerate((MARGIN_LEFT, MARGIN_LEFT + 540)):
            yy = y
            lines = []
            for r in range(5):
                words = [tok(f"row{r:02d}{chr(97 + side)}", x0 + 12, yy)]
                row_cells = [words[0]["text"]]
                for c in range(3):
                    val = f"{(r + 1) * 1000 + c + side * 7:,}"
                    words.append(tok(val, x0 + 150 + c * 100, yy))
                    row_cells.append(val)
                for cn, cell in enumerate(row_cells):
                    expected.append({"table_n": side, "row_n": r,
                                     "col_n": cn, "cell": cell})
                lines.append({"words": words, "baseline_y": yy,
                              "indent": 0})
                yy += LINE_PITCH
            pars.append({"lines": lines})
            regions.append({"table_n": side, "method": "numeric",
                            "n_cols": 4, "header": "none",
                            "title": None})
    elif variant == 2:
        # column-major body under a row-major header row
        n_rows, col_xs = 6, [MARGIN_LEFT, 400, 600, 800]
        heads = []
        for c in range(4):
            h = f"hd{chr(97 + c)}xy"
            heads.append(tok(h, col_xs[c] + 12, y))
            expected.append({"table_n": 0, "row_n": 0, "col_n": c,
                             "cell": h})
        pars.append({"lines": [{"words": [w], "baseline_y": y,
                                "indent": 0} for w in heads]})
        body_y = y + LINE_PITCH
        for c in range(4):
            yy = body_y
            lines = []
            for r in range(n_rows):
                val = f"lab{r:02d}" if c == 0 \
                    else f"{(r + 1) * 100 + c:,}"
                lines.append({"words": [tok(val, col_xs[c] + 12, yy)],
                              "baseline_y": yy, "indent": 0})
                expected.append({"table_n": 0, "row_n": r + 1,
                                 "col_n": c, "cell": val})
                yy += LINE_PITCH
            pars.append({"lines": lines})
        y = body_y + n_rows * LINE_PITCH
        regions.append({"table_n": 0, "method": "numeric", "n_cols": 4,
                        "header": "none", "title": None})
    elif variant == 4:
        # spanning-header grid: the header strip's verticals are a
        # strict subset of the data columns
        n_rows, n_cols, col_w = 4, 4, 180
        xs = [MARGIN_LEFT + i * col_w for i in range(n_cols + 1)]
        head_y = y
        heads = ["h2007x", "h2008x"]
        pars.append({"lines": [{
            "words": [tok(heads[0], xs[0] + 12, head_y),
                      tok(heads[1], xs[2] + 12, head_y)],
            "baseline_y": head_y, "indent": 0}]})
        expected.extend([
            {"table_n": 0, "row_n": 0, "col_n": 0, "cell": heads[0]},
            {"table_n": 0, "row_n": 0, "col_n": 1, "cell": ""},
            {"table_n": 0, "row_n": 0, "col_n": 2, "cell": heads[1]},
            {"table_n": 0, "row_n": 0, "col_n": 3, "cell": ""}])
        head_top = head_y - ASC_H - 10
        data_top = head_y + DESC_H + 10
        y = head_y + LINE_PITCH
        row_ys = [data_top]
        lines = []
        for r in range(n_rows):
            words = []
            for c in range(n_cols):
                val = str(100 * (r + 1) + c)
                words.append(tok(val, xs[c] + 12, y))
                expected.append({"table_n": 0, "row_n": r + 1,
                                 "col_n": c, "cell": val})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            row_ys.append(y + DESC_H + 10)
            y += LINE_PITCH
        pars.append({"lines": lines})
        page_grids = [
            {"col_xs": [xs[0], xs[2], xs[4]],
             "row_ys": [head_top, data_top],
             "dashed": False, "segmented": False},
            {"col_xs": xs, "row_ys": row_ys,
             "dashed": False, "segmented": False}]
        regions.append({"table_n": 0, "method": "grid", "n_cols": 4,
                        "header": "none", "title": None})
    elif variant == 5:
        # grid over the numeric columns only; labels unstroked to the
        # left; 'Total' summary row below the bottom rule
        n_rows, n_cols, col_w = 4, 3, 180
        # the label-to-grid gap must exceed the line-split threshold:
        # a label merged with its first value into one stream line is
        # only 'row-overlap' evidence, which the reference (correctly)
        # refuses to confirm a label column from on its own
        gx0 = MARGIN_LEFT + 280
        xs = [gx0 + i * col_w for i in range(n_cols + 1)]
        row_ys = [y - ASC_H - 10]
        lines = []
        for r in range(n_rows):
            label = f"item{r:02d}"
            words = [tok(label, MARGIN_LEFT + 12, y)]
            expected.append({"table_n": 0, "row_n": r, "col_n": 0,
                             "cell": label})
            for c in range(n_cols):
                val = str(100 * (r + 1) + c)
                words.append(tok(val, xs[c] + 12, y))
                expected.append({"table_n": 0, "row_n": r,
                                 "col_n": c + 1, "cell": val})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            row_ys.append(y + DESC_H + 10)
            y += LINE_PITCH
        pars.append({"lines": lines})
        y += 20  # summary row 72 px below the last data baseline
        t_words = [tok("Total", MARGIN_LEFT + 12, y)]
        sums = [str(sum(100 * (r + 1) + c for r in range(n_rows)))
                for c in range(n_cols)]
        cells = ["Total"] + sums
        for c, val in enumerate(sums):
            t_words.append(tok(val, xs[c] + 12, y))
        for cn, cell in enumerate(cells):
            expected.append({"table_n": 0, "row_n": n_rows,
                             "col_n": cn, "cell": cell})
        pars.append({"lines": [{"words": t_words, "baseline_y": y,
                                "indent": 0}]})
        page_grids = [{"col_xs": xs, "row_ys": row_ys,
                       "dashed": False, "segmented": False}]
        regions.append({"table_n": 0, "method": "grid", "n_cols": 4,
                        "header": "none", "title": None})
    elif variant == 8:
        # currency + dot-leader rows
        dots = "." * 7
        lines = []
        for r in range(5):
            label = f"item{r:02d}"
            words = [tok(label, MARGIN_LEFT + 12, y),
                     tok(dots, 250, y),
                     tok("$", 500, y),
                     tok(f"{(r + 1) * 1000:,}", 540, y),
                     tok("$", 800, y),
                     tok(f"{(r + 1) * 500:,}", 840, y)]
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            cells = [f"{label} {dots}",
                     f"$ {(r + 1) * 1000:,}", f"$ {(r + 1) * 500:,}"]
            for cn, cell in enumerate(cells):
                expected.append({"table_n": 0, "row_n": r,
                                 "col_n": cn, "cell": cell})
            y += LINE_PITCH
        pars.append({"lines": lines})
        regions.append({"table_n": 0, "method": "numeric", "n_cols": 3,
                        "header": "none", "title": None})
    elif variant == 7:
        # stacked 2-cell header rows over label + 2 numeric columns
        num_x = (550, 850)
        heads = [("h2006x", "h2007x"), ("(Rs)xx", "(Rs)xx")]
        for hrow in heads:
            hl = [{"words": [tok(hrow[0], num_x[0] + 12, y)],
                   "baseline_y": y, "indent": 0},
                  {"words": [tok(hrow[1], num_x[1] + 12, y)],
                   "baseline_y": y, "indent": 0}]
            pars.append({"lines": hl})
            y += LINE_PITCH
        lines = []
        for r in range(5):
            label = f"item{r:02d}"
            row_words = [tok(label, MARGIN_LEFT + 12, y),
                         tok(f"{(r + 1) * 100:,}", num_x[0] + 12, y),
                         tok(f"{(r + 1) * 200:,}", num_x[1] + 12, y)]
            lines.append({"words": row_words, "baseline_y": y,
                          "indent": 0})
            y += LINE_PITCH
        pars.append({"lines": lines})
        for rn, hrow in enumerate(heads):
            expected.append({"table_n": 0, "row_n": rn, "col_n": 0,
                             "cell": ""})
            expected.append({"table_n": 0, "row_n": rn, "col_n": 1,
                             "cell": hrow[0]})
            expected.append({"table_n": 0, "row_n": rn, "col_n": 2,
                             "cell": hrow[1]})
        for r in range(5):
            expected.append({"table_n": 0, "row_n": r + 2, "col_n": 0,
                             "cell": f"item{r:02d}"})
            expected.append({"table_n": 0, "row_n": r + 2, "col_n": 1,
                             "cell": f"{(r + 1) * 100:,}"})
            expected.append({"table_n": 0, "row_n": r + 2, "col_n": 2,
                             "cell": f"{(r + 1) * 200:,}"})
        regions.append({"table_n": 0, "method": "numeric", "n_cols": 3,
                        "header": "strong", "title": None})
    elif variant == 6:
        # per-cell stroked-rectangle grid
        n_rows, n_cols, col_w = 4, 4, 180
        xs = [MARGIN_LEFT + i * col_w for i in range(n_cols + 1)]
        row_ys = [y - ASC_H - 10]
        lines = []
        for r in range(n_rows):
            words = []
            for c in range(n_cols):
                val = str(100 * (r + 1) + c)
                words.append(tok(val, xs[c] + 12, y))
                expected.append({"table_n": 0, "row_n": r,
                                 "col_n": c, "cell": val})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            row_ys.append(y + DESC_H + 10)
            y += LINE_PITCH
        pars.append({"lines": lines})
        page_grids = [{"col_xs": xs, "row_ys": row_ys,
                       "dashed": False, "segmented": False,
                       "cell_rects": True}]
        regions.append({"table_n": 0, "method": "grid", "n_cols": 4,
                        "header": "none", "title": None})
    else:
        # bridged: 4 + 4 numeric rows around a narrow section header;
        # direct gap > threshold but each bridged step stays under it
        xs0 = MARGIN_LEFT
        row_n = 0
        lines = []
        for r in range(4):
            words = [tok(f"row{r:02d}x", xs0 + 12, y)]
            cells = [words[0]["text"]]
            for c in range(3):
                val = f"{(r + 1) * 1000 + c:,}"
                words.append(tok(val, xs0 + 250 + c * 150, y))
                cells.append(val)
            for cn, cell in enumerate(cells):
                expected.append({"table_n": 0, "row_n": row_n,
                                 "col_n": cn, "cell": cell})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            row_n += 1
            y += LINE_PITCH
        y += 48  # section header 100 px below the last data row
        sect = tok("section", xs0 + 12, y)
        lines.append({"words": [sect], "baseline_y": y, "indent": 0})
        expected.append({"table_n": 0, "row_n": row_n, "col_n": 0,
                         "cell": "section"})
        for cn in range(1, 4):
            expected.append({"table_n": 0, "row_n": row_n,
                             "col_n": cn, "cell": ""})
        row_n += 1
        y += 100  # second step of the bridge, also under the threshold
        for r in range(4, 8):
            words = [tok(f"row{r:02d}x", xs0 + 12, y)]
            cells = [words[0]["text"]]
            for c in range(3):
                val = f"{(r + 1) * 1000 + c:,}"
                words.append(tok(val, xs0 + 250 + c * 150, y))
                cells.append(val)
            for cn, cell in enumerate(cells):
                expected.append({"table_n": 0, "row_n": row_n,
                                 "col_n": cn, "cell": cell})
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            row_n += 1
            y += LINE_PITCH
        pars.append({"lines": lines})
        regions.append({"table_n": 0, "method": "numeric", "n_cols": 4,
                        "header": "none", "title": None})

    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H}
    if page_grids:
        page["table_grids"] = page_grids
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected,
            "n_tables": len(regions), "n_grid_cols": 4,
            "regions": regions, "num_cells": [], "hr_cells": []}


def build_pdf_table_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """PDF table family: one ruled-grid table (drawn h/v rule lines,
    numeric cells at 100*(row+1)+col) and, on odd docs, a borderless
    right-clustered-numeric block, embedded between text paragraphs.
    Variants: doc_id %6==2 draws the grid dashed
    (reconstituteDashedLines), %6==5 draws it as per-cell border
    segments with no verticals (detectSegmentedHLineTables), %6==4
    stacks a second 3x3 grid below the first (connected-component
    multi-table), %3==0 puts a 'Table 1 <word>' caption line above the
    grid (detectTableTitle); doc_id 30-35 are the row-band (zebra)
    docs (extractRowBandStructure); doc_id 36-39 are the Phase-1/2
    text-candidate docs (text table / side-by-side / column-major /
    bridged)."""
    if 30 <= doc_id < 36:
        return _build_zebra_table_model(doc_id, seed)
    if doc_id >= 53:
        return _build_vline_columns_model(doc_id, seed)
    if doc_id >= 52:
        return _build_multi_region_model(doc_id, seed)
    if doc_id >= 51:
        return _build_sibling_split_model(doc_id, seed)
    if doc_id >= 50:
        return _build_rule_cluster_model(doc_id, seed)
    if doc_id >= 45:
        return _build_refine_top_model(doc_id, seed)
    if doc_id >= 36:
        return _build_phase2_table_model(doc_id, seed)
    rng = _doc_rng(seed + 5151, doc_id)
    n_rows = rng.randint(3, 6)
    n_cols = rng.randint(3, 5)
    segmented = doc_id % 6 == 5
    second_grid = doc_id % 6 == 4
    col_w = 180
    xs = [MARGIN_LEFT + i * col_w for i in range(n_cols + 1)]

    pars, expected, y = [], [], TOP_BASELINE
    # leading text paragraph
    lead = [{"text": rng.choice(LEXICON), "chars": None,
             "out_words": None, "left": MARGIN_LEFT + i * 110,
             "right": MARGIN_LEFT + i * 110 + 90,
             "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}
            for i in range(5)]
    for w in lead:
        w["out_words"] = [w["text"]]
    pars.append({"lines": [{"words": lead, "baseline_y": y, "indent": 0}]})
    y += PAR_GAP

    title_text = None
    if doc_id % 3 == 0:
        # caption line just above the grid (Phase-5.55 title scan)
        tword = rng.choice(LEXICON)
        title_text = f"Table 1 {tword}"
        tx, twords = MARGIN_LEFT, []
        for t in ("Table", "1", tword):
            twords.append({
                "text": t, "chars": None, "out_words": [t],
                "left": tx, "right": tx + len(t) * CHAR_W,
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
            tx += len(t) * CHAR_W + 10
        pars.append({"lines": [{"words": twords, "baseline_y": y,
                                "indent": 0}]})
        # extra clearance: the grid bbox extends 5 px above its top
        # rule (tryDetectStrictGrid :2369), and a caption overlapping
        # that margin is (correctly) not fully above the table
        y += LINE_PITCH + 12

    # ruled grid: row baselines inside bands bounded by rule ys
    grid_top = y - ASC_H - 10
    row_ys = [grid_top]
    lines = []
    for r in range(n_rows):
        words = []
        for c in range(n_cols):
            val = str(100 * (r + 1) + c)
            x = xs[c] + 12
            words.append({
                "text": val, "chars": None, "out_words": [val],
                "left": x, "right": x + len(val) * CHAR_W,
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
            expected.append({"table_n": 0, "row_n": r, "col_n": c,
                             "cell": val})
        lines.append({"words": words, "baseline_y": y, "indent": 0})
        row_ys.append(y + DESC_H + 10)
        y += LINE_PITCH
    pars.append({"lines": lines})
    y += PAR_GAP

    # segmented tables rule BELOW each row (no top border): the
    # detector's 1.5-row-height top extension then reaches exactly the
    # first data row, not the prose above the table
    page = {"pars": pars, "width": PAGE_W, "height": PAGE_H,
            "table_grids": [{"col_xs": xs,
                             "row_ys": row_ys[1:] if segmented
                             else row_ys,
                             "dashed": doc_id % 6 == 2,
                             "segmented": segmented}]}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    n_tables = 1
    regions = [{"table_n": 0,
                "method": "segmented-hline" if segmented else "grid",
                "n_cols": n_cols, "header": "none",
                "title": title_text}]
    num_cells = []

    if second_grid:
        # stacked second grid: its rules form a separate connected
        # component -> a second "grid" table on the same page
        g2_rows, g2_cols = 3, 3
        xs2 = [MARGIN_LEFT + i * col_w for i in range(g2_cols + 1)]
        g2_top = y - ASC_H - 10
        row_ys2 = [g2_top]
        lines2 = []
        for r in range(g2_rows):
            words = []
            for c in range(g2_cols):
                val = str(500 + 100 * (r + 1) + c)
                x = xs2[c] + 12
                words.append({
                    "text": val, "chars": None, "out_words": [val],
                    "left": x, "right": x + len(val) * CHAR_W,
                    "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
                expected.append({"table_n": 1, "row_n": r, "col_n": c,
                                 "cell": val})
            lines2.append({"words": words, "baseline_y": y, "indent": 0})
            row_ys2.append(y + DESC_H + 10)
            y += LINE_PITCH
        pars.append({"lines": lines2})
        y += PAR_GAP
        page["table_grids"].append(
            {"col_xs": xs2, "row_ys": row_ys2, "dashed": False,
             "segmented": False})
        n_tables = 2
        regions.append({"table_n": 1, "method": "grid",
                        "n_cols": g2_cols, "header": "none",
                        "title": None})

    def _tok(text, x, yy):
        return {"text": text, "chars": None, "out_words": [text],
                "left": x, "right": x + len(text) * CHAR_W,
                "top": yy - ASC_H, "bottom": yy + DESC_H, "conf": 97}

    if doc_id % 2 == 1:
        with_header = doc_id % 4 == 1
        num_xs = [MARGIN_LEFT] + [MARGIN_LEFT + 450 + c * 150
                                  for c in range(3)]
        # Keep the block's first row below the header-scan lookback
        # horizon (10 row pitches) of the leading paragraph, so the
        # detector's verdict never depends on the grid's row count.
        y = max(y, 731)
        if with_header:
            # title row (single short cell) + 4-cell header row — the
            # detectHeaders walk must extend the table band over both
            title = rng.choice(LEXICON)
            pars.append({"lines": [{
                "words": [_tok(title, MARGIN_LEFT, y)],
                "baseline_y": y, "indent": 0}]})
            num_cells.append([title, "", "", ""])
            y += LINE_PITCH
            heads = [rng.choice(LEXICON) for _ in range(4)]
            pars.append({"lines": [{
                "words": [_tok(h, num_xs[i], y)
                          for i, h in enumerate(heads)],
                "baseline_y": y, "indent": 0}]})
            num_cells.append(heads)
            y += LINE_PITCH
        # borderless financial block: label + 3 numeric columns
        blines = []
        for r in range(4):
            label = rng.choice(LEXICON)
            words = [_tok(label, num_xs[0], y)]
            row_cells = [label]
            for c in range(3):
                val = f"{(r + 1) * 1000 + c * 7},{100 + r}"
                words.append(_tok(val, num_xs[c + 1], y))
                row_cells.append(val)
            num_cells.append(row_cells)
            blines.append({"words": words, "baseline_y": y, "indent": 0})
            y += LINE_PITCH
        pars.append({"lines": blines})
        n_tables = 2
        regions.append({
            "table_n": 1, "method": "numeric", "n_cols": 4,
            "header": "strong" if with_header else "none",
            "title": None})

    hr_cells = []
    if doc_id % 4 == 3:
        # header-rule table (detectHeaderRuleTables): a header row above
        # a ruling row of 4 disjoint rule segments, then 6 data rows of
        # label + 3 numeric columns. No grid verticals anywhere.
        hr_xs = [MARGIN_LEFT, MARGIN_LEFT + 260, MARGIN_LEFT + 420,
                 MARGIN_LEFT + 580]
        hr_ws = [240, 140, 140, 140]
        # far enough below the numeric block that the Phase-2 run
        # threshold (3x median row spacing) separates the two tables —
        # closer and the reference's own row grouping would merge them
        # into one candidate that the header-rule table then replaces
        yh = 1060
        heads = [rng.choice(LEXICON) for _ in range(4)]
        pars.append({"lines": [{
            "words": [_tok(h, hr_xs[i] + 12, yh)
                      for i, h in enumerate(heads)],
            "baseline_y": yh, "indent": 0}]})
        hr_cells.append(heads)
        y_rule = yh + DESC_H + 6
        page_rules = [{"left": hr_xs[i], "right": hr_xs[i] + hr_ws[i],
                       "y": y_rule} for i in range(4)]
        yd = y_rule + 40
        dlines = []
        for r in range(6):
            label = rng.choice(LEXICON)
            words = [_tok(label, hr_xs[0] + 12, yd)]
            row_cells = [label]
            for c in range(3):
                val = f"{(r + 2) * 500 + c * 3},{200 + r}"
                words.append(_tok(val, hr_xs[c + 1] + 12, yd))
                row_cells.append(val)
            hr_cells.append(row_cells)
            dlines.append({"words": words, "baseline_y": yd, "indent": 0})
            yd += LINE_PITCH
        pars.append({"lines": dlines})
        page.setdefault("rules", []).extend(page_rules)
        n_tables += 1
        regions.append({
            "table_n": n_tables - 1, "method": "header-rule",
            "n_cols": 4, "header": "none", "title": None})
    return {"model": model, "expected": expected, "n_tables": n_tables,
            "n_grid_cols": n_cols, "regions": regions,
            "num_cells": num_cells, "hr_cells": hr_cells}


def write_pdf_table_parquet(path: str, n_docs: int = 54,
                            seed: int = SEED_DEFAULT) -> None:
    """pdf_table_docs.parquet (url, html) + pdf_table.parquet golden
    grid cells + pdf_table_meta.parquet (url, n_tables)."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, cell_rows, region_rows = [], [], []
    for doc_id in range(n_docs):
        m = build_pdf_table_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_table/{doc_id:08d}"
        # Cycle content-stream filters: every 5th doc LZW-compressed,
        # every 5th+1 RunLength — exercising the pre-Flate-era filters
        # against the same golden cells.
        sf = {0: "lzw", 1: "rle"}.get(doc_id % 5)
        doc_rows.append({
            "url": url,
            "html": _render(m["model"], rotate=False, stream_filter=sf)})
        for rec in m["expected"]:
            cell_rows.append({"url": url, **rec})
        for r, row in enumerate(m["num_cells"]):
            for c, cell in enumerate(row):
                cell_rows.append({"url": url, "table_n": 1,
                                  "row_n": r, "col_n": c, "cell": cell})
        for r, row in enumerate(m.get("hr_cells") or []):
            for c, cell in enumerate(row):
                cell_rows.append({"url": url,
                                  "table_n": m["n_tables"] - 1,
                                  "row_n": r, "col_n": c, "cell": cell})
        for rec in m["regions"]:
            region_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "pdf_table_docs.parquet"), index=False)
    pd.DataFrame(cell_rows).to_parquet(
        os.path.join(path, "pdf_table.parquet"), index=False)
    pd.DataFrame(region_rows).to_parquet(
        os.path.join(path, "pdf_table_regions.parquet"), index=False)


def write_imagedup_parquet(path: str, n_groups: int = 10,
                           n_unrelated: int = 10,
                           n_mono: int = 12) -> None:
    """imagedup_docs.parquet (media_id, data) + imagedup_pairs.parquet
    golden (id_a, id_b) for the image near-dup oracle.

    Construction (the golden pair set is hand-derived, not computed):
    each group g carries three renditions of one photo — PNG, lossy
    JPEG re-encode, 2x-upscale PNG (ids 10g, 10g+1, 10g+2) — so every
    within-group pair is a near-dup; unrelated photos (ids 500+u) pair
    with nothing; ``n_mono`` identical monochrome images (ids 900+)
    collapse to one pHash and are dropped by the hot-bucket cap
    (max_bucket_size=8 < n_mono); one corrupt blob (id 999) must land
    in the error path without pairs. Generation ASSERTS the perceptual
    separation (within-group Hamming <= 3, cross-source > 3) so the
    golden stays valid if the photo generator changes."""
    import os

    import numpy as np
    import pandas as pd

    from .textops.imagehash import phash64_pixels
    from .textops.jpeg import encode_jpeg_gray
    from .textops.multimodal import encode_png_gray

    def photo(seed, h=64, w=96):
        rng = np.random.RandomState(seed)
        base = rng.rand(6, 8)
        ys = np.linspace(0, 5, h)
        xs = np.linspace(0, 7, w)
        yi = np.clip(ys.astype(int), 0, 4)
        xi = np.clip(xs.astype(int), 0, 6)
        fy = (ys - yi)[:, None]
        fx = (xs - xi)[None, :]
        a = (base[yi][:, xi] * (1 - fy) * (1 - fx)
             + base[yi + 1][:, xi] * fy * (1 - fx)
             + base[yi][:, xi + 1] * (1 - fy) * fx
             + base[yi + 1][:, xi + 1] * fy * fx)
        return (a * 255).astype(np.uint8)

    def ham(a, b):
        return bin(a ^ b).count("1")

    rows, pairs, hashes = [], [], {}
    for g in range(n_groups):
        img = photo(1000 + 37 * g)
        up = np.repeat(np.repeat(img, 2, 0), 2, 1)
        variants = [encode_png_gray(img), encode_jpeg_gray(img),
                    encode_png_gray(up)]
        hs = [phash64_pixels(img),
              phash64_pixels(__import__(
                  "scribe_js_spark.textops.jpeg", fromlist=["decode_jpeg"]
              ).decode_jpeg(variants[1])),
              phash64_pixels(up)]
        for i in range(3):
            for j in range(i + 1, 3):
                assert ham(hs[i], hs[j]) <= 3, (g, i, j)
        hashes[g] = hs[0]
        for i, data in enumerate(variants):
            rows.append({"media_id": 10 * g + i, "data": data})
        for i in range(3):
            for j in range(i + 1, 3):
                pairs.append({"id_a": 10 * g + i, "id_b": 10 * g + j})
    for u in range(n_unrelated):
        img = photo(5000 + 101 * u)
        hashes[f"u{u}"] = phash64_pixels(img)
        rows.append({"media_id": 500 + u, "data": encode_png_gray(img)})
    keys = list(hashes)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            assert ham(hashes[ka], hashes[kb]) > 3, (ka, kb)
    mono = np.full((32, 32), 128, dtype=np.uint8)
    for k in range(n_mono):
        rows.append({"media_id": 900 + k, "data": encode_png_gray(mono)})
    rows.append({"media_id": 999, "data": b"not an image"})
    pd.DataFrame(rows).to_parquet(
        os.path.join(path, "imagedup_docs.parquet"), index=False)
    pd.DataFrame(sorted(pairs, key=lambda p: (p["id_a"], p["id_b"])))\
        .to_parquet(os.path.join(path, "imagedup_pairs.parquet"),
                    index=False)


def build_groupx_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """PDF grouping-rule family (the groupCharsIntoPage deferred rules):
    per line one scenario —
    - orphan_quote: a same-size curly quote emitted at stream end is
      merged back into its word (orphan case a);
    - dropcap:     an oversized top-aligned capital emitted at stream
      end merges (case b) and becomes a dropcap word;
    - ref_marker:  a reduced-size trailing digit emitted at stream end
      reattaches to its host line and flags superscript;
    - smallcaps:   mixed-size all-uppercase words become smallCaps with
      the large-char size, extending over the following word;
    - styleruns:   a bold word with a regular trailing period keeps one
      word and records a styleRun delta."""
    rng = _doc_rng(seed + 77001, doc_id)
    FONT_SIZE_PDF = 30  # render_pdf.FONT_SIZE (import cycle avoided)
    asc = 0.718
    y = TOP_BASELINE
    lines, expected = [], []

    def _w(text, left, width, **kw):
        d = {"text": text, "chars": None, "out_words": [text],
             "left": left, "right": left + width,
             "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}
        d.update(kw)
        return d

    def _exp(line_n, word_n, text, sup=False, dropcap=False,
             small_caps=False, bold=False, n_runs=0):
        expected.append({
            "line_n": line_n, "word_n": word_n, "text": text,
            "sup": sup, "dropcap": dropcap, "smallCaps": small_caps,
            "bold": bold, "n_style_runs": n_runs})

    # line 0: orphan same-size quote
    tok, tok2 = rng.choice(LEXICON), rng.choice(LEXICON)
    w1 = _w(tok, MARGIN_LEFT, len(tok) * CHAR_W)
    quote = _w("”", w1["right"], CHAR_W, deferred=True,
               segments=[{"text": "”", "fs": FONT_SIZE_PDF}])
    w2 = _w(tok2, w1["right"] + CHAR_W + 10, len(tok2) * CHAR_W)
    lines.append({"words": [w1, quote, w2], "baseline_y": y, "indent": 0})
    _exp(0, 0, tok + "”")
    _exp(0, 1, tok2)
    y += LINE_PITCH

    # line 1: drop cap
    dc_fs = 75
    dc = _w("T", MARGIN_LEFT, 0.5 * dc_fs, deferred=True,
            segments=[{"text": "T", "fs": dc_fs}],
            baseline_y=y + asc * (dc_fs - FONT_SIZE_PDF))
    he = _w("he", MARGIN_LEFT + 0.5 * dc_fs, 2 * CHAR_W)
    tok3 = rng.choice(LEXICON)
    w3 = _w(tok3, he["right"] + 10, len(tok3) * CHAR_W)
    lines.append({"words": [dc, he, w3], "baseline_y": y, "indent": 0})
    _exp(1, 0, "T", dropcap=True)
    _exp(1, 1, "he")
    _exp(1, 2, tok3)
    y += 2 * LINE_PITCH  # dropcap glyph dips into the band below

    # line 2: out-of-order reference marker
    t1, t2 = rng.choice(LEXICON), rng.choice(LEXICON)
    m1 = _w(t1, MARGIN_LEFT, len(t1) * CHAR_W)
    m2 = _w(t2, m1["right"] + 10, len(t2) * CHAR_W)
    marker = _w("7", m2["right"] + 2, 0.5 * 18, deferred=True,
                segments=[{"text": "7", "fs": 18}], baseline_y=y - 12)
    lines.append({"words": [m1, m2, marker], "baseline_y": y, "indent": 0})
    _exp(2, 0, t1)
    _exp(2, 1, t2)
    _exp(2, 2, "7", sup=True)
    y += LINE_PITCH

    # line 3: fake small caps
    sc1 = _w("SMALL", MARGIN_LEFT, 15 + 4 * 11,
             segments=[{"text": "S", "fs": FONT_SIZE_PDF},
                       {"text": "MALL", "fs": 22}])
    sc2 = _w("CAPS", sc1["right"] + 10, 4 * 11,
             segments=[{"text": "CAPS", "fs": 22}])
    tok5 = rng.choice(LEXICON)
    sc3 = _w(tok5, sc2["right"] + 10, len(tok5) * CHAR_W)
    lines.append({"words": [sc1, sc2, sc3], "baseline_y": y, "indent": 0})
    _exp(3, 0, "SMALL", small_caps=True)
    _exp(3, 1, "CAPS", small_caps=True)
    _exp(3, 2, tok5)
    y += LINE_PITCH

    # line 4: style runs (bold word, regular trailing period)
    br = _w("bold.", MARGIN_LEFT, 5 * CHAR_W,
            segments=[{"text": "bold", "fs": FONT_SIZE_PDF, "bold": True},
                      {"text": ".", "fs": FONT_SIZE_PDF}])
    tok6 = rng.choice(LEXICON)
    w6 = _w(tok6, br["right"] + 10, len(tok6) * CHAR_W)
    lines.append({"words": [br, w6], "baseline_y": y, "indent": 0})
    _exp(4, 0, "bold.", bold=True, n_runs=1)
    _exp(4, 1, tok6)

    model = {"doc_id": doc_id, "family": "base", "use_bold_font": True,
             "pages": [{"pars": [{"lines": lines}],
                        "width": PAGE_W, "height": PAGE_H}]}
    return {"model": model, "expected": expected}


def write_groupx_parquet(path: str, n_docs: int = 30,
                         seed: int = SEED_DEFAULT) -> None:
    """groupx_docs.parquet (url, html PDF bytes) + groupx.parquet golden
    word rows for the pdf_group_rules oracle."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_groupx_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_groupx/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": _render(m["model"], tj_mode=False, rotate=False,
                            ligatures=False, cid_font=False)})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "groupx_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "groupx.parquet"), index=False)


def build_ocrsel_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """OCR-page-selection family: a 5-page PDF mixing page classes —
    (0) plain body text, (1) full-page scan, (2) scan + invisible OCR
    layer, (3) text + mid-size figure image, (4) text + a broken-
    ToUnicode-font run — with the expected selectOcrPages masks for
    the autoShallow and autoDeep scopes."""
    rng = _doc_rng(seed + 60601, doc_id)

    def _text_page(n_pars=4, broken_word=False):
        pars = []
        y = TOP_BASELINE + LINE_PITCH  # keep lines inside the body band
        for _ in range(n_pars):
            lines = []
            for _ in range(rng.randint(2, 4)):
                words, x = [], MARGIN_LEFT
                for _ in range(rng.randint(5, 8)):
                    tok = rng.choice(LEXICON)
                    words.append({
                        "text": tok, "chars": None, "out_words": [tok],
                        "left": x, "right": x + len(tok) * CHAR_W,
                        "top": y - ASC_H, "bottom": y + DESC_H,
                        "conf": 97})
                    x += len(tok) * CHAR_W + WORD_GAP
                lines.append({"words": words, "baseline_y": y,
                              "indent": 0})
                y += LINE_PITCH
            pars.append({"lines": lines})
            y += PAR_GAP - LINE_PITCH
        page = {"pars": pars, "width": PAGE_W, "height": PAGE_H}
        if broken_word:
            # three consecutive /F3 glyphs -> longestBrokenRun >= 3
            bw = {"text": "abc", "chars": None, "out_words": ["abc"],
                  "left": MARGIN_LEFT, "right": MARGIN_LEFT + 45,
                  "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97,
                  "segments": [{"text": "abc", "fs": 30,
                                "fkey": "/F3"}]}
            page["pars"].append({"lines": [{
                "words": [bw], "baseline_y": y, "indent": 0}]})
            page["broken_font"] = True
        return page

    p0 = _text_page()
    p1 = {"pars": [], "width": PAGE_W, "height": PAGE_H,
          "scan_image": 1.0}
    p2 = _text_page(n_pars=3)
    p2["scan_image"] = 1.0
    p2["invisible_text"] = True
    p3 = _text_page()
    p3["scan_image"] = (0.6, 0.6)  # mid-size figure, frac 0.36
    p4 = _text_page(broken_word=True)

    def _type3_word(fkey, text, y):
        return {"text": text, "chars": None, "out_words": [text],
                "left": MARGIN_LEFT,
                "right": MARGIN_LEFT + 15 * len(text),
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97,
                "segments": [{"text": text, "fs": 30, "fkey": fkey}]}

    # p5: five consecutive chars in the Type3 FILLER font /F6 — four
    # PUA-mapped codes share one stamped CharProc, so the filler
    # discount (parsePdfDoc.js:523-534) keeps the font clean and the
    # broken-run gate must stay False. p6: three chars in /F7, three
    # distinct PUA-mapped outlines -> genuinely broken.
    p5 = _text_page()
    y5 = PAGE_H - 260
    p5["pars"].append({"lines": [{
        "words": [_type3_word("/F6", "abcde", y5)],
        "baseline_y": y5, "indent": 0}]})
    p5["type3_font"] = True
    p6 = _text_page()
    p6["pars"].append({"lines": [{
        "words": [_type3_word("/F7", "abc", y5)],
        "baseline_y": y5, "indent": 0}]})
    p6["type3_font"] = True

    model = {"doc_id": doc_id, "family": "base",
             "pages": [p0, p1, p2, p3, p4, p5, p6]}
    # gates: doc classifies 'text' (5 of 7 pages vote text), so
    # per-page selection applies
    expected = [
        # page, shallow, deep, scan, ocr_layer, baked, broken
        # (a full-page image also satisfies may_have_baked; the
        # invisible layer does not count as readable, so page 2 is
        # still a scan page)
        (0, False, False, False, False, False, False),
        (1, True, True, True, False, True, False),
        (2, True, True, True, True, True, False),
        (3, False, True, False, False, True, False),
        (4, False, True, False, False, False, True),
        (5, False, False, False, False, False, False),
        (6, False, True, False, False, False, True),
    ]
    return {"model": model, "expected": expected}


def write_ocrsel_parquet(path: str, n_docs: int = 25,
                         seed: int = SEED_DEFAULT) -> None:
    """ocrsel_docs.parquet (url, html) + ocrsel.parquet golden per-page
    gate values and selection masks."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_ocrsel_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_ocrsel/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": _render(m["model"], rotate=False, tj_mode=False,
                            ligatures=False, cid_font=False)})
        for (pn, sh, dp, scan, layer, baked, broken) in m["expected"]:
            golden_rows.append({
                "url": url, "page_n": pn, "ocr_shallow": sh,
                "ocr_deep": dp, "is_scan": scan, "has_ocr_layer": layer,
                "may_have_baked": baked, "has_broken_run": broken})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "ocrsel_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "ocrsel.parquet"), index=False)


def build_linenum_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Transcript-style layout family: a left-margin line-number column
    (1..N per page, recurring at one x across all pages), full-width
    body paragraphs, and a both-side-inset block quote per page."""
    rng = _doc_rng(seed + 424242, doc_id)
    right_m = PAGE_W - MARGIN_LEFT
    pages, expected = [], []
    for page_n in range(3):
        pars = []

        def _word(text, left, right, y):
            return {"text": text, "chars": None, "out_words": [text],
                    "left": left, "right": right,
                    "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}

        # line-number column: 1..12 at x=40, standard pitch
        num_lines = []
        y = TOP_BASELINE
        for i in range(1, 13):
            t = str(i)
            num_lines.append({
                "words": [_word(t, 40, 40 + len(t) * CHAR_W, y)],
                "baseline_y": y, "indent": 0})
            y += LINE_PITCH
        pars.append({"lines": num_lines, "type": "linenum"})

        def _text_par(n_lines, left, right, y0, ptype):
            lines = []
            yy = y0
            for _ in range(n_lines):
                words, x = [], left
                while True:
                    tok = rng.choice(LEXICON)
                    wdt = len(tok) * CHAR_W
                    if x + wdt > right - 80:
                        break
                    words.append(_word(tok, x, x + wdt, yy))
                    x += wdt + WORD_GAP
                # stretch the final word box to the right margin so the
                # line reads as justified (box widths are authored)
                words[-1]["right"] = right
                lines.append({"words": words, "baseline_y": yy,
                              "indent": 0})
                yy += LINE_PITCH
            pars.append({"lines": lines, "type": ptype})
            return yy

        y2 = _text_par(4, MARGIN_LEFT, right_m, TOP_BASELINE, "body")
        y2 += PAR_GAP - LINE_PITCH
        y2 = _text_par(3, MARGIN_LEFT + 60, right_m - 60, y2, "blockquote")
        y2 += PAR_GAP - LINE_PITCH
        _text_par(3, MARGIN_LEFT, right_m, y2, "body")

        pages.append({"pars": pars, "width": PAGE_W, "height": PAGE_H})
        for par_i, par in enumerate(pages[-1]["pars"]):
            expected.append({"page_n": page_n, "par_n": par_i,
                             "par_type": par["type"]})
    model = {"doc_id": doc_id, "family": "base", "pages": pages}
    return {"model": model, "expected": expected}


def write_linenum_parquet(path: str, n_docs: int = 25,
                          seed: int = SEED_DEFAULT) -> None:
    """linenum_docs.parquet (url, hOCR bytes) + linenum.parquet golden
    paragraph roles for the layout_roles2 oracle."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_linenum_models(doc_id, seed=seed)
        url = f"https://fixtures.test/hocr_linenum/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_hocr(m["model"]).encode("utf-8")})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "linenum_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "linenum.parquet"), index=False)


def build_abbyy_table_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """ABBYY table-layout family: one ``blockType="Table"`` block with
    numeric cells. Even docs carry correct cell widths (first-row-width
    column path); odd docs carry deliberately wrong widths so the
    content-coordinate recalculation path must rebuild the columns."""
    rng = _doc_rng(seed + 86420, doc_id)
    n_rows = rng.randint(3, 6)
    n_cols = rng.randint(3, 4)
    col_w = 180
    tl = MARGIN_LEFT
    tt = TOP_BASELINE + LINE_PITCH - ASC_H - 10
    tr = tl + n_cols * col_w
    bad_widths = doc_id % 2 == 1

    lead_tok = rng.choice(LEXICON)
    lead_par = {"lines": [{"words": [{
        "text": lead_tok, "chars": None, "out_words": [lead_tok],
        "left": MARGIN_LEFT, "right": MARGIN_LEFT + len(lead_tok) * CHAR_W,
        "top": TOP_BASELINE - ASC_H, "bottom": TOP_BASELINE + DESC_H,
        "conf": 97}], "baseline_y": TOP_BASELINE, "indent": 0}]}

    rows, expected = [], []
    y = TOP_BASELINE + 2 * LINE_PITCH
    for r in range(n_rows):
        row = []
        for c in range(n_cols):
            val = str(100 * (r + 1) + c)
            left = tl + c * col_w + 12
            row.append({
                "text": val, "left": left,
                "right": left + len(val) * CHAR_W,
                "baseline_y": y,
                "width": (col_w - 40) if bad_widths else col_w})
            expected.append({"table_n": 0, "row_n": r, "col_n": c,
                             "cell": val})
        rows.append(row)
        y += LINE_PITCH
    tb = y - LINE_PITCH + DESC_H + 10

    page = {"pars": [lead_par], "width": PAGE_W, "height": PAGE_H,
            "abbyy_tables": [{"l": tl, "t": tt, "r": tr, "b": tb,
                              "rows": rows}]}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected,
            "bad_widths": bad_widths, "n_cols": n_cols}


def build_azure_table_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Azure DocIntel table-layout family: ``analyzeResult.tables``
    with polygon cells (convertTableLayoutAzure semantics). Even docs
    carry a plain grid; odd docs a first-row cell spanning two columns,
    which per the reference collapses those columns into one wide
    column box whose body cells merge. Cell (1, 1) is left empty
    everywhere to exercise empty-cell output."""
    rng = _doc_rng(seed + 97531, doc_id)
    n_rows = rng.randint(3, 6)
    n_cols = rng.randint(3, 4)
    col_w = 180
    tl = MARGIN_LEFT
    span_first = doc_id % 2 == 1

    lead_tok = rng.choice(LEXICON)
    lead_par = {"lines": [{"words": [{
        "text": lead_tok, "chars": None, "out_words": [lead_tok],
        "left": MARGIN_LEFT, "right": MARGIN_LEFT + len(lead_tok) * CHAR_W,
        "top": TOP_BASELINE - ASC_H, "bottom": TOP_BASELINE + DESC_H,
        "conf": 97}], "baseline_y": TOP_BASELINE, "indent": 0}]}

    def cell_box(r_i, c_i, c_span=1):
        y = TOP_BASELINE + (2 + r_i) * LINE_PITCH
        return (tl + c_i * col_w, y - ASC_H - 4,
                tl + (c_i + c_span) * col_w, y + DESC_H + 4)

    cells = []          # azure_tables cell records
    table_pars = []     # one par per table row (page words/lines)
    values: dict = {}   # (model_row, model_col) -> text
    for r in range(n_rows):
        y = TOP_BASELINE + (2 + r) * LINE_PITCH
        words = []
        for c in range(n_cols):
            if r == 1 and c == 1:
                cells.append({"row": r, "col": c, "content": "",
                              "box": cell_box(r, c)})
                continue
            if span_first and r == 0:
                if c == 0:
                    val = "HDR"
                    cells.append({"row": 0, "col": 0, "span": 2,
                                  "content": val,
                                  "box": cell_box(0, 0, 2)})
                elif c == 1:
                    continue  # covered by the span
                else:
                    val = str(100 + c)
                    cells.append({"row": 0, "col": c, "content": val,
                                  "box": cell_box(0, c)})
            else:
                val = str(100 * (r + 1) + c)
                cells.append({"row": r, "col": c, "content": val,
                              "box": cell_box(r, c)})
            left = tl + c * col_w + 12
            words.append({
                "text": val, "chars": None, "out_words": [val],
                "left": left, "right": left + len(val) * CHAR_W,
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 96,
                "quoted": False, "token": None})
            values[(r, c)] = val
        table_pars.append({"lines": [{"words": words, "baseline_y": y,
                                      "indent": 0}]})

    # Expected cells by the reference rule: column boxes are the first
    # row's cell polygons; words fall into the box holding their
    # midpoint, rows split at each row's max cell bottom.
    col_boxes = [(c["box"][0], c["box"][2])
                 for c in sorted((c for c in cells if c["row"] == 0),
                                 key=lambda c: c["col"])]
    expected = []
    for r in range(n_rows):
        for j, (bl, br) in enumerate(col_boxes):
            texts = []
            for c in range(n_cols):
                if (r, c) not in values:
                    continue
                left = tl + c * col_w + 12
                cx = left + len(values[(r, c)]) * CHAR_W / 2
                if bl <= cx < br:
                    texts.append(values[(r, c)])
            expected.append({"table_n": 0, "row_n": r, "col_n": j,
                             "cell": " ".join(texts)})

    page = {"pars": [lead_par] + table_pars,
            "width": PAGE_W, "height": PAGE_H,
            "azure_tables": [{
                "row_count": n_rows, "col_count": n_cols,
                "cells": cells}]}
    model = {"doc_id": doc_id, "family": "base", "pages": [page]}
    return {"model": model, "expected": expected}


def write_abbyy_table_parquet(path: str, n_docs: int = 30,
                              seed: int = SEED_DEFAULT) -> None:
    """abbyy_table_docs.parquet (url, ABBYY XML or Azure JSON bytes) +
    abbyy_table.parquet golden cells — the explicit-table-layout
    family (ABBYY blockType="Table" docs plus Azure
    analyzeResult.tables docs). Each golden row carries
    ``xlsx_rt_md5``: the canonical digest of the EXPECTED cell
    matrices, computed directly from the hand-derived cells — never by
    running the XLSX writer — so the driver row proves
    read(write(matrices)) == expected."""
    import os

    import pandas as pd

    from .export.xlsx import matrices_digest
    from .render_cloud import render_azure_docintel

    def _expected_digest(recs) -> str:
        tables: dict = {}
        for rec in recs:
            tables.setdefault(rec["table_n"], {}) \
                .setdefault(rec["row_n"], {})[rec["col_n"]] = rec["cell"]
        mats = [[[rows[rn][cn] for cn in sorted(rows[rn])]
                 for rn in sorted(rows)]
                for _tn, rows in sorted(tables.items())]
        return matrices_digest(mats)

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_abbyy_table_models(doc_id, seed=seed)
        url = f"https://fixtures.test/abbyy_table/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_abbyy(m["model"]).encode("utf-8")})
        dig = _expected_digest(m["expected"])
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec, "xlsx_rt_md5": dig})
    for doc_id in range(max(1, n_docs * 5 // 6)):
        m = build_azure_table_models(doc_id, seed=seed)
        url = f"https://fixtures.test/azure_table/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_azure_docintel(m["model"]).encode("utf-8")})
        dig = _expected_digest(m["expected"])
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec, "xlsx_rt_md5": dig})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "abbyy_table_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "abbyy_table.parquet"), index=False)


def build_annot_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """PDF annotation family: a base doc whose first two pages carry a
    Link (URI action), Highlight (QuadPoints + author), Text sticky
    note, FreeText, Widget (text field) and Square, in /Annots order."""
    rng = _doc_rng(seed + 95001, doc_id)
    model = build_doc_model(doc_id, seed=seed)
    tok = rng.choice(LEXICON)
    annots_p0 = [
        {"subtype": "Link", "rect": (100, 1400, 300, 1430),
         "uri": f"https://example.test/{tok}/{doc_id}"},
        {"subtype": "Highlight", "rect": (100, 1300, 400, 1340),
         "quad_points": [100, 1340, 400, 1340, 100, 1300, 400, 1300],
         "contents": f"note {doc_id}", "author": "reviewer"},
        {"subtype": "Text", "rect": (50, 1200, 70, 1220),
         "contents": f"sticky {tok}", "author": "editor"},
    ]
    # Filled-field variants (parsePdfDoc.js:1091-1176: /V values are
    # page text): %3==0 single-line with center quadding, %3==1
    # multiline that must wrap, %3==2 comb cells; every doc also adds
    # a hidden filled widget whose value must NOT extract.
    k3 = doc_id % 3
    if k3 == 0:
        filled = {"subtype": "Widget", "rect": (100, 980, 400, 1010),
                  "author": "filled", "field_type": "Tx",
                  "value": f"fvx{doc_id} fvy{doc_id}", "quadding": 1}
    elif k3 == 1:
        filled = {"subtype": "Widget", "rect": (100, 950, 180, 1040),
                  "author": "filled", "field_type": "Tx",
                  "value": f"fvx{doc_id} fvy{doc_id} fvz{doc_id}",
                  "ff": 0x1000}
    else:
        filled = {"subtype": "Widget", "rect": (100, 980, 400, 1010),
                  "author": "filled", "field_type": "Tx",
                  "value": f"fvq{doc_id}", "ff": 0x1000000,
                  "max_len": 24}
    hidden = {"subtype": "Widget", "rect": (450, 980, 600, 1010),
              "author": "ghost", "field_type": "Tx",
              "value": f"fvhidden{doc_id}", "hidden": True}
    annots_p0 = annots_p0 + [filled, hidden]
    annots_p1 = [
        {"subtype": "FreeText", "rect": (120, 900, 500, 940),
         "contents": f"callout {doc_id}"},
        {"subtype": "Widget", "rect": (200, 800, 420, 830),
         "author": f"field_{tok}", "field_type": "Tx"},
        {"subtype": "Square", "rect": (500, 700, 600, 760)},
    ]
    model["pages"][0]["annots"] = annots_p0
    if len(model["pages"]) > 1:
        model["pages"][1]["annots"] = annots_p1
    expected = []
    for pn, specs in ((0, annots_p0),
                      (1, annots_p1 if len(model["pages"]) > 1 else [])):
        for an, spec in enumerate(specs):
            is_widget = spec["subtype"] == "Widget"
            expected.append({
                "page_n": pn, "annot_n": an,
                "subtype": spec["subtype"],
                "contents": spec.get("contents"),
                "uri": spec.get("uri"),
                "field_name": (spec.get("author")
                               if is_widget else None),
                "field_value": (spec.get("value")
                                if is_widget else None),
                # every token of a visible filled field appears in the
                # extracted page text; a hidden one never does
                "field_text_ok": (
                    ("n" if spec.get("hidden") else "y")
                    if is_widget and spec.get("value") else None),
            })
    return {"model": model, "expected": expected}


def write_annot_parquet(path: str, n_docs: int = 30,
                        seed: int = SEED_DEFAULT) -> None:
    """annot_docs.parquet (url, html PDF bytes; every 5th doc AES-256
    encrypted to prove annotation strings decrypt) + annots.parquet
    golden records."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_annot_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_annots/{doc_id:08d}"
        enc = "aesv3" if doc_id % 5 == 4 else None
        doc_rows.append({
            "url": url,
            "html": _render(m["model"], rotate=False, outline=False,
                            form_xobject=False, encrypt_mode=enc)})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "annot_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "annots.parquet"), index=False)


def build_struct_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Tagged-PDF family: marked-content paragraphs linked to a
    structure tree. Page-0 first par is a LARGE-font /LI (the list-
    item pin that must beat the title size-ratio rule,
    analyzeLayout.js:2970), each page's second par /BlockQuote
    (struct-corroborated quote promotion, :2213-2234), page-0 third
    par /H1, each page's fourth par /TD, the rest the custom /Para
    role-mapped to /P. Every 4th doc carries an OCR-producer string
    (struct map vetoed); every 5th is untagged."""
    model = build_doc_model(doc_id, seed=seed)
    tagged = doc_id % 5 != 4
    ocr_producer = doc_id % 4 == 3
    # Page-0 par-0 words at 1.6x body size: promotes to 'title'
    # unless the /LI tag pins it to body.
    for line in model["pages"][0]["pars"][0]["lines"]:
        x = line["words"][0]["left"]
        for w in line["words"]:
            txt = w["text"]
            w["segments"] = [{"text": txt, "fs": 48}]
            w["left"] = x
            w["right"] = x + int(0.5 * 48 * len(txt))
            x = w["right"] + 24
    expected = []
    roles = []
    structured = tagged and not ocr_producer
    if tagged:
        model["struct_tags"] = True
        model["producer"] = ("ABBYY FineReader 15" if ocr_producer
                             else "Microsoft Word 2016")
        for pn, page in enumerate(model["pages"]):
            for k, par in enumerate(page["pars"]):
                if pn == 0 and k == 0:
                    par["struct_role"] = "LI"
                elif k == 1:
                    par["struct_role"] = "BlockQuote"
                elif pn == 0 and k == 2:
                    par["struct_role"] = "H1"
                elif k == 3:
                    par["struct_role"] = "TD"
                # others default to Para -> role-mapped to P
                if not ocr_producer:
                    tag = par.get("struct_role", "P")
                    expected.append({
                        "page_n": pn, "mcid": k,
                        "tag": tag if tag in ("H1", "BlockQuote",
                                              "LI", "TD") else "P"})
    for pn, page in enumerate(model["pages"]):
        for k in range(len(page["pars"])):
            if pn == 0 and k == 0:
                role = "body" if structured else "title"
            elif k == 1 and structured:
                role = "blockquote"
            else:
                role = "body"
            roles.append({"page_n": pn, "par_n": k, "par_type": role})
    return {"model": model, "expected": expected, "roles": roles}


def write_struct_parquet(path: str, n_docs: int = 30,
                         seed: int = SEED_DEFAULT) -> None:
    """struct_docs.parquet (url, html tagged-PDF bytes) +
    struct.parquet golden (page, mcid, block tag) rows +
    struct_roles.parquet golden struct-corroborated paragraph roles."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows, role_rows = [], [], []
    for doc_id in range(n_docs):
        m = build_struct_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_struct/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            # classic xref: the xref-stream builder does not carry
            # the trailer /Info entry the producer veto reads
            "html": _render(m["model"], rotate=False, tj_mode=False,
                            outline=False, form_xobject=False,
                            xref_stream=False)})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
        for rec in m["roles"]:
            role_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "struct_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "struct.parquet"), index=False)
    pd.DataFrame(role_rows).to_parquet(
        os.path.join(path, "struct_roles.parquet"), index=False)


def build_math_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Inline-math family: a formula line (math-font glyphs, a raised
    numerator and lowered denominator stacked at one x) embedded in
    prose. The built-up-math exemptions must keep the whole formula on
    ONE line; the numerator reads as a superscript word."""
    rng = _doc_rng(seed + 31415, doc_id)
    lines, expected = [], []
    y = TOP_BASELINE

    def _w(text, left, width, baseline=None, segs=None):
        d = {"text": text, "chars": None, "out_words": [text],
             "left": left, "right": left + width,
             "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97}
        if baseline is not None:
            d["baseline_y"] = baseline
        if segs is not None:
            d["segments"] = segs
        return d

    def _mseg(text, fs):
        return [{"text": text, "fs": fs, "fkey": "/F5"}]

    # prose line
    t1, t2 = rng.choice(LEXICON), rng.choice(LEXICON)
    w1 = _w(t1, MARGIN_LEFT, len(t1) * CHAR_W)
    w2 = _w(t2, w1["right"] + 10, len(t2) * CHAR_W)
    lines.append({"words": [w1, w2], "baseline_y": y, "indent": 0})
    expected += [
        {"line_n": 0, "word_n": 0, "text": t1, "sup": False},
        {"line_n": 0, "word_n": 1, "text": t2, "sup": False}]
    y += LINE_PITCH

    # formula line: E = 12/34 + x  (numerator raised, denominator
    # lowered, both at one x; 8 math-font glyphs gate pageHasMath)
    x0 = MARGIN_LEFT
    we = _w("E", x0, 15, segs=_mseg("E", 30))
    weq = _w("=", we["right"] + 10, 15, segs=_mseg("=", 30))
    x_frac = weq["right"] + 10
    wnum = _w("12", x_frac, 18, baseline=y - 14, segs=_mseg("12", 18))
    wden = _w("34", x_frac, 18, baseline=y + 16, segs=_mseg("34", 18))
    wplus = _w("+", x_frac + 24, 15, segs=_mseg("+", 30))
    wx = _w("x", wplus["right"] + 10, 15, segs=_mseg("x", 30))
    t3 = rng.choice(LEXICON)
    w3 = _w(t3, wx["right"] + 10, len(t3) * CHAR_W)
    lines.append({"words": [we, weq, wnum, wden, wplus, wx, w3],
                  "baseline_y": y, "indent": 0})
    expected += [
        {"line_n": 1, "word_n": 0, "text": "E", "sup": False},
        {"line_n": 1, "word_n": 1, "text": "=", "sup": False},
        {"line_n": 1, "word_n": 2, "text": "12", "sup": True},
        {"line_n": 1, "word_n": 3, "text": "34", "sup": False},
        {"line_n": 1, "word_n": 4, "text": "+", "sup": False},
        {"line_n": 1, "word_n": 5, "text": "x", "sup": False},
        {"line_n": 1, "word_n": 6, "text": t3, "sup": False}]
    y += LINE_PITCH

    # trailing prose line must still cut off the formula line
    t4 = rng.choice(LEXICON)
    w4 = _w(t4, MARGIN_LEFT, len(t4) * CHAR_W)
    lines.append({"words": [w4], "baseline_y": y, "indent": 0})
    expected.append({"line_n": 2, "word_n": 0, "text": t4, "sup": False})

    model = {"doc_id": doc_id, "family": "base", "use_math_font": True,
             "pages": [{"pars": [{"lines": lines}],
                        "width": PAGE_W, "height": PAGE_H}]}
    return {"model": model, "expected": expected}


def write_math_parquet(path: str, n_docs: int = 25,
                       seed: int = SEED_DEFAULT) -> None:
    """math_docs.parquet (url, html PDF bytes) + math.parquet golden
    word rows for the pdf_inline_math oracle."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_math_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_math/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": _render(m["model"], tj_mode=False, rotate=False,
                            ligatures=False, cid_font=False)})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "math_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "math.parquet"), index=False)


_PII_RES = [
    (__import__("re").compile(
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    (__import__("re").compile(
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
    (__import__("re").compile(r"\+\d[\d .()-]{6,}\d"), "<PHONE>"),
]


def _pii_golden(text: str) -> dict:
    """Golden-side mirror of textops.quality.pii_scrub: same patterns
    (the Java/Python/RE2-common subset), same order, counts on the
    original text."""
    counts = {}
    for (rx, _), name in zip(_PII_RES, ("n_emails", "n_ipv4",
                                        "n_phones")):
        counts[name] = len(rx.findall(text))
    scrubbed = text
    for rx, repl in _PII_RES:
        scrubbed = rx.sub(repl, scrubbed)
    return {"pii_scrubbed": scrubbed, **counts}


def build_webhtml_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Raw-web-page family: Common-Crawl-style HTML with scripts,
    styles, nav/header/aside/footer chrome, a link-farm 'related' box,
    and real content paragraphs in one of four container shapes
    (article / main / #content / .post-body). The golden text is the
    content paragraphs only."""
    rng = _doc_rng(seed + 787878, doc_id)

    def _para(n):
        toks = [rng.choice(LEXICON) for _ in range(n)]
        return " ".join(toks)

    headline = _para(4).title()
    paras = [_para(rng.randint(18, 45)) for _ in range(rng.randint(3, 6))]
    # entity handling: one paragraph carries an escaped ampersand
    paras[0] = paras[0] + " alpha & beta"
    # PII-bearing paragraph: drives the pii_scrub columns of the
    # web_extract oracle (goldens scrub with the same patterns in
    # Python — see _pii_golden)
    paras.append(
        f"contact {rng.choice(LEXICON)}{doc_id}@example.com or call "
        f"+1 555 {doc_id % 10000:04d} 0199 at host "
        f"192.168.{doc_id % 256}.{(doc_id * 7) % 256} today")
    expected = "\n".join([headline] + paras)

    body_paras = "".join(
        f"<p>{p.replace('&', '&amp;')}</p>" for p in paras)
    # Hidden-element boilerplate INSIDE the content container: plain
    # prose with no boilerplate-looking class, so only the hidden-state
    # pruning (hidden attr / display:none / aria-hidden) excludes it —
    # the golden never contains it.
    hidden_kind = doc_id % 3
    hidden_para = f"<p>{_para(12)} cached offscreen copy</p>"
    if hidden_kind == 0:
        hidden_div = f"<div hidden>{hidden_para}</div>"
    elif hidden_kind == 1:
        hidden_div = (f'<div style="display: none">{hidden_para}</div>')
    else:
        hidden_div = f'<div aria-hidden="true">{hidden_para}</div>'
    inner = f"<h1>{headline}</h1>{hidden_div}{body_paras}"
    container = doc_id % 4
    if container == 0:
        content = f"<article>{inner}</article>"
    elif container == 1:
        content = f"<main>{inner}</main>"
    elif container == 2:
        content = f'<div id="content">{inner}</div>'
    else:
        content = f'<div class="post-body">{inner}</div>'

    nav_links = "".join(
        f'<a href="/{rng.choice(LEXICON)}">{rng.choice(LEXICON)}</a> '
        for _ in range(6))
    related = "".join(
        f'<li><a href="/r{i}">{_para(3)}</a></li>' for i in range(4))
    html = (
        "<!DOCTYPE html><html><head><title>Site</title>"
        "<script>window.x = 1;</script><style>body{margin:0}</style>"
        '<meta charset="utf-8"></head><body>'
        f"<nav>{nav_links}</nav>"
        '<header><a href="/">ExampleSite</a></header>'
        f"{content}"
        f'<div class="related"><ul>{related}</ul></div>'
        '<aside><a href="/ad">Sponsored</a></aside>'
        f"<footer><a href=\"/privacy\">Privacy</a> © 2026</footer>"
        "</body></html>")
    return {"html": html, "expected": expected}


def write_webhtml_parquet(path: str, n_docs: int = 40,
                          seed: int = SEED_DEFAULT) -> None:
    """webhtml_docs.parquet (url, html web-page bytes) +
    webhtml.parquet golden main-content text."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_webhtml_models(doc_id, seed=seed)
        url = f"https://fixtures.test/webhtml/{doc_id:08d}"
        doc_rows.append({"url": url,
                         "html": m["html"].encode("utf-8")})
        golden_rows.append({"url": url, "text": m["expected"],
                            **_pii_golden(m["expected"])})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "webhtml_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "webhtml.parquet"), index=False)


def build_epub_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """EPUB family: 2-4 spine chapters, each a full web-page document
    from the webhtml family (chrome + content container), packed into
    an OCF zip with container.xml + OPF manifest/spine. Expected text =
    chapter contents joined by newline (page boundary = paragraph
    boundary). Odd docs store chapters under an OEBPS/ subdirectory to
    exercise href resolution against the OPF base path."""
    import io
    import zipfile

    rng = _doc_rng(seed + 565656, doc_id)
    n_chapters = rng.randint(2, 4)
    chapters = [build_webhtml_models(doc_id * 7 + c, seed=seed)
                for c in range(n_chapters)]
    subdir = "OEBPS/" if doc_id % 2 == 1 else ""
    opf_path = f"{subdir}content.opf"

    manifest = "".join(
        f'<item id="ch{c}" href="ch{c}.xhtml"'
        f' media-type="application/xhtml+xml"/>'
        for c in range(n_chapters))
    spine = "".join(f'<itemref idref="ch{c}"/>'
                    for c in range(n_chapters))
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf"'
        ' version="3.0" unique-identifier="id"><metadata>'
        f'<dc:title xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f'Fixture Book {doc_id}</dc:title></metadata>'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>")
    container = (
        '<?xml version="1.0"?><container version="1.0" xmlns='
        '"urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
        f'<rootfile full-path="{opf_path}" media-type='
        '"application/oebps-package+xml"/></rootfiles></container>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # mimetype first and STORED, per OCF
        zf.writestr(zipfile.ZipInfo("mimetype"),
                    "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml", container)
        zf.writestr(opf_path, opf)
        for c, ch in enumerate(chapters):
            zf.writestr(f"{subdir}ch{c}.xhtml", ch["html"])
    expected = "\n".join(ch["expected"] for ch in chapters)
    return {"epub": buf.getvalue(), "expected": expected,
            "n_chapters": n_chapters}


def write_epub_parquet(path: str, n_docs: int = 25,
                       seed: int = SEED_DEFAULT) -> None:
    """epub_docs.parquet (url, epub bytes in html col) + epub.parquet
    golden text."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_epub_models(doc_id, seed=seed)
        url = f"https://fixtures.test/epub/{doc_id:08d}"
        doc_rows.append({"url": url, "html": m["epub"]})
        golden_rows.append({"url": url, "text": m["expected"],
                            **_pii_golden(m["expected"])})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "epub_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "epub.parquet"), index=False)


def build_warc_models(warc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """WARC family: one Common-Crawl-style archive of 3-5 response
    records (webhtml pages), interleaved with warcinfo/request records
    the reader must skip. Even archives are record-wise gzip members
    (.warc.gz layout), odd ones plain; every third response uses
    chunked transfer-encoding."""
    import gzip as _gzip

    rng = _doc_rng(seed + 434343, warc_id)
    n_pages = rng.randint(3, 5)

    def record(headers: dict, body: bytes) -> bytes:
        hdr = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in headers.items())
        hdr += f"Content-Length: {len(body)}\r\n\r\n"
        return hdr.encode("latin-1") + body + b"\r\n\r\n"

    info_body = b"software: fixture-crawler/1.0\r\n"
    recs = [record({"WARC-Type": "warcinfo"}, info_body)]
    golden = []
    for p in range(n_pages):
        m = build_webhtml_models(warc_id * 11 + p, seed=seed)
        payload = m["html"].encode("utf-8")
        url = f"https://fixtures.test/warc/{warc_id:04d}/{p}"
        date = f"2026-01-01T{warc_id % 24:02d}:{p:02d}:00Z"
        recs.append(record(
            {"WARC-Type": "request", "WARC-Target-URI": url},
            b"GET / HTTP/1.1\r\nHost: fixtures.test\r\n\r\n"))
        if p % 3 == 2:
            http_body = (b"%x\r\n" % len(payload) + payload
                         + b"\r\n0\r\n\r\n")
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Transfer-Encoding: chunked\r\n\r\n" + http_body)
        else:
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: %d\r\n\r\n" % len(payload)
                    + payload)
        recs.append(record(
            {"WARC-Type": "response", "WARC-Target-URI": url,
             "WARC-Date": date}, http))
        golden.append({"url": url, "text": m["expected"]})
    if warc_id % 2 == 0:
        blob = b"".join(_gzip.compress(r, mtime=0) for r in recs)
    else:
        blob = b"".join(recs)
    return {"warc": blob, "golden": golden}


def write_warc_parquet(path: str, n_archives: int = 8,
                       seed: int = SEED_DEFAULT) -> None:
    """warc_docs.parquet (warc_id, warc bytes) + warc.parquet golden
    (url, text)."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for warc_id in range(n_archives):
        m = build_warc_models(warc_id, seed=seed)
        doc_rows.append({"warc_id": warc_id, "warc": m["warc"]})
        golden_rows.extend(
            {**rec, **_pii_golden(rec["text"])} for rec in m["golden"])
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "warc_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "warc.parquet"), index=False)


def ensure_webhtml_bench_corpus(path: str, n_docs: int,
                                seed: int = SEED_DEFAULT) -> str:
    """Write (once) and return a webhtml-only bench corpus parquet:
    (url, html) rows of raw Common-Crawl-style pages for timing the
    main-content extraction path in isolation."""
    import os

    import pandas as pd

    fpath = os.path.join(path, f"webhtml_{n_docs}_{seed}_rg8.parquet")
    if os.path.exists(fpath):
        return fpath
    os.makedirs(path, exist_ok=True)
    rows = []
    for doc_id in range(n_docs):
        m = build_webhtml_models(doc_id, seed=seed)
        rows.append({"url": f"https://fixtures.test/webhtml/{doc_id:08d}",
                     "html": m["html"].encode("utf-8")})
    # row_group_size keeps the single file splittable (see
    # ensure_bench_corpus for the rationale; rg8 cache-key note too).
    pd.DataFrame(rows).to_parquet(fpath, index=False, row_group_size=8)
    return fpath


def _set_line_words(line: dict, tokens: list[str]) -> None:
    """Replace a model line's words with clean undecored tokens at
    standard CHAR_W geometry (for lines that must match an outline
    anchor byte-for-byte after extraction)."""
    top = line["words"][0]["top"]
    bottom = line["words"][0]["bottom"]
    x = 100
    words = []
    for t in tokens:
        words.append({"text": t, "chars": None, "out_words": [t],
                      "quoted": False, "token": None, "left": x,
                      "right": x + len(t) * CHAR_W, "top": top,
                      "bottom": bottom, "conf": 96})
        x += len(t) * CHAR_W + CHAR_W
    line["words"] = words


def build_heading_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Outline-anchored heading family: bookmarks name headings that
    geometry cannot detect — same size and weight as body text
    (outlineIndex.js:149 buildOutlineHeadingIndex +
    analyzeLayout.js:1783-1787). Page 0 carries a heading LINE at the
    top of a multi-line paragraph (split case); page 1 a single-line
    heading paragraph (whole-par case). Decoy bookmarks (sentence-
    shaped, unmatched) must not promote; every 5th doc has an
    OCR-producer Info dict that disables the whole index; every 7th
    has no outline at all."""
    from .operators.pdf.document import PdfDocument
    from .render_pdf import render_pdf as _render

    model = build_doc_model(doc_id, seed=seed, n_pages=2)
    p0_title = ["Chapter", f"Part{doc_id}", "Overview"]
    p1_title = ["Results", "Summary"]
    # page 0, par 1, line 0: heading line atop a multi-line body par
    _set_line_words(model["pages"][0]["pars"][1]["lines"][0], p0_title)
    p0_split = len(model["pages"][0]["pars"][1]["lines"]) > 1
    # page 1, par 1: truncated to a single heading-only line
    par1 = model["pages"][1]["pars"][1]
    par1["lines"] = [par1["lines"][0]]
    _set_line_words(par1["lines"][0], p1_title)

    ocr_producer = doc_id % 5 == 4
    no_outline = doc_id % 7 == 6
    if ocr_producer:
        model["producer"] = "ABBYY FineReader 15"
    pdf = _render(model, rotate=False, outline=False,
                  form_xobject=False, xref_stream=False)

    if not no_outline:
        doc = PdfDocument(pdf)
        pages_node = doc.resolve(doc.resolve(doc.trailer["Root"])["Pages"])
        kids = [r.num for r in doc.resolve(pages_node["Kids"])]
        size = max(doc.xref) + 1
        o = size  # outlines root
        items = [
            (" ".join(p0_title), kids[0]),
            (" ".join(p1_title), kids[1]),
            ("Ends like a sentence.", kids[0]),  # shape-rejected
            ("Unmatched Heading", kids[0]),      # no matching line
        ]
        objs = {}
        first, last = o + 1, o + len(items)
        objs[o] = (f"<< /Type /Outlines /First {first} 0 R "
                   f"/Last {last} 0 R /Count {len(items)} >>").encode()
        for i, (title, pg) in enumerate(items):
            num = o + 1 + i
            body = f"<< /Title ({title}) /Parent {o} 0 R "
            if i > 0:
                body += f"/Prev {num - 1} 0 R "
            if i < len(items) - 1:
                body += f"/Next {num + 1} 0 R "
            body += f"/Dest [{pg} 0 R /XYZ null null null] >>"
            objs[num] = body.encode()
        catalog = dict(doc.resolve(doc.trailer["Root"]))
        from .operators.pdf.lexer import Name, Ref
        from .operators.pdf.metadata import serialize_object

        catalog[Name("Outlines")] = Ref(o, 0)
        pdf = _append_pdf_revision(
            pdf, objs, serialize_object(catalog).encode("latin-1"), 1,
            size, "")

    promoted = not (ocr_producer or no_outline)
    golden = []
    for page_n in (0, 1):
        n_pars = len(model["pages"][page_n]["pars"])
        roles = ["body"] * n_pars
        if promoted:
            if page_n == 0 and p0_split:
                roles = (["body", "heading", "body"]
                         + ["body"] * (n_pars - 2))
            elif page_n == 0:
                roles[1] = "heading"
            else:
                roles[1] = "heading"
        for par_n, role in enumerate(roles):
            golden.append({"page_n": page_n, "par_n": par_n,
                           "par_type": role})
    return {"pdf": pdf, "expected": golden}


def write_heading_parquet(path: str, n_docs: int = 25,
                          seed: int = SEED_DEFAULT) -> None:
    """heading_docs.parquet (url, html PDF bytes) + headings.parquet
    golden per-paragraph roles."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_heading_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_heading/{doc_id:08d}"
        doc_rows.append({"url": url, "html": m["pdf"]})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "heading_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "headings.parquet"), index=False)


def build_image_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Image-inventory family (parsePdfImages.js:199 extractImages):
    one page whose XObjects cover the inventory dimensions — Flate RGB
    (with /Interpolate on every 6th doc), a 1-bit /ImageMask with an
    inverted /Decode, an /Indexed palette image, and per-doc-id
    variants: DCTDecode (jpg), JPXDecode (jp2), ICCBased N=4 (folds to
    DeviceCMYK), a gray image carrying a /SMask (the soft mask is
    itself inventoried — the sweep is doc-wide), and a CCITT Group 4
    fax image (the classic scanned-PDF shape) whose decoded mean is
    part of the golden. Every record carries ``pixels_mean_e6`` — the
    analytic decoded-pixel mean for the decodable codecs, None where
    decode_image_pixels stubs or the payload is broken."""
    import zlib

    from .render_pdf import _Writer

    w = _Writer()
    page_w, page_h = 612, 792
    wd, ht = 16 + doc_id % 8, 12 + doc_id % 5
    golden = []
    img_defs = []  # (dict_body_fmt, data, golden_record)

    def img(dict_body: str, data: bytes, **g):
        img_defs.append((dict_body, data, g))

    import math as _m

    interp = doc_id % 6 == 0
    rgb_raw = bytes((x * 7 + doc_id) % 256 for x in range(wd * ht * 3))
    rgb = zlib.compress(rgb_raw)
    img(f"/Subtype /Image /Width {wd} /Height {ht} "
        f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
        f"/Filter /FlateDecode"
        + (" /Interpolate true" if interp else ""),
        rgb, width=wd, height=ht, bpc=8, image_mask=False,
        colorspace="DeviceRGB", palette_hival=-1, filter="FlateDecode",
        ext="raw", decode_invert=False, has_smask=False,
        interpolate=interp, n_raw_bytes=len(rgb),
        pixels_mean_e6=int(_m.floor(
            sum(rgb_raw) / len(rgb_raw) * 1e6)))

    mask = bytes([0b10101010] * (((wd + 7) // 8) * ht))
    # /Decode [1 0] inverts the 1,0,1,0 bit pattern: even columns 0,
    # odd columns 255 -> mean = 255 * floor(wd/2) / wd
    img(f"/Subtype /Image /Width {wd} /Height {ht} /ImageMask true "
        f"/BitsPerComponent 1 /Decode [1 0]",
        mask, width=wd, height=ht, bpc=1, image_mask=True,
        colorspace="DeviceGray", palette_hival=-1, filter="",
        ext="raw", decode_invert=True, has_smask=False,
        interpolate=False, n_raw_bytes=len(mask),
        pixels_mean_e6=int(_m.floor(255 * (wd // 2) / wd * 1e6)))

    from .textops.ccitt import encode_g4
    fax_bits = [[1 if (x * 7 + y * 13) % 256 < 128 else 0
                 for x in range(wd)] for y in range(ht)]
    fax = encode_g4(fax_bits, wd)
    fax_mean = 255 * sum(1 - b for row in fax_bits for b in row) \
        / (wd * ht)
    img(f"/Subtype /Image /Width {wd} /Height {ht} "
        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /CCITTFaxDecode "
        f"/DecodeParms << /K -1 /Columns {wd} /Rows {ht} >>",
        fax, width=wd, height=ht, bpc=1, image_mask=False,
        colorspace="DeviceGray", palette_hival=-1,
        filter="CCITTFaxDecode", ext="raw", decode_invert=False,
        has_smask=False, interpolate=False, n_raw_bytes=len(fax),
        pixels_mean_e6=int(_m.floor(fax_mean * 1e6)))

    from .textops.jbig2 import (build_jbig2_embedded,
                                build_jbig2_halftone, build_jbig2_pair,
                                build_jbig2_symbol_text,
                                build_jbig2_symbol_text_huffman)
    jb_wd, jb_ht = wd, ht
    if doc_id % 5 == 2 and (doc_id // 5) % 4 == 3:
        # halftone variant (doc 17): a pattern dictionary of 4x4
        # density cells tiled by gray-coded bit planes
        pats = [[[1 if (x * 3 + y * 2 + 1) % 4 < k else 0
                  for x in range(4)] for y in range(4)]
                for k in range(4)]
        gw, gh = wd // 4, ht // 4
        grid = [[(gx + gy) % 4 for gx in range(gw)]
                for gy in range(gh)]
        jb = build_jbig2_halftone(pats, grid)
        jb_wd, jb_ht = gw * 4, gh * 4
        jb_bits = [[pats[grid[yy // 4][xx // 4]][yy % 4][xx % 4]
                    for xx in range(jb_wd)] for yy in range(jb_ht)]
        jb_globals = None
        jb_parms = ""
    elif doc_id % 5 == 2:
        # symbol-dictionary + text-region coding (the scanner-encoder
        # shape): two glyphs placed four times; the page bitmap is
        # composed here so the golden mean stays analytic. Variants by
        # (doc_id // 5) % 5: plain arithmetic, one refined instance
        # (per-instance IARI + generic refinement), the HUFFMAN
        # organization (Annex B standard tables, runcode symbol IDs,
        # uncompressed collective bitmaps), a halftone pattern page
        # (handled above), or an SDREFAGG dictionary chain.
        g1 = [[1 if (x + y) % 2 == 0 else 0 for x in range(4)]
              for y in range(5)]
        g2 = [[1 if x in (0, 3) or y in (0, 4) else 0
               for x in range(4)] for y in range(5)]
        placements = [(0, 1, 1), (1, 6, 1), (1, 1, 7), (0, 6, 7)]
        variant = (doc_id // 5) % 5
        if variant == 1:
            g1r = [row[:] for row in g1]
            g1r[2][1] ^= 1
            g1r[4][2] ^= 1
            placements = placements[:3] + [(0, 6, 7, g1r)]
        jb_bits = [[0] * wd for _ in range(ht)]
        for p in placements:
            si, px_, py_ = p[0], p[1], p[2]
            g = p[3] if len(p) > 3 else (g1 if si == 0 else g2)
            for yy in range(5):
                for xx in range(4):
                    jb_bits[py_ + yy][px_ + xx] |= g[yy][xx]
        if variant == 2:
            jb = build_jbig2_symbol_text_huffman(
                [g1, g2], placements, wd, ht)
        elif variant == 4:
            # SDREFAGG: a second dictionary refines g1 and the region
            # places the combined export set (doc 22)
            from .textops.jbig2 import build_jbig2_refagg
            g1r = [row[:] for row in g1]
            g1r[1][2] ^= 1
            placements = placements[:3] + [(2, 6, 7)]
            jb_bits = [[0] * wd for _ in range(ht)]
            for si, px_, py_ in placements:
                g = (g1, g2, g1r)[si]
                for yy in range(5):
                    for xx in range(4):
                        jb_bits[py_ + yy][px_ + xx] |= g[yy][xx]
            jb = build_jbig2_refagg([g1, g2], [(0, g1r)], placements,
                                    wd, ht)
        else:
            jb = build_jbig2_symbol_text([g1, g2], placements, wd, ht)
        jb_globals = None
        jb_parms = ""
    else:
        jb_bits = [[1 if (x * 5 + y * 11) % 7 < 3 else 0
                    for x in range(wd)] for y in range(ht)]
        jb_kw = [{}, {"mmr": True}, {"tpgdon": True},
                 {"template": 2}][doc_id % 4]
        jb_split = doc_id % 3 == 1
        if jb_split:
            jb_globals, jb = build_jbig2_pair(jb_bits, **jb_kw)
            jb_parms = (" /DecodeParms << /JBIG2Globals"
                        " __JBGNUM__ 0 R >>")
        else:
            jb_globals = None
            jb = build_jbig2_embedded(jb_bits, **jb_kw)
            jb_parms = ""
    jb_mean = 255 * sum(1 - b for row in jb_bits for b in row) \
        / (jb_wd * jb_ht)
    img(f"/Subtype /Image /Width {jb_wd} /Height {jb_ht} "
        f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /JBIG2Decode{jb_parms}",
        jb, width=jb_wd, height=jb_ht, bpc=1, image_mask=False,
        colorspace="DeviceGray", palette_hival=-1,
        filter="JBIG2Decode", ext="raw", decode_invert=False,
        has_smask=False, interpolate=False, n_raw_bytes=len(jb),
        pixels_mean_e6=int(_m.floor(jb_mean * 1e6)))

    pal = zlib.compress(bytes(x % 4 for x in range(wd * ht)))
    img(f"/Subtype /Image /Width {wd} /Height {ht} "
        f"/ColorSpace [/Indexed /DeviceRGB 3 <000000ff0000%s00ff00>] "
        f"/BitsPerComponent 8 /Filter /FlateDecode" % "0000ff",
        pal, width=wd, height=ht, bpc=8, image_mask=False,
        colorspace="Indexed", palette_hival=3, filter="FlateDecode",
        ext="raw", decode_invert=False, has_smask=False,
        interpolate=False, n_raw_bytes=len(pal), pixels_mean_e6=None)

    if doc_id % 2 == 0:
        # Real 4-component DCT payloads (the reference's decodeJPEG.js
        # exists for exactly this shape), cycling (doc_id // 2) % 3:
        # stored-CMYK (APP14 transform 0), stored-YCCK (transform 2),
        # and CMYK under a /Decode [1 0 ...] inversion. Blockwise-
        # constant 4:4:4:4 planes make the stored-sample roundtrip
        # exact, so the golden mean is the conversion of the input
        # planes (tests/test_jpeg_cmyk.py proves the equality and
        # cross-checks the polynomial against a literal port).
        import numpy as _np

        from .textops.jpeg import _cmyk_to_rgb, encode_jpeg_cmyk

        jw, jh = wd * 2, ht * 2
        jpg_variant = (doc_id // 2) % 3
        planes = []
        for s in (doc_id, doc_id + 89, doc_id + 167, doc_id + 241):
            blocks = _np.fromfunction(
                lambda by, bx: (bx * 53 + by * 29 + s) % 256,
                ((jh + 7) // 8, (jw + 7) // 8)).astype(_np.uint8)
            planes.append(_np.kron(
                blocks, _np.ones((8, 8), dtype=_np.uint8))[:jh, :jw])
        transform = 2 if jpg_variant == 1 else 0
        jpg_invert = jpg_variant == 2
        jpg = encode_jpeg_cmyk(planes, sampling=(1, 1),
                               transform=transform)
        jpg_mean = float(_cmyk_to_rgb(
            [p.astype(float) for p in planes], transform,
            jpg_invert).mean())
        img(f"/Subtype /Image /Width {jw} /Height {jh} "
            f"/ColorSpace /DeviceCMYK /BitsPerComponent 8 "
            f"/Filter /DCTDecode"
            + (" /Decode [1 0 1 0 1 0 1 0]" if jpg_invert else ""),
            jpg, width=jw, height=jh, bpc=8, image_mask=False,
            colorspace="DeviceCMYK", palette_hival=-1,
            filter="DCTDecode", ext="jpg", decode_invert=jpg_invert,
            has_smask=False, interpolate=False, n_raw_bytes=len(jpg),
            pixels_mean_e6=int(_m.floor(jpg_mean * 1e6)))

    if doc_id % 3 == 0:
        # Real JPEG 2000 payloads through textops/jpx_encode, cycling
        # the codec surface: bare reversible codestream, RGB/RCT in a
        # JP2 container, tiled RPCL with layers + per-pass termination
        # + segmentation symbols, a pclr-palette JP2 whose internal
        # palette applies (PDF colourspace is not /Indexed), and a
        # 4-component DeviceCMYK codestream (converted through the
        # same SWOP tail as 4-component DCT).
        import numpy as _np

        from .textops.jpx_encode import encode_jpx, wrap_jp2

        jpx_variant = (doc_id // 3) % 5
        jpx_cs_name = "DeviceGray"
        if jpx_variant == 0:
            gpx = _np.fromfunction(
                lambda y, x: (x * 7 + y * 13 + doc_id) % 256,
                (ht, wd)).astype(_np.uint8)
            jp2 = encode_jpx(gpx, levels=2)
            jpx_mean = float(gpx.mean())
        elif jpx_variant == 1:
            rpx = _np.fromfunction(
                lambda y, x, c: (x * 11 + y * 5 + c * 37 + doc_id)
                % 256, (ht, wd, 3)).astype(_np.uint8)
            jp2 = wrap_jp2(encode_jpx(rpx, mct=True),
                           width=wd, height=ht, ncomp=3)
            jpx_mean = float(rpx.mean())
            jpx_cs_name = "DeviceRGB"
        elif jpx_variant == 2:
            gpx = _np.fromfunction(
                lambda y, x: (x * 3 + y * 17 + doc_id) % 256,
                (ht, wd)).astype(_np.uint8)
            jp2 = encode_jpx(gpx, tile_size=(8, 8), progression=2,
                             layers=2, per_pass_termination=True,
                             segmentation=True)
            jpx_mean = float(gpx.mean())
        elif jpx_variant == 3:
            lut = _np.array(
                [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                dtype=_np.uint8)
            idx = _np.fromfunction(
                lambda y, x: (x + y * 3 + doc_id) % 4,
                (ht, wd)).astype(_np.uint8)
            jp2 = wrap_jp2(encode_jpx(idx, precision=2),
                           width=wd, height=ht, ncomp=1, precision=2,
                           palette=lut)
            jpx_mean = float(lut[idx].mean())
            jpx_cs_name = "DeviceRGB"
        else:
            from .textops.jpeg import _cmyk_to_rgb

            cpx = _np.fromfunction(
                lambda y, x, c: (x * 7 + y * 13 + c * 61 + doc_id)
                % 256, (ht, wd, 4)).astype(_np.uint8)
            jp2 = encode_jpx(cpx)  # reversible => samples exact
            jpx_mean = float(_cmyk_to_rgb(
                [cpx[:, :, i].astype(float) for i in range(4)],
                None, False).mean())
            jpx_cs_name = "DeviceCMYK"
        img(f"/Subtype /Image /Width {wd} /Height {ht} "
            f"/ColorSpace /{jpx_cs_name} /BitsPerComponent 8 "
            f"/Filter [/JPXDecode]",
            jp2, width=wd, height=ht, bpc=8, image_mask=False,
            colorspace=jpx_cs_name, palette_hival=-1,
            filter="JPXDecode", ext="jp2", decode_invert=False,
            has_smask=False, interpolate=False, n_raw_bytes=len(jp2),
            pixels_mean_e6=int(_m.floor(jpx_mean * 1e6)))

    # fixed objects: 1 Catalog, 2 Pages, 3 Page, 4 Contents, then the
    # images (+ optional ICC stream / SMask pair appended after).
    first_img = 5
    n_named = len(img_defs)
    icc_num = smask_num = cmyk_num = smask_target_num = None
    nxt = first_img + n_named
    if doc_id % 5 == 0:
        icc_num, cmyk_num = nxt, nxt + 1
        nxt += 2
    if doc_id % 4 == 0:
        smask_num, smask_target_num = nxt, nxt + 1
        nxt += 2
    jb_globals_num = None
    if jb_globals is not None:
        jb_globals_num = nxt
        nxt += 1

    content = b"q 100 0 0 80 72 600 cm /Im0 Do Q"
    inline_golden = []
    if doc_id % 3 == 1:
        # Inline (BI/ID/EI) images on every 3rd doc: an unfiltered
        # gray (computed-length termination: EI abuts the payload) and
        # a CCITT G4 fax (whitespace-bounded scan termination). The
        # inventory lists them after the XObjects (inline=True rows).
        gray_raw = bytes((x * 11 + doc_id) % 256 for x in range(wd * ht))
        content += (f"\nq BI /W {wd} /H {ht} /BPC 8 /CS /G ID ".encode()
                    + gray_raw + b"EI Q")
        inline_golden.append(dict(
            width=wd, height=ht, bpc=8, image_mask=False,
            colorspace="DeviceGray", palette_hival=-1, filter="",
            ext="raw", decode_invert=False, has_smask=False,
            interpolate=False, n_raw_bytes=len(gray_raw), inline=True,
            pixels_mean_e6=int(_m.floor(
                sum(gray_raw) / len(gray_raw) * 1e6))))
        ifax_bits = [[1 if (x * 5 + y * 3 + doc_id) % 7 < 3 else 0
                      for x in range(wd)] for y in range(ht)]
        ifax = encode_g4(ifax_bits, wd)
        # the scan path must not find a premature whitespace-bounded
        # EI inside the codec payload (same determinism guard as the
        # imagedup family's separation assert)
        _ws = (0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20)
        for j in range(1, len(ifax) - 1):
            assert not (ifax[j:j + 2] == b"EI" and ifax[j - 1] in _ws
                        and (j + 2 >= len(ifax)
                             or ifax[j + 2] in _ws + (0x2F,))), doc_id
        ifax_mean = 255 * sum(1 - b for row in ifax_bits
                              for b in row) / (wd * ht)
        content += (f"\nq BI /W {wd} /H {ht} /BPC 1 /CS /G /F /CCF "
                    f"/DP << /K -1 /Columns {wd} /Rows {ht} >> "
                    f"ID ".encode() + ifax + b"\nEI Q")
        inline_golden.append(dict(
            width=wd, height=ht, bpc=1, image_mask=False,
            colorspace="DeviceGray", palette_hival=-1,
            filter="CCITTFaxDecode", ext="raw", decode_invert=False,
            has_smask=False, interpolate=False, n_raw_bytes=len(ifax),
            inline=True,
            pixels_mean_e6=int(_m.floor(ifax_mean * 1e6))))
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(f"<< /Type /Pages /Kids [3 0 R] /Count 1 "
          f"/MediaBox [0 0 {page_w} {page_h}] >>".encode())
    xnames = " ".join(
        f"/Im{i} {first_img + i} 0 R" for i in range(n_named))
    if cmyk_num:
        xnames += f" /ImIcc {cmyk_num} 0 R"
    if smask_target_num:
        xnames += f" /ImSm {smask_target_num} 0 R"
    w.add((f"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
           f"/Resources << /XObject << {xnames} >> >> >>").encode())
    w.add(b"<< /Length %d >>\nstream\n" % len(content)
          + content + b"\nendstream")
    for dict_body, data, g in img_defs:
        if jb_globals_num is not None:
            dict_body = dict_body.replace(
                "__JBGNUM__", str(jb_globals_num))
        w.add((f"<< {dict_body} /Length {len(data)} >>\nstream\n"
               ).encode() + data + b"\nendstream")
        golden.append(g)
    if icc_num:
        icc = bytes(32)
        w.add(b"<< /N 4 /Length %d >>\nstream\n" % len(icc)
              + icc + b"\nendstream")
        cmyk = zlib.compress(bytes(wd * ht * 4))
        w.add((f"<< /Subtype /Image /Width {wd} /Height {ht} "
               f"/ColorSpace [/ICCBased {icc_num} 0 R] "
               f"/BitsPerComponent 8 /Filter /FlateDecode "
               f"/Length {len(cmyk)} >>\nstream\n").encode()
              + cmyk + b"\nendstream")
        golden.append(dict(
            width=wd, height=ht, bpc=8, image_mask=False,
            colorspace="DeviceCMYK", palette_hival=-1,
            filter="FlateDecode", ext="raw", decode_invert=False,
            has_smask=False, interpolate=False, n_raw_bytes=len(cmyk),
            pixels_mean_e6=None))
    if smask_num:
        sm = zlib.compress(bytes(wd * ht))
        w.add((f"<< /Subtype /Image /Width {wd} /Height {ht} "
               f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
               f"/Filter /FlateDecode /Length {len(sm)} >>\nstream\n"
               ).encode() + sm + b"\nendstream")
        gray = zlib.compress(bytes(wd * ht))
        w.add((f"<< /Subtype /Image /Width {wd} /Height {ht} "
               f"/ColorSpace /DeviceGray /BitsPerComponent 8 "
               f"/SMask {smask_num} 0 R "
               f"/Filter /FlateDecode /Length {len(gray)} >>\nstream\n"
               ).encode() + gray + b"\nendstream")
        golden.append(dict(
            width=wd, height=ht, bpc=8, image_mask=False,
            colorspace="DeviceGray", palette_hival=-1,
            filter="FlateDecode", ext="raw", decode_invert=False,
            has_smask=False, interpolate=False, n_raw_bytes=len(sm),
            pixels_mean_e6=0))
        golden.append(dict(
            width=wd, height=ht, bpc=8, image_mask=False,
            colorspace="DeviceGray", palette_hival=-1,
            filter="FlateDecode", ext="raw", decode_invert=False,
            has_smask=True, interpolate=False, n_raw_bytes=len(gray),
            pixels_mean_e6=0))
    if jb_globals_num is not None:
        # JBIG2Globals stream (not an image XObject — the inventory
        # sweep must not list it); holds the page-information segment
        w.add((f"<< /Length {len(jb_globals)} >>\nstream\n"
               ).encode() + jb_globals + b"\nendstream")
    golden.extend(inline_golden)
    for n, g in enumerate(golden):
        g["image_n"] = n
        g.setdefault("inline", False)
    return {"pdf": w.build(), "expected": golden}


def write_image_parquet(path: str, n_docs: int = 24,
                        seed: int = SEED_DEFAULT) -> None:
    """image_docs.parquet (url, html PDF bytes) + images.parquet golden
    per-image inventory records."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_image_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_images/{doc_id:08d}"
        doc_rows.append({"url": url, "html": m["pdf"]})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "image_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "images.parquet"), index=False)


def _hex_byte(v: float) -> str:
    """0..1 float -> two hex digits with JS Math.round semantics."""
    import math as _math

    return format(max(0, min(255, _math.floor(v * 255 + 0.5))), "02x")


def _rgb_hex(rgb) -> str:
    return "#" + "".join(_hex_byte(v) for v in rgb)


def build_color_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Text-color family: one page whose lines exercise every color
    path of executeTextOperators (parsePdfDoc.js:1692-1766) — device
    gray/RGB/CMYK fills, a Separation tint transform (one of the four
    PDF function types per doc), ExtGState /ca alpha, invisible text
    (Tr 3), and faux-bold stroking (Tr 2 + w). Goldens are computed
    here from the spec formulas, independent of the extractor."""
    from .operators.pdf.colorfn import cmyk_to_rgb
    from .render_pdf import _Writer, _esc

    fs = 24.0
    page_w, page_h = 612, 792
    gray = (doc_id % 5) * 0.2
    c, m, y, k = (doc_id % 3) * 0.3, 0.8, 0.1, (doc_id % 2) * 0.2
    t = 0.25 + (doc_id % 3) * 0.25
    ca = 0.25 + (doc_id % 3) * 0.25
    lw = 0.75 + (doc_id % 4) * 0.25
    variant = doc_id % 4

    # ---- tint function object + its expected rgb at tint t
    if variant == 0:  # type 2 exponential
        fn_body = (b"<< /FunctionType 2 /Domain [0 1] "
                   b"/C0 [1 1 1] /C1 [0.2 0.4 0.6] /N 1 >>")
        spot_rgb = [1 + t * (0.2 - 1), 1 + t * (0.4 - 1),
                    1 + t * (0.6 - 1)]
    elif variant == 1:  # type 3 stitching of two type-2 ramps
        fn_body = (
            b"<< /FunctionType 3 /Domain [0 1] /Bounds [0.5] "
            b"/Encode [0 1 0 1] /Functions ["
            b"<< /FunctionType 2 /Domain [0 1] /C0 [1 1 1] "
            b"/C1 [0.5 0.5 0.5] /N 1 >> "
            b"<< /FunctionType 2 /Domain [0 1] /C0 [0.5 0.5 0.5] "
            b"/C1 [0 0 0.4] /N 1 >>] >>")
        if t < 0.5:
            t2 = t / 0.5
            spot_rgb = [1 + t2 * (0.5 - 1)] * 3
        else:
            t2 = (t - 0.5) / 0.5
            spot_rgb = [0.5 - t2 * 0.5, 0.5 - t2 * 0.5,
                        0.5 + t2 * (0.4 - 0.5)]
    elif variant == 2:  # type 0 sampled, 2 corners, linear interp
        samples = bytes([255, 128, 0, 0, 128, 255])
        fn_body = (
            b"<< /FunctionType 0 /Domain [0 1] "
            b"/Range [0 1 0 1 0 1] /Size [2] /BitsPerSample 8 "
            b"/Length %d >>\nstream\n" % len(samples)
            + samples + b"\nendstream")
        spot_rgb = [1 - t, 128 / 255, t]
    else:  # type 4 PostScript calculator
        ps = b"{ dup dup }"
        fn_body = (
            b"<< /FunctionType 4 /Domain [0 1] "
            b"/Range [0 1 0 1 0 1] /Length %d >>\nstream\n" % len(ps)
            + ps + b"\nendstream")
        spot_rgb = [t, t, t]

    cmyk_rgb = [v / 255.0 for v in cmyk_to_rgb(c, m, y, k)]
    # (prefix_ops, words, color_hex, opacity, render_mode, stroke_w)
    lines = [
        ("", ["plain", "ink"], "#000000", 1.0, 0, 0.0),
        ("1 0 0 rg", ["crimson", "words"], "#ff0000", 1.0, 0, 0.0),
        (f"{gray} g", ["gray", "tone"], _rgb_hex([gray] * 3),
         1.0, 0, 0.0),
        (f"{c} {m} {y} {k} k", ["process", "mix"], _rgb_hex(cmyk_rgb),
         1.0, 0, 0.0),
        (f"/CS0 cs {t} scn", ["spot", "tint"], _rgb_hex(spot_rgb),
         1.0, 0, 0.0),
        # DeviceN 2-input tint: PS "{ add 0.5 mul dup dup }" folds the
        # two ink components to a gray level ((a+b)/2 on each channel).
        (f"/CS1 cs {t} {gray} scn", ["duotone", "blend"],
         _rgb_hex([(t + gray) * 0.5] * 3), 1.0, 0, 0.0),
        ("/GS0 gs", ["soft", "veil"], "#000000", ca, 0, 0.0),
        ("3 Tr", ["ghost", "layer"], "#000000", 0.0, 0, 0.0),
        (f"2 Tr {lw} w 0.2 0.2 0.2 RG", ["heavy", "strokes"],
         "#000000", 1.0, 2, lw),
    ]

    content = ["BT", f"/F1 {fs} Tf"]
    golden = []
    for ln, (ops, words, hexc, opacity, rm, sw) in enumerate(lines):
        y_pdf = page_h - (100 + 40 * ln)
        content.append("q")
        if ops:
            content.append(ops)
        x = 72.0
        for wn, word in enumerate(words):
            content.append(f"1 0 0 1 {x} {y_pdf} Tm ({_esc(word)}) Tj")
            golden.append({
                "line_n": ln, "word_n": wn, "text": word,
                "color": hexc, "opacity": opacity,
                "render_mode": rm, "stroke_width": sw})
            x += 0.5 * fs * len(word) + 0.5 * fs
        content.append("Q")
    content.append("ET")
    stream = "\n".join(content).encode("latin-1")

    w = _Writer()
    w.add(b"<< /Type /Catalog /Pages 2 0 R >>")
    w.add(f"<< /Type /Pages /Kids [5 0 R] /Count 1 "
          f"/MediaBox [0 0 {page_w} {page_h}] >>".encode())
    w.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
          b"/FirstChar 32 /LastChar 126 /Widths ["
          + b" ".join(b"500" for _ in range(95))
          + b"] /FontDescriptor 4 0 R /Encoding /WinAnsiEncoding >>")
    w.add(b"<< /Type /FontDescriptor /FontName /Helvetica /Flags 32 "
          b"/Ascent 718 /Descent -207 /CapHeight 718 /ItalicAngle 0 "
          b"/StemV 88 /FontBBox [-166 -225 1000 931] >>")
    w.add(b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R /Resources "
          b"<< /Font << /F1 3 0 R >> "
          b"/ColorSpace << /CS0 [/Separation /Spot /DeviceRGB 7 0 R] "
          b"/CS1 [/DeviceN [/InkA /InkB] /DeviceRGB 8 0 R] >> "
          b"/ExtGState << /GS0 << /Type /ExtGState /ca "
          + str(ca).encode() + b" >> >> >> >>")
    w.add(b"<< /Length %d >>\nstream\n" % len(stream)
          + stream + b"\nendstream")
    w.add(fn_body)
    ps2 = b"{ add 0.5 mul dup dup }"
    w.add(b"<< /FunctionType 4 /Domain [0 1 0 1] "
          b"/Range [0 1 0 1 0 1] /Length %d >>\nstream\n" % len(ps2)
          + ps2 + b"\nendstream")
    return {"pdf": w.build(), "expected": golden}


def write_color_parquet(path: str, n_docs: int = 24,
                        seed: int = SEED_DEFAULT) -> None:
    """color_docs.parquet (url, html PDF bytes) + colors.parquet golden
    per-word style records."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_color_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_color/{doc_id:08d}"
        doc_rows.append({"url": url, "html": m["pdf"]})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "color_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "colors.parquet"), index=False)


def _append_pdf_revision(base: bytes, objs: dict[int, bytes],
                         catalog: bytes | None, root_num: int,
                         size: int, trailer_pairs: str) -> bytes:
    """Incremental update: append the given objects (and optionally a
    re-emitted catalog), then a classic xref section whose trailer
    /Prev chains to the base revision — the structure
    countXrefRevisions reports on (metadataInspect.js:41)."""
    import re as _re

    m = None
    for m in _re.finditer(rb"startxref\s+(\d+)", base[-2048:], _re.S):
        pass
    prev = int(m.group(1))
    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    entries: dict[int, int] = {}
    if catalog is not None:
        entries[root_num] = len(out)
        out += f"{root_num} 0 obj\n".encode() + catalog + b"\nendobj\n"
    for n in sorted(objs):
        entries[n] = len(out)
        out += f"{n} 0 obj\n".encode() + objs[n] + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n"
    nums = sorted(entries)
    i = 0
    while i < len(nums):
        j = i
        while j + 1 < len(nums) and nums[j + 1] == nums[j] + 1:
            j += 1
        out += f"{nums[i]} {j - i + 1}\n".encode()
        for n in nums[i : j + 1]:
            out += f"{entries[n]:010d} 00000 n \n".encode()
        i = j + 1
    size = max(size, max(nums) + 1)
    out += (f"trailer\n<< /Size {size} /Root {root_num} 0 R /Prev {prev} "
            f"{trailer_pairs}>>\nstartxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


_XMP_PACKET = (
    b'<?xpacket begin="\xef\xbb\xbf" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
    b'<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
    b'<rdf:RDF xmlns:rdf='
    b'"http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>\n'
    b"</x:xmpmeta>\n<?xpacket end=\"w\"?>")


def _fake_exif_jpeg(doc_id: int) -> bytes:
    """Marker-only JPEG: SOI + APP1(EXIF w/ GPS IFD tag bytes and an
    ASCII camera string) + EOI. Enough for the marker-segment scan
    (imageMetadata.js:70); never decoded."""
    payload = (b"Exif\x00\x00II*\x00\x08\x00\x00\x00"
               + b"\x25\x88"  # GPSInfo tag id, little-endian order
               + f"TestCam Model {doc_id:03d}".encode())
    seg = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    return b"\xff\xd8" + seg + b"\xff\xd9"


def build_metadata_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """PDF metadata family: a base doc plus an incremental-update
    revision carrying every identifying-metadata category
    metadataInspect.js:86 enumerates — Info dict (+ custom keys), XMP,
    OCGs (one filename-leaky), embedded file, signature, hidden info
    dict, markup-annot author, per-object XMP, EXIF-bearing JPEG
    stream, OpenAction/JavaScript, Lang/PageLabels/ViewerPreferences,
    PieceInfo — and for odd docs a second revision (prior-revision
    leak). Every 8th doc is AES-256 encrypted with no revision."""
    from .operators.pdf.document import PdfDocument
    from .operators.pdf.lexer import Name, Ref
    from .operators.pdf.metadata import serialize_object
    from .render_pdf import render_pdf as _render

    import hashlib

    model = build_doc_model(doc_id, seed=seed, n_pages=1)
    golden = {
        "title": None, "author": None, "producer": None,
        "n_custom_info": 0, "has_doc_id": False, "encrypted": False,
        "has_xmp": False, "n_xmp_objects": 0, "n_piece_info": 0,
        "ocg_names": "", "n_embedded_files": 0, "open_action": False,
        "has_javascript": False, "lang": None, "page_labels": False,
        "viewer_prefs": False, "n_signatures": 0, "n_hidden_info": 0,
        "annot_authors": "", "n_image_meta": 0, "prior_revisions": 1,
    }

    if doc_id % 8 == 7:
        model["producer"] = "ScribeFixture 1.0"  # 17 bytes: survives the
        # reference's degenerate-length AES string passthrough
        pdf = _render(model, rotate=False, outline=False,
                      form_xobject=False, xref_stream=False,
                      encrypt_mode="aesv3")
        golden.update(producer="ScribeFixture 1.0", encrypted=True,
                      has_doc_id=True)
        return {"pdf": pdf, "expected": golden}

    base = _render(model, rotate=False, outline=False,
                   form_xobject=False, xref_stream=False)
    doc = PdfDocument(base)
    size = max(doc.xref) + 1
    nxt = size
    objs: dict[int, bytes] = {}

    def add(body: bytes) -> int:
        nonlocal nxt
        objs[nxt] = body
        nxt += 1
        return nxt - 1

    def stream(dict_body: str, data: bytes) -> bytes:
        return (f"<< {dict_body} /Length {len(data)} >>\nstream\n"
                ).encode() + data + b"\nendstream"

    catalog = dict(doc.resolve(doc.trailer["Root"]))

    # XMP on the catalog (always)
    xmp_num = add(stream("/Type /Metadata /Subtype /XML", _XMP_PACKET))
    catalog[Name("Metadata")] = Ref(xmp_num, 0)
    golden["has_xmp"] = True

    # Info dict (always; Company = custom key on every 3rd doc)
    title = f"Fixture Doc {doc_id}"
    author = f"Author {doc_id % 5}"
    info = (f"<< /Title ({title}) /Author ({author}) "
            f"/Producer (ScribeSpark 2.0) "
            f"/CreationDate (D:20260101000000Z)")
    golden.update(title=title, author=author, producer="ScribeSpark 2.0")
    if doc_id % 3 == 0:
        info += " /Company (ACME Corp)"
        golden["n_custom_info"] = 1
    info_num = add((info + " >>").encode())

    if doc_id % 2 == 1:  # OCGs, one leaking a source path
        clean = "Diagram Layer"
        leaky = f"C:\\art\\source{doc_id}.psd"
        a = add(f"<< /Type /OCG /Name ({clean}) >>".encode())
        b = add(("<< /Type /OCG /Name (" + leaky.replace("\\", "\\\\")
                 + ") >>").encode())
        catalog[Name("OCProperties")] = {
            Name("OCGs"): [Ref(a, 0), Ref(b, 0)],
            Name("D"): {Name("Order"): []}}
        golden["ocg_names"] = ",".join(sorted([clean, leaky]))

    if doc_id % 3 == 1:  # embedded file
        data = f"id,value\n{doc_id},1\n".encode()
        ef = add(stream("/Type /EmbeddedFile", data))
        add((f"<< /Type /Filespec /F (data_{doc_id}.csv) "
             f"/EF << /F {ef} 0 R >> >>").encode())
        golden["n_embedded_files"] = 1

    if doc_id % 5 == 2:  # signature
        add(b"<< /Type /Sig /Filter /Adobe.PPKLite "
            b"/SubFilter /adbe.pkcs7.detached "
            b"/ByteRange [0 0 0 0] /Contents <00> >>")
        golden["n_signatures"] = 1

    if doc_id % 6 == 3:  # hidden info dict off an arbitrary key
        add(b"<< /Author (ghost writer) /Company (OldCo Inc) >>")
        golden["n_hidden_info"] = 1

    if doc_id % 7 == 2:  # markup-annot author
        rev = f"reviewer_{doc_id}"
        add((f"<< /Type /Annot /Subtype /Text /Rect [0 0 10 10] "
             f"/Contents (margin note) /T ({rev}) >>").encode())
        golden["annot_authors"] = rev

    if doc_id % 9 == 4:  # stray per-object XMP
        add(stream("/Type /Metadata /Subtype /XML", _XMP_PACKET))
        golden["n_xmp_objects"] = 1

    if doc_id % 8 == 2:  # EXIF-bearing JPEG image stream
        jpg = _fake_exif_jpeg(doc_id)
        add(stream("/Subtype /Image /Width 2 /Height 2 "
                   "/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                   "/Filter /DCTDecode", jpg))
        golden["n_image_meta"] = 1

    if doc_id % 2 == 0:
        catalog[Name("Lang")] = b"en-US"
        golden["lang"] = "en-US"
    if doc_id % 5 == 0:
        catalog[Name("PageLabels")] = {
            Name("Nums"): [0, {Name("S"): Name("D")}]}
        golden["page_labels"] = True
    if doc_id % 6 == 0:
        catalog[Name("ViewerPreferences")] = {Name("HideToolbar"): True}
        golden["viewer_prefs"] = True
    if doc_id % 4 == 0:
        catalog[Name("OpenAction")] = {
            Name("S"): Name("GoTo"), Name("D"): [None, Name("Fit")]}
        catalog[Name("Names")] = {
            Name("JavaScript"): {Name("Names"): []}}
        golden["open_action"] = True
        golden["has_javascript"] = True
    if doc_id % 7 == 5:
        catalog[Name("PieceInfo")] = {
            Name("FixtureApp"): {Name("Private"): b"x"}}
        golden["n_piece_info"] = 1

    did = hashlib.md5(f"metafix{doc_id}".encode()).hexdigest()
    trailer_pairs = f"/Info {info_num} 0 R /ID [<{did}> <{did}>] "
    golden["has_doc_id"] = True
    pdf = _append_pdf_revision(
        base, objs, serialize_object(catalog).encode("latin-1"), 1,
        size, trailer_pairs)
    golden["prior_revisions"] = 2

    if doc_id % 2 == 1:  # second incremental save
        pdf = _append_pdf_revision(
            pdf, {nxt: b"<< /FixtureRev 2 >>"}, None, 1, nxt + 1,
            trailer_pairs)
        golden["prior_revisions"] = 3

    return {"pdf": pdf, "expected": golden}


def write_metadata_parquet(path: str, n_docs: int = 24,
                           seed: int = SEED_DEFAULT) -> None:
    """metadata_docs.parquet (url, html PDF bytes) + pdf_meta.parquet
    golden one-row-per-url metadata reports."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_metadata_models(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_meta/{doc_id:08d}"
        doc_rows.append({"url": url, "html": m["pdf"]})
        golden_rows.append({"url": url, **m["expected"]})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "metadata_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "pdf_meta.parquet"), index=False)


def build_list_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Enumerated-list family: an intro paragraph, then a numbered
    list ("1." "2." "3."), a bullet list ("•" x3) and a paren-alpha
    pair ("(a)"/"(b)") each authored at uniform pitch (one reflow
    paragraph) that the numbering-scheme pass must split into one
    paragraph per item."""
    rng = _doc_rng(seed + 515151, doc_id)
    y = TOP_BASELINE
    pars, expected = [], []

    def _line(tokens, y0):
        words, x = [], MARGIN_LEFT
        for tok in tokens:
            width = len(tok) * CHAR_W
            words.append({
                "text": tok, "chars": None, "out_words": [tok],
                "left": x, "right": x + width,
                "top": y0 - ASC_H, "bottom": y0 + DESC_H, "conf": 97})
            x += width + WORD_GAP
        return {"words": words, "baseline_y": y0, "indent": 0}

    def _body(n):
        return [rng.choice(LEXICON) for _ in range(n)]

    # intro paragraph (2 lines)
    lines = []
    for _ in range(2):
        lines.append(_line(_body(6), y))
        y += LINE_PITCH
    pars.append({"lines": lines})
    expected.append({"par_n": 0, "first_word": lines[0]["words"][0]
                     ["text"], "n_lines": 2})
    y += PAR_GAP - LINE_PITCH

    # numbered list: 3 items (weak num-dot form needs a 3-run)
    lines = []
    for i in range(1, 4):
        lines.append(_line([f"{i}."] + _body(5), y))
        y += LINE_PITCH
    pars.append({"lines": lines})
    for i in range(1, 4):
        expected.append({"par_n": len(expected), "first_word": f"{i}.",
                         "n_lines": 1})
    y += PAR_GAP - LINE_PITCH

    # bullet list: same glyph three times
    lines = []
    for _ in range(3):
        lines.append(_line(["•"] + _body(4), y))
        y += LINE_PITCH
    pars.append({"lines": lines})
    for _ in range(3):
        expected.append({"par_n": len(expected), "first_word": "•",
                         "n_lines": 1})
    y += PAR_GAP - LINE_PITCH

    # paren-alpha pair (strong form activates at a 2-run)
    lines = []
    for mark in ("(a)", "(b)"):
        lines.append(_line([mark] + _body(5), y))
        y += LINE_PITCH
    pars.append({"lines": lines})
    for mark in ("(a)", "(b)"):
        expected.append({"par_n": len(expected), "first_word": mark,
                         "n_lines": 1})
    y += PAR_GAP - LINE_PITCH

    # dingbat bullets: a symbol glyph outside the explicit bullet set
    # ("✦", category So) activates the bullet scheme via the
    # lone-symbol rule (analyzeLayout.js lineEnumerator, last branch);
    # the trailing "“"-led line is the negative control — punctuation
    # never reads as a bullet, so it stays glued to the third item.
    lines = []
    for _ in range(3):
        lines.append(_line(["✦"] + _body(4), y))
        y += LINE_PITCH
    lines.append(_line(["“"] + _body(3), y))
    y += LINE_PITCH
    pars.append({"lines": lines})
    for k in range(3):
        expected.append({"par_n": len(expected), "first_word": "✦",
                         "n_lines": 2 if k == 2 else 1})

    model = {"doc_id": doc_id, "family": "base",
             "pages": [{"pars": pars, "width": PAGE_W,
                        "height": PAGE_H}]}
    for rec in expected:
        rec["page_n"] = 0
    return {"model": model, "expected": expected}


def write_list_parquet(path: str, n_docs: int = 25,
                       seed: int = SEED_DEFAULT) -> None:
    """list_docs.parquet (url, hOCR bytes) + lists.parquet golden
    paragraph rows for the list_items oracle."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_list_models(doc_id, seed=seed)
        url = f"https://fixtures.test/hocr_lists/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_hocr(m["model"]).encode("utf-8")})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "list_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "lists.parquet"), index=False)


def build_toc_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """TOC family: page 0 is a dense table of contents (dot-leader
    entries, one of them wrapped over two lines) authored as one
    uniform-pitch paragraph that must split into one paragraph per
    entry; page 1 is plain prose that must NOT split even though one
    line mentions a trailing number."""
    rng = _doc_rng(seed + 606060, doc_id)
    y = TOP_BASELINE

    def _line(tokens, y0):
        words, x = [], MARGIN_LEFT
        for tok in tokens:
            width = len(tok) * CHAR_W
            words.append({
                "text": tok, "chars": None, "out_words": [tok],
                "left": x, "right": x + width,
                "top": y0 - ASC_H, "bottom": y0 + DESC_H, "conf": 97})
            x += width + WORD_GAP
        return {"words": words, "baseline_y": y0, "indent": 0}

    expected = []
    toc_lines = []
    n_entries = rng.randint(6, 9)
    page_no = 1
    par_n = 0
    for e in range(n_entries):
        title = [rng.choice(LEXICON) for _ in range(rng.randint(2, 3))]
        wrapped = e == 2  # one two-line entry
        if wrapped:
            toc_lines.append(_line(title + [rng.choice(LEXICON)], y))
            y += LINE_PITCH
            toc_lines.append(_line(
                [rng.choice(LEXICON), ".......", str(page_no)], y))
            n_lines = 2
        else:
            toc_lines.append(_line(
                title + [".......", str(page_no)], y))
            n_lines = 1
        y += LINE_PITCH
        expected.append({"page_n": 0, "par_n": par_n,
                         "n_lines": n_lines})
        par_n += 1
        page_no += rng.randint(3, 20)
    page0 = {"pars": [{"lines": toc_lines}],
             "width": PAGE_W, "height": PAGE_H}

    # prose page: one 5-line paragraph; a trailing number on one line
    # must not read as a TOC entry (no dot leaders, density gate off)
    y = TOP_BASELINE
    prose = []
    for i in range(5):
        toks = [rng.choice(LEXICON) for _ in range(6)]
        if i == 2:
            toks.append("1984")
        prose.append(_line(toks, y))
        y += LINE_PITCH
    page1 = {"pars": [{"lines": prose}], "width": PAGE_W,
             "height": PAGE_H}
    expected.append({"page_n": 1, "par_n": 0, "n_lines": 5})

    model = {"doc_id": doc_id, "family": "base",
             "pages": [page0, page1]}
    return {"model": model, "expected": expected}


def write_toc_parquet(path: str, n_docs: int = 25,
                      seed: int = SEED_DEFAULT) -> None:
    """toc_docs.parquet (url, hOCR bytes) + toc.parquet golden
    paragraph rows."""
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_toc_models(doc_id, seed=seed)
        url = f"https://fixtures.test/hocr_toc/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_hocr(m["model"]).encode("utf-8")})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "toc_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "toc.parquet"), index=False)


def build_linenum_b_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """Case-B line numbers: every body line leads with its number as a
    merged prefix word ("7 The witness said ..."). Every 5th doc is
    the confuser instead — a data table whose first content word after
    the index is numeric — and must get NO lineNum flags."""
    rng = _doc_rng(seed + 131313, doc_id)
    confuser = doc_id % 5 == 4
    pages, expected = [], []
    for page_n in range(3):
        y = TOP_BASELINE
        lines = []
        for i in range(1, 13):
            words, x = [], MARGIN_LEFT
            toks = [str(i)]
            if confuser:
                toks.append(f"{1000 + i * 7}")
                toks += [rng.choice(LEXICON) for _ in range(2)]
            else:
                # wide prose line (med right frac >= 0.35 of the page)
                toks += [rng.choice(LEXICON) for _ in range(7)]
            for tok in toks:
                width = len(tok) * CHAR_W
                words.append({
                    "text": tok, "chars": None, "out_words": [tok],
                    "left": x, "right": x + width,
                    "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
                x += width + WORD_GAP
            lines.append({"words": words, "baseline_y": y, "indent": 0})
            expected.append({
                "page_n": page_n, "line_n": i - 1,
                "first_word_linenum": not confuser})
            y += LINE_PITCH
        pages.append({"pars": [{"lines": lines}], "width": PAGE_W,
                      "height": PAGE_H})
    model = {"doc_id": doc_id, "family": "base", "pages": pages}
    return {"model": model, "expected": expected}


def write_linenum_b_parquet(path: str, n_docs: int = 25,
                            seed: int = SEED_DEFAULT) -> None:
    import os

    import pandas as pd

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_linenum_b_models(doc_id, seed=seed)
        url = f"https://fixtures.test/hocr_linenum_b/{doc_id:08d}"
        doc_rows.append({
            "url": url,
            "html": render_hocr(m["model"]).encode("utf-8")})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "linenum_b_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "linenum_b.parquet"), index=False)


def build_docx_num_models(doc_id: int, seed: int = SEED_DEFAULT) -> dict:
    """DOCX numbering family: multilevel decimal ("%1." / "%1.%2."),
    paren-letter and roman schemes, with deeper-level counter resets
    exercised (1, 2, 2.1, 2.2, 3, 3.1)."""
    rng = _doc_rng(seed + 999331, doc_id)
    y = TOP_BASELINE

    def _par(tokens, num=None):
        nonlocal y
        words, x = [], MARGIN_LEFT
        for tok in tokens:
            width = len(tok) * CHAR_W
            words.append({
                "text": tok, "chars": None, "out_words": [tok],
                "left": x, "right": x + width,
                "top": y - ASC_H, "bottom": y + DESC_H, "conf": 97})
            x += width + WORD_GAP
        par = {"lines": [{"words": words, "baseline_y": y,
                          "indent": 0}]}
        if num:
            par["num"] = num
        y += PAR_GAP
        return par

    def _body(n):
        return [rng.choice(LEXICON) for _ in range(n)]

    pars, expected = [], []

    def add(num, par_num):
        pars.append(_par(_body(rng.randint(3, 6)), num))
        expected.append(par_num)

    add(None, None)                                  # intro
    add({"numId": "1", "ilvl": 0}, "1")
    add({"numId": "1", "ilvl": 0}, "2")
    add({"numId": "1", "ilvl": 1}, "2.1")
    add({"numId": "1", "ilvl": 1}, "2.2")
    add({"numId": "1", "ilvl": 0}, "3")
    add({"numId": "1", "ilvl": 1}, "3.1")            # reset exercised
    add({"numId": "2", "ilvl": 0}, "(a)")
    add({"numId": "2", "ilvl": 0}, "(b)")
    add({"numId": "3", "ilvl": 0}, "i")
    add({"numId": "3", "ilvl": 0}, "ii")

    # Footnotes: two referenced out of (id) order plus an unreferenced
    # one (must not be lifted). Markers become inline index words;
    # footnote paragraphs append after the body in first-reference
    # order with parNum = index and a live link to their marker word.
    note_a = " ".join(_body(3))
    note_b = " ".join(_body(4))
    pars[1]["footnote_refs"] = ["7"]   # first reference  -> index 1
    pars[4]["footnote_refs"] = ["3"]   # second reference -> index 2

    model = {
        "doc_id": doc_id, "family": "base",
        "pages": [{"pars": pars, "width": PAGE_W, "height": PAGE_H}],
        "docx_numbering": {
            "abstract": {
                "0": {0: {"start": 1, "numFmt": "decimal",
                          "lvlText": "%1."},
                      1: {"start": 1, "numFmt": "decimal",
                          "lvlText": "%1.%2."}},
                "1": {0: {"start": 1, "numFmt": "lowerLetter",
                          "lvlText": "(%1)"}},
                "2": {0: {"start": 1, "numFmt": "lowerRoman",
                          "lvlText": "%1."}},
            },
            "nums": {"1": "0", "2": "1", "3": "2"},
        },
        "docx_footnotes": {
            "3": note_b, "7": note_a,
            "9": " ".join(_body(3)),  # never referenced -> not lifted
        },
    }
    rows = [{"par_n": i, "par_num": pn, "par_type": "body",
             "footnote_linked": i in (1, 4)}
            for i, pn in enumerate(expected)]
    n = len(rows)
    rows.append({"par_n": n, "par_num": "1", "par_type": "footnote",
                 "footnote_linked": True})
    rows.append({"par_n": n + 1, "par_num": "2", "par_type": "footnote",
                 "footnote_linked": True})
    return {"model": model, "expected": rows}


def write_docx_num_parquet(path: str, n_docs: int = 25,
                           seed: int = SEED_DEFAULT) -> None:
    import os

    import pandas as pd

    from .render_docx import render_docx

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        m = build_docx_num_models(doc_id, seed=seed)
        url = f"https://fixtures.test/docx_num/{doc_id:08d}"
        doc_rows.append({"url": url, "html": render_docx(m["model"])})
        for rec in m["expected"]:
            golden_rows.append({"url": url, **rec})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "docx_num_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "docx_num.parquet"), index=False)


ENCRYPT_MODES = ("rc4_40", "rc4_128", "aesv2", "aesv3")


def write_encrypted_parquet(path: str, n_docs: int = 40,
                            seed: int = SEED_DEFAULT) -> None:
    """Encrypted-PDF family: encrypted_docs.parquet (url, html) cycling
    RC4-40/RC4-128/AES-128/AES-256 standard-handler variants, plus
    tampered docs (corrupted /U on V=5) that must surface as
    parse failures; encrypted.parquet carries the golden text and the
    expected failed flag."""
    import os

    import pandas as pd

    from .render_pdf import render_pdf as _render

    doc_rows, golden_rows = [], []
    for doc_id in range(n_docs):
        model = build_doc_model(doc_id, seed=seed)
        url = f"https://fixtures.test/pdf_encrypted/{doc_id:08d}"
        mode = ENCRYPT_MODES[doc_id % len(ENCRYPT_MODES)]
        tampered = doc_id % 10 == 9
        if tampered:
            data = bytearray(_render(model, encrypt_mode="aesv3"))
            # corrupt the /U validation hash -> empty-password check
            # fails -> PdfError('encrypted: password required')
            at = data.find(b"/U <")
            ch = data[at + 4]
            data[at + 4] = ord("0") if ch != ord("0") else ord("1")
            html = bytes(data)
            text, failed = "", True
        else:
            html = _render(model, encrypt_mode=mode)
            text, failed = expected_text(model), False
        doc_rows.append({"url": url, "html": html})
        golden_rows.append({"url": url, "text": text, "failed": failed})
    pd.DataFrame(doc_rows).to_parquet(
        os.path.join(path, "encrypted_docs.parquet"), index=False)
    pd.DataFrame(golden_rows).to_parquet(
        os.path.join(path, "encrypted.parquet"), index=False)


def bench_page_count(doc_id: int) -> int:
    """FIXTURES.md §5 bench skew mix: 90% 1-3 pages, 9% 10-30, 1%
    200-500 — the long tail the salting strategy must absorb."""
    r = (doc_id * 2654435761) % 100
    rng = _doc_rng(991, doc_id)
    if r < 90:
        return rng.randint(1, 3)
    if r < 99:
        return rng.randint(10, 30)
    return rng.randint(200, 500)


def make_bench_rows(n_docs: int, seed: int = SEED_DEFAULT,
                    formats: tuple[str, ...] | None = None) -> list[dict]:
    """Bench-tier corpus with the skewed page-count mix."""
    if formats is None:
        formats = available_formats()
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for doc_id in range(n_docs):
        fmt = _pick_format(doc_id, formats)
        family = {"hocr_char": "charlevel", "hocr_cjk": "cjk"}.get(fmt, "base")
        render_fmt = "hocr" if fmt.startswith("hocr_") else fmt
        n_pages = 1 if fmt in ("text", "docx") else bench_page_count(doc_id)
        model = build_doc_model(doc_id, seed=seed, n_pages=n_pages,
                                family=family)
        golden_model = model
        if fmt == "stext":
            html: bytes = render_stext(model).encode("utf-8")
        elif fmt == "pdf_cffsub":
            html = render_pdf(model, cff_subset={
                "drop": CFF_DROP_CODES, "unmapped": CFF_UNMAPPED_CODES})
            golden_model = strip_model_chars(model, CFF_DROP_CODES)
        elif fmt in ("pdf", "pdf_twocol"):
            html = render_pdf(model)
        elif fmt == "textract":
            html = render_textract(model).encode("utf-8")
        elif fmt == "google_vision":
            html = render_google_vision(model).encode("utf-8")
        elif fmt == "google_doc_ai":
            from .render_cloud import render_google_docai
            html = render_google_docai(model).encode("utf-8")
        elif fmt == "azure_doc_intel":
            from .render_cloud import render_azure_docintel
            html = render_azure_docintel(model).encode("utf-8")
        elif fmt == "docx":
            from .render_docx import render_docx
            html = render_docx(model)
        else:
            html = RENDERERS[render_fmt](model).encode("utf-8")
        rows.append({
            "url": f"https://fixtures.test/{fmt}/{doc_id:08d}",
            "warc_ts": base_ts + timedelta(seconds=doc_id),
            "html": html,
            "text": expected_text(golden_model),
            "lang": "eng",
        })
    return rows


def ensure_bench_corpus(path: str, n_docs: int,
                        seed: int = SEED_DEFAULT) -> str:
    """Write (once) and return the bench corpus parquet path."""
    import os

    import pandas as pd

    # Cache key includes the family mix so a stale cache from an older
    # corpus composition is never silently reused.
    mix_tag = sum(w * (i + 1) for i, (_, w) in enumerate(FORMAT_MIX))
    # rg8 suffix: cache key includes the row-group layout so a coarser
    # cached file is never silently reused (content is identical — the
    # layout only affects scan granularity).
    fpath = os.path.join(
        path, f"bench_{n_docs}_{seed}_{mix_tag}_rg8.parquet")
    if os.path.exists(fpath):
        return fpath
    os.makedirs(path, exist_ok=True)
    df = pd.DataFrame(make_bench_rows(n_docs, seed=seed))
    df["warc_ts"] = (
        pd.to_datetime(df["warc_ts"]).dt.tz_localize(None).astype("datetime64[us]"))
    # Small row groups keep the file splittable: Spark parallelizes the
    # scan across row-group boundaries, so no byte-shuffle is needed to
    # fan the parse out (at cluster scale the input is many files and
    # this is automatic). Round 6: 64 -> 8 rows per group — with the
    # 1%-huge-document tail, a 64-row group could hold several
    # multi-second documents and its task bounded the whole stage
    # (guide 2.5/6: straggler = biggest unsplittable piece).
    df[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        fpath, index=False, row_group_size=8)
    return fpath


def _pick_format(doc_id: int, available: tuple[str, ...]) -> str:
    mix = [(f, w) for f, w in FORMAT_MIX if f in available]
    total = sum(w for _, w in mix)
    r = (doc_id * 2654435761) % total  # Knuth multiplicative hash — deterministic
    acc = 0
    for f, w in mix:
        acc += w
        if r < acc:
            return f
    return mix[-1][0]


def available_formats() -> tuple[str, ...]:
    avail = ["hocr", "abbyy", "alto", "text", "hocr_char", "hocr_cjk",
             "textract", "google_vision", "hocr_furniture", "hocr_skew",
             "hocr_footnote", "google_doc_ai", "azure_doc_intel", "docx",
             "hocr_twocol", "pdf_twocol"]
    try:  # optional renderers land in later phases
        from . import render_stext as _  # noqa: F401
        avail.append("stext")
    except ImportError:
        pass
    try:
        from . import render_pdf as _  # noqa: F401
        avail.append("pdf")
        avail.append("pdf_cffsub")
    except ImportError:
        pass
    return tuple(avail)


def make_corpus_rows(n_docs: int, seed: int = SEED_DEFAULT,
                     formats: tuple[str, ...] | None = None) -> list[dict]:
    """Input-table rows ``(url, warc_ts, html, text, lang)`` plus
    expected-metadata fields (``format`` + counts) for golden tables."""
    if formats is None:
        formats = available_formats()
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for doc_id in range(n_docs):
        fmt = _pick_format(doc_id, formats)
        family = {"hocr_char": "charlevel", "hocr_cjk": "cjk",
                  "hocr_furniture": "furniture", "hocr_skew": "skew",
                  "hocr_footnote": "footnote", "hocr_twocol": "twocol",
                  "pdf_twocol": "twocol"}.get(fmt, "base")
        render_fmt = ("pdf" if fmt in ("pdf_twocol", "pdf_cffsub")
                      else "hocr" if fmt.startswith("hocr_") else fmt)
        indent_family = family == "base" and (doc_id % 10) == 7
        # Plain-text docs are kept to one model page so convertPageText's
        # pagination never splits a paragraph across synthetic pages
        # (reflow would insert '\n' at the page boundary).
        n_pages = 1 if fmt in ("text", "docx") else None
        if family == "twocol":
            model = build_two_column_model(doc_id, seed=seed)
        else:
            model = build_doc_model(doc_id, seed=seed, n_pages=n_pages,
                                    indent_family=indent_family,
                                    family=family)
        golden_model = model
        if fmt == "stext":
            html: bytes = render_stext(model).encode("utf-8")
        elif fmt == "pdf_cffsub":
            html = render_pdf(model, cff_subset={
                "drop": CFF_DROP_CODES, "unmapped": CFF_UNMAPPED_CODES})
            golden_model = strip_model_chars(model, CFF_DROP_CODES)
        elif fmt in ("pdf", "pdf_twocol"):
            # Every (19k+9)th plain-pdf doc omits /Widths entirely:
            # extraction is byte-identical only when the standard-14
            # Helvetica AFM fallback supplies the real advances
            # (operators/pdf/afm.py; words are laid out with the true
            # metrics, so flat substitutes garble the word gaps).
            sw = (fmt == "pdf" and doc_id % 19 == 9
                  and doc_id % 17 != 6)  # CID docs keep their /W
            # CID-doc variants, split on (doc_id//34) % 4 (doc_id//17
            # is even for every pdf-format CID doc — the format
            # picker's period correlates with the %17 cycle — so
            # //34 walks all residues): %4==0 omits /ToUnicode (byte
            # identity requires the Identity CIDs-as-codepoints
            # fallback), %4==1 uses the predefined /90ms-RKSJ-H CMap
            # (mixed-codespace split + Shift-JIS charset decode),
            # %4==3 encodes GIDs with an embedded TrueType cmap and no
            # /ToUnicode (requires the GID->Unicode reverse map,
            # parsePdfFonts.js buildGidToUnicodeFromTrueType).
            k4 = (doc_id // 34) % 4 if doc_id % 17 == 6 else None
            html = render_pdf(model, std_widths=sw,
                              cid_tounicode=k4 not in (0, 3),
                              cid_cmap="rksj" if k4 == 1 else None,
                              cid_gidmap=k4 == 3)
        elif fmt == "textract":
            html = render_textract(model).encode("utf-8")
        elif fmt == "google_vision":
            html = render_google_vision(model).encode("utf-8")
        elif fmt == "google_doc_ai":
            from .render_cloud import render_google_docai
            html = render_google_docai(model).encode("utf-8")
        elif fmt == "azure_doc_intel":
            from .render_cloud import render_azure_docintel
            html = render_azure_docintel(model).encode("utf-8")
        elif fmt == "docx":
            from .render_docx import render_docx
            html = render_docx(model)
        else:
            html = RENDERERS[render_fmt](model).encode("utf-8")
        counts = expected_counts(golden_model)
        if doc_id % 13 == 11:
            # crawl archives store many bodies gzipped; the wrapper is
            # transparent to extraction, so the expected text (and the
            # byte-identity oracle) is unchanged
            import gzip as _gzip

            html = _gzip.compress(html, mtime=0)  # deterministic bytes
        rows.append({
            "url": f"https://fixtures.test/{fmt}/{doc_id:08d}",
            "warc_ts": base_ts + timedelta(seconds=doc_id),
            "html": html,
            "text": expected_text(golden_model),
            "lang": "chi_sim" if family == "cjk" else "eng",
            "format": render_fmt,
            **counts,
        })
    return rows


def make_corpus_pandas(n_docs: int, seed: int = SEED_DEFAULT,
                       formats: tuple[str, ...] | None = None):
    import pandas as pd

    rows = make_corpus_rows(n_docs, seed=seed, formats=formats)
    df = pd.DataFrame(rows)
    # Microsecond precision: Spark cannot read TIMESTAMP(NANOS) parquet.
    df["warc_ts"] = (
        pd.to_datetime(df["warc_ts"]).dt.tz_localize(None).astype("datetime64[us]"))
    return df


def write_corpus_parquet(path: str, n_docs: int, seed: int = SEED_DEFAULT,
                         formats: tuple[str, ...] | None = None) -> None:
    """Write the input table (canonical 5 columns) and the golden
    metadata table next to it."""
    import os

    df = make_corpus_pandas(n_docs, seed=seed, formats=formats)
    os.makedirs(path, exist_ok=True)
    df[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        os.path.join(path, "corpus.parquet"), index=False)
    df[["url", "format", "page_count", "par_count", "line_count",
        "word_count"]].to_parquet(
        os.path.join(path, "meta.parquet"), index=False)

    # Golden span rows for pass-through-geometry formats.
    import pandas as pd

    span_rows = []
    for _, row in df.iterrows():
        fmt_slug = row["url"].split("/")[-2]
        if fmt_slug not in ("hocr", "alto"):  # excludes hocr_char/hocr_cjk
            continue
        doc_id = int(row["url"].rsplit("/", 1)[1])
        indent_family = (doc_id % 10) == 7
        model = build_doc_model(doc_id, seed=seed, indent_family=indent_family)
        span_rows.extend(expected_spans(model, fmt_slug, row["url"]))
    pd.DataFrame(span_rows).to_parquet(
        os.path.join(path, "spans.parquet"), index=False)

    # Multi-layer pair family: 10% of urls carry two extra OCR
    # renditions with seeded errors + golden eval/consensus values.
    layer_rows = []
    eval_rows = []
    consensus_rows = []
    combined_rows = []
    for _, row in df.iterrows():
        doc_id = int(row["url"].rsplit("/", 1)[1])
        if doc_id % 10 != 3:
            continue
        layers = build_layer_models(doc_id, seed=seed)
        url = row["url"]
        layer_rows.append({
            "url": url,
            "html_truth": render_hocr(layers["truth"]).encode("utf-8"),
            "html_ocr_a": render_hocr(layers["ocr_a"]).encode("utf-8"),
            "html_ocr_b": render_hocr(layers["ocr_b"]).encode("utf-8"),
        })
        eval_rows.append({"url": url, **layers["eval_expected"]})
        for rec in layers["consensus_expected"]:
            consensus_rows.append({"url": url, **rec})
        for rec in layers["combined_expected"]:
            combined_rows.append({"url": url, **rec})
    # Furniture-role golden rows (document-level layout pass).
    role_rows = []
    for _, row in df.iterrows():
        slug = row["url"].split("/")[-2]
        if slug not in ("hocr_furniture", "hocr_footnote"):
            continue
        doc_id = int(row["url"].rsplit("/", 1)[1])
        fam = "furniture" if slug == "hocr_furniture" else "footnote"
        model = build_doc_model(doc_id, seed=seed, family=fam)
        for pn, page in enumerate(model["pages"]):
            for pi, par in enumerate(page["pars"]):
                role_rows.append({
                    "url": row["url"], "page_n": pn, "par_n": pi,
                    "par_type": par.get("type", "body")})
    pd.DataFrame(role_rows).to_parquet(
        os.path.join(path, "roles.parquet"), index=False)

    pd.DataFrame(layer_rows).to_parquet(
        os.path.join(path, "layers.parquet"), index=False)
    pd.DataFrame(eval_rows).to_parquet(
        os.path.join(path, "eval.parquet"), index=False)
    pd.DataFrame(consensus_rows).to_parquet(
        os.path.join(path, "consensus.parquet"), index=False)
    pd.DataFrame(combined_rows).to_parquet(
        os.path.join(path, "combined.parquet"), index=False)
