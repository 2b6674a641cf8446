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
# format mix per FIXTURES.md §5 (pdf/stext rendered once those writers land)
FORMAT_MIX = (
    ("hocr", 30), ("abbyy", 25), ("alto", 15), ("text", 10),
    ("stext", 10), ("pdf", 10),
)


def _doc_rng(seed: int, doc_id: int) -> random.Random:
    return random.Random(seed * 1_000_003 + doc_id)


# ---------------------------------------------------------------- model


def build_doc_model(doc_id: int, seed: int = SEED_DEFAULT,
                    n_pages: int | None = None,
                    indent_family: bool = False) -> dict:
    """Ground-truth layout model for one document."""
    rng = _doc_rng(seed, doc_id)
    if n_pages is None:
        n_pages = rng.randint(1, 3)

    pages = []
    for page_n in range(n_pages):
        pars = []
        n_pars = rng.randint(2, 5)
        y = TOP_BASELINE
        prev_single = False
        for par_n in range(n_pars):
            if y > MAX_BASELINE:
                break
            min_lines = 2 if (indent_family or prev_single) else 1
            n_lines = rng.randint(min_lines, 6)
            lines = []
            for line_n in range(n_lines):
                if y > MAX_BASELINE:
                    break
                indent = INDENT if (indent_family and line_n == 0) else 0
                x = MARGIN_LEFT + indent
                words = []
                n_words = rng.randint(4, 9)
                for w in range(n_words):
                    token = rng.choice(LEXICON)
                    width = len(token) * CHAR_W
                    if x + width > MARGIN_LEFT + USABLE_W:
                        break
                    conf = rng.randint(40, 74) if rng.random() < 0.05 \
                        else rng.randint(95, 99)
                    words.append({
                        "text": token,
                        "left": x, "right": x + width,
                        "top": y - ASC_H, "bottom": y + DESC_H,
                        "conf": conf,
                    })
                    x += width + WORD_GAP
                if not words:
                    continue
                # Paragraph-final line ends with a period.
                lines.append({"words": words, "baseline_y": y, "indent": indent})
                y += LINE_PITCH
            if not lines:
                continue
            last_word = lines[-1]["words"][-1]
            last_word["text"] += "."
            last_word["right"] += CHAR_W
            pars.append({"lines": lines})
            prev_single = len(lines) == 1
            y += PAR_GAP - LINE_PITCH  # total gap between pars = PAR_GAP
        if indent_family and pars and len(pars[-1]["lines"]) == 1:
            pars.pop()  # trailing single-line par is undetectable by indent
        if pars:
            pages.append({"pars": pars, "width": PAGE_W, "height": PAGE_H})
    if not pages:  # degenerate fallback: one fixed paragraph
        pages = [{
            "pars": [{"lines": [{
                "words": [{
                    "text": "data.", "left": MARGIN_LEFT,
                    "right": MARGIN_LEFT + 5 * CHAR_W,
                    "top": TOP_BASELINE - ASC_H,
                    "bottom": TOP_BASELINE + DESC_H, "conf": 97,
                }],
                "baseline_y": TOP_BASELINE, "indent": 0,
            }]}],
            "width": PAGE_W, "height": PAGE_H,
        }]
    return {"doc_id": doc_id, "pages": pages, "indent_family": indent_family}


def expected_text(model: dict) -> str:
    """Reference writeText({reflowText: true}) semantics applied to the
    model: words joined ' ', lines of one par joined ' ', each par after
    the first prefixed '\\n' (page boundary = paragraph boundary)."""
    pars_out = []
    for page in model["pages"]:
        for par in page["pars"]:
            words = [w["text"] for line in par["lines"] for w in line["words"]]
            pars_out.append(" ".join(words))
    return "\n".join(pars_out)


def expected_counts(model: dict) -> dict:
    n_words = sum(
        len(line["words"])
        for page in model["pages"] for par in page["pars"] for line in par["lines"])
    n_lines = sum(
        len(par["lines"]) for page in model["pages"] for par in page["pars"])
    n_pars = sum(len(page["pars"]) for page in model["pages"])
    return {
        "page_count": len(model["pages"]),
        "par_count": n_pars,
        "line_count": n_lines,
        "word_count": n_words,
    }


# ------------------------------------------------------------- renderers


def render_hocr(model: dict) -> str:
    out = [
        "<html><head><meta name='ocr-system' content='tesseract'></head><body>"]
    for page_n, page in enumerate(model["pages"]):
        out.append(
            f"<div class='ocr_page' id='page_{page_n + 1}' "
            f"title='image \"page_{page_n + 1}\"; "
            f"bbox 0 0 {page['width']} {page['height']}; ppageno {page_n}'>")
        line_counter = 0
        for par in page["pars"]:
            out.append("<p class='ocr_par' lang='eng'>")
            for line in par["lines"]:
                line_counter += 1
                l = min(w["left"] for w in line["words"])
                r = max(w["right"] for w in line["words"])
                t = min(w["top"] for w in line["words"])
                b = max(w["bottom"] for w in line["words"])
                # x_size = asc + desc + x-ascender share; mirrors Tesseract:
                # ascHeight = x_size - x_descenders, xHeight = that - x_ascenders
                out.append(
                    f"<span class='ocr_line' title='bbox {l} {t} {r} {b}; "
                    f"baseline 0 -{DESC_H}; x_size {ASC_H + DESC_H}; "
                    f"x_descenders {DESC_H}; x_ascenders 12'>")
                for w_n, w in enumerate(line["words"]):
                    wid = f"word_{page_n + 1}_{line_counter}_{w_n + 1}"
                    out.append(
                        f"<span class='ocrx_word' id='{wid}' "
                        f"title='bbox {w['left']} {w['top']} {w['right']} "
                        f"{w['bottom']}; x_wconf {w['conf']}'>"
                        f"{escape_xml(w['text'])}</span>")
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


def render_pdf(model: dict) -> bytes:
    from .render_pdf import render_pdf as _rp
    return _rp(model)


# --------------------------------------------------------------- corpus


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
    avail = ["hocr", "abbyy", "alto", "text"]
    try:  # optional renderers land in later phases
        from . import render_stext as _  # noqa: F401
        avail.append("stext")
    except ImportError:
        pass
    try:
        from . import render_pdf as _  # noqa: F401
        avail.append("pdf")
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
        indent_family = (doc_id % 10) == 7  # 10% exercise the indent rule
        # Plain-text docs are kept to one model page so convertPageText's
        # pagination never splits a paragraph across synthetic pages
        # (reflow would insert '\n' at the page boundary).
        n_pages = 1 if fmt == "text" else None
        model = build_doc_model(doc_id, seed=seed, n_pages=n_pages,
                                indent_family=indent_family)
        if fmt == "stext":
            html: bytes = render_stext(model).encode("utf-8")
        elif fmt == "pdf":
            html = render_pdf(model)
        else:
            html = RENDERERS[fmt](model).encode("utf-8")
        counts = expected_counts(model)
        rows.append({
            "url": f"https://fixtures.test/{fmt}/{doc_id:08d}",
            "warc_ts": base_ts + timedelta(seconds=doc_id),
            "html": html,
            "text": expected_text(model),
            "lang": "eng",
            "format": fmt,
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
