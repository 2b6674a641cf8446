"""Golden font-metric observation rows for the ``font_metrics`` oracle.

Derived from the fixture layout model ONLY — never by running the
extractor. The model fully determines every char box
(fixtures._char_box) and the pass2/pass3 effects on char-level words
are analytic for the charlevel decoration set:

- quote decoration: pass3 smartens the straight quotes to a
  directional pair; boxes keep the '"' char class (x, y-31 .. x+8, y-12).
- dash decoration: the 20 px '-' against xHeight 19 normalizes to an
  en dash (20/19 > 0.9); box keeps the '-' class (y-13 .. y-9).
- ligature decoration: replace_ligatures expands the text past the
  char count, so calcCharMetrics skips the whole word
  (fontStatistics.js:242-333 len-mismatch guard) — no rows.
- small-caps fix can't trigger (lexicon tokens are all lowercase) and
  the trailing-superscript split needs trailing digits (none).
- line xHeight/ascHeight: every charlevel line's x-class chars are
  19 px and asc-class chars 31 px, and the hOCR title carries the same
  values as fallback, so norm is always 19 (31 for digit chars).

Usage: python tools/make_font_golden.py [out.parquet]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scribe_js_spark.fixtures import (  # noqa: E402
    SEED_DEFAULT,
    _char_box,
    _pick_format,
    available_formats,
    build_doc_model,
)

XHEIGHT = 19.0
ASCHEIGHT = 31.0
_DIGIT_RE = re.compile(r"\d")


def model_font_observations(model: dict, url: str) -> list[dict]:
    """Observation rows (family, style, kind, key, value) the extractor
    must produce for one charlevel document, computed from the model."""
    rows = []
    for page in model["pages"]:
        for par in page["pars"]:
            for line in par["lines"]:
                y = line["baseline_y"]
                for w in line["words"]:
                    if not w.get("chars") or w["conf"] < 80:
                        continue
                    rendered = [ch for ch, _ in w["chars"]]
                    if "ﬁ" in rendered:  # ligature word drops out
                        continue
                    final = list(rendered)
                    if w.get("quoted"):
                        final[0], final[-1] = "“", "”"
                    widths = [cw for _, cw in w["chars"]]
                    final = [
                        "–" if (c == "-" and cw == 20) else c
                        for c, cw in zip(final, widths)]
                    boxes = []
                    x = w["left"]
                    for ch0, cw in w["chars"]:
                        boxes.append(_char_box(ch0, x, cw, y))
                        x += cw
                    for k, ch in enumerate(final):
                        le, t, r, b = boxes[k]
                        h, wd = float(b - t), float(r - le)
                        norm = ASCHEIGHT if _DIGIT_RE.search(ch) else XHEIGHT
                        code = str(ord(ch))
                        base = {"url": url, "family": "Default",
                                "style": "normal"}
                        rows.append({**base, "kind": "width", "key": code,
                                     "value": wd / norm})
                        rows.append({**base, "kind": "height", "key": code,
                                     "value": h / norm})
                        if k + 1 < len(final):
                            nl, nt, nr, nb = boxes[k + 1]
                            trailing = float(nl - r)
                            w_next = float(nr - nl)
                            if trailing + w_next > 0:
                                bigram = f"{code},{ord(final[k + 1])}"
                                rows.append({
                                    **base, "kind": "kerning",
                                    "key": bigram, "value": trailing / norm})
                                rows.append({
                                    **base, "kind": "kerning2",
                                    "key": bigram,
                                    "value": (trailing + w_next) / norm})
    return rows


def main():
    import pandas as pd

    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/t2/font_obs.parquet"
    formats = available_formats()
    rows = []
    for doc_id in range(1000):
        if _pick_format(doc_id, formats) != "hocr_char":
            continue
        model = build_doc_model(doc_id, seed=SEED_DEFAULT, family="charlevel")
        url = f"https://fixtures.test/hocr_char/{doc_id:08d}"
        rows.extend(model_font_observations(model, url))
    pd.DataFrame(rows).to_parquet(out, index=False)
    print(f"{out}: {len(rows)} observation rows")


if __name__ == "__main__":
    main()
