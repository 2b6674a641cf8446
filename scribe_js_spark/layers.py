"""Spark wrappers for multi-layer comparison / consensus.

The grouping key is the document (all pages of both layers live in one
row), so the comparison is a zero-shuffle mapInPandas — the distributed
analog of compareOCR's per-page worker jobs
(/root/reference/js/recognizeConvert.js:221-276) with doc-level metric
reduction (calcEvalStatsDoc, :139-160).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVAL_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("total", LongType()),
    StructField("correct", LongType()),
    StructField("incorrect", LongType()),
    StructField("missed", LongType()),
    StructField("extra", LongType()),
    StructField("correctLowConf", LongType()),
    StructField("incorrectHighConf", LongType()),
])

CONSENSUS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("word_id", StringType()),
    StructField("text", StringType()),
    StructField("conf", IntegerType()),
])

COMB_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("line_n", LongType()),
    StructField("word_n", LongType()),
    StructField("word_id", StringType()),
    StructField("text", StringType()),
    StructField("conf", LongType()),
    StructField("left", LongType()),
    StructField("right", LongType()),
])


def _pages_of(data: bytes):
    from .extract import extract_document

    res = extract_document(bytes(data))
    if res.error is not None:
        raise ValueError(res.error)
    return res.pages


def compare_layers(df: DataFrame, cand_col: str = "html_ocr_a",
                   truth_col: str = "html_truth") -> DataFrame:
    """Per-url eval metrics of a candidate layer vs a ground-truth
    layer: per-page compare, doc-level sums."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .operators.compare import compare_ocr_page

        keys = ("total", "correct", "incorrect", "missed", "extra",
                "correctLowConf", "incorrectHighConf")
        for pdf in batches:
            out = {"url": []}
            for k in keys:
                out[k] = []
            for url, cand, truth in zip(
                    pdf["url"], pdf[cand_col], pdf[truth_col]):
                pages_a = _pages_of(cand)
                pages_b = _pages_of(truth)
                totals = dict.fromkeys(keys, 0)
                for i in range(max(len(pages_a), len(pages_b))):
                    pa = pages_a[i] if i < len(pages_a) else None
                    pb = pages_b[i] if i < len(pages_b) else None
                    if pa is None or pb is None:
                        if pb is not None:
                            totals["total"] += sum(
                                len(l.words) for l in pb.lines)
                            totals["missed"] += sum(
                                len(l.words) for l in pb.lines)
                        continue
                    m = compare_ocr_page(pa, pb)
                    for k in keys:
                        totals[k] += m[k]
                out["url"].append(url)
                for k in keys:
                    out[k].append(totals[k])
            yield pd.DataFrame(out)

    return df.select("url", cand_col, truth_col).mapInPandas(
        fn, schema=EVAL_SCHEMA)


def consensus_vote(df: DataFrame, base_col: str = "html_ocr_a",
                   comp_cols: tuple = ("html_truth", "html_ocr_b")) -> DataFrame:
    """Per-word consensus decisions for base vs N comparator layers."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .operators.compare import build_consensus_page

        for pdf in batches:
            out = {"url": [], "word_id": [], "text": [], "conf": []}
            for row in pdf.itertuples(index=False):
                url = row.url
                base_pages = _pages_of(getattr(row, base_col))
                comp_layers = [
                    _pages_of(getattr(row, c)) for c in comp_cols]
                for i, base_page in enumerate(base_pages):
                    comps = [
                        (layer[i] if i < len(layer) else None)
                        for layer in comp_layers]
                    res = build_consensus_page(base_page, comps)
                    for d in res["decisions"]:
                        out["url"].append(url)
                        out["word_id"].append(d["word_id"])
                        out["text"].append(d["text"])
                        out["conf"].append(d["conf"])
            yield pd.DataFrame(out)

    return df.select("url", base_col, *comp_cols).mapInPandas(
        fn, schema=CONSENSUS_SCHEMA)


def merge_comb_layers(df: DataFrame, col_a: str = "html_legacy",
                      col_b: str = "html_lstm",
                      legacy_lstm_comb: bool = True,
                      image_col: str = "page_image") -> DataFrame:
    """Comb-mode merge of two engine layers per document: page-pairwise
    comb_merge_page (compareOCRModule.js comb branch), emitting the
    merged word stream. Zero-shuffle mapInPandas keyed by document.

    When the input carries ``image_col`` (PNG bytes of the binarized
    page scan, nullable), conflicts are additionally scored with the
    image-based evalWords metric against page 0's image — the
    reference's visual comparison path."""
    has_image = image_col in df.columns

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .operators.comb import comb_merge_page

        for pdf in batches:
            out = {f.name: [] for f in COMB_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                pages_a = _pages_of(getattr(row, col_a))
                pages_b = _pages_of(getattr(row, col_b))
                image = None
                raw = getattr(row, image_col, None) if has_image else None
                if raw is not None and len(raw) > 0:
                    from .textops.multimodal import decode_png

                    _w, _h, _c, px = decode_png(bytes(raw))
                    image = px[:, :, 0]
                for i, pa in enumerate(pages_a):
                    if i >= len(pages_b):
                        break
                    merged = comb_merge_page(
                        pa, pages_b[i],
                        legacy_lstm_comb=legacy_lstm_comb,
                        page_image=image if i == 0 else None)
                    for line_n, line in enumerate(merged.lines):
                        for word_n, w in enumerate(line.words):
                            out["url"].append(row.url)
                            out["line_n"].append(line_n)
                            out["word_n"].append(word_n)
                            out["word_id"].append(w.id)
                            out["text"].append(w.text)
                            out["conf"].append(int(w.conf))
                            out["left"].append(int(w.bbox.left))
                            out["right"].append(int(w.bbox.right))
            yield pd.DataFrame(out)

    cols = ["url", col_a, col_b] + ([image_col] if has_image else [])
    return df.select(*cols).mapInPandas(fn, schema=COMB_SCHEMA)
