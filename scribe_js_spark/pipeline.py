"""Spark extraction pipeline.

The distributed analog of the reference's batch CLI
(/root/reference/js/extractTextDir.js: directory walk -> worker pool ->
per-document extraction, per-file errors never abort the batch):

    input df (url, warc_ts, html, text, lang)
      -> [optional salt repartition by size bucket]     # skew handling
      -> mapInPandas(extract)                           # one row = one doc,
                                                        # zero shuffles in the
                                                        # hot path
      -> (url, text, format, page_count, word_count, error[, spans])

Design notes for 100 TB scale:
- One row = one document end-to-end: the parse, paragraph assignment and
  text fold all happen inside a single Arrow-batched UDF, so the only
  shuffle in the whole job is the optional salting repartition.
- Skew: document parse cost varies by orders of magnitude. ``salt=True``
  hash-repartitions on (size_bucket, url) so the 1% of 200-500-page
  documents spread evenly instead of stacking in input-split order.
  AQE rebalances shuffle partitions but not UDF compute skew — the salt
  is ours to apply (SURVEY.md §4.1).
- Resume: ``resume_against`` anti-joins previously committed urls so a
  restarted run only processes the remainder (per-partition lineage is
  the output table itself, keyed by run_id).
- Arrow batch size: documents are large; cap records per batch via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session_conf).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType([
    StructField("page_n", IntegerType()),
    StructField("line_n", IntegerType()),
    StructField("word_n", IntegerType()),
    StructField("word_id", StringType()),
    StructField("text", StringType()),
    StructField("left", DoubleType()),
    StructField("top", DoubleType()),
    StructField("right", DoubleType()),
    StructField("bottom", DoubleType()),
    StructField("conf", DoubleType()),
    StructField("sup", BooleanType()),
    StructField("bold", BooleanType()),
    StructField("italic", BooleanType()),
    StructField("smallCaps", BooleanType()),
    StructField("dropcap", BooleanType()),
    StructField("baseline_slope", DoubleType()),
    StructField("baseline_offset", DoubleType()),
    StructField("par_n", IntegerType()),
    StructField("par_type", StringType()),
])

EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("text", StringType()),
    StructField("format", StringType()),
    StructField("error", StringType()),
    StructField("page_count", IntegerType()),
    StructField("word_count", IntegerType()),
])

EXTRACT_SPANS_SCHEMA = StructType(
    EXTRACT_SCHEMA.fields + [StructField("spans", ArrayType(SPAN_STRUCT))])


def session_conf(builder):
    """Recommended extraction-job settings, applied to a SparkSession builder."""
    return (
        builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches are bounded by BYTES (the load-bearing cap for
        # multi-MB document rows: 16 MB/batch regardless of row count —
        # verified on this Spark: a batch closes when EITHER cap is hit,
        # for mapInArrow and mapInPandas alike). The record cap is a
        # secondary bound; 64 would fragment narrow-row Python stages
        # (e.g. 16-byte pair rows) into ~10 us-a-piece micro-batches,
        # so it sits at 4096 now that the byte cap carries the memory
        # contract. Env-overridable for other deployments.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_MAX_RECORDS", "4096"))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(16 * 1024 * 1024))
        # Fine-grained input splits: document rows are heavy to *process*
        # relative to their bytes, so target many small scan partitions
        # and let the scheduler balance them instead of shuffling bytes.
        .config("spark.sql.files.maxPartitionBytes", str(1 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        # local mode: no data locality to wait for
        .config("spark.locality.wait", "0s")
    )


def _extract_batches(batches, with_spans: bool):
    import pandas as pd

    from .extract import extract_with_spans

    for pdf in batches:
        out = {
            "url": [], "text": [], "format": [], "error": [],
            "page_count": [], "word_count": [],
        }
        if with_spans:
            out["spans"] = []
        for url, html in zip(pdf["url"], pdf["html"]):
            rec = extract_with_spans(bytes(html), with_spans=with_spans)
            out["url"].append(url)
            out["text"].append(rec["text"])
            out["format"].append(rec["format"])
            out["error"].append(rec["error"])
            out["page_count"].append(rec["page_count"])
            out["word_count"].append(rec["word_count"])
            if with_spans:
                out["spans"].append(rec["spans"])
        yield pd.DataFrame(out)


def _extract_batches_arrow(batches):
    """Arrow-native extraction (no-spans path): consumes and produces
    ``pyarrow.RecordBatch`` directly. Skips the pandas layer entirely —
    the url column passes through zero-copy and the ~100KB document
    blobs avoid one object-dtype boxing per direction, which is a
    measurable share of the Spark-vs-multiprocessing overhead at high
    core counts (BENCH/BASELINE.md)."""
    import pyarrow as pa

    from .extract import extract_with_spans

    for rb in batches:
        urls = rb.column(rb.schema.get_field_index("url"))
        htmls = rb.column(rb.schema.get_field_index("html"))
        text, fmt, err, pc, wc = [], [], [], [], []
        for h in htmls:
            rec = extract_with_spans(h.as_py(), with_spans=False)
            text.append(rec["text"])
            fmt.append(rec["format"])
            err.append(rec["error"])
            pc.append(rec["page_count"])
            wc.append(rec["word_count"])
        yield pa.RecordBatch.from_arrays(
            [urls, pa.array(text, pa.string()),
             pa.array(fmt, pa.string()), pa.array(err, pa.string()),
             pa.array(pc, pa.int32()), pa.array(wc, pa.int32())],
            names=["url", "text", "format", "error",
                   "page_count", "word_count"])


def salt_by_size(df: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    """Spread large documents across partitions.

    Size bucket = log2 of byte length; hash-repartition on
    (bucket, url) so each partition receives a mix of sizes. This is
    the explicit analog of the reference's rolling-window job dispatch
    (/root/reference/js/extractPDFText.js:36-48) for a shared-nothing
    cluster.
    """
    salted = df.withColumn(
        "_size_bucket",
        F.floor(F.log2(F.greatest(F.length("html"), F.lit(1)))),
    )
    if num_partitions:
        salted = salted.repartition(num_partitions, "_size_bucket", "url")
    else:
        salted = salted.repartition("_size_bucket", "url")
    return salted.drop("_size_bucket")


# Page-level fan-out is opt-in: the two-branch plan scans the input
# twice (a byte-length filter cannot push into parquet), so it only pays
# off when single-document parse time rivals a whole partition's budget
# (multi-thousand-page documents). Measured on the bench corpus the
# whole-doc path wins up to ~5MB/doc.
PAGE_SPLIT_BYTES_DEFAULT = None


def extract_text(
    df: DataFrame,
    with_spans: bool = False,
    salt: bool = True,
    num_partitions: Optional[int] = None,
    resume_against: Optional[DataFrame] = None,
    page_split_bytes: Optional[int] = PAGE_SPLIT_BYTES_DEFAULT,
) -> DataFrame:
    """Run the extraction pipeline over an input DataFrame.

    ``resume_against``: a DataFrame of already-committed output (must
    contain ``url``); those documents are skipped via a left-anti join —
    the checkpoint/resume contract of the north rule.

    ``page_split_bytes``: documents larger than this take the page-level
    fan-out path — split into per-page strings (narrow), shuffle pages
    across the cluster, parse per page, reassemble per url. This bounds
    the straggler tail at one *page*, not one 500-page document, which
    is what makes N->4N scaling hold on skewed corpora. Small documents
    keep the zero-shuffle whole-document path. None disables splitting.
    """
    work = df.select("url", "html")
    if resume_against is not None:
        work = work.join(resume_against.select("url"), on="url", how="left_anti")

    if page_split_bytes is None:
        small, big = work, None
    else:
        size = F.length("html")
        small = work.filter(size <= page_split_bytes)
        big = work.filter(size > page_split_bytes)

    if salt:
        small = salt_by_size(small, num_partitions)
    # Unsalted path stays zero-shuffle on purpose: an A/B with a
    # round-robin spread_input() here measured 2.3x SLOWER on the
    # bench corpus (19-20 s vs 8 s) — repartitioning multi-MB binary
    # document rows pays a per-row sort (sortBeforeRepartition) plus a
    # full serialize/deserialize of the payload, which dwarfs the
    # parallelism gain; fine-grained row groups in the input file give
    # the scan its parallelism without moving bytes (round 6).

    schema = EXTRACT_SPANS_SCHEMA if with_spans else EXTRACT_SCHEMA

    # mapInArrow skips the pandas boxing layer, but an interleaved A/B
    # at local[32] (tools/bench_arrow_ab.py: pandas 13.3s vs arrow
    # 16.3s, best-of-3 alternating) measured it 22% SLOWER here — the
    # per-value .as_py() calls cost more than pandas' bulk object
    # conversion. It stays opt-in for re-measurement on other shapes.
    use_arrow = (not with_spans
                 and os.environ.get("SPARK_GRAFT_ARROW", "0") == "1")
    if use_arrow:
        small_res = small.mapInArrow(_extract_batches_arrow, schema=schema)
    else:
        def fn(batches: Iterator) -> Iterator:
            return _extract_batches(batches, with_spans)

        small_res = small.mapInPandas(fn, schema=schema)
    if big is None:
        return small_res
    big_res = _extract_paged(big, with_spans, num_partitions)
    return small_res.unionByName(big_res)


def _span_free(fields):
    return [f for f in fields if f.name != "spans"]


def _extract_paged(big: DataFrame, with_spans: bool,
                   num_partitions: Optional[int]) -> DataFrame:
    """Page-level fan-out for huge documents: split -> shuffle pages ->
    parse per page -> reassemble per url. Page texts concatenate with
    '\\n' (a page boundary is always a paragraph boundary in the reflow
    fold), so the result is byte-identical to the whole-document path."""
    import pandas as pd

    split_schema = StructType([
        StructField("url", StringType()),
        StructField("format", StringType()),
        StructField("page_n", IntegerType()),
        StructField("page_str", StringType()),
        StructField("html", df_binary_type()),
        StructField("error", StringType()),
    ])

    def split_fn(batches: Iterator) -> Iterator:
        from .extract import split_document_pages

        for pdf in batches:
            out = {"url": [], "format": [], "page_n": [], "page_str": [],
                   "html": [], "error": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                fmt, pages, err = split_document_pages(bytes(html))
                if err is not None or pages is None:
                    # non-splittable or failed: single whole-doc row
                    out["url"].append(url)
                    out["format"].append(fmt)
                    out["page_n"].append(-1)
                    out["page_str"].append(None)
                    out["html"].append(bytes(html))
                    out["error"].append(err)
                    continue
                for i, p in enumerate(pages):
                    out["url"].append(url)
                    out["format"].append(fmt)
                    out["page_n"].append(i)
                    out["page_str"].append(p)
                    out["html"].append(None)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    pages_df = big.mapInPandas(split_fn, schema=split_schema)
    # The page shuffle: spread one document's pages across the cluster.
    pages_df = pages_df.repartition(
        *( [num_partitions] if num_partitions else [] ), "url", "page_n")

    page_fields = [
        StructField("url", StringType()),
        StructField("format", StringType()),
        StructField("page_n", IntegerType()),
        StructField("text", StringType()),
        StructField("error", StringType()),
        StructField("word_count", IntegerType()),
    ]
    if with_spans:
        page_fields.append(StructField("spans", ArrayType(SPAN_STRUCT)))
    page_schema = StructType(page_fields)

    def parse_fn(batches: Iterator) -> Iterator:
        from .extract import extract_single_page, extract_with_spans

        for pdf in batches:
            out = {"url": [], "format": [], "page_n": [], "text": [],
                   "error": [], "word_count": []}
            if with_spans:
                out["spans"] = []
            for url, fmt, page_n, page_str, html, err in zip(
                    pdf["url"], pdf["format"], pdf["page_n"],
                    pdf["page_str"], pdf["html"], pdf["error"]):
                if err is not None:
                    rec = {"text": None, "error": err, "word_count": 0,
                           "spans": []}
                    fmt_out = fmt
                elif page_n == -1:
                    whole = extract_with_spans(
                        bytes(html), with_spans=with_spans)
                    rec = {"text": whole["text"], "error": whole["error"],
                           "word_count": whole["word_count"],
                           "spans": whole["spans"]}
                    fmt_out = whole["format"]
                    # encode page_count via page_n for whole-doc rows
                    page_n = -1 - whole["page_count"]
                else:
                    rec = extract_single_page(
                        fmt, page_str, int(page_n), with_spans=with_spans)
                    fmt_out = fmt
                out["url"].append(url)
                out["format"].append(fmt_out)
                out["page_n"].append(int(page_n))
                out["text"].append(rec["text"])
                out["error"].append(rec["error"])
                out["word_count"].append(rec["word_count"])
                if with_spans:
                    out["spans"].append(rec["spans"])
            yield pd.DataFrame(out)

    parsed = pages_df.mapInPandas(parse_fn, schema=page_schema)

    # Reassemble per document. Page texts sort by page_n; empty pages
    # (no lines) contribute nothing, matching writeText's skip.
    aggs = [
        F.max("format").alias("format"),
        F.min("error").alias("error"),
        F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("page_n", "text"))),
                    lambda s: s["text"]),
                lambda t: t != ""),
            "\n").alias("text"),
        F.when(F.min("page_n") < -1, (-F.min("page_n") - 1))
        .otherwise(F.count("*")).cast("int").alias("page_count"),
        F.sum("word_count").cast("int").alias("word_count"),
    ]
    if with_spans:
        aggs.append(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("page_n", "spans")))
                .getField("spans")).alias("spans"))
    assembled = parsed.groupBy("url").agg(*aggs)
    assembled = assembled.withColumn(
        "text", F.when(F.col("error").isNotNull(), F.lit(None)).otherwise(F.col("text"))
    ).withColumn(
        "page_count",
        F.when(F.col("error").isNotNull(), F.lit(0)).otherwise(F.col("page_count"))
    ).withColumn(
        "word_count",
        F.when(F.col("error").isNotNull(), F.lit(0)).otherwise(F.col("word_count"))
    )
    if with_spans:
        assembled = assembled.withColumn(
            "spans",
            F.when(F.col("error").isNotNull(),
                   F.array().cast(ArrayType(SPAN_STRUCT)))
            .otherwise(F.col("spans")))

    cols = ["url", "text", "format", "error", "page_count", "word_count"]
    if with_spans:
        cols.append("spans")
    return assembled.select(*cols)


def df_binary_type():
    from pyspark.sql.types import BinaryType

    return BinaryType()


def extract_spans(df: DataFrame, **kwargs) -> DataFrame:
    """Exploded ordered span rows: one row per word
    (expected_spans schema, FIXTURES.md §4)."""
    res = extract_text(df, with_spans=True, **kwargs)
    return (
        res.filter(F.col("error").isNull())
        .select("url", F.explode("spans").alias("s"))
        .select("url", "s.*")
    )


def extract_par_roles(df: DataFrame) -> DataFrame:
    """Document-level layout pass: extraction + furniture-role
    classification (header/footer/pagenum/title). The whole document is
    one row, so the cross-page pass (recurring header keys, folio
    sequences) needs no shuffle — the grouped-pass analog of the
    reference's main-thread analyzeLayout join (SURVEY.md §3.1 step 3)."""
    import pandas as pd

    from pyspark.sql.types import IntegerType

    schema = StructType([
        StructField("url", StringType()),
        StructField("page_n", IntegerType()),
        StructField("par_n", IntegerType()),
        StructField("par_type", StringType()),
    ])

    def fn(batches: Iterator) -> Iterator:
        from .extract import extract_document
        from .operators.layout_doc import analyze_layout_doc, collect_par_roles

        for pdf in batches:
            out = {"url": [], "page_n": [], "par_n": [], "par_type": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                res = extract_document(bytes(html))
                if res.error is not None:
                    continue
                analyze_layout_doc(res.pages)
                for r in collect_par_roles(res.pages):
                    out["url"].append(url)
                    out["page_n"].append(r["page_n"])
                    out["par_n"].append(r["par_n"])
                    out["par_type"].append(r["par_type"])
            yield pd.DataFrame(out)

    return df.select("url", "html").mapInPandas(fn, schema=schema)


def extraction_metrics(result: DataFrame) -> DataFrame:
    """Aggregate job metrics: docs, failure rate, span counts —
    the metrics sidecar committed alongside each output write
    (north rule). Pure DataFrame aggregation, no UDF."""
    return result.agg(
        F.count("*").alias("docs_total"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("docs_failed"),
        (F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)) / F.count("*"))
        .alias("parse_failure_rate"),
        F.sum("page_count").alias("pages_total"),
        F.sum("word_count").alias("spans_total"),
    )


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    run_id: str,
    fmt: str = "parquet",
    with_spans: bool = False,
    salt: bool = True,
    resume: bool = True,
) -> dict:
    """End-to-end job: read -> (resume anti-join) -> extract -> commit
    output + metrics. Returns the collected metrics row as a dict.

    With an Iceberg catalog configured, ``fmt='iceberg'`` writes to a
    table instead of a path; the parquet path is the sandbox stand-in
    with identical commit semantics (output + metrics per run_id).
    """
    import time

    df = spark.read.parquet(input_path) if fmt == "parquet" \
        else spark.read.table(input_path)

    resume_against = None
    if resume:
        try:
            prior = (spark.read.parquet(output_path) if fmt == "parquet"
                     else spark.read.table(output_path))
            resume_against = prior
        except Exception:
            resume_against = None

    t0 = time.time()
    result = extract_text(
        df, with_spans=with_spans, salt=salt, resume_against=resume_against)
    # per-partition lineage: every committed row names the run AND the
    # task partition that produced it, so a partial failure is
    # attributable and the resume anti-join (keyed on url within
    # run_id history) restarts exactly the unprocessed remainder
    result = result.withColumn("run_id", F.lit(run_id)) \
        .withColumn("lineage_partition", F.spark_partition_id())
    if fmt == "parquet":
        result.write.mode("append").parquet(output_path)
    else:
        result.writeTo(output_path).append()
    elapsed = time.time() - t0

    # mergeSchema: a resumed dataset may hold pre-lineage files whose
    # footer (if picked arbitrarily) would hide the lineage_partition
    # column; merging unions the schemas across commits.
    committed = (spark.read.option("mergeSchema", "true")
                 .parquet(output_path) if fmt == "parquet"
                 else spark.read.table(output_path))
    this_run = committed.filter(F.col("run_id") == run_id)
    metrics_row = extraction_metrics(this_run).collect()[0].asDict()
    if "lineage_partition" in this_run.columns:
        metrics_row["partitions_total"] = this_run.select(
            "lineage_partition").distinct().count()
    else:
        metrics_row["partitions_total"] = None
    metrics_row["elapsed_sec"] = elapsed
    metrics_row["docs_per_sec"] = (
        metrics_row["docs_total"] / elapsed if elapsed > 0 else None)
    metrics_row["run_id"] = run_id

    metrics_schema = StructType([
        StructField("run_id", StringType()),
        StructField("docs_total", LongType()),
        StructField("docs_failed", LongType()),
        StructField("parse_failure_rate", DoubleType()),
        StructField("pages_total", LongType()),
        StructField("spans_total", LongType()),
        StructField("partitions_total", LongType()),
        StructField("elapsed_sec", DoubleType()),
        StructField("docs_per_sec", DoubleType()),
    ])
    metrics_df = spark.createDataFrame(
        [tuple(metrics_row.get(f.name) for f in metrics_schema.fields)],
        schema=metrics_schema)
    if fmt == "parquet":
        metrics_df.write.mode("append").parquet(output_path + "_metrics")
    else:
        metrics_df.writeTo(output_path + "_metrics").append()
    return metrics_row


def write_bucketed(df: DataFrame, table: str, n_buckets: int,
                   bucket_col: str = "url") -> None:
    """Persist a table bucketed (and sorted) by ``bucket_col`` so that
    subsequent equi-joins and aggregations on that key are co-located:
    two tables bucketed the same way join with ZERO Exchange nodes —
    at 100 TB that turns the biggest shuffle in a multi-layer compare
    (joining OCR layers / resuming against committed output on url)
    into a map-side merge. Spark bucketing rides the session catalog
    (saveAsTable); set ``spark.sql.warehouse.dir`` to the target
    storage root."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, bucket_col)
     .sortBy(bucket_col)
     .format("parquet")
     .saveAsTable(table))


def write_searchable_pdfs(df: DataFrame, text_mode: str = "invis",
                          on_unencodable: str = "embed") -> DataFrame:
    """Corpus-scale searchable-PDF generation: extract every document
    and re-emit it as a text-layer PDF (url, pdf binary, error) — the
    distributed form of the reference's extract->writePdf flow. Zero
    shuffles: extraction and writing happen in one Arrow-batched UDF
    per document."""
    from pyspark.sql.types import BinaryType

    schema = StructType([
        StructField("url", StringType()),
        StructField("pdf", BinaryType()),
        StructField("error", StringType()),
    ])

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        from .export.pdf import write_text_pdf
        from .extract import extract_document

        for pdf_batch in batches:
            out = {"url": [], "pdf": [], "error": []}
            for url, html in zip(pdf_batch["url"], pdf_batch["html"]):
                blob = None
                err = None
                try:
                    res = extract_document(bytes(html))
                    if res.error is not None:
                        err = res.error
                    else:
                        blob = write_text_pdf(
                            res.pages, text_mode=text_mode,
                            on_unencodable=on_unencodable)
                except Exception as e:  # noqa: BLE001 — never-fatal
                    err = f"write_failure: {e}"
                out["url"].append(url)
                out["pdf"].append(blob)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.select("url", "html").mapInPandas(fn, schema=schema)


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the engine to pure Spark SQL: after this,
    ``SELECT scribe_extract_text(html) FROM corpus`` works anywhere a
    SQL string does. All three functions are Arrow-batched pandas UDFs
    over the same per-document core the DataFrame API uses.

    - scribe_extract_text(binary) -> string (NULL on parse failure)
    - scribe_extract_error(binary) -> string (NULL on success)
    - scribe_detect_format(binary) -> string
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _text(html):
        from .extract import extract_document

        def one(b):
            r = extract_document(bytes(b))
            return r.text if r.error is None else None

        return html.map(one)

    def _error(html):
        from .extract import extract_document

        return html.map(lambda b: extract_document(bytes(b)).error)

    def _format(html):
        from .operators.detect import detect_document_format

        return html.map(lambda b: detect_document_format(bytes(b)))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf cannot inspect — attach real type objects instead
    for fn in (_text, _error, _format):
        fn.__annotations__ = {"html": pd.Series, "return": pd.Series}
    spark.udf.register("scribe_extract_text", pandas_udf(_text, "string"))
    spark.udf.register("scribe_extract_error",
                       pandas_udf(_error, "string"))
    spark.udf.register("scribe_detect_format",
                       pandas_udf(_format, "string"))
