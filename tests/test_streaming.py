"""Structured Streaming: incremental extraction drains only new files;
results match the batch path byte-identically."""

import os

import pyspark.sql.functions as F

from scribe_js_spark.fixtures import make_corpus_pandas
from scribe_js_spark.streaming import stream_extract_text


def test_stream_extract_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    pdf = make_corpus_pandas(30, formats=("hocr", "abbyy", "alto", "text"))
    pdf.iloc[:20][["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        os.path.join(inp, "part0.parquet"), index=False)

    q = stream_extract_text(spark, inp, outp, ckpt)
    q.awaitTermination()
    got = spark.read.parquet(outp)
    assert got.count() == 20
    assert got.filter(F.col("error").isNotNull()).count() == 0

    # Add a file; a new availableNow run drains only the increment.
    pdf.iloc[20:][["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        os.path.join(inp, "part1.parquet"), index=False)
    q2 = stream_extract_text(spark, inp, outp, ckpt)
    q2.awaitTermination()
    got2 = spark.read.parquet(outp)
    assert got2.count() == 30

    # Byte-identity vs expected text
    exp = spark.createDataFrame(
        pdf[["url", "text"]]).withColumnRenamed("text", "expected")
    joined = got2.join(exp, "url")
    assert joined.filter(F.col("text") == F.col("expected")).count() == 30
