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


def test_stream_dedup_exact_stateful(spark, tmp_path):
    """applyInPandasWithState dedup: the first doc per text signature
    flags is_first; duplicates arriving in LATER micro-batches are
    caught by the persisted state."""
    import pandas as pd

    from scribe_js_spark.streaming import stream_dedup_exact

    inp = str(tmp_path / "sin")
    outp = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    os.makedirs(inp)

    def write_batch(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(inp, name), index=False)

    write_batch("b0.parquet",
                [(1, "alpha text"), (2, "beta text"), (3, "alpha text")])

    def run():
        stream = (spark.readStream
                  .schema("doc_id long, text string").parquet(inp))
        return (stream_dedup_exact(stream).writeStream
                .format("parquet").option("path", outp)
                .option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True)
                .start())

    run().awaitTermination()
    got = {r["doc_id"]: (r["is_first"], r["n_seen"])
           for r in spark.read.parquet(outp).collect()}
    assert got[1] == (True, 1)
    assert got[2] == (True, 1)
    assert got[3] == (False, 2)

    # second micro-batch: a cross-batch duplicate must hit the state
    write_batch("b1.parquet", [(4, "alpha text"), (5, "gamma text")])
    run().awaitTermination()
    got2 = {r["doc_id"]: (r["is_first"], r["n_seen"])
            for r in spark.read.parquet(outp).collect()}
    assert got2[4] == (False, 3)   # third copy of 'alpha text'
    assert got2[5] == (True, 1)
