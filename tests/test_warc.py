"""WARC crawl-archive reading."""

import gzip

import pytest

from scribe_js_spark.fixtures import build_warc_models
from scribe_js_spark.operators.warc import warc_records, warc_to_table


def test_plain_and_member_gzip_layouts():
    for w in (0, 1):  # even = gzip members, odd = plain
        m = build_warc_models(w)
        got = {u: p for u, _d, p in warc_records(m["warc"])}
        assert len(got) == len(m["golden"])


def test_skips_non_response_records_and_dechunks():
    m = build_warc_models(2)
    recs = list(warc_records(m["warc"]))
    # every third response was chunk-encoded; payloads must be whole
    for (_u, _d, payload), g in zip(recs, m["golden"]):
        assert payload.decode("utf-8").startswith("<!DOCTYPE html>")


def test_malformed_raises_value_error():
    with pytest.raises(ValueError):
        list(warc_records(b"NOTAWARC"))
    m = build_warc_models(1)
    with pytest.raises(ValueError):
        list(warc_records(m["warc"][: len(m["warc"]) // 2]))


def test_warc_to_table_explodes_and_extracts(spark):
    from scribe_js_spark.pipeline import extract_text

    blobs = [(w, build_warc_models(w)) for w in range(3)]
    df = spark.createDataFrame(
        [(w, m["warc"]) for w, m in blobs], ["warc_id", "warc"])
    table = warc_to_table(df)
    assert table.columns == ["url", "warc_ts", "html"]
    out = {r["url"]: r["text"] for r in
           extract_text(table, salt=False).collect()}
    golden = {g["url"]: g["text"] for _w, m in blobs for g in m["golden"]}
    assert out == golden
    # a corrupt archive row is skipped, never fatal
    df2 = spark.createDataFrame(
        [(0, blobs[0][1]["warc"]), (1, b"garbage")], ["warc_id", "warc"])
    assert warc_to_table(df2).count() == len(blobs[0][1]["golden"])


def test_streaming_warc_ingestion(spark, tmp_path):
    """binaryFile stream of WARC archives -> input table -> extraction,
    exactly-once via checkpoint: a second availableNow run adds
    nothing; a new archive adds only its rows."""
    from scribe_js_spark.streaming import stream_extract_warc

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    m0 = build_warc_models(0)
    (in_dir / "a.warc.gz").write_bytes(m0["warc"])

    def drain():
        q = stream_extract_warc(
            spark, str(in_dir), str(tmp_path / "out"),
            str(tmp_path / "ckpt"))
        q.awaitTermination()

    drain()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == len(m0["golden"])
    drain()  # no new files: nothing re-processed
    assert spark.read.parquet(str(tmp_path / "out")).count() == \
        len(m0["golden"])
    m1 = build_warc_models(1)
    (in_dir / "b.warc").write_bytes(m1["warc"])
    drain()
    final = spark.read.parquet(str(tmp_path / "out"))
    assert final.count() == len(m0["golden"]) + len(m1["golden"])
    golden = {g["url"]: g["text"] for m in (m0, m1) for g in m["golden"]}
    got = {r["url"]: r["text"] for r in final.collect()}
    assert got == golden
