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
