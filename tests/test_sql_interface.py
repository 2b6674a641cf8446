"""Pure-SQL access to the engine (register_sql_functions)."""


def test_sql_extraction_matches_dataframe_api(spark, tmp_path):
    from scribe_js_spark.fixtures import write_corpus_parquet
    from scribe_js_spark.pipeline import (
        extract_text, register_sql_functions)

    write_corpus_parquet(str(tmp_path), n_docs=10)
    df = spark.read.parquet(str(tmp_path / "corpus.parquet"))
    df.createOrReplaceTempView("corpus")
    register_sql_functions(spark)
    sql_rows = {r["url"]: r for r in spark.sql(
        "SELECT url, scribe_extract_text(html) AS text,"
        "       scribe_extract_error(html) AS error,"
        "       scribe_detect_format(html) AS fmt"
        " FROM corpus").collect()}
    api_rows = {r["url"]: r for r in
                extract_text(df, salt=False).collect()}
    assert sql_rows.keys() == api_rows.keys()
    for url, a in api_rows.items():
        s = sql_rows[url]
        assert s["text"] == a["text"]
        assert s["error"] == a["error"]
        assert s["fmt"] == a["format"]
