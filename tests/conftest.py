import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from scribe_js_spark.pipeline import session_conf

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("scribe-js-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
    )
    spark = session_conf(builder).getOrCreate()
    yield spark
    spark.stop()
