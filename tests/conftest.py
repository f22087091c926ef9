import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from s3_sqs_data_ingestion_demo_spark.session import build_session

    s = build_session(app_name="tests", conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
