import pytest
from pyspark.sql import SparkSession

_SESSION: SparkSession | None = None


def _build() -> SparkSession:
    from s3_sqs_data_ingestion_demo_spark.session import build_session

    return build_session(
        app_name="tests", conf={"spark.sql.shuffle.partitions": "8"}
    )


@pytest.fixture(scope="module")
def spark() -> SparkSession:
    """Shared SparkSession with a liveness guard.

    One JVM for the whole suite (session startup is ~6 s), but checked
    at every module boundary: if a prior module killed the context
    (e.g. an executor OOM shutting down the shared local JVM), rebuild
    instead of letting every remaining Spark test cascade to
    ConnectionRefusedError.  Module scope (not function) so
    module-scoped data fixtures may depend on this one.
    """
    global _SESSION
    from s3_sqs_data_ingestion_demo_spark.session import session_is_alive

    if not session_is_alive(_SESSION):
        if _SESSION is not None:
            try:
                _SESSION.stop()
            except Exception:
                pass
            # Drop stale singletons so getOrCreate builds a fresh JVM-side
            # session rather than resurrecting the dead one.
            SparkSession._instantiatedSession = None
            SparkSession._activeSession = None
        _SESSION = _build()
    return _SESSION


def pytest_sessionfinish(session, exitstatus):
    global _SESSION
    if _SESSION is not None:
        try:
            _SESSION.stop()
        except Exception:
            pass
        _SESSION = None
