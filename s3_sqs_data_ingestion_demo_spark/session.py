"""SparkSession factory.

Mirrors the reference's session construction (reference:
spark-job/read.py:65-81): a base conf dict of sensible defaults is merged
with the job config's ``spark`` map (job conf wins), then ``getOrCreate``.
The reference's defaults are s3a filesystem wiring; ours add the local
performance conf that matters at scale (AQE, shuffle partitioning,
Arrow).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Perf defaults — every one of these is safe on a real cluster and
# load-bearing at scale: AQE re-plans joins/partitions at runtime,
# coalesce + skew-join fix the two most common shuffle pathologies,
# Arrow makes any pandas-UDF path vectorized.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Release unreachable checkpoint/persist/shuffle blocks promptly:
    # the ContextCleaner only runs on driver GC, and a many-query
    # session (bench sweep, driver loop) accumulates eagerly-
    # checkpointed RDD blocks faster than a 128 GiB heap GCs — the
    # default 30min periodic GC never fires inside a sweep
    "spark.cleaner.periodicGC.interval": "1min",
    # Read TIMESTAMP(NANOS) parquet columns as long (Spark has no
    # nanosecond timestamp type); accessors convert ns → timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # catalog tables (bucketed writes) land outside the repo; override
    # per-job for real deployments
    "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
}

# Scale profile for the INGEST path (job.build_spark applies it by
# default; any key in the job config's ``spark`` map still wins).
# These are the production AQE/shuffle knobs a 1000-executor run wants
# and a local[32] run tolerates:
# - advisory 128 MiB post-shuffle partitions with parallelismFirst off:
#   AQE coalesces to the advisory SIZE instead of chasing parallelism,
#   so a 100 TB shuffle lands ~full partitions, not 200 slivers; a
#   micro-batch CDC merge coalesces down to a handful of tasks.
# - 256 MiB scan splits: fewer, fuller input tasks against large
#   parquet (the default 128 MiB doubles the task count for no win on
#   zstd-compressed columnar scans).
# - skew-join threshold 256 MiB: one hot CDC key splits into parallel
#   subtasks instead of straggling the merge.
# On a real cluster additionally size spark.sql.shuffle.partitions to
# 2-3x total cores (here the local default of n_cpus stands) — with
# AQE coalesce on, oversizing is safe and undersizing is not.
INGEST_SCALE_PROFILE: dict[str, str] = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}

PROFILES: dict[str, dict[str, str]] = {
    "default": {},
    "ingest-scale": INGEST_SCALE_PROFILE,
}

# s3a defaults for cloud runs — parity with reference: spark-job/read.py:68-77.
# Only merged when the job asks for the s3a protocol; harmless strings
# otherwise (hadoop-aws jars are not bundled locally).
S3A_CONF: dict[str, str] = {
    "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
    ),
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.connection.maximum": "100",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def default_driver_memory() -> str:
    """Driver-JVM heap for local runs.

    Spark's default is 1 GiB, which a local[32] session doing 32-task
    shuffle writes exhausts (in local mode the "driver" JVM hosts every
    executor thread).  This must be decided BEFORE the JVM launches —
    ``spark.driver.memory`` is not runtime-settable — so the factory
    bakes a default into the pre-launch conf: 1/4 of physical RAM,
    clamped to [2g, 16g].  ``SPARK_GRAFT_DRIVER_MEM`` overrides.
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total_gib = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (1 << 30)
        )
        return f"{max(2, min(16, total_gib // 4))}g"
    except (ValueError, OSError):
        return "4g"


def session_is_alive(spark: SparkSession | None) -> bool:
    """True iff ``spark`` has a live, non-stopped SparkContext."""
    if spark is None:
        return False
    try:
        sc = spark.sparkContext
        return sc._jsc is not None and not sc._jsc.sc().isStopped()
    except Exception:
        return False


def merged_conf(
    conf: dict[str, str] | None = None,
    protocol: str = "local",
    profile: str = "default",
) -> dict[str, str]:
    """The exact conf map ``build_session`` hands the builder — pure
    (no JVM) so tests can assert a profile lands without a session.
    Precedence, lowest to highest: DEFAULT_CONF < cpu-derived
    parallelism < driver memory < s3a wiring < named profile < the
    job's ``spark`` map (job conf always wins, reference:
    spark-job/read.py:79-80)."""
    if profile not in PROFILES:
        raise ValueError(
            f"unknown session profile {profile!r}; known: {sorted(PROFILES)}"
        )
    cpus = default_parallelism()
    merged = dict(DEFAULT_CONF)
    merged.setdefault("spark.sql.shuffle.partitions", str(cpus))
    merged.setdefault("spark.default.parallelism", str(cpus))
    # Pre-JVM-launch conf: PySpark's launch_gateway forwards builder conf
    # as spark-submit --conf, so this sizes the heap iff we are the
    # process that launches the JVM (getOrCreate on a live session keeps
    # that session's heap — callers needing a different size must stop it
    # first).
    merged.setdefault("spark.driver.memory", default_driver_memory())
    if protocol in ("s3", "s3a"):
        merged.update(S3A_CONF)
    merged.update(PROFILES[profile])
    if conf:
        merged.update({str(k): str(v) for k, v in conf.items()})
    return merged


def build_session(
    app_name: str = "s3-sqs-ingestion-spark",
    conf: dict[str, str] | None = None,
    master: str | None = None,
    protocol: str = "local",
    profile: str = "default",
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``conf`` is the job's ``spark`` map and overrides the defaults,
    exactly as the reference merges job conf over its hadoop defaults
    (reference: spark-job/read.py:79-80).  ``profile`` names a conf
    bundle from ``PROFILES`` (the ingest path defaults to
    ``ingest-scale``; see ``INGEST_SCALE_PROFILE``).
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in merged_conf(conf, protocol, profile).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Python-UDF/``mapInPandas`` closures pickle references to this
    package; executors unpickle them in their own interpreter, which
    does not inherit the driver script's ``sys.path``.  Shipping a zip
    is the same mechanism a real multi-node cluster needs, so local
    behavior matches cluster behavior.
    """
    try:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        pkg_name = os.path.basename(pkg_dir)
        newest = max(
            os.path.getmtime(os.path.join(root, f))
            for root, _, files in os.walk(pkg_dir)
            for f in files
            if f.endswith(".py")
        )
        zip_path = os.path.join(tempfile.gettempdir(), f"{pkg_name}_pyfiles.zip")
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest:
            tmp = zip_path + ".tmp"
            with zipfile.ZipFile(tmp, "w") as zf:
                for root, _, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            zf.write(full, rel)
            os.replace(tmp, zip_path)
        spark.sparkContext.addPyFile(zip_path)
    except Exception:  # best-effort; in-repo runs work without it
        pass


def get_test_session() -> SparkSession:
    """Session for tests/bench: local[N], small shuffle width."""
    return build_session(app_name="s3-sqs-ingestion-spark-test")
