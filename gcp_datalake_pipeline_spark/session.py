"""SparkSession factory.

Reference parity note: the reference stores audit timestamps as
``now() AT TIME ZONE 'UTC'`` (model.sql:18), so the session timezone is UTC.

Scale stance: AQE on (runtime coalescing + skew-join splitting), shuffle
partitions sized for the local harness but overridable via env for cluster
runs; Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gcp_datalake_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Defaults target the local[N] test harness; on a real cluster pass
    ``master=None`` with an external spark-submit master and a larger
    ``shuffle_partitions`` (rule of thumb: 2-3x total cores, or let AQE
    coalesce from a high initial number).
    """
    # Pin Python WORKERS to the driver's interpreter BEFORE the context
    # starts: pyspark resolves the worker exec from the PYSPARK_PYTHON
    # env var only (context.py: os.environ.get("PYSPARK_PYTHON",
    # "python3")), so under a minimal PATH the default is the system
    # python without numpy/pandas and every Arrow/pandas operator dies
    # with ModuleNotFoundError on the executor side only. A caller's
    # explicit PYSPARK_PYTHON still wins.
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ETL parity: lenient casts/date-parses map malformed -> NULL, like
        # the reference's `|| null` coercions. Engine code still prefers
        # try_* functions so it stays correct under ANSI sessions too.
        .config("spark.sql.ansi.enabled", "false")
        # TIMESTAMP columns as INT64 micros, not the legacy INT96: INT96
        # pages carry NO parquet footer statistics, which blinds the
        # whole stats layer (file skipping, metadata COUNT/MIN/MAX, DML
        # candidate pruning) to every temporal predicate — on a 100 TB
        # events table, date-range DML is THE hot case. TIMESTAMP_MICROS
        # is what Delta/Iceberg write and every modern reader (and the
        # filestats footer harvest) understands; pre-existing INT96
        # files still read fine and simply take the conservative scan
        # path. Overridable via extra_conf for legacy-writer parity.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # Scan split sizing stays at Spark defaults: a global minPartitionNum/
    # openCostInBytes floor (tried in an earlier round) taxes EVERY small
    # query with per-core task scheduling to help the few compute-dense
    # scans — adaptivity belongs at the operator layer, where
    # ensure_scan_parallelism (plans/queries.py) spreads compute-heavy
    # content scans only when the planned split count is actually below
    # the session's parallelism (never on real cluster inputs). The env
    # knobs remain for deployments that want a hard floor back.
    for env, conf in (
        ("SPARK_GRAFT_MIN_SPLITS", "spark.sql.files.minPartitionNum"),
        ("SPARK_GRAFT_OPEN_COST", "spark.sql.files.openCostInBytes"),
    ):
        if os.environ.get(env):
            builder = builder.config(conf, os.environ[env])
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
