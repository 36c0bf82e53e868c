"""SparkSession construction with scale-oriented defaults.

One place to set every knob so tests, bench and the pipeline run the same
configuration.  Defaults target the sandbox (single JVM, local[k]); on a
real cluster the same settings apply per-executor and the master URL comes
from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "wikdict_gen_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local core count; default $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: defaults to the core count — at sandbox data sizes
    more partitions only add scheduling overhead; at cluster scale this is
    overridden to O(total cores).
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    # shuffle spill to RAM-backed storage when available: the sandbox has
    # 125G RAM and small shuffles; on a cluster spark.local.dir comes from
    # the cluster manager and this default is irrelevant
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        # Arrow is the transport for every pandas UDF in the engine
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic sessions: no timezone surprises in timestamp columns
        .config("spark.sql.session.timeZone", "UTC")
        # long pipelines: reclaim broadcast/shuffle state promptly
        .config("spark.cleaner.periodicGC.interval", "2min")
        # many-stage pipelines generate hundreds of codegen classes; the
        # default 240m code cache fills and the JIT stops compiling, which
        # silently triples stage times late in a run
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local corpora are few big files; small split size keeps scans wide
        # (on a real cluster the default 128m is right — override via env)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)),
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (needed to switch local[k] parallelism)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
