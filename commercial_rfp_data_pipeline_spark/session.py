"""SparkSession builder with scale-appropriate defaults.

Local mode is a single JVM; on a real cluster the same confs apply per
executor. AQE is on so runtime statistics drive shuffle coalescing,
skew-join splitting, and broadcast conversion — the 100-TB story relies
on it (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _ensure_worker_protobuf_path() -> None:
    """Prepend the vendored mini-protobuf to PYTHONPATH when no real
    protobuf wheel exists, so Python workers forked by the (not yet
    started) JVM can import the TWS state-protocol modules. Driver-side
    sys.path is handled too. See streaming/protoshim_install.py."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    vendor = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "vendor", "protoshim"
    )
    import sys

    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    current = os.environ.get("PYTHONPATH", "")
    if vendor not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + current if current else "")
        )


def get_spark(
    app_name: str = "commercial_rfp_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults: ``local[$SPARK_GRAFT_CPUS]`` (32), shuffle partitions
    matched to cores (not Spark's default 200 — wrong for local and
    tiny data; at real cluster scale callers raise it to ~2-3x total
    cores), AQE + skew-join handling on, UTC session timezone so
    timestamp comparisons against the DuckDB oracle (UTC-naive) are
    stable, ANSI off for permissive multi-format parsing semantics
    (the reference's pandas `errors='coerce'` model; SURVEY.md §4.3).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # the transformWithStateInPandas state protocol needs a protobuf
    # runtime in every Python process Spark spawns (incl. the pre-init
    # driver worker, whose env snapshots the JVM's env at JVM LAUNCH —
    # so this must run before getOrCreate builds the JVM). When the
    # real wheel is absent, put the vendored mini-runtime
    # (vendor/protoshim) on PYTHONPATH; no-op otherwise.
    _ensure_worker_protobuf_path()
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet has shipped with TIMESTAMP(NANOS) ts, readable
        # only as raw longs under this legacy flag (io.load_table and
        # streaming.read_events_stream convert back to timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def production_conf(total_cores: int, executor_mem_gb: int) -> dict[str, str]:
    """Recommended confs for a real multi-executor cluster at the
    100-TB design point — the deltas vs the local-mode defaults above.
    Callers pass these as ``extra_conf`` (or spark-submit --conf).

    Rationale per key:
    - shuffle partitions ~2.5x total cores: enough tasks for stragglers
      and AQE coalescing headroom without scheduler overload;
    - 128 MB scan partitions: matches parquet row-group sizing so one
      task ≈ one row group stack, keeping partitions within executor
      memory even at wide schemas;
    - broadcast threshold scaled to executor memory (dims up to ~1% of
      heap are cheaper to ship than to shuffle the fact side);
    - RocksDB state store: streaming state (dedup, sessions) larger
      than heap spills to local disk with incremental checkpoints;
    - shuffle compression + zstd: network is the scarce resource at
      1000 executors."""
    return {
        "spark.sql.shuffle.partitions": str(int(total_cores * 2.5)),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(
            # ~1% of executor heap (10 MB per GB), capped at 256 MB
            min(executor_mem_gb * 10, 256) * 1024 * 1024
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(96 * 1024 * 1024),
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.io.compression.codec": "zstd",
        "spark.shuffle.compress": "true",
        "spark.speculation": "true",
    }
