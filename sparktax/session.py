"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point, applied identically in
local-mode tests:

* AQE on (runtime partition coalescing + skew-join splitting) — replaces the
  reference's hand-built dict indexes and memory tricks
  (reference libs/graph/knowledge_graph.py:17,29-30).
* Arrow execution on — every Python kernel is an Arrow-batched pandas UDF,
  never per-row Python (input contract).
* Explicit shuffle partitioning — sized to cores locally; on a real cluster
  AQE coalesces from a deliberately-high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "sparktax",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int n → ``local[n]``; "*" → all; None → env
    ``SPARK_GRAFT_CPUS`` or all cores.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() or 8 if cores in ("*",) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app)
        # --- adaptive execution: runtime coalesce + skew-join splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Arrow lane for every pandas UDF / applyInPandas kernel ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # generous broadcast threshold: dims (entities/relations/candidate
        # dictionaries) are small relative to triples at any scale
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARKTAX_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def stop_spark() -> None:
    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()
