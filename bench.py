"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>,
     "triples_per_sec": <extraction throughput>}

The extraction query is the north-star metric (triples/sec); the rest cover
the KG, linking, dedup, similarity and window lanes.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from sparktax.session import get_spark  # noqa: E402

HEADLINE = [
    "extract_triples",
    "kg_class_sizes",
    "kg_existential",
    "components",
    "link_mentions",
    "dedup_groups",
    "minhash_neardup",
    "simhash",
    "cosine_topk",
    "agg_pricing",
    "topk_window",
    "events_lag",
    "taxonomy_blobs",
]


def _bench_minhash_neardup(spark, sf_dir):
    """Production-path twin of the driver query: the correctness-gate
    version of minhash_neardup runs hasher="md5" so DuckDB can replicate
    its signatures; the BENCHMARK times the default xxhash64 hasher (the
    100 TB path) with otherwise identical parameters, keeping r02→r03
    timings comparable."""
    from pyspark.sql import functions as F

    from sparktax.textops import minhash_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    return minhash_near_duplicates(docs, threshold=0.5, n=3, k=64, bands=16)


# queries benched on a different code path than their correctness-gate twin
OVERRIDES = {"minhash_neardup": _bench_minhash_neardup}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app="sparktax-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # warm-up (not timed): JVM codegen + the Python/Arrow worker pool
    qs["kg_class_sizes"](spark, sf_dir).count()
    qs["extract_triples"](spark, "/root/testdata/sf0.001").count()

    times: dict[str, float] = {}
    n_triples = 0
    for name in HEADLINE:
        fn = OVERRIDES.get(name, qs.get(name))
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
        if name == "extract_triples":
            n_triples = n
    total = round(sum(times.values()), 3)
    out = {
        "metric": "sparktax_headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "triples_per_sec": round(n_triples / times["extract_triples"], 1)
        if times.get("extract_triples")
        else None,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
