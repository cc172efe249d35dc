"""Pinned two-parallelism scaling probe for the JVM SimHash operator
(same method as scripts/scaling_bench.py: taskset-pinned local[N] vs
local[4N] on the same on-disk input, best-of-2 after a warm-up).

SimHash is a pure Catalyst pipeline (explode → project → partial agg →
one-row-per-doc exchange → final agg): no Python lane at all, so it
should scale like any codegen'd aggregation until the box's memory
bandwidth wall. Prints one JSON line and appends nothing — paste the
numbers into BENCH/BASELINE.md by hand.

Usage: python scripts/simhash_scaling.py [replicas] [n_small] [n_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
replicas, sf_dir, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app="simhash-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
rep = d.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
# per-replica salt keeps token entropy high (see scaling_bench.py note)
salted = rep.select(
    (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
    F.concat_ws(" ", F.col("text"),
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("x"),
                               F.col("rep").cast("string")))).alias("text"),
)
salted.repartition(256).write.mode("overwrite").parquet(out)
print(spark.read.parquet(out).count())
spark.stop()
"""

RUN = """
import sys, time
sys.path.insert(0, {repo!r})
from sparktax.session import get_spark
from sparktax.textops import simhash
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="simhash-scaling", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
simhash(docs).count()  # warm-up (page cache + codegen)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = simhash(docs).count()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n}} {{best:.3f}}")
spark.stop()
"""


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * (int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.path.join(tempfile.gettempdir(), f"simhash_scaling_{replicas}")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO), str(replicas), sf_dir, out],
            check=True,
        )

    def timed(cores: int) -> float:
        cpus = f"0-{cores - 1}" if cores > 1 else "0"
        r = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, "-c", RUN.format(repo=REPO),
             str(cores), out],
            check=True, capture_output=True, text=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][-1]
        _, n, sec = line.split()
        return int(n), float(sec)

    n_docs, t_small = timed(n_small)
    _, t_big = timed(n_big)
    eff = t_small / (4 * t_big) if n_big == 4 * n_small else t_small / ((n_big / n_small) * t_big)
    print(json.dumps({
        "metric": "simhash_scaling_efficiency",
        "n_docs": n_docs,
        "cores_small": n_small, "sec_small": round(t_small, 3),
        "cores_big": n_big, "sec_big": round(t_big, 3),
        "docs_per_sec_small": round(n_docs / t_small, 1),
        "docs_per_sec_big": round(n_docs / t_big, 1),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
