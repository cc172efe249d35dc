"""Pinned two-parallelism scaling probe for the INCREMENTAL dedup lane
(round-5 addition, sparktax/textops.py:dedup_incremental): taskset-pinned
local[N] vs local[4N] on the same on-disk batch against the same
pre-built index, one discarded warm-up, best-of-2 — the same method as
scripts/shuffle_scaling.py (north-rule evidence: the sandbox has no real
cluster, so two parallelism levels on one box stand in for two cluster
sizes).

What the timed job exercises (all the lane's shuffle-bearing stages):
exact-fp anti-join against the stored index, MinHash signatures for the
new batch, within-batch banded self-join, stored-signature band-bucket
recompute + cross equi-join, and the snapshot append commit. The corpus
is high-entropy (near-zero true duplicates, n=5 shingles — round-3
lesson: hex filler text needs >=5-gram shingles or the banded join goes
quadratic) so the exchanges, not pair output, dominate.

Between timed runs the index is ROLLED BACK to its seed version
(catalog.rollback_snapshot — a pure pointer swap), so every run sees an
identical index state despite the operator's append commit being part of
the timed cost.

Prints one JSON line; paste into BENCH/BASELINE.md's round addendum by
hand.

Usage: python scripts/incdedup_scaling.py [doc_replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
replicas, out = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="incdedup-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
n_docs = 5000 * replicas
docs = spark.range(2 * n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"tok{{i}}")))
        for i in range(30)
    ]).alias("text"),
)
docs.filter(F.col("doc_id") < n_docs).repartition(128)\\
    .write.mode("overwrite").parquet(f"{{out}}/batch0")
docs.filter(F.col("doc_id") >= n_docs).repartition(128)\\
    .write.mode("overwrite").parquet(f"{{out}}/batch1")
print(spark.read.parquet(f"{{out}}/batch1").count())
spark.stop()
"""

SEED_INDEX = """
import sys
sys.path.insert(0, {repo!r})
from sparktax.session import get_spark
from sparktax.textops import dedup_incremental
out, idx = sys.argv[1], sys.argv[2]
spark = get_spark(app="incdedup-scaling-seed", cores=32)
spark.sparkContext.setLogLevel("ERROR")
b0 = spark.read.parquet(f"{{out}}/batch0")
n = dedup_incremental(b0, idx).count()
print(f"SEEDED {{n}}")
spark.stop()
"""

RUN = """
import sys, time
sys.path.insert(0, {repo!r})
from sparktax.catalog import current_version, rollback_snapshot
from sparktax.session import get_spark
from sparktax.textops import dedup_incremental
cores, out, idx = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark(app="incdedup-scaling-run", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
b1 = spark.read.parquet(f"{{out}}/batch1")
n_docs = b1.count()
v0 = current_version(idx)
def job():
    n = dedup_incremental(b1, idx).count()
    rollback_snapshot(idx, v0)  # pointer swap only — untimed cost is nil
    return n
job()  # warm-up (page cache + codegen)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_docs}} {{n}} {{best:.3f}}")
spark.stop()
"""


def _timed(cores: int, out: str, idx: str) -> tuple[int, int, float]:
    cpus = f"0-{cores - 1}" if cores > 1 else "0"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", RUN.format(repo=REPO),
         str(cores), out, idx],
        check=True, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_in, n_out, sec = line.split()
    return int(n_in), int(n_out), float(sec)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    out = os.path.join(tempfile.gettempdir(), f"incdedup_scaling_{replicas}")
    idx = f"{out}/index"
    if not os.path.exists(f"{out}/batch1"):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO), str(replicas), out],
            check=True,
        )
    if os.path.exists(idx):
        shutil.rmtree(idx)
    subprocess.run(
        [sys.executable, "-c", SEED_INDEX.format(repo=REPO), out, idx],
        check=True,
    )
    pairs = []
    for n_small, n_big in ((2, 8), (8, 32)):
        n_in, n_out, t_small = _timed(n_small, out, idx)
        _, _, t_big = _timed(n_big, out, idx)
        pairs.append({
            "N_cores": n_small, "4N_cores": n_big,
            "sec_small": round(t_small, 3), "sec_big": round(t_big, 3),
            "docs_per_sec_small": round(n_in / t_small, 1),
            "docs_per_sec_big": round(n_in / t_big, 1),
            "efficiency": round(t_small / (4 * t_big), 3),
        })
    print(json.dumps({
        "metric": "incdedup_scaling", "batch_docs": n_in,
        "survivors": n_out, "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
