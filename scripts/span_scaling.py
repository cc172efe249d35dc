"""Pinned two-parallelism scaling probe for SPAN-LEVEL DEDUP
(textops.dedup_spans, the ExactSubstr lane): window hashing is a narrow
fan-out, duplicate detection is one map-side-combined aggregate on the
window hash, marked spans rejoin on the hash — this probe times that
content shuffle plus the per-doc interval-merge windows at N vs 4N.

Corpus: high-entropy 60-token docs (md5 tokens) with a 16-token
boilerplate block planted in every 10th doc at a varying offset — the
duplicated-window path (and its hot-hash skew: one block shared by 10 %
of the corpus) executes for real, while 90 % of windows stay unique so
the aggregate, not pair output, dominates. Results force with a
bit_xor(xxhash64(clean_text)) agg, never a prunable count().

Same method as scripts/prep_chain_scaling.py: taskset-pinned local[N]
vs local[4N] on the same on-disk input, one discarded warm-up,
best-of-2, a box-state snapshot BEFORE each leg embedded in the JSON.

Usage: python scripts/span_scaling.py [doc_replicas]
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
replicas, out = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app="span-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
n_docs = 5000 * replicas
boiler = " ".join(f"boiler{{j}}" for j in range(16))
toks = [
    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"tok{{i}}")))
    for i in range(60)
]
body = F.concat_ws(" ", *toks)
# every 10th doc: splice the shared block after (id % 37) tokens so the
# duplicated region sits at varying offsets (realistic boilerplate)
at = (F.col("id") % 37 + 1).cast("int")
head = F.array_join(F.slice(F.split(body, " "), 1, at), " ")
tail_len = F.lit(60) - at
tail = F.array_join(F.slice(F.split(body, " "), at + 1, tail_len), " ")
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 10 == 0,
           F.concat_ws(" ", head, F.lit(boiler), tail))
     .otherwise(body).alias("text"),
)
docs.repartition(256).write.mode("overwrite").parquet(out)
print(spark.read.parquet(out).count())
spark.stop()
"""

RUN = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
from sparktax.textops import dedup_spans
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="span-scaling-run", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_docs = docs.count()

def job():
    out = dedup_spans(docs, w=8)
    row = out.agg(
        F.sum("n_removed").alias("n_removed"),
        F.bit_xor(F.xxhash64("clean_text")).alias("sig"),
    ).first()
    return row["n_removed"]

job()  # warm-up (page cache + codegen)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_docs}} {{n}} {{best:.3f}}")
spark.stop()
"""


def _box() -> dict:
    sys.path.insert(0, REPO)
    from bench import _disk_write_mbps, _steal_pct

    return {
        "load1": round(os.getloadavg()[0], 2),
        "steal_pct": _steal_pct(),
        "disk_write_mbps": _disk_write_mbps(),
    }


def _timed(cores: int, path: str) -> tuple[int, int, float, dict]:
    box = _box()
    cpus = f"0-{cores - 1}" if cores > 1 else "0"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", RUN.format(repo=REPO),
         str(cores), path],
        check=True, capture_output=True, text=True, timeout=2400,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_in, n_out, sec = line.split()
    return int(n_in), int(n_out), float(sec), box


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out = os.path.join(tempfile.gettempdir(), f"span_scaling_{replicas}")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO),
             str(replicas), out],
            check=True,
        )
    pairs = []
    for n_small, n_big in ((2, 8), (8, 32)):
        n_in, n_out, t_small, box_small = _timed(n_small, out)
        _, _, t_big, box_big = _timed(n_big, out)
        pairs.append({
            "N_cores": n_small, "4N_cores": n_big,
            "sec_small": round(t_small, 3), "sec_big": round(t_big, 3),
            "rows_per_sec_small": round(n_in / t_small, 1),
            "rows_per_sec_big": round(n_in / t_big, 1),
            "efficiency": round(t_small / (4 * t_big), 3),
            "box_small": box_small, "box_big": box_big,
        })
    print(json.dumps({
        "metric": "span_dedup_scaling", "docs_in": n_in,
        "tokens_removed": n_out, "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
