"""Pinned two-parallelism scaling probe for the TRAINING-PREP CHAIN
(mix_corpora → training_order → pack_sequences): the round-5 lane whose
cost is one full-corpus shuffle (hashpartitioning on shard_id) plus
per-shard window sorts and the two-level pack prefix sum.

Same method as scripts/shuffle_scaling.py: taskset-pinned local[N] vs
local[4N] on the same on-disk input, one discarded warm-up, best-of-2.
The corpus is high-entropy (md5 tokens) with a 32-domain source column;
mix weights cycle {0, 0.75, 1.5, 2.25} so all lanes (drop / fractional /
integer+fractional) execute. n_shards is fixed at 256 across runs so the
work is identical and only parallelism varies; results force with a
bit_xor(xxhash64) agg, never a prunable count().

Prints one JSON line; paste into BENCH/BASELINE.md's round addendum by
hand (the scaling_bench rewrite preserves '## Round' sections).

Usage: python scripts/prep_chain_scaling.py [doc_replicas]
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
spark = get_spark(app="prep-chain-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
n_docs = 5000 * replicas
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat(F.lit("src"), (F.col("id") % 32).cast("string")).alias("source"),
    F.concat_ws(" ", *[
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"tok{{i}}")))
        for i in range(30)
    ]).alias("text"),
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
from sparktax.textops import mix_corpora, training_order, pack_sequences
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="prep-chain-run", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_docs = docs.count()
weights = {{f"src{{i}}": (i % 4) * 0.75 for i in range(32)}}

def job():
    mixed = mix_corpora(docs, weights, seed=11)
    ordered = training_order(
        mixed, n_shards=256, seed=7, extra_key_cols=["copy_idx"]
    )
    # pack in training order: per-shard contiguous global id so sequences
    # fill shard-by-shard in read order (the real pretraining layout)
    gid = (F.col("shard_id") * (1 << 40) + F.col("pos")).alias("gid")
    stream = ordered.select(gid, "text")
    packed = pack_sequences(stream, budget=2048, id_col="gid", n_ranges=64)
    row = packed.agg(
        F.count("gid").alias("n"),
        F.bit_xor(F.xxhash64("gid", "seq_id", "seq_offset")).alias("sig"),
    ).first()
    return row["n"]

job()  # warm-up (page cache + codegen + Arrow pool)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_docs}} {{n}} {{best:.3f}}")
spark.stop()
"""


def _box() -> dict:
    """Box-state snapshot before a leg (bench.py's probes): a leg timed
    on a throttled/loaded box self-identifies in the JSON."""
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
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = os.path.join(tempfile.gettempdir(), f"prep_chain_{replicas}")
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
        "metric": "prep_chain_scaling", "docs_in": n_in,
        "packed_rows_out": n_out, "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
