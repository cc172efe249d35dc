"""Pinned two-parallelism scaling probe for the PQ ADC lane
(sparktax/pq.py:pq_topk over a PRECOMPUTED code table): taskset-pinned
local[N] vs local[4N] on the same on-disk codes, one discarded warm-up,
best-of-2 — the same method as scripts/incdedup_scaling.py (north-rule
evidence: no real cluster in the sandbox, so two parallelism levels on
one box stand in for two cluster sizes).

What the timed job exercises — the shape a 10⁹-vector corpus runs per
query batch: scan the code table (the ONLY corpus-sized input; raw
vectors are never read), posexplode ×m_sub, broadcast-join the per-query
ADC LUT, map-side partial aggregate to one (query, doc) score row, and
the per-query top-k window. Corpus = the sf embeddings replicated with
deterministic per-replica element jitter (xxhash64-seeded, so replicas
are distinct vectors and every (query, doc) score survives to the
exchange).

Build (corpus + codebooks + encoded code table) runs once at 32 cores
and is untimed; only the ADC scan + window is timed.

Prints one JSON line; paste into BENCH/BASELINE.md's round addendum by
hand.

Usage: python scripts/pq_scaling.py [replicas] [n_queries]
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
import numpy as np
from pyspark.sql import functions as F
from sparktax.session import get_spark
from sparktax.pq import pq_encode, train_pq_codebooks
replicas, n_queries, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(app="pq-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
n_base = emb.count()
# replicate with per-(replica, position) jitter so every vector is unique
rep = spark.range(replicas).select(F.col("id").alias("rep"))
corpus = (
    emb.crossJoin(rep)
    .repartition(128)  # testdata parquet is single-row-group (CLAUDE.md)
    .select(
        (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x
            + (
                F.xxhash64(F.col("rep"), i, F.col("vec_id")).cast("double")
                / F.lit(float(2**63))
            )
            * F.lit(0.05),
        ).alias("embedding"),
    )
)
corpus.write.mode("overwrite").parquet(f"{{out}}/corpus")
corpus = spark.read.parquet(f"{{out}}/corpus")
cb = train_pq_codebooks(corpus, m_sub=16, n_codes=64, seed=42)
np.save(f"{{out}}/codebooks.npy", cb)
pq_encode(corpus, cb, mode="float").repartition(128)\\
    .write.mode("overwrite").parquet(f"{{out}}/codes")
corpus.orderBy("vec_id").limit(n_queries)\\
    .write.mode("overwrite").parquet(f"{{out}}/queries")
print("BUILT", spark.read.parquet(f"{{out}}/codes").count())
spark.stop()
"""

RUN = """
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from pyspark.sql import functions as F
from sparktax.session import get_spark
from sparktax.pq import pq_topk
cores, out = sys.argv[1], sys.argv[2]
spark = get_spark(app="pq-scaling-run", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
cb = np.load(f"{{out}}/codebooks.npy")
codes = spark.read.parquet(f"{{out}}/codes")
corpus = spark.read.parquet(f"{{out}}/corpus")
queries = spark.read.parquet(f"{{out}}/queries")
n_codes_rows = codes.count()
def job():
    top = pq_topk(corpus, queries, k=10, codebooks=cb, codes=codes, mode="float")
    # force every score row (count() on a narrow plan prunes: CLAUDE.md)
    return top.agg(
        F.count("score"), F.bit_xor(F.xxhash64("neighbor_id"))
    ).collect()[0][0]
job()  # warm-up (page cache + codegen)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_codes_rows}} {{n}} {{best:.3f}}")
spark.stop()
"""


def _timed(cores: int, out: str) -> tuple[int, int, float]:
    cpus = f"0-{cores - 1}" if cores > 1 else "0"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", RUN.format(repo=REPO),
         str(cores), out],
        check=True, capture_output=True, text=True, timeout=2400,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_corpus, n_top, sec = line.split()
    return int(n_corpus), int(n_top), float(sec)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = os.path.join(
        tempfile.gettempdir(), f"pq_scaling_{replicas}_{n_queries}"
    )
    if not os.path.exists(f"{out}/codes"):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO),
             str(replicas), str(n_queries), out],
            check=True,
        )
    pairs = []
    for n_small, n_big in ((2, 8), (8, 32)):
        n_corpus, n_top, t_small = _timed(n_small, out)
        _, _, t_big = _timed(n_big, out)
        pairs.append({
            "N_cores": n_small, "4N_cores": n_big,
            "sec_small": round(t_small, 3), "sec_big": round(t_big, 3),
            "vecs_per_sec_small": round(n_corpus / t_small, 1),
            "vecs_per_sec_big": round(n_corpus / t_big, 1),
            "efficiency": round(t_small / (4 * t_big), 3),
        })
    print(json.dumps({
        "metric": "pq_adc_scaling", "corpus_vecs": n_corpus,
        "topk_rows": n_top, "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
