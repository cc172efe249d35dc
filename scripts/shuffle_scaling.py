"""Pinned two-parallelism scaling probe for SHUFFLE-BEARING stages
(round-2 verdict item #8: the headline scaling evidence times the
no-shuffle extraction stage; this probe shows the shuffle stages scale
too). Same method as scripts/scaling_bench.py: taskset-pinned local[N]
vs local[4N] on the same on-disk input, one discarded warm-up,
best-of-2.

Two jobs, each dominated by its exchanges:

* ``lsh`` — MinHash/LSH blocking: shingle → 64-perm signatures (groupBy
  id, map-side partial min) → banded self-join on (band, bucket) →
  distinct candidate pairs. Three exchanges, the dedup hot path.
* ``encode`` — dictionary encode: union of subj/obj uris → DISTINCT.
  One full-width exchange of every uri string, no pre-aggregation
  shrinkage — the worst-case shuffle shape in the pipeline.

Prints one JSON line per job; paste into BENCH/BASELINE.md's round
addendum by hand (the scaling_bench rewrite preserves '## Round'
sections).

Usage: python scripts/shuffle_scaling.py [lsh|encode|both] \\
           [doc_replicas] [triple_replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD_DOCS = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
replicas, sf_dir, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app="shuffle-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
# fully high-entropy corpus (30 md5 tokens ≈ 1 KB/doc): the real documents
# table is template-generated and so self-similar that the banded join
# explodes quadratically inside buckets — the probe would then time pair
# OUTPUT, not the shuffles under test. Near-zero true duplicates keeps the
# candidate set tiny and the exchanges dominant.
n_docs = 5000 * replicas
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(" ", *[
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"tok{{i}}")))
        for i in range(30)
    ]).alias("text"),
)
docs.repartition(256).write.mode("overwrite").parquet(out)
print(spark.read.parquet(out).count())
spark.stop()
"""

BUILD_TRIPLES = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
replicas, sf_dir, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark(app="shuffle-scaling-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet(f"{{sf_dir}}/lineitem.parquet")
rep = li.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
s = F.concat(F.lit("S"), F.col("l_suppkey"), F.lit("-"), F.col("rep"))
p = F.concat(F.lit("P"), F.col("l_partkey"), F.lit("-"), F.col("rep"))
o = F.concat(F.lit("O"), F.col("l_orderkey"), F.lit("-"), F.col("rep"))
raw = (
    rep.select(s.alias("subj"), F.lit("supplies_part").alias("pred"), p.alias("obj"))
    .union(rep.select(p.alias("subj"), F.lit("belongs_to").alias("pred"), o.alias("obj")))
    .union(rep.select(o.alias("subj"), F.lit("handled_by").alias("pred"), s.alias("obj")))
)
raw.repartition(256).write.mode("overwrite").parquet(out)
print(spark.read.parquet(out).count())
spark.stop()
"""

RUN_LSH = """
import sys, time
sys.path.insert(0, {repo!r})
from sparktax.session import get_spark
from sparktax.link.minhash import lsh_candidate_pairs, minhash_signatures, shingle
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="shuffle-scaling-lsh", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_docs = docs.count()
job = lambda: lsh_candidate_pairs(
    minhash_signatures(shingle(docs, "text", "doc_id", n=5), k=64), bands=16
).count()
# n=5: the synthetic corpus is hex text (16-char alphabet) — 3-grams make
# every doc near-identical at the shingle level and the banded join would
# go quadratic; 5-grams give ~17^5 shingle space and near-zero cross-doc
# Jaccard, keeping the exchanges (not pair output) as the timed cost.
job()  # warm-up (page cache + codegen)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_docs}} {{n}} {{best:.3f}}")
spark.stop()
"""

RUN_ENCODE = """
import sys, time
sys.path.insert(0, {repo!r})
from sparktax.session import get_spark
from sparktax.graph.kg import encode_triples
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="shuffle-scaling-encode", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
raw = spark.read.parquet(path)
n_triples = raw.count()
job = lambda: encode_triples(raw, method="hash")[1].count()  # entities dim
job()  # warm-up
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_triples}} {{n}} {{best:.3f}}")
spark.stop()
"""


def _timed(script: str, cores: int, path: str) -> tuple[int, int, float]:
    cpus = f"0-{cores - 1}" if cores > 1 else "0"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", script.format(repo=REPO),
         str(cores), path],
        check=True, capture_output=True, text=True, timeout=2400,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_in, n_out, sec = line.split()
    return int(n_in), int(n_out), float(sec)


def _probe(job: str, build: str, run: str, replicas: int, sf_dir: str) -> dict:
    out = os.path.join(tempfile.gettempdir(), f"shuffle_scaling_{job}_{replicas}")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", build.format(repo=REPO),
             str(replicas), sf_dir, out],
            check=True,
        )
    pairs = []
    for n_small, n_big in ((2, 8), (8, 32)):
        n_in, n_out, t_small = _timed(run, n_small, out)
        _, _, t_big = _timed(run, n_big, out)
        pairs.append({
            "N_cores": n_small, "4N_cores": n_big,
            "sec_small": round(t_small, 3), "sec_big": round(t_big, 3),
            "rows_per_sec_small": round(n_in / t_small, 1),
            "rows_per_sec_big": round(n_in / t_big, 1),
            "efficiency": round(t_small / (4 * t_big), 3),
        })
    return {"metric": f"{job}_shuffle_scaling", "rows_in": n_in,
            "rows_out": n_out, "pairs": pairs}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    doc_replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    triple_replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if which in ("lsh", "both"):
        print(json.dumps(_probe("lsh", BUILD_DOCS, RUN_LSH, doc_replicas, sf_dir)))
    if which in ("encode", "both"):
        print(json.dumps(
            _probe("encode", BUILD_TRIPLES, RUN_ENCODE, triple_replicas, sf_dir)
        ))


if __name__ == "__main__":
    main()
