"""End-to-end curation-chain throughput at scale: one timed pass of

    heuristic quality gate → exact dedup → ExactSubstr span dedup →
    DSIR scoring + top-80% selection → forced materialization

over a 2M-doc (default) high-entropy corpus with planted boilerplate
and exact duplicates — the composed pipeline, not per-op probes, so
stage-boundary costs (joins between stages, reused scans) are included.

Reuses the span-scaling corpus builder (boilerplate in every 10th doc)
plus planted exact duplicates (every 50th doc repeats doc id−1's text).
Prints one JSON line with docs/s and a per-leg box snapshot.

Usage: python scripts/curation_e2e.py [doc_replicas] [cores]
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
spark = get_spark(app="curation-e2e-build", cores=32)
spark.sparkContext.setLogLevel("ERROR")
n_docs = 5000 * replicas
boiler = " ".join(f"boiler{{j}}" for j in range(16))
# ~40% english-stopword tokens so the quality/DSIR gates see real signal
stop = ["the", "and", "of", "to", "in", "is", "that", "for"]
toks = []
for i in range(60):
    if i % 5 < 2:
        toks.append(F.element_at(
            F.array(*[F.lit(s) for s in stop]),
            ((F.xxhash64(F.col("id"), F.lit(i)) % 8 + 8) % 8 + 1).cast("int")))
    else:
        toks.append(F.md5(F.concat(F.col("id").cast("string"),
                                   F.lit(f"tok{{i}}"))))
body = F.concat_ws(" ", *toks)
at = (F.col("id") % 37 + 1).cast("int")
head = F.array_join(F.slice(F.split(body, " "), 1, at), " ")
tail = F.array_join(F.slice(F.split(body, " "), at + 1, F.lit(60) - at), " ")
with_boiler = F.when(F.col("id") % 10 == 0,
                     F.concat_ws(" ", head, F.lit(boiler), tail)).otherwise(body)
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.concat(F.lit("src"), (F.col("id") % 16).cast("string")).alias("source"),
    F.when(F.col("id") % 3 == 0, F.lit("en")).otherwise(F.lit("xx")).alias("lang"),
    with_boiler.alias("text"),
)
# exact duplicates: every 50th doc repeats the previous doc's body
dup = docs.filter(F.col("doc_id") % 50 == 1).select(
    (F.col("doc_id") + 10_000_000).alias("doc_id"), "source", "lang", "text")
docs.unionByName(dup).repartition(256).write.mode("overwrite").parquet(out)
print(spark.read.parquet(out).count())
spark.stop()
"""

RUN = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparktax.session import get_spark
from sparktax.textops import (dedup_exact, dedup_spans, importance_select,
                              quality_score)
cores, path = sys.argv[1], sys.argv[2]
spark = get_spark(app="curation-e2e-run", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_in = docs.count()

def job():
    d = docs
    ok = quality_score(d).filter(F.col("quality") >= 0.3).select("doc_id")
    d = d.join(ok, "doc_id", "left_semi")
    d = dedup_exact(d)
    sp = dedup_spans(d, w=8)
    d = (d.join(sp.select("doc_id", "clean_text"), "doc_id")
          .withColumn("text", F.col("clean_text")).drop("clean_text")
          .filter(F.length("text") > 0))
    d = d.localCheckpoint()  # stage boundary: scoring runs 2 count jobs
    sel = importance_select(d, d.filter(F.col("lang") == "en"),
                            keep_frac=0.8)
    kept = d.join(sel.select("doc_id"), "doc_id", "left_semi")
    row = kept.agg(F.count("*").alias("n"),
                   F.bit_xor(F.xxhash64("text")).alias("sig")).first()
    return row["n"]

job()  # warm-up
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    n = job()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{n_in}} {{n}} {{best:.3f}}")
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


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = os.path.join(tempfile.gettempdir(), f"curation_e2e_{replicas}")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO),
             str(replicas), out],
            check=True,
        )
    box = _box()
    cpus = f"0-{cores - 1}" if cores > 1 else "0"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", RUN.format(repo=REPO),
         str(cores), out],
        check=True, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")][-1]
    _, n_in, n_out, sec = line.split()
    print(json.dumps({
        "metric": "curation_chain_e2e",
        "docs_in": int(n_in), "docs_kept": int(n_out),
        "sec": float(sec), "docs_per_sec": round(int(n_in) / float(sec), 1),
        "cores": cores, "box": box,
    }))


if __name__ == "__main__":
    main()
