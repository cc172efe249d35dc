"""Decompose dedup_spans cost: detection vs rebuild, span-free fraction.

Usage: python scripts/r06_spans_probe.py [sf_dir] [replicas]

With replicas > 1 the documents table is replicated with shifted doc_ids
(key-disjoint, same text) to grow the corpus without changing per-doc
shapes — duplicated windows then cross replicas, which only makes the
span lane BUSIER (more marked spans), a fair stress for the rebuild.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparktax.session import get_spark
from sparktax.textops import dedup_spans

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

spark = get_spark("spans_probe")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
if reps > 1:
    n_docs = docs.count()
    docs = (
        docs.crossJoin(spark.range(reps).withColumnRenamed("id", "_rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * n_docs)
        .drop("_rep")
        .repartition(32)
    )
docs = docs.localCheckpoint()  # isolate probe from scan cost

def force(df, label, cols):
    best = None
    for _ in range(3):
        t0 = time.time()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.bit_xor(F.xxhash64(c)).alias(f"x_{c}") for c in cols],
        ).collect()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best-of-3 {best:.3f}s n={row['n']}")
    return row

spark.sparkContext.setJobDescription("full dedup_spans")
r = force(dedup_spans(docs, w=8, hasher="md5"), "full", ["clean_text"])

# detection-only: stop at the spans aggregate (replicate internals)
from sparktax.textops import normalized_text

w = 8
win_re = rf"(?<!\S)(?=((?:\S+ ){{{w - 1}}}\S+))"
wtexts = F.regexp_extract_all(
    normalized_text(F.coalesce(F.col("text"), F.lit(""))), F.lit(win_re), 1
)
wins = docs.select(
    F.col("doc_id"), F.posexplode(wtexts).alias("pos", "_wt")
).select(
    "doc_id",
    "pos",
    F.conv(F.substring(F.md5("_wt"), 1, 15), 16, 10).cast("long").alias("whash"),
)
key = F.col("doc_id") * (1 << 20) + F.col("pos")
firsts = (
    wins.groupBy("whash")
    .agg(F.count("*").alias("_n"), F.min(key).alias("_first"))
    .filter(F.col("_n") > 1)
    .select("whash", "_first")
)
marked = (
    wins.join(firsts, "whash")
    .filter(key != F.col("_first"))
    .select("doc_id", "pos", (F.col("pos") + w).alias("end"))
)
spark.sparkContext.setJobDescription("detection only (marked)")
force(marked, "marked", ["pos"])

# how many docs actually carry spans?
n_docs_total = docs.count()
n_docs_spanned = marked.select("doc_id").distinct().count()
print(f"docs total={n_docs_total} with-spans={n_docs_spanned} "
      f"({100.0 * n_docs_spanned / n_docs_total:.1f}%)")
spark.stop()
