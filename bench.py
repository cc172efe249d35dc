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
import mmap
import os
import re
import shutil
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
    "dedup_spans",
    "dsir_weights",
    "semantic_dedup",
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


def _bench_dedup_spans(spark, sf_dir):
    """Production lane (xxhash64 window hashes, not the md5 oracle device);
    count() would prune the clean_text rebuild, so force every column
    through a bit_xor/xxhash64 aggregate (the narrow-plan count() lesson)."""
    from pyspark.sql import functions as F

    from sparktax.textops import dedup_spans

    # testdata parquet is single-row-group → the window-hash fan-out would
    # run in ONE task without this; real inputs arrive in many splits
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)
    out = dedup_spans(docs, w=8)
    return out.agg(
        F.bit_xor(F.xxhash64("clean_text")).alias("h"),
        F.sum("n_removed").alias("n_removed"),
    )


def _bench_dsir_weights(spark, sf_dir):
    """Production lane (xxhash64 buckets); agg-forced for the same reason."""
    from pyspark.sql import functions as F

    from sparktax.textops import importance_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)
    out = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    return out.agg(
        F.bit_xor(F.xxhash64("logratio")).alias("h"),
        F.sum("n_grams").alias("n_grams"),
    )


def _bench_semantic_dedup(spark, sf_dir):
    """Production lane (BLAS float assignment, xxhash64-rank centroids)."""
    from pyspark.sql import functions as F

    from sparktax.simsearch import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.2, n_cells=16)
    return out.agg(
        F.bit_xor(F.xxhash64("id")).alias("h"), F.count("*").alias("kept")
    )


# queries benched on a different code path than their correctness-gate twin
OVERRIDES = {
    "minhash_neardup": _bench_minhash_neardup,
    "dedup_spans": _bench_dedup_spans,
    "dsir_weights": _bench_dsir_weights,
    "semantic_dedup": _bench_semantic_dedup,
}


def _steal_pct(sample_s: float = 0.5) -> float:
    """CPU steal % over a short window, from /proc/stat deltas."""

    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    s0, t0 = snap()
    time.sleep(sample_s)
    s1, t1 = snap()
    dt = t1 - t0
    return round(100.0 * (s1 - s0) / dt, 2) if dt else 0.0


def _disk_write_mbps(size_mb: int = 200, path: str = "/tmp") -> float:
    """Direct-IO write throughput probe. The sandbox's virtual disk
    throttles to ~20 MB/s after sustained multi-GB writes (reads stay
    fast, CPU unaffected) — this is the probe that distinguishes a
    clean box (~400 MB/s) from a throttled one, which no load-average
    check can see."""
    fname = os.path.join(path, f".sparktax_bench_probe_{os.getpid()}")
    block = 4 * 1024 * 1024
    buf = mmap.mmap(-1, block)  # page-aligned, O_DIRECT-safe
    buf.write(b"\xa5" * block)
    try:
        try:
            fd = os.open(fname, os.O_WRONLY | os.O_CREAT | os.O_TRUNC | os.O_DIRECT)
            direct = True
        except OSError:
            fd = os.open(fname, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
            direct = False
        t0 = time.perf_counter()
        for _ in range(size_mb * 1024 * 1024 // block):
            os.write(fd, buf)
        if not direct:
            os.fsync(fd)
        os.close(fd)
        dt = time.perf_counter() - t0
        return round(size_mb / dt, 1) if dt else 0.0
    except OSError:
        return -1.0
    finally:
        buf.close()
        try:
            os.unlink(fname)
        except OSError:
            pass


def box_probes() -> dict:
    """Box-state snapshot emitted with every bench JSON so BENCH_rN files
    are self-interpreting: cross-round totals taken at arbitrary box
    states differ by up to ±13% at identical config (round-4 worktree
    A/B evidence, BENCH/BASELINE.md)."""
    shm = shutil.disk_usage("/dev/shm")
    return {
        "load1": round(os.getloadavg()[0], 2),
        "steal_pct": _steal_pct(),
        "disk_write_mbps": _disk_write_mbps(),
        "shm_free_gb": round(shm.free / 2**30, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    repeats = int(os.environ.get("SPARKTAX_BENCH_REPEATS", "1"))
    box = box_probes()  # probe BEFORE Spark starts (cleanest reading)
    spark = get_spark(app="sparktax-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # warm-up (not timed): JVM codegen + the Python/Arrow worker pool
    qs["kg_class_sizes"](spark, sf_dir).count()
    qs["extract_triples"](spark, "/root/testdata/sf0.001").count()

    times: dict[str, float] = {}
    n_triples = 0
    for rep in range(repeats):
        for name in HEADLINE:
            fn = OVERRIDES.get(name, qs.get(name))
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            # best-of-N per query (SPARKTAX_BENCH_REPEATS>1 for manual
            # controlled runs; driver default stays 1)
            if name not in times or dt < times[name]:
                times[name] = dt
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
        "box": box,
        "repeats": repeats,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
