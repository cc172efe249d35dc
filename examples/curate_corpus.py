"""Training-data curation — the documents-table lane end-to-end:

    exact dedup → MinHash/LSH near-dup → quality + language +
    repetition filters → benchmark decontamination → clean corpus +
    audit counts.

Every stage is pure Catalyst (no Python in a hot path) and every
filter is expressed so it would run unchanged over a 100 TB corpus:
hash-groupBy dedup, banded LSH candidates, broadcast probe shingles.

    python examples/curate_corpus.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sparktax.session import get_spark  # noqa: E402
from sparktax.textops import (  # noqa: E402
    decontaminated,
    dedup_exact,
    language_id,
    minhash_near_duplicates,
    prepare_training_corpus,
    quality_score,
    repetition_signals,
    split_corpus,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="curate-corpus", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup (one hash groupBy; text bytes never shuffle)
    docs = dedup_exact(docs)
    n1 = docs.count()

    # 2. near-dup removal: MinHash/LSH pairs → drop the larger id of each
    pairs = minhash_near_duplicates(docs, threshold=0.8, n=5, k=64, bands=16)
    losers = pairs.select(F.col("b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality + language gates (all Catalyst expressions)
    q = quality_score(docs).filter(F.col("quality") >= 0.5).select("doc_id")
    lang = language_id(docs).filter(F.col("lang_pred") == "en").select("doc_id")
    rep = repetition_signals(docs).filter(
        (F.col("top_bigram_frac") < 0.2) & (F.col("dup_sentence_frac") < 0.3)
    ).select("doc_id")
    docs = (
        docs.join(q, "doc_id", "left_semi")
        .join(lang, "doc_id", "left_semi")
        .join(rep, "doc_id", "left_semi")
    )
    n3 = docs.count()

    # 4. decontamination against a probe set (stand-in: every 100th doc's
    # first 120 chars plays the role of a benchmark prompt)
    probes = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 100 == 7)
        .select(F.col("doc_id").alias("probe_id"), F.substring("text", 1, 120).alias("text"))
    )
    docs = decontaminated(docs, probes, n=8)
    n4 = docs.count()

    # 5. training layout: held-out split, then mix → deterministic
    # shuffle → packed sequences for the train partition (one corpus
    # shuffle; every assignment is a seeded integer device, so the
    # whole layout is bit-reproducible)
    labeled = split_corpus(
        docs, {"train": 0.98, "val": 0.01, "test": 0.01}, seed=29
    )
    train = labeled.filter(F.col("split") == "train").drop("split")
    packed = prepare_training_corpus(
        train,
        weights={f"src{i}": 1.0 for i in range(20)},
        n_shards=8,
        budget=512,
        seed=29,
    )
    n5, n_seq = packed.count(), packed.agg(
        F.countDistinct("seq_id")
    ).first()[0]

    print(f"raw={n0}  exact-dedup={n1}  near-dup={n2}  "
          f"quality/lang/repetition={n3}  decontaminated={n4}  "
          f"train-docs-packed={n5}  sequences={n_seq}")
    spark.stop()


if __name__ == "__main__":
    main()
