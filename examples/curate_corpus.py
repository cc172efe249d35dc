"""Training-data curation — the documents-table lane end-to-end:

    exact dedup → MinHash/LSH near-dup → ExactSubstr span dedup →
    SemDeDup (embedding cells) → quality + language + repetition
    filters → DSIR importance selection → benchmark decontamination →
    split → mix → shuffle → pack → BPE audit.

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
from sparktax.bpe import encode_bpe, train_bpe  # noqa: E402
from sparktax.simsearch import semantic_dedup  # noqa: E402
from sparktax.textops import (  # noqa: E402
    decontaminated,
    dedup_exact,
    dedup_spans,
    importance_select,
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

    # 2b. span-level dedup (ExactSubstr): duplicated >=8-token windows
    # collapse to their first occurrence; docs continue with clean_text
    spans = dedup_spans(docs, w=8)
    docs = (
        docs.join(spans.select("doc_id", "clean_text", "n_removed"), "doc_id")
        .withColumn("text", F.col("clean_text"))
        .drop("clean_text")
    )
    n_span_tokens = docs.agg(F.sum("n_removed")).first()[0]
    docs = docs.drop("n_removed").filter(F.length("text") > 0)

    # 2c. semantic dedup (SemDeDup) over the embeddings table: vectors
    # sharing a k-means cell with cosine >= 0.85 to an earlier vector drop
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept_vecs = semantic_dedup(emb, threshold=0.85, n_cells=8).select(
        F.col("id").alias("doc_id")
    )
    # stage boundary: every audit count below is a separate driver action,
    # and each action re-executes the WHOLE lazy lineage above it (the
    # pack_sequences 3x lesson) — truncate it once the dedup wave is done
    docs = docs.join(kept_vecs, "doc_id", "left_semi").localCheckpoint()
    n2c = docs.count()

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

    # 3b. DSIR importance selection: keep the top 80% by importance
    # weight vs the English target — EXACT on the quantized score grid,
    # so the kept set is identical at any parallelism (approxQuantile's
    # sketch drifts with partition count)
    sel = importance_select(
        docs, docs.filter(F.col("lang") == "en"), keep_frac=0.8
    )
    docs = docs.join(
        sel.select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint()
    n3b = docs.count()

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

    # 6. tokenizer audit: train BPE on the train split, report the merge
    # table size and the corpus' BPE token count (cost ∝ vocabulary)
    merges = train_bpe(train, n_merges=32)
    bpe_tokens = (
        encode_bpe(train, merges).agg(F.sum("n_bpe_tokens")).first()[0]
    )

    print(f"raw={n0}  exact-dedup={n1}  near-dup={n2}  "
          f"span-tokens-removed={n_span_tokens}  semantic-dedup={n2c}  "
          f"quality/lang/repetition={n3}  dsir-selected={n3b}  "
          f"decontaminated={n4}  train-docs-packed={n5}  "
          f"sequences={n_seq}  bpe-merges={merges.count()}  "
          f"bpe-tokens={bpe_tokens}")
    spark.stop()


if __name__ == "__main__":
    main()
