"""Getting started — the reference's `Getting Started.ipynb` walkthrough,
re-expressed against this engine. Runnable end-to-end in ~2 min:

    python examples/getting_started.py

Sections mirror the notebook: load a graph → query triples → build a
dataset → cluster → extract a taxonomy → evaluate — and then the parts the
reference doesn't have: construct the KG from transcripts first, and do it
all resumable.
"""

from __future__ import annotations

import sys
import os
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sparktax import synth  # noqa: E402
from sparktax.extract import extract_triples  # noqa: E402
from sparktax.extraction.pipeline import extract_taxonomy  # noqa: E402
from sparktax.graph import KnowledgeGraph  # noqa: E402
from sparktax.session import get_spark  # noqa: E402
from sparktax.taxonomy import evaluate_full  # noqa: E402


def main() -> None:
    spark = get_spark(app="getting-started", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    # ------------------------------------------------------------------
    print("== 1. transcripts → knowledge graph ==")
    pdf, gold = synth.gen_transcripts_pdf(n_convs=150, seed=42)
    transcripts = synth.transcripts_to_spark(spark, pdf)
    raw = extract_triples(transcripts)
    print(f"extracted {raw.count()} triples (gold: {len(gold)})")
    kg = KnowledgeGraph.from_raw_triples(raw, isa_uri="is_a").cache()

    # ------------------------------------------------------------------
    print("\n== 2. triple-pattern queries (reference cells 13-23) ==")
    print("entities:", kg.entities.count(), "relations:", kg.relations.count())
    kg.find_triples(h="Ada_Lovelace", as_string=True).show(5, truncate=False)
    print("class sizes:")
    (
        kg.class_sizes(valid_only=False)
        .join(kg.entities.withColumnRenamed("id", "t"), "t")
        .select(F.col("uri").alias("class"), "n_instances")
        .orderBy(F.desc("n_instances"))
        .show(5, truncate=False)
    )

    # ------------------------------------------------------------------
    print("== 3. blobs → dataset → clustering → taxonomy (cells 25+) ==")
    dataset, classes, emb, gold_tree = synth.gen_blob_embeddings_pdf(per_class=30)
    got = extract_taxonomy(
        spark.createDataFrame(dataset),
        spark.createDataFrame(emb),
        classes=spark.createDataFrame(classes),
        method="hard",
    )
    print("extracted:", sorted(got))
    (direct, closed) = evaluate_full(gold_tree, got)
    print(f"direct P/R/F1 = {direct}\nclosure P/R/F1 = {closed}")

    # inspect it the way every reference notebook does: the balanced
    # ASCII tree (reference Node.print / libs/tree/pprint.py)
    from sparktax.tree import Tree

    taxo = Tree.from_edges(sorted(got), add_root="THING")
    print("\nextracted taxonomy:")
    taxo.print()
    # …or as a self-contained HTML page with hover tooltips
    fd, html_path = tempfile.mkstemp(suffix=".html", prefix="taxonomy_")
    os.close(fd)
    taxo.html(hover=lambda n: f"depth {taxo.depth(n)}", filename=html_path)
    print(f"(HTML report with hover tooltips written to {html_path})")

    # soft mapping variant
    got_soft = extract_taxonomy(
        spark.createDataFrame(dataset),
        spark.createDataFrame(emb),
        classes=spark.createDataFrame(classes),
        method="soft",
        beta=200.0,
        threshold=0.3,
    )
    print("soft mapping F1:", evaluate_full(gold_tree, got_soft)[0][2])

    # ------------------------------------------------------------------
    print("\n== 4. the full resumable pipeline ==")
    from sparktax.pipeline import run_pipeline

    workdir = tempfile.mkdtemp(prefix="sparktax_run_")
    summary = run_pipeline(spark, transcripts, workdir)
    for stage, m in summary.items():
        print(f"  {stage}: rows={m['rows']} bytes={m['bytes']} wall={m['wall_sec']}s")
    print(f"(re-running resumes from {workdir} without recompute)")
    if "60_taxonomy" in summary:
        tax = spark.read.parquet(f"{workdir}/60_taxonomy/data")
        if tax.count():
            print("pipeline-extracted taxonomy:")
            Tree.from_df(tax, add_root="THING").print()
    spark.stop()


if __name__ == "__main__":
    main()
