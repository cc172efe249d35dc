"""The north-star pipeline, end-to-end and resumable:

transcripts (parquet/Iceberg) → batched Arrow triple extraction →
dictionary encoding → entity linking (exact + MinHash/LSH) →
canonicalization (connected components) → materialized nodes/edges →
type-vectors → non-expressive + expressive taxonomy extraction.

Every stage checkpoints through :class:`sparktax.ckpt.StageCheckpointer`
(per-partition lineage + metrics; re-runs resume from the last finished
stage). Launchable via spark-submit:

    spark-submit --py-files sparktax.zip -m sparktax.pipeline \\
        --input /data/transcripts --workdir /ckpt/run1

(in-sandbox: ``python -m sparktax.pipeline --input ... --workdir ...``).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparktax.ckpt import StageCheckpointer
from sparktax.extract import extract_triples
from sparktax.graph.kg import KnowledgeGraph, encode_triples
from sparktax.link import canonical_entity_map, rewrite_triples


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    isa_uri: str = "is_a",
    fuzzy_threshold: float = 0.85,
    edge_partitions: int | None = None,
    taxonomy: bool = True,
    encode_method: str = "dense",
) -> dict:
    """Run (or resume) the full KG-construction pipeline; returns the
    stage-manifest summary."""
    ck = StageCheckpointer(spark, workdir)

    raw = ck.stage(
        "10_raw_triples",
        lambda: extract_triples(transcripts),
        params={"grammar": "v1"},
    )

    # encode: three coupled lazy outputs → three stages over the same raw
    # upstream (nothing executes until each stage writes).
    # encode_method="hash" is the 10¹²-turn path (no global-sort id stage).
    t_df, e_df, r_df = encode_triples(raw, method=encode_method)
    enc = {"method": encode_method}
    triples = ck.stage("20_triples", t_df, params=enc, upstream=["10_raw_triples"])
    entities = ck.stage("21_entities", e_df, params=enc, upstream=["10_raw_triples"])
    relations = ck.stage("22_relations", r_df, params=enc, upstream=["10_raw_triples"])

    mapping = ck.stage(
        "30_canonical_map",
        lambda: canonical_entity_map(entities, jaccard_threshold=fuzzy_threshold),
        params={"jaccard": fuzzy_threshold},
        upstream=["21_entities"],
    )
    # edges are laid out by (h, salt-of-t): co-located by head for downstream
    # pattern scans, but a hub head (one h with millions of edges) spreads
    # over 8 writer partitions instead of pinning a single straggler task
    # (north_rule: salting beyond AQE).
    edges = ck.stage(
        "40_edges",
        lambda: rewrite_triples(triples, mapping).repartition(
            *([edge_partitions] if edge_partitions else []),
            F.col("h"),
            F.pmod(F.xxhash64("t"), F.lit(8)),
        ),
        upstream=["20_triples", "30_canonical_map"],
    )
    nodes = ck.stage(
        "41_nodes",
        lambda: entities.join(
            mapping.filter(F.col("id") == F.col("canonical_id")).select("id"),
            "id",
            "left_semi",
        ),
        upstream=["21_entities", "30_canonical_map"],
    )

    if taxonomy:
        kg = KnowledgeGraph(edges, nodes, relations, isa_uri=isa_uri)
        from sparktax.typevec import type_vectors

        ck.stage(
            "50_type_vectors",
            lambda: type_vectors(kg, k=32),
            params={"k": 32},
            upstream=["40_edges", "41_nodes"],
        )
    return ck.summary()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet path")
    ap.add_argument("--workdir", required=True, help="checkpoint directory")
    ap.add_argument("--isa-uri", default="is_a")
    ap.add_argument("--no-taxonomy", action="store_true")
    args = ap.parse_args()
    from sparktax.session import get_spark

    spark = get_spark(app="sparktax-pipeline")
    transcripts = spark.read.parquet(args.input)
    summary = run_pipeline(
        spark, transcripts, args.workdir, isa_uri=args.isa_uri, taxonomy=not args.no_taxonomy
    )
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
