"""Type-co-occurrence vectors: the graph-native entity embedding.

For the graft, the "embedding" of an entity is its (optionally normalized)
count vector over the top-K types co-occurring with it (north_star:
"type-cooccurrence statistics ... hierarchical clustering of entity
type-vectors"). Built entirely in Spark SQL — one groupBy + a broadcast
vocab join + Catalyst array expressions; no Python in the path.

Replaces the reference's externally-trained TransE/RDF2Vec matrices
(libs/embeddings.py:16-57) with a self-contained, scalable construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sparktax.graph.kg import KnowledgeGraph


def type_vocabulary(kg: KnowledgeGraph, k: int = 64) -> DataFrame:
    """(t, idx) — the k most frequent types, idx dense 0..k-1
    (deterministic tiebreak on type id)."""
    w = Window.orderBy(F.desc("n"), F.asc("t"))
    return (
        kg.triples.filter(F.col("r") == kg.isa)
        .groupBy("t")
        .agg(F.count("*").alias("n"))
        .withColumn("idx", F.row_number().over(w) - 1)
        .filter(F.col("idx") < k)
        .select("t", "idx")
    )


def cooccurrence_counts(kg: KnowledgeGraph, vocab: DataFrame) -> DataFrame:
    """(h, idx, n): for entity h, how often a vocab type co-occurs in h's
    1-hop neighborhood — h's own types plus the types of h's direct
    objects (the 2-hop h→x→type pattern, O16)."""
    isa = F.col("r") == kg.isa
    own = kg.triples.filter(isa).select("h", "t")
    # the h→x→type self-join reads the co-located bucketed copies when the
    # graph carries them (KnowledgeGraph.with_colocated): probe side keyed
    # on its t, type side on its h → zero-Exchange SMJ, same as mine_atoms
    hop = (
        kg.triples_keyed_on("t").filter(~isa)
        .select("h", F.col("t").alias("x"))
        .join(
            kg.triples_keyed_on("h").filter(isa).select(F.col("h").alias("x"), "t"),
            "x",
        )
        .select("h", "t")
    )
    return (
        own.unionByName(hop)
        .join(broadcast(vocab), "t")
        .groupBy("h", "idx")
        .agg(F.count("*").alias("n"))
    )


def type_vectors(
    kg: KnowledgeGraph, k: int = 64, normalize: bool = True
) -> DataFrame:
    """(entity_id, vector:array<float>) — dense length-k vectors."""
    vocab = type_vocabulary(kg, k)
    counts = cooccurrence_counts(kg, vocab)
    mp = counts.groupBy("h").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("idx"), F.col("n").cast("double")))
        ).alias("mp")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.coalesce(F.element_at(F.col("mp"), i), F.lit(0.0)),
    )
    out = mp.select(F.col("h").alias("entity_id"), vec.alias("_v"))
    if normalize:
        norm = F.sqrt(
            F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
        )
        out = out.select(
            "entity_id",
            F.transform(
                F.col("_v"), lambda x: (x / F.when(norm > 0, norm).otherwise(1.0))
            ).alias("_v"),
        )
    return out.select(
        "entity_id", F.transform(F.col("_v"), lambda x: x.cast("float")).alias("vector")
    )
