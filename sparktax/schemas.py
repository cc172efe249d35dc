"""Explicit StructType schemas for every engine table.

The reference's schemas are fixed-and-implicit (positional text files,
OpenKE format — reference libs/graph/io.py:11-17). Here every table is an
explicit StructType; no inference anywhere in the pipeline.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ----- pipeline input (authoritative shape: BASELINE.json input_hint) -----
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# ----- extraction outputs -----
MENTIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention_id", LongType(), False),
        StructField("surface", StringType(), False),
        StructField("kind", StringType(), False),  # subj | obj
        StructField("span_start", IntegerType(), True),
        StructField("span_end", IntegerType(), True),
    ]
)

RAW_TRIPLES = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)

# ----- knowledge graph (reference D1/D2: libs/graph/knowledge_graph.py:17,
# libs/graph/id_mapper.py:11-54) -----
TRIPLES = StructType(
    [
        StructField("h", LongType(), False),
        StructField("r", LongType(), False),
        StructField("t", LongType(), False),
    ]
)

ENTITIES = StructType(
    [
        StructField("id", LongType(), False),
        StructField("uri", StringType(), False),
    ]
)

RELATIONS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("uri", StringType(), False),
    ]
)

# ----- typed dataset (reference D3: libs/dataset/dataset.py:12-36) -----
DATASET = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("entity_id", LongType(), False),
        StructField("class_id", IntegerType(), False),
    ]
)

CLASSES = StructType(
    [
        StructField("class_id", IntegerType(), False),
        StructField("class_name", StringType(), False),
    ]
)

# ----- embeddings (reference D4: libs/embeddings.py:86-97) -----
EMBEDDINGS = StructType(
    [
        StructField("entity_id", LongType(), False),
        StructField("vector", ArrayType(FloatType()), False),
    ]
)

# ----- dendrogram / clustering (reference D5: libs/cluster/_cluster.py:39-49)
# leaves 0..n-1 are sample rows, internal nodes n..2n-2; root = 2n-2.
DENDROGRAM = StructType(
    [
        StructField("task_id", LongType(), False),  # one clustering task (axiom/sample)
        StructField("child", LongType(), False),
        StructField("parent", LongType(), False),
    ]
)

LEAVES = StructType(
    [
        StructField("task_id", LongType(), False),
        StructField("leaf", LongType(), False),  # 0..n-1 node id
        StructField("sample_id", LongType(), False),
        StructField("entity_id", LongType(), False),
        StructField("class_id", IntegerType(), False),
    ]
)

# leaf→ancestor closure, built inside the clustering kernel (O22)
CLOSURE = StructType(
    [
        StructField("task_id", LongType(), False),
        StructField("leaf", LongType(), False),
        StructField("node", LongType(), False),  # ancestor-or-self
    ]
)

# ----- taxonomy (reference D6: libs/tree/base.py:110-115) -----
TAXONOMY = StructType(
    [
        StructField("child", StringType(), False),
        StructField("parent", StringType(), False),
    ]
)

# ----- entity linking -----
CANDIDATE_DICT = StructType(
    [
        StructField("surface", StringType(), False),
        StructField("entity_id", LongType(), False),
        StructField("prior", DoubleType(), False),
    ]
)

MATCH_EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
    ]
)

COMPONENTS = StructType(
    [
        StructField("node", LongType(), False),
        StructField("component", LongType(), False),
    ]
)

# ----- axiom catalog (reference D7: libs/axiom/base.py:7-245) -----
AXIOMS = StructType(
    [
        StructField("axiom_id", LongType(), False),
        StructField("kind", StringType(), False),  # concept|existential|top|and|or|neg|remainder
        StructField("rel", LongType(), True),
        StructField("concept", LongType(), True),
        StructField("children", ArrayType(LongType()), True),
        StructField("name", StringType(), False),
    ]
)

# long-form sparse entity–axiom matrix (reference D8)
ENTITY_AXIOM = StructType(
    [
        StructField("sample_id", LongType(), False),
        StructField("axiom_id", LongType(), False),
        StructField("holds", BooleanType(), False),
    ]
)
