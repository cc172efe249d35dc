"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline at sf0.001: synthesize transcript
turns from lineitem rows, run the zero-shuffle Arrow extraction, dictionary
-encode into a KG, and aggregate class sizes.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (SURVEY.md §2), DuckDB-checkable at sf0.01. Column names/aliases are
aligned pairwise; scores are rounded so value hashes match across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make `sparktax` importable even when this file is loaded by path from
# another working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_SHIPPED: set[int] = set()


def _ensure_pkg(spark: "SparkSession") -> None:
    """Ship the sparktax package to executor Python workers.

    The driver process finds it via sys.path above, but cloudpickled UDFs
    unpickle on workers whose sys.path does not include this repo unless
    the driver's cwd happens to be here — addPyFile covers every layout
    (and is exactly the spark-submit --py-files story)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zp = os.path.join(tempfile.gettempdir(), f"sparktax_pkg_{os.getpid()}.zip")
    if not os.path.exists(zp):
        with zipfile.ZipFile(zp, "w") as z:
            pkg = os.path.join(_REPO, "sparktax")
            for root, _dirs, files in os.walk(pkg):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        z.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zp)
    _SHIPPED.add(key)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# offsets giving disjoint node-id spaces for the KG derived from TPC-H
C_OFF = 1_000_000  # customers
N_OFF = 2_000_000  # nations
R_OFF = 3_000_000  # regions
S_OFF = 4_000_000  # suppliers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# derived fixtures (same definition lives in the oracle SQL)
# --------------------------------------------------------------------------


def _transcripts_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript turns: one turn per lineitem row whose text
    embeds a 'S<suppkey> supplies_part P<partkey>.' statement.

    (Round-6 A/B note: fanning the narrow source out before the Arrow
    kernel was measured WORSE at sf0.1 in alternating same-box bench pairs
    — 1.54 s → 1.83 s — the extraction kernel clears ~500k rows/s in one
    worker, so the repartition exchange + 32 Python-worker round-trips cost
    more than the single task they replace. Left unfanned.)"""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("conv_id"),
        F.col("l_linenumber").cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.concat(
            F.lit("ok ran tool S"),
            F.col("l_suppkey"),
            F.lit(" supplies_part P"),
            F.col("l_partkey"),
            F.lit(". done"),
        ).alias("text"),
        F.lit("kg_lookup").alias("tool"),
        F.col("l_shipdate").alias("ts"),
    )


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(h, r, t): customer --in_nation(0)--> nation --in_region(1)--> region,
    order --placed_by(2)--> customer, supplier --in_nation(0)--> nation."""
    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + C_OFF).alias("h"),
        F.lit(0).cast("long").alias("r"),
        (F.col("c_nationkey").cast("long") + N_OFF).alias("t"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("long") + N_OFF).alias("h"),
        F.lit(1).cast("long").alias("r"),
        (F.col("n_regionkey").cast("long") + R_OFF).alias("t"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + S_OFF).alias("h"),
        F.lit(0).cast("long").alias("r"),
        (F.col("s_nationkey").cast("long") + N_OFF).alias("t"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + 10_000_000).alias("h"),
        F.lit(2).cast("long").alias("r"),
        (F.col("o_custkey") + C_OFF).alias("t"),
    )
    return cust.union(nat).union(supp).union(orders)


_KG_SQL = f"""
    SELECT c_custkey + {C_OFF} AS h, 0::BIGINT AS r,
           c_nationkey::BIGINT + {N_OFF} AS t FROM customer
    UNION ALL
    SELECT n_nationkey::BIGINT + {N_OFF}, 1, n_regionkey::BIGINT + {R_OFF} FROM nation
    UNION ALL
    SELECT s_suppkey + {S_OFF}, 0, s_nationkey::BIGINT + {N_OFF} FROM supplier
    UNION ALL
    SELECT o_orderkey + 10000000, 2, o_custkey + {C_OFF} FROM orders
"""


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """sf0.001 flagship: transcripts → triples → KG encode → class sizes."""
    _ensure_pkg(spark)
    from sparktax.extract import extract_triples
    from sparktax.graph import KnowledgeGraph

    sf_dir = "/root/testdata/sf0.001"
    transcripts = _transcripts_from_lineitem(spark, sf_dir)
    raw = extract_triples(transcripts)
    kg = KnowledgeGraph.from_raw_triples(
        raw.select("subj", "pred", "obj"), isa_uri="supplies_part"
    )
    sizes = kg.class_sizes(valid_only=False)
    return (
        sizes.join(kg.entities.withColumnRenamed("id", "t"), "t")
        .select(F.col("uri").alias("part"), F.col("n_instances").alias("n_suppliers"))
        .orderBy(F.desc("n_suppliers"), F.asc("part"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-extract: zero-shuffle Arrow statement extraction (parity vs SQL)."""
    from sparktax.extract import extract_triples

    return extract_triples(_transcripts_from_lineitem(spark, sf_dir)).select(
        "conv_id", "turn_idx", "subj", "pred", "obj"
    )


def q_extract_contextual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-turn pronoun coreference: every 3rd turn's subject is 'They',
    resolved to the most recent explicit subject in the conversation by the
    SQL-window forward-fill path."""
    from pyspark.sql import Window

    from sparktax.extract import extract_triples_contextual

    li = _t(spark, sf_dir, "lineitem")
    # l_linenumber is NOT unique per order in this testdata → derive a
    # dense, deterministic turn index (same expression in the oracle)
    wo = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_suppkey", "l_partkey"
    )
    li = li.withColumn("_turn", F.row_number().over(wo))
    pron = (F.col("_turn") % 3 == 0)
    subj = F.when(pron, F.lit("They")).otherwise(
        F.concat(F.lit("S"), F.col("l_suppkey"))
    )
    t = li.select(
        F.col("l_orderkey").cast("string").alias("conv_id"),
        F.col("_turn").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit("note "), subj, F.lit(" supplies_part P"), F.col("l_partkey"), F.lit(".")
        ).alias("text"),
        F.lit("").alias("tool"),
        F.col("l_shipdate").cast("timestamp").alias("ts"),
    )
    return extract_triples_contextual(t).select(
        "conv_id", "turn_idx", "subj", "pred", "obj"
    )


def q_kg_class_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O20: members per nation over the derived KG (isa = relation 0)."""
    from sparktax.graph import KnowledgeGraph

    spark_triples = _kg_triples(spark, sf_dir)
    kg = KnowledgeGraph(spark_triples, None, None)
    kg._isa_id = 0
    return kg.class_sizes(valid_only=False).select(
        F.col("t").alias("class_node"), "n_instances"
    )


def q_kg_pattern_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9: triple-pattern (*, r=0, t=nation7) via pushdown filter."""
    from sparktax.graph import KnowledgeGraph

    kg = KnowledgeGraph(_kg_triples(spark, sf_dir), None, None)
    return kg.find_triples(r=0, t=N_OFF + 7).select("h", "r", "t")


def q_kg_existential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16/O17: extension of ∃placed_by.(nation_3 customers) — orders whose
    customer is in nation 3 (the 2-hop self-join)."""
    from sparktax.graph import KnowledgeGraph

    kg = KnowledgeGraph(_kg_triples(spark, sf_dir), None, None)
    kg._isa_id = 0
    return kg.instances_of_existential(2, N_OFF + 3).select(F.col("h").alias("order_node"))


def q_kg_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: 1-hop in/out adjacency of nation 3, exploded + sorted."""
    from sparktax.graph import KnowledgeGraph

    kg = KnowledgeGraph(_kg_triples(spark, sf_dir), None, None)
    nb = kg.neighborhood(N_OFF + 3)
    return nb.select(
        "direction", "r", F.explode("neighbors").alias("neighbor")
    )


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (large-star/small-star) over customer→nation→
    region edges: every node lands in its region's component, whose id is
    the min customer key in that region."""
    from sparktax.link import connected_components

    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + C_OFF).alias("src"),
        (F.col("c_nationkey").cast("long") + N_OFF).alias("dst"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("long") + N_OFF).alias("src"),
        (F.col("n_regionkey").cast("long") + R_OFF).alias("dst"),
    )
    return connected_components(cust.union(nat)).select("node", "component")


def q_link_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dictionary entity linking: supplier-name mentions against
    a (surface, entity_id, prior) dictionary from the supplier table."""
    from sparktax.link import link_mentions

    supp = _t(spark, sf_dir, "supplier")
    mentions = supp.select(
        F.col("s_suppkey").alias("mention_id"),
        F.upper(F.col("s_name")).alias("surface"),
    )
    cand = supp.select(
        F.col("s_name").alias("surface"),
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("prior"),
    )
    return link_mentions(mentions, cand).select(
        "mention_id", "entity_id", F.round("prior", 2).alias("prior")
    )


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup fingerprints: md5 over normalized text (per doc)."""
    from sparktax.textops import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fp")


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: canonical id + copy count per fingerprint."""
    from sparktax.textops import fingerprint

    fp = fingerprint(_t(spark, sf_dir, "documents"))
    return fp.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("n_copies"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (sparktax/textops.py:dedup_incremental):
    two id-ordered batches through a FRESH persisted snapshot index —
    batch 2's fingerprints anti-join batch 1's committed index — and the
    union of survivors must equal whole-corpus exact dedup (oracle:
    min-id per normalized fingerprint). The near lane's batch-equals-
    whole-corpus proof lives in tests/test_dedup_incremental.py."""
    import tempfile

    from sparktax.textops import dedup_incremental, fingerprint

    docs = _t(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="sparktax_incdex_")
    s1 = dedup_incremental(docs.filter(F.col("doc_id") < 250), idx, near=False)
    s2 = dedup_incremental(docs.filter(F.col("doc_id") >= 250), idx, near=False)
    surv = s1.select("doc_id").unionByName(s2.select("doc_id"))
    return surv.join(fingerprint(docs), "doc_id").select("doc_id", "fp")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-3-gram Jaccard pairs ≥ 0.5 among the first 200 docs
    (the oracle-checkable near-dup path; MinHash/LSH is the scale path)."""
    from sparktax.textops import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (MOSS winnowing): min md5-prefix
    hash per sliding window of character 5-gram hashes."""
    from sparktax.textops import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnow_fingerprints(docs, k=5, w=4)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: documents sharing ≥1 distinct word
    5-gram with a probe set (here: the first 120 chars of every 100th doc,
    standing in for benchmark texts). Probe shingles broadcast; the corpus
    is touched once."""
    from sparktax.textops import decontaminate

    docs = _t(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 100 == 7).select(
        F.col("doc_id").alias("probe_id"), F.substring("text", 1, 120).alias("text")
    )
    return decontaminate(docs, probes, n=5).select("doc_id", "probe_id", "n_matches")


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparktax.textops import language_id

    return language_id(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang_pred", "lang_hits"
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparktax.textops import token_counts

    return token_counts(_t(spark, sf_dir, "documents")).select(
        "doc_id", "ws_tokens", "bpe_ish_tokens"
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparktax.textops import quality_score

    return quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars", "n_tokens", "punct_ratio", "stopword_ratio", "quality"
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-token / top-bigram share and
    duplicate-sentence fraction (boilerplate detectors for LM training
    corpora)."""
    from sparktax.textops import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (pre-training hygiene). Both engines append the SAME
    deterministic doc_id-derived PII spans (email/phone/ssn/ip) to every
    document's text, then replay the identical ordered regex chain — the
    redacted text and per-kind counts must match byte-for-byte."""
    from sparktax.textops import redact_pii

    d = F.col("doc_id")
    aug = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@mail.example.com ph 555-"),
            F.lpad((d % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
            F.lit(" ssn "),
            F.lpad((d % 900).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d % 90).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((d % 9000).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            (d % 256).cast("string"),
            F.lit(".0."),
            ((d * 7) % 256).cast("string"),
        ).alias("text"),
    )
    return redact_pii(aug).select(
        "doc_id", "text", "n_email", "n_ssn", "n_phone", "n_ip"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-then-chunk sequence layout (GPT-style pretraining batches):
    every doc's (seq_id, seq_offset, end_seq_id) in the concatenated
    token stream, computed by a distributed two-level prefix sum that is
    integer-bit-equal to the single-window global cumsum DuckDB runs."""
    from sparktax.textops import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), budget=256, n_ranges=8
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with overlap (RAG / long-doc layout):
    size-32 windows every 24 tokens. Narrow map + generator — the plan
    has no Exchange; DuckDB replays it via unnest(range) + list slices."""
    from sparktax.textops import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    )


# gate mix: deterministic per-source weights {0, 0.75, 1.5, 2.25} — exercises
# drop (0), fractional down-sample, and integer+fractional up-sample lanes
_MIX_WEIGHTS = {f"src{i}": (i % 4) * 0.75 for i in range(20)}
_MIX_SEED = 11


def q_mix_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted training mixture: floor(w) copies per doc plus a
    frac(w)-probability extra, decided by the exact 60-bit md5-uniform
    integer device — bit-replayable in DuckDB (same integer thresholds
    via mix_weight_params)."""
    from sparktax.textops import mix_corpora

    return mix_corpora(
        _t(spark, sf_dir, "documents"), _MIX_WEIGHTS, seed=_MIX_SEED
    ).select("doc_id", "source", "copy_idx")


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = 13


def q_split_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: one 60-bit md5-uniform
    draw bucketed by exact cumulative integer thresholds — a pure
    narrow map (zero shuffles), content-stable as the corpus grows."""
    from sparktax.textops import split_corpus

    return split_corpus(
        _t(spark, sf_dir, "documents"), _SPLIT_FRACTIONS, seed=_SPLIT_SEED
    ).select("doc_id", "source", "split")


def _split_corpus_sql() -> str:
    from sparktax.textops import split_thresholds

    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(doc_id::VARCHAR || "
        f"':{_SPLIT_SEED}'),{j + 1},1))::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    )
    ths = split_thresholds(_SPLIT_FRACTIONS)
    case = (
        "CASE "
        + " ".join(f"WHEN u60 < {t} THEN '{n}'" for n, t in ths[:-1])
        + f" ELSE '{ths[-1][0]}' END"
    )
    return f"""
        WITH u AS (SELECT doc_id, source, ({u60}) AS u60 FROM documents)
        SELECT doc_id, source, {case} AS split FROM u
    """


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span-level dedup (Lee et al. 2022) in the md5-hash
    lane: duplicated ≥8-token windows collapse to their global first
    occurrence; DuckDB replays windows, first-keys, interval merge and
    text rebuild bit-for-bit."""
    from sparktax.textops import dedup_spans

    return dedup_spans(_t(spark, sf_dir, "documents"), w=8, hasher="md5")


def _dedup_spans_sql(w: int = 8) -> str:
    """DuckDB replica of the md5 dedup_spans lane. Pure SQL (no gate-data
    read at build time): same normalization/tokens as the other text
    oracles, the u60 md5-prefix window hash, min(doc_id·2²⁰+pos) first
    keys, gaps-and-islands interval merge, and a lambda rebuild of the
    kept token stream."""
    norm = _NORM.format(c="coalesce(text, '')")
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(g),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split({norm}, ' '), t -> t <> '') AS t
            FROM documents
        ),
        wtext AS (
            SELECT doc_id, i AS pos,
                   array_to_string(list_slice(t, i + 1, i + {w}), ' ') AS g
            FROM toks,
                 LATERAL (SELECT unnest(
                     range(0, greatest(len(t) - {w} + 1, 0))) AS i)
        ),
        wins AS (SELECT doc_id, pos, ({u60}) AS whash FROM wtext),
        firsts AS (
            SELECT whash, min(doc_id * 1048576 + pos) AS fk
            FROM wins GROUP BY whash HAVING count(*) > 1
        ),
        marked AS (
            SELECT w.doc_id, w.pos, w.pos + {w} AS e
            FROM wins w JOIN firsts f USING (whash)
            WHERE w.doc_id * 1048576 + w.pos <> f.fk
        ),
        pm AS (
            SELECT doc_id, pos, e,
                   max(e) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS pmax
            FROM marked
        ),
        isl AS (
            SELECT doc_id, pos, e,
                   sum(CASE WHEN pmax IS NULL OR pos > pmax
                       THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS grp
            FROM pm
        ),
        merged AS (
            SELECT doc_id, min(pos) AS s, max(e) AS e
            FROM isl GROUP BY doc_id, grp
        ),
        spans AS (
            SELECT doc_id, list_sort(list(s * 1048576 + e)) AS sp
            FROM merged GROUP BY doc_id
        ),
        pre AS (
            SELECT t.doc_id, len(t.t) AS n_tokens, t.t AS t,
                   coalesce(s.sp, CAST([] AS BIGINT[])) AS sp
            FROM toks t LEFT JOIN spans s USING (doc_id)
        ),
        kept AS (
            SELECT doc_id, n_tokens, t,
                   list_filter(range(0, n_tokens),
                       i -> len(list_filter(sp,
                           z -> i >= (z >> 20) AND i < (z & 1048575))) = 0)
                       AS ki
            FROM pre
        )
        SELECT doc_id, n_tokens::BIGINT AS n_tokens,
               (n_tokens - len(ki))::BIGINT AS n_removed,
               coalesce(array_to_string(
                   list_transform(ki, i -> t[i + 1]), ' '), '') AS clean_text
        FROM kept
    """


_DOCCLUS_K = 8
_DOCCLUS_BUCKETS = 2048
_DOCCLUS_SEED = 42


def q_doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-tf spherical k-means document clustering (the domain-
    discovery prep) in the md5 lane: sampling, bucketing, the shared
    numpy Lloyd core and the all-integer assignment replay in DuckDB."""
    from sparktax.textops import cluster_documents

    return cluster_documents(
        _t(spark, sf_dir, "documents"),
        k=_DOCCLUS_K,
        buckets=_DOCCLUS_BUCKETS,
        seed=_DOCCLUS_SEED,
        hasher="md5",
    )


def _doc_clusters_sql() -> str:
    """DuckDB replica: hashlib md5-rank sampling + duckdb featurization +
    the shared ``_lloyd`` → quantized centroid VALUES → integer dot
    argmax with the (s DESC, cluster DESC) tie-break."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from sparktax.simsearch import _lloyd

    K, B, seed = _DOCCLUS_K, _DOCCLUS_BUCKETS, _DOCCLUS_SEED
    norm = _NORM.format(c="coalesce(text, '')")
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(g),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    grams_cte = f"""
        toks AS (
            SELECT doc_id,
                   list_filter(string_split({norm}, ' '), t -> t <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(t || list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks
        ),
        bucketed AS (SELECT doc_id, ({u60}) % {B} AS bucket FROM grams)
    """
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.sql(
        f"WITH {grams_cte} SELECT doc_id, bucket, count(*) "
        f"FROM bucketed GROUP BY 1, 2"
    ).fetchall()
    by_doc: dict = {}
    for d, b, n in rows:
        by_doc.setdefault(d, []).append((int(b), int(n)))

    def rank(i):
        return (
            int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16),
            i,
        )

    all_ids = [r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()]
    sample_ids = sorted(sorted(all_ids), key=rank)[:4096]
    X = np.zeros((len(sample_ids), B))
    for r, i in enumerate(sorted(sample_ids)):
        for b, c in by_doc.get(i, []):
            X[r, b] = c
    C = _lloyd(X, K, 10, seed)
    Cq = np.round(C * (1 << 20)).astype(np.int64)
    w_values = ", ".join(
        f"({b}, {j}, {int(Cq[j, b])})"
        for j in range(K)
        for b in range(B)
        if Cq[j, b] != 0
    )
    return f"""
        WITH {grams_cte},
        counts AS (
            SELECT doc_id, bucket, count(*) AS c
            FROM bucketed GROUP BY 1, 2
        ),
        w(bucket, cluster, wt) AS (VALUES {w_values}),
        dots AS (
            SELECT doc_id, cluster, sum(c * wt) AS s
            FROM counts JOIN w USING (bucket)
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT doc_id, cluster,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY s DESC, cluster DESC) AS rk
            FROM dots
        )
        SELECT d.doc_id, coalesce(r.cluster, -1) AS cluster
        FROM documents d
        LEFT JOIN (SELECT doc_id, cluster FROM ranked WHERE rk = 1) r
            USING (doc_id)
    """


_QCLF_BUCKETS = 2048
_QCLF_SEED = 42


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality classifier (Joulin et al. 2016) in the md5
    lane: hash-rank sampling, bucketing, the shared numpy trainer and the
    all-integer scoring are each engine-replayable, so the whole
    train-then-score round trip hash-checks against DuckDB."""
    from sparktax.textops import classify_quality, train_quality_classifier

    docs = _t(spark, sf_dir, "documents")
    wq, bq = train_quality_classifier(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
        buckets=_QCLF_BUCKETS,
        seed=_QCLF_SEED,
        hasher="md5",
    )
    return classify_quality(docs, wq, bq, hasher="md5")


def _qclf_replica_weights(sf_dir: str):
    """Independent hashlib/duckdb replay of the md5 training lane:
    engine-parity tokens from DuckDB, hashlib md5 sampling rank and
    bucketing, the shared numpy core (`logreg_weights`, the `_lloyd`
    pattern), standardization fold reimplemented here."""
    import hashlib

    import duckdb
    import numpy as np

    from sparktax.textops import logreg_weights

    norm = _NORM.format(c="coalesce(text, '')")
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, list_filter(string_split({norm}, ' '), "
        f"t -> t <> '') AS t FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    B, seed = _QCLF_BUCKETS, _QCLF_SEED

    def grams(toks):
        return list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    def rank(i):
        return (
            int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16),
            i,
        )

    toks_of = {d: (t or []) for d, _, t in rows}
    lang_of = {d: lg for d, lg, _ in rows}

    def featurize(ids):
        ids = sorted(ids, key=rank)[:4096]
        X = np.zeros((len(ids), B))
        for r, i in enumerate(sorted(ids)):
            for g in grams(toks_of[i]):
                X[r, bucket(g)] += 1
            tot = X[r].sum()
            if tot > 0:
                X[r] /= tot
        return X

    Xp = featurize([d for d in toks_of if lang_of[d] == "en"])
    Xn = featurize([d for d in toks_of if lang_of[d] != "en"])
    X = np.concatenate([Xp, Xn])
    y = np.concatenate([np.ones(len(Xp)), np.zeros(len(Xn))])
    mu, sd = X.mean(axis=0), X.std(axis=0) + 1e-9
    w, b = logreg_weights((X - mu) / sd, y)
    w_eff = w / sd
    b_eff = b - float((w * (mu / sd)).sum())
    return (
        np.round(w_eff * (1 << 20)).astype(np.int64),
        int(round(b_eff * (1 << 20))),
    )


def _qclf_sql() -> str:
    """DuckDB replica of the md5 classify lane: replica-trained weights
    as VALUES, the u60 md5 bucket device, integer per-doc sums."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    wq, bq = _qclf_replica_weights(sf_dir)
    norm = _NORM.format(c="coalesce(text, '')")
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(g),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    w_values = ", ".join(
        f"({i}, {int(wq[i])})" for i in range(len(wq))
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split({norm}, ' '), t -> t <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(t || list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks
        ),
        bucketed AS (
            SELECT doc_id, ({u60}) % {len(wq)} AS bucket FROM grams
        ),
        w(bucket, wq) AS (VALUES {w_values}),
        scored AS (
            SELECT doc_id, count(*) AS n_grams, sum(wq) AS s
            FROM bucketed JOIN w USING (bucket)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               (coalesce(s.s, 0) + {bq} * coalesce(s.n_grams, 0))::BIGINT
                   AS logit_q,
               (coalesce(s.s, 0) + {bq} * coalesce(s.n_grams, 0)) > 0
                   AS keep
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """


_BPE_MERGES = 24


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training (Sennrich et al. 2016): the full iterative
    merge loop over the word-frequency table. Deterministic by the
    (count DESC, left ASC, right ASC) tie-break, so an independent python
    replay reproduces the merge table exactly."""
    from sparktax.bpe import train_bpe

    return train_bpe(_t(spark, sf_dir, "documents"), n_merges=_BPE_MERGES)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding with the trained merges (distinct words encoded once,
    corpus joined back). The oracle compares md5 of the joined symbol
    stream so no document text is embedded in SQL."""
    from sparktax.bpe import encode_bpe, train_bpe

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=_BPE_MERGES)
    return encode_bpe(docs, merges).select(
        "doc_id", "n_bpe_tokens", F.md5("bpe_text").alias("bpe_md5")
    )


def _bpe_replica(sf_dir: str, n_merges: int):
    """Independent pure-python BPE replay (no code shared with
    sparktax/bpe.py): words come from DuckDB with the engine-parity
    normalization, the merge loop and encoder are reimplemented here."""
    from collections import Counter

    import duckdb

    norm = _NORM.format(c="coalesce(text, '')")
    con = duckdb.connect()
    doc_rows = con.sql(
        f"SELECT doc_id, list_filter(string_split({norm}, ' '), "
        f"t -> t <> '') AS t FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wc: Counter = Counter(w for _, t in doc_rows for w in (t or []))
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((rank, a, b))
        new_vocab: dict = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab

    enc_cache: dict = {}

    def enc_word(w: str) -> list[str]:
        if w not in enc_cache:
            syms = list(w) + ["</w>"]
            for _, a, b in merges:
                i, new = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        new.append(a + b)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            enc_cache[w] = syms
        return enc_cache[w]

    docs = []
    for doc_id, t in doc_rows:
        toks = [s for w in (t or []) for s in enc_word(w)]
        docs.append((doc_id, len(toks), " ".join(toks)))
    return merges, docs


def _maybe_bpe_oracle() -> dict[str, str]:
    """Like _maybe_ivf_oracle: the builder reads the gate parquet, so only
    the expected missing-data failures degrade these two to rows-only."""
    import hashlib
    import os

    try:
        import duckdb

        missing = (FileNotFoundError, OSError, duckdb.IOException)
    except ImportError:
        return {}
    try:
        sf_dir = os.environ.get(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
        merges, docs = _bpe_replica(sf_dir, _BPE_MERGES)
        qclf_sql = _qclf_sql()
        doc_clusters_sql = _doc_clusters_sql()
    except missing as e:
        import sys

        print(f"bpe/qclf oracles degraded to rows-only: {e!r}", file=sys.stderr)
        return {}

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    mvals = ", ".join(f"({r}, {q(a)}, {q(b)})" for r, a, b in merges)
    evals = ", ".join(
        f"({d}, {n}, '{hashlib.md5(t.encode()).hexdigest()}')"
        for d, n, t in docs
    )
    return {
        "bpe_merges": f"""
            SELECT * FROM (VALUES {mvals}) AS t(rank, "left", "right")
        """,
        "bpe_encode": f"""
            SELECT * FROM (VALUES {evals})
                AS t(doc_id, n_bpe_tokens, bpe_md5)
        """,
        "quality_classifier": qclf_sql,
        "doc_clusters": doc_clusters_sql,
    }


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): raw = all documents,
    target = the English subset; md5-bucketed 1–2-grams so DuckDB replays
    the bucketing, counts feed the SAME numpy weight function in both
    engines, and per-doc sums are all-integer (order-free)."""
    from sparktax.textops import importance_weights

    docs = _t(spark, sf_dir, "documents")
    return importance_weights(
        docs, docs.filter(F.col("lang") == "en"), buckets=4096, hasher="md5"
    )


def _dsir_sql(buckets: int = 4096) -> str:
    """DuckDB replica of the md5 DSIR lane: recompute both bucket-count
    vectors from the gate parquet with the same normalization/grams/md5
    bucketing, run the SAME ``dsir_bucket_weights`` numpy quantizer, embed
    the int64 weights as VALUES, and replay the integer per-doc sum."""
    import os

    import duckdb
    import numpy as np

    from sparktax.textops import dsir_bucket_weights

    norm = _NORM.format(c="text")
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(g),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    grams_cte = f"""
        toks AS (
            SELECT doc_id,
                   list_filter(string_split({norm}, ' '), t -> t <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(t || list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks
        ),
        bucketed AS (SELECT doc_id, ({u60}) % {buckets} AS bucket FROM grams)
    """
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW all_docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )

    def count_vec(where: str) -> np.ndarray:
        rows = con.sql(
            f"WITH documents AS (SELECT * FROM all_docs {where}), {grams_cte}"
            f" SELECT bucket, count(*) FROM bucketed GROUP BY 1"
        ).fetchall()
        c = np.zeros(buckets, dtype=np.int64)
        for b, n in rows:
            c[int(b)] = int(n)
        return c

    wq = dsir_bucket_weights(count_vec("WHERE lang = 'en'"), count_vec(""))
    w_values = ", ".join(f"({i}, {int(wq[i])})" for i in range(buckets))
    return f"""
        WITH {grams_cte},
        w(bucket, wq) AS (VALUES {w_values}),
        scored AS (
            SELECT doc_id, count(*) AS n_grams, sum(wq) AS s
            FROM bucketed JOIN w USING (bucket)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               round(coalesce(s.s, 0) / 1048576.0, 6) AS logratio
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DSIR top-70% selection on the quantized score grid —
    parallelism-independent (the approxQuantile-drift fix): kept set is
    a pure function of the input multiset."""
    from sparktax.textops import importance_select

    docs = _t(spark, sf_dir, "documents")
    return importance_select(
        docs,
        docs.filter(F.col("lang") == "en"),
        keep_frac=0.7,
        buckets=4096,
        hasher="md5",
    )


def _dsir_select_sql() -> str:
    """DuckDB replica: the distributed grid-threshold + tie-band rule is
    EQUIVALENT to the simple global ranking (qv DESC, doc_id ASC) ≤
    n_keep — fine for the oracle at sf0.01, a single-partition sort the
    engine deliberately avoids at scale."""
    import duckdb
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    n_keep = int(n * 0.7)  # same float op as the engine's python
    return f"""
        WITH scored AS ({_dsir_sql()}),
        q AS (
            SELECT doc_id, logratio,
                   round(logratio * 1048576)::BIGINT AS qv
            FROM scored
        )
        SELECT doc_id, logratio FROM q
        QUALIFY row_number() OVER (ORDER BY qv DESC, doc_id) <= {n_keep}
    """


def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style hashed-ngram LM cross-entropy (Wenzek et al. 2019):
    model = the English subset; md5 buckets + quantized log-probs make
    the per-doc totals all-integer and engine-exact."""
    from sparktax.textops import perplexity_score

    docs = _t(spark, sf_dir, "documents")
    return perplexity_score(
        docs, docs.filter(F.col("lang") == "en"), buckets=4096, hasher="md5"
    )


def _perplexity_sql(buckets: int = 4096) -> str:
    """DuckDB replica of the md5 perplexity lane: recompute the model's
    bucket counts from the gate parquet with the same grams/bucketing,
    run the SAME ``lm_bucket_logprobs`` quantizer, replay the integer
    per-doc sum."""
    import os

    import duckdb
    import numpy as np

    from sparktax.textops import lm_bucket_logprobs

    norm = _NORM.format(c="coalesce(text, '')")
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(g),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    grams_cte = f"""
        toks AS (
            SELECT doc_id,
                   list_filter(string_split({norm}, ' '), t -> t <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(t || list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS g
            FROM toks
        ),
        bucketed AS (SELECT doc_id, ({u60}) % {buckets} AS bucket FROM grams)
    """
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW all_docs AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.sql(
        f"WITH documents AS (SELECT * FROM all_docs WHERE lang = 'en'), "
        f"{grams_cte} SELECT bucket, count(*) FROM bucketed GROUP BY 1"
    ).fetchall()
    c = np.zeros(buckets, dtype=np.int64)
    for b, n in rows:
        c[int(b)] = int(n)
    lp = lm_bucket_logprobs(c)
    w_values = ", ".join(f"({i}, {int(lp[i])})" for i in range(buckets))
    return f"""
        WITH {grams_cte},
        w(bucket, lq) AS (VALUES {w_values}),
        scored AS (
            SELECT doc_id, count(*) AS n_grams, sum(lq) AS s
            FROM bucketed JOIN w USING (bucket)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               round(-coalesce(s.s, 0) / 1048576.0, 6) AS total_nll
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """


_ORDER_SEED = 7


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-prep chain: domain-weighted mix (copies) →
    deterministic seeded shuffle into 8 shards. One hashpartitioning
    exchange on shard_id, per-shard window sort — parallelism scales
    with n_shards, never a global-order sort."""
    from sparktax.textops import mix_corpora, training_order

    mixed = mix_corpora(
        _t(spark, sf_dir, "documents"), _MIX_WEIGHTS, seed=_MIX_SEED
    ).select("doc_id", "source", "copy_idx")
    return training_order(
        mixed, n_shards=8, seed=_ORDER_SEED, extra_key_cols=["copy_idx"]
    ).select("doc_id", "copy_idx", "shard_id", "pos")


def _training_order_sql() -> str:
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(doc_id::VARCHAR || ':' || "
        f"copy_idx::VARCHAR || ':{_ORDER_SEED}'),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
        WITH mixed AS ({_mix_corpora_sql()}),
        u AS (SELECT doc_id, copy_idx, ({u60}) AS u60 FROM mixed)
        SELECT doc_id, copy_idx,
               (u60 % 8)::BIGINT AS shard_id,
               (row_number() OVER (PARTITION BY u60 % 8
                   ORDER BY u60, doc_id, copy_idx) - 1)::BIGINT AS pos
        FROM u
    """


def _mix_corpora_sql() -> str:
    from sparktax.textops import mix_weight_params

    vals = ", ".join(
        f"('{d}', {b}, {t})"
        for d, (b, t) in (
            (d, mix_weight_params(w)) for d, w in sorted(_MIX_WEIGHTS.items())
        )
    )
    u60 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(doc_id::VARCHAR || "
        f"':{_MIX_SEED}'),{j + 1},1))::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
        WITH w(dom, base, thresh) AS (VALUES {vals}),
        u AS (SELECT doc_id, source, ({u60}) AS u60 FROM documents),
        j AS (
            SELECT u.doc_id, u.source,
                   w.base + CASE WHEN u.u60 < w.thresh THEN 1 ELSE 0 END
                       AS n_copies
            FROM u JOIN w ON u.source = w.dom
        )
        SELECT doc_id, source,
               unnest(range(1, n_copies + 1))::BIGINT AS copy_idx
        FROM j WHERE n_copies > 0
    """


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-4 cosine neighbors of the first 5 vectors."""
    from sparktax.simsearch import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return cosine_topk(emb, queries, k=4).select(
        "query_id", "neighbor_id", "score", "rank"
    )


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-agg (TPC-H Q1 shape): returnflag/linestatus pricing summary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38: top-3 orders by totalprice per orderpriority."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


def q_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: broadcast dim decode — customers with nation/region names."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O43-45: customers with orders minus low-balance ones (anti/except)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    low = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return with_orders.exceptAll(low).distinct()


def q_bucketed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O28: histogram of events.value in width-50 buckets per event_type."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.floor(F.col("value") / 50).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


def q_events_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graft windows: per-user inter-event gap via lag over (ts, event_id)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; the cast to TIMESTAMP interprets wall time in the
    # session timezone — pin UTC so gaps are DST-free regardless of the
    # driver session's configuration
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    return e.select(
        "user_id",
        "event_id",
        F.when(prev.isNotNull(), (us - prev) / 1_000_000.0)
        .otherwise(None)
        .alias("gap_s"),
    ).select("user_id", "event_id", F.round("gap_s", 6).alias("gap_s"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at
    or before it (union + window forward-fill, one shuffle — checked
    against DuckDB's native ASOF JOIN)."""
    from pyspark.sql import Window

    from sparktax.asof import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    e = _t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    j = asof_join(left, right, on="user_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return j.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("click_event_id"),
        F.round("value", 6).alias("click_value"),
        F.round((us("ts") - us("ts_right")) / 1_000_000.0, 6).alias("gap_s"),
    )


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O49: contains-scan with deterministic order + limit."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.lower(F.col("p_name")).contains("red"))
        .orderBy("p_partkey")
        .limit(100)
        .select("p_partkey", "p_name")
    )


def q_safe_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O50: zero-guarded division — per-nation positive-balance ratio."""
    c = _t(spark, sf_dir, "customer")
    agg = c.groupBy("c_nationkey").agg(
        F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("pos"),
        F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("rich"),
    )
    return agg.select(
        "c_nationkey",
        F.round(
            F.when(F.col("pos") == 0, 0.0).otherwise(F.col("rich") / F.col("pos")), 6
        ).alias("rich_ratio"),
    )


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O54: seeded deterministic sampling, fully DuckDB-oracled via the
    md5-rank device (rank = exact 60-bit int of the first 15 hex chars of
    ``md5(h || ':' || seed)``, replicated in SQL with the strpos hex
    trick). Production default stays ``rank_on="xxhash64"`` (faster, same
    uniform-without-replacement semantics)."""
    from sparktax.graph import KnowledgeGraph

    kg = KnowledgeGraph(_kg_triples(spark, sf_dir), None, None)
    kg._isa_id = 0
    return kg.sample_instances(50, cls=N_OFF + 1, seed=7, rank_on="md5")


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH near-dup pipeline, fully DuckDB-oracled: the md5 hasher
    makes signatures bit-identical across engines (same device as the
    SimHash oracle), so shingle → 64-perm minhash → 16-band blocking →
    exact-Jaccard verify is hash-checked end to end. Production default
    stays ``hasher="xxhash64"`` (faster per shingle, same algorithm)."""
    from sparktax.textops import minhash_near_duplicates

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = minhash_near_duplicates(
        docs, threshold=0.5, n=3, k=64, bands=16, hasher="md5"
    )
    return pairs.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures — fully JVM-side (md5 token hash, 64 conditional
    sums), bit-for-bit reproducible by the DuckDB oracle."""
    from sparktax.textops import simhash

    return simhash(_t(spark, sf_dir, "documents"))


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN, fully DuckDB-oracled via the md5int plane
    mode: integer hyperplane weights from md5 + 2²⁰-quantized vectors make
    the signatures (and therefore the banded candidate set) bit-identical
    across engines; the exact-cosine rerank rounds to 6dp like
    cosine_topk. Production default stays ``plane_gen="gauss"`` (BLAS
    matmul signatures, same blocking algorithm)."""
    from sparktax.simsearch import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.orderBy("vec_id").limit(5)
    return lsh_topk(emb, queries, dim=dim, k=4, plane_gen="md5int")


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN, fully DuckDB-oracled in the reproducible mode:
    centroids train on the md5-rank-ordered sample (the oracle builder
    recomputes them bit-identically with hashlib + the same numpy Lloyd),
    assignment is all-integer quantized, rerank rounds to 6dp. Production
    default stays the float/BLAS path (same algorithm; recall and
    full-probe exactness pytest-asserted, plus the ivf_full_probe
    hash-gate)."""
    from sparktax.simsearch import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return ivf_topk(
        emb, queries, k=4, n_cells=16, n_probe=4, assign_mode="md5int"
    )


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same IVF probe as ``ivf_topk`` but over PERSISTED inverted
    lists bucketed by cell (sparktax/simsearch.py:materialize_ivf_index):
    the probed-cell set pushes down as a literal filter on the bucket
    column, so the scan reads only matching buckets
    (``SelectedBucketsCount`` — plan-audited). Same centroids + quantized
    assignment ⇒ bit-identical results ⇒ the same DuckDB oracle."""
    import tempfile

    from sparktax.simsearch import (
        ivf_topk_indexed,
        materialize_ivf_index,
        train_ivf_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    C = train_ivf_centroids(emb, 16, rank_on="md5")
    idx = materialize_ivf_index(
        spark, emb, tempfile.mkdtemp(prefix="sparktax_ivfidx_"), C,
        assign_mode="md5int",
    )
    queries = emb.orderBy("vec_id").limit(5)
    return ivf_topk_indexed(idx, queries, C, k=4, n_probe=4, assign_mode="md5int")


def q_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at ``n_probe == n_cells``: every cell is probed, so the
    candidate set is the whole corpus and the result must be EXACTLY the
    brute-force top-k — oracled against the same SQL as ``cosine_topk``
    (round-2 verdict item #6: make the pytest-proven full-probe exactness
    visible in the driver's correctness gate)."""
    from sparktax.simsearch import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return ivf_topk(emb, queries, k=4, n_cells=16, n_probe=16).select(
        "query_id", "neighbor_id", "score", "rank"
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (repo addition — the billion-vector
    compression lane; sparktax/pq.py). Reproducible mode: codebooks train
    per subspace on the md5-rank-ordered sample (the oracle builder
    recomputes them bit-identically with hashlib + the same numpy L2
    Lloyd), encoding and the ADC lookup sums are ALL-INTEGER
    (``round(·2²⁰)`` quantization), so the scores — integer partial-dot
    sums over the compressed codes — hash-match DuckDB exactly.
    Production default stays ``mode="float"`` (BLAS argmin encode, double
    ADC; same algorithm, recall pytest-asserted)."""
    from sparktax.pq import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return pq_topk(emb, queries, k=4, m_sub=8, n_codes=16, mode="md5int")


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ — the full FAISS-style three-stage funnel (coarse cells →
    ADC over probed cells' codes → exact rerank of the top-16), every
    stage engine-reproducible: md5-rank-trained centroids AND codebooks,
    integer cell assignment, integer ADC shortlist, 6dp-rounded cosine
    rerank. The one approximate lane a 100 TB corpus actually ships."""
    from sparktax.pq import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    return ivfpq_topk(
        emb, queries, k=4, n_cells=16, n_probe=4, m_sub=8, n_codes=16,
        mode="md5int", rerank=16,
    )


def q_uri_shorten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O47/O48: URI prefix shortening + literal normalization."""
    from sparktax.graph.io import normalize_literals, shorten_uri

    n = _t(spark, sf_dir, "nation")
    long_uri = F.concat(
        F.lit("http://dbpedia.org/resource/"), F.regexp_replace("n_name", " ", "_")
    )
    label_lit = F.concat(F.lit('"'), F.col("n_name"), F.lit('"@en'))
    typed_lit = F.concat(
        F.lit('"'), F.col("n_nationkey"), F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer>')
    )
    return n.select(
        "n_nationkey",
        shorten_uri(long_uri).alias("short_uri"),
        normalize_literals(label_lit).alias("label_norm"),
        normalize_literals(typed_lit).alias("typed_norm"),
    )


def q_openke_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O13: OpenKE directory scan with scan-time row filters
    (lightweight + exclude_entities). The fixture is derived
    deterministically from the supplier table, so the oracle recomputes
    the expected surviving triples straight from SQL."""
    import tempfile

    from sparktax.graph.io import read_openke_dir

    supp = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .orderBy("s_suppkey")
        .collect()
    )
    d = os.path.join(
        tempfile.gettempdir(), f"sparktax_openke_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    os.makedirs(d, exist_ok=True)
    ents = [("owl:Thing", 0), ("dbo:Junk:Wikidata", 90)]
    ents += [(f"dbo:N{i}", 1 + i) for i in range(25)]
    ents += [(f"dbr:S{r.s_suppkey}", 100 + r.s_suppkey) for r in supp]
    rels = [("rdf:type", 0), ("rdfs:label", 1), ("based_in", 2)]
    rows = []
    for r in supp:
        k, nat = r.s_suppkey, r.s_nationkey
        rows.append((100 + k, 1 + nat, 0))  # rdf:type nation-class (kept)
        rows.append((100 + k, 100 + k, 1))  # rdfs:label (lightweight-dropped)
        rows.append((100 + k, 1 + nat, 2))  # based_in (kept)
        if k % 10 == 0:
            rows.append((100 + k, 90, 0))  # invalid type (dropped)
        if k % 7 == 0:
            rows.append((100 + k, 0, 0))  # owl:Thing (kept)
    with open(f"{d}/entity2id.txt", "w") as f:
        f.write(f"{len(ents)}\n" + "".join(f"{u}\t{i}\n" for u, i in ents))
    with open(f"{d}/relation2id.txt", "w") as f:
        f.write(f"{len(rels)}\n" + "".join(f"{u}\t{i}\n" for u, i in rels))
    with open(f"{d}/train2id.txt", "w") as f:
        f.write(f"{len(rows)}\n" + "".join(f"{h} {t} {r}\n" for h, t, r in rows))
    triples, _, _ = read_openke_dir(
        spark, d, lightweight=True, exclude_entities={"dbr:S1"}
    )
    return triples.select("h", "r", "t")


def q_rank_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O41: rank within group — nations ranked by customer count per region."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    counts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    w = Window.partitionBy("n_regionkey").orderBy(F.desc("n_cust"), F.asc("n_nationkey"))
    return counts.withColumn("rnk", F.rank().over(w))


def q_type_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O25/O38: per-cluster type frequencies + top-3 (mktsegment as the
    cluster, nation as the type; freq = count/cluster size)."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("n"))
    sizes = c.groupBy("c_mktsegment").agg(F.count("*").alias("total"))
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n"), F.asc("c_nationkey"))
    return (
        counts.join(sizes, "c_mktsegment")
        .withColumn("freq", F.round(F.col("n") / F.col("total"), 6))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_nationkey", "n", "freq", "rk")
    )


def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27: per-label centroid norm + RMS radius (spheroid stats)."""
    from sparktax.simsearch import centroid_per_label

    emb = _t(spark, sf_dir, "embeddings")
    cent = centroid_per_label(emb)
    norm = F.sqrt(
        F.aggregate(F.col("centroid"), F.lit(0.0), lambda a, x: a + x * x)
    )
    return cent.select(
        "label",
        F.round(norm, 5).alias("centroid_norm"),
        F.round("radius", 5).alias("radius"),
    )


def q_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Separability: pairwise euclidean distance between per-label
    centroids (reference geometric_distance; the taxonomic half is
    driver-side tree math, pytest-covered)."""
    from sparktax.separability import centroid_distances
    from sparktax.simsearch import centroid_per_label

    emb = _t(spark, sf_dir, "embeddings")
    cent = centroid_per_label(emb)
    return centroid_distances(cent, id_col="label").select(
        "a", "b", F.round("geom", 5).alias("geom")
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact mode on the first 150
    vectors — the oracle-checkable path; LSH mode is the scale path)."""
    from sparktax.simsearch import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    return embedding_near_duplicates(emb, threshold=0.3, method="exact")


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked embedding near-dup, fully DuckDB-oracled via the md5int
    plane mode (deterministic banded blocking + exact verify — blocking
    recall is a property of the signatures, which both engines compute
    bit-identically)."""
    from sparktax.simsearch import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, threshold=0.3, method="lsh", plane_gen="md5int"
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (Abbas et al. 2023) in the md5int mode:
    md5-rank-trained centroids + all-integer quantized cell assignment make
    the cells engine-reproducible, and the within-cell cosine suppression
    reranks on the 6dp-rounded score — kept set bit-identical in DuckDB."""
    from sparktax.simsearch import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, threshold=0.2, n_cells=8, assign_mode="md5int"
    ).select(F.col("id").alias("vec_id"), "cell")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal lane (rows-only: binary payloads aren't SQL-expressible):
    REAL numpy decode of PPM/WAV fixtures → 16-dim features."""
    from sparktax.multimodal import MEDIA, extract_features, gen_media_pdf

    media = spark.createDataFrame(
        gen_media_pdf(60, seed=9, real_payloads=True), schema=MEDIA
    )
    feats = extract_features(media.filter(F.col("kind") != "video"), decoder="real")
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.element_at("feature", 1), 5).alias("f0"),
        F.round(F.element_at("feature", 3), 5).alias("f2"),
    )


def q_taxonomy_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden taxonomy extraction on planted blobs (rows-only: the HAC +
    Hungarian pipeline has no SQL equivalent). Returns the recovered
    (child, parent) edges — exactness is asserted in pytest."""
    from sparktax.extraction.pipeline import extract_taxonomy
    from sparktax.synth import gen_blob_embeddings_pdf

    dataset, classes, emb, gold = gen_blob_embeddings_pdf(per_class=30, seed=42)
    got = extract_taxonomy(
        spark.createDataFrame(dataset),
        spark.createDataFrame(emb),
        classes=spark.createDataFrame(classes),
        method="hard",
    )
    return spark.createDataFrame(sorted(got), "child string, parent string")


def _with_pkg(fn):
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_pkg(spark)
        return fn(spark, sf_dir)

    inner.__doc__ = fn.__doc__
    inner.__name__ = fn.__name__
    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        k: _with_pkg(v)
        for k, v in _raw_queries().items()
    }


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Declared queries. ORDER MATTERS for evidence coverage: the driver's
    correctness gate records at most ~50 rows per round in file order, so
    the queries it has never checked (the PQ family: pq_topk, ivfpq_topk,
    ivf_topk_indexed — green only in the local replica through round 5) and
    the 12 rows it skipped in round 5 lead the dict; the long-green
    remainder follows in the original order. Rotate least-recently-checked
    queries forward in future rounds."""
    return {
        # --- never in a driver CORRECTNESS file (round-5 verdict task 2) ---
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "ivf_topk_indexed": q_ivf_topk_indexed,
        # --- skipped by the driver's 50-row cap in round 5 ---
        "centroid_distances": q_centroid_distances,
        "ivf_full_probe": q_ivf_full_probe,
        "ivf_topk": q_ivf_topk,
        "lsh_topk": q_lsh_topk,
        "media_features": q_media_features,
        "minhash_neardup": q_minhash_neardup,
        "sample_deterministic": q_sample_deterministic,
        "simhash": q_simhash,
        "taxonomy_blobs": q_taxonomy_blobs,
        # --- driver-checked green in round 5 ---
        "extract_triples": q_extract_triples,
        "extract_contextual": q_extract_contextual,
        "kg_class_sizes": q_kg_class_sizes,
        "kg_pattern_lookup": q_kg_pattern_lookup,
        "kg_existential": q_kg_existential,
        "kg_neighborhood": q_kg_neighborhood,
        "components": q_components,
        "link_mentions": q_link_mentions,
        "dedup_fingerprint": q_dedup_fingerprint,
        "dedup_groups": q_dedup_groups,
        "dedup_incremental": q_dedup_incremental,
        "ngram_jaccard": q_ngram_jaccard,
        "winnow_fingerprints": q_winnow_fingerprints,
        "decontaminate": q_decontaminate,
        "language_id": q_language_id,
        "token_counts": q_token_counts,
        "quality_score": q_quality_score,
        "repetition": q_repetition,
        "redact_pii": q_redact_pii,
        "pack_sequences": q_pack_sequences,
        "chunk_documents": q_chunk_documents,
        "mix_corpora": q_mix_corpora,
        "training_order": q_training_order,
        "split_corpus": q_split_corpus,
        "dsir_weights": q_dsir_weights,
        "perplexity": q_perplexity,
        "dsir_select": q_dsir_select,
        "dedup_spans": q_dedup_spans,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "quality_classifier": q_quality_classifier,
        "doc_clusters": q_doc_clusters,
        "cosine_topk": q_cosine_topk,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "semantic_dedup": q_semantic_dedup,
        "agg_pricing": q_agg_pricing,
        "topk_window": q_topk_window,
        "join_dims": q_join_dims,
        "set_ops": q_set_ops,
        "bucketed_agg": q_bucketed_agg,
        "events_lag": q_events_lag,
        "asof_join": q_asof_join,
        "substring_search": q_substring_search,
        "safe_divide": q_safe_divide,
        "uri_shorten": q_uri_shorten,
        "openke_filtered_scan": q_openke_filtered_scan,
        "rank_matrix": q_rank_matrix,
        "type_freq_topk": q_type_freq_topk,
        "centroids": q_centroids,
    }


_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^\\w\\s]', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)

# Shared by "cosine_topk" (brute force) and "ivf_full_probe" (IVF with every
# cell probed — exact by construction, so the same oracle applies).
_COSINE_TOPK_SQL = """
    WITH q AS (SELECT vec_id, embedding FROM embeddings
               ORDER BY vec_id LIMIT 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                   q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6)
                   AS score
        FROM q, embeddings c WHERE c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
    QUALIFY rank <= 4
"""


def _lsh_sig_cte(n_planes: int = 16, n_bands: int = 4, seed: int = 42) -> str:
    """Shared CTE chain replicating sparktax.simsearch.hyperplane_signatures
    with ``plane_gen="md5int"``: integer weights in [-1000, 1000] from the
    first 15 md5 hex chars (strpos device), vectors quantized to
    ``round(x·2²⁰)``, all-integer dot products — signatures bit-identical
    to Spark's, so the banded candidate sets match exactly."""
    hex15 = " + ".join(
        f"strpos('123456789abcdef', substr(mh,{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    bits = n_planes // n_bands
    mask = (1 << bits) - 1
    return f"""
        grid AS (
            SELECT p.plane, q.pos,
                   md5('{seed}:' || p.plane::VARCHAR || ':'
                       || q.pos::VARCHAR) AS mh
            FROM (SELECT unnest(range(0, {n_planes})) AS plane) p,
                 (SELECT unnest(range(0,
                      (SELECT len(embedding) FROM embeddings LIMIT 1)))
                  AS pos) q
        ),
        w AS (SELECT plane, pos, ({hex15}) % 2001 - 1000 AS w FROM grid),
        qv AS (
            SELECT vec_id AS id, i - 1 AS pos,
                   round(embedding[i]::DOUBLE * 1048576)::BIGINT AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        ),
        dots AS (
            SELECT id, plane, sum(q * w) AS s
            FROM qv JOIN w USING (pos) GROUP BY 1, 2
        ),
        sig AS (
            SELECT id,
                   sum(CASE WHEN s >= 0 THEN (1::BIGINT << plane)
                       ELSE 0 END) AS sig
            FROM dots GROUP BY id
        ),
        bands AS (
            SELECT id, b.band, (sig >> ({bits} * b.band)) & {mask} AS key
            FROM sig,
                 LATERAL (SELECT unnest(range(0, {n_bands})) AS band) b
        )
    """


_LSH_TOPK_SQL = f"""
    WITH {_lsh_sig_cte()},
    q5 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
    cand AS (
        SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
        FROM bands q JOIN bands c USING (band, key)
        WHERE q.id IN (SELECT vec_id FROM q5) AND c.id <> q.id
    ),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(list_cosine_similarity(
                   qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]), 6)
                   AS score
        FROM cand
        JOIN embeddings qe ON qe.vec_id = cand.query_id
        JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, score,
           row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
    QUALIFY rank <= 4
"""


_NEARDUP_LSH_SQL = f"""
    WITH {_lsh_sig_cte()},
    cand AS (
        SELECT DISTINCT x.id AS a, y.id AS b
        FROM bands x JOIN bands y USING (band, key)
        WHERE x.id < y.id
    ),
    scored AS (
        SELECT cand.a, cand.b,
               round(list_cosine_similarity(
                   ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)
                   AS cosine
        FROM cand
        JOIN embeddings ea ON ea.vec_id = cand.a
        JOIN embeddings eb ON eb.vec_id = cand.b
    )
    SELECT a, b, cosine FROM scored WHERE cosine >= 0.3
"""


# media_features gold: the fixture is fully seeded (gen_media_pdf(60,
# seed=9)) and the numpy PPM/WAV decode + feature kernel deterministic,
# so — like taxonomy_blobs — the oracle is the literal expected table
# (sf-independent: the query reads no sf tables). Any decode/feature
# regression hash-mismatches here. Regenerate by running the query.
_MEDIA_GOLD_SQL = """
    SELECT media_id, kind, n_bytes,
           f0::DOUBLE AS f0, f2::DOUBLE AS f2
    FROM (VALUES (0, 'image', 15133, 0.32787, 0.46702),
                (1, 'audio', 161804, 0.32725, 0.50801),
                (3, 'image', 3277, 0.32431, 0.49672),
                (4, 'audio', 447436, 0.31273, 0.48091),
                (6, 'image', 1153, 0.30154, 0.29784),
                (7, 'audio', 20428, 0.51819, 0.76037),
                (9, 'image', 15232, 0.42034, 0.32401),
                (10, 'audio', 132812, 0.42375, 0.63118),
                (12, 'image', 12067, 0.28617, 0.34494),
                (13, 'audio', 827308, 0.36888, 0.56575),
                (15, 'image', 8377, 0.33176, 0.25552),
                (16, 'audio', 45532, 0.19341, 0.30775),
                (18, 'image', 24853, 0.26583, 0.30477),
                (19, 'audio', 501196, 0.2674, 0.41539),
                (21, 'image', 1039, 0.44177, 0.32499),
                (22, 'audio', 923148, 0.29705, 0.45976),
                (24, 'image', 2653, 0.35314, 0.30566),
                (25, 'audio', 172556, 0.38747, 0.58629),
                (27, 'image', 8275, 0.41314, 0.44947),
                (28, 'audio', 785324, 0.41172, 0.62136),
                (30, 'image', 4567, 0.27712, 0.40927),
                (31, 'audio', 8204, 0.16918, 0.26688),
                (33, 'image', 21640, 0.30937, 0.28779),
                (34, 'audio', 918972, 0.20508, 0.33226),
                (36, 'image', 5338, 0.34705, 0.48273),
                (37, 'audio', 242284, 0.46363, 0.69243),
                (39, 'image', 2842, 0.41842, 0.2637),
                (40, 'audio', 309884, 0.23415, 0.37532),
                (42, 'image', 2848, 0.39206, 0.3897),
                (43, 'audio', 371484, 0.30111, 0.4637),
                (45, 'image', 7438, 0.44646, 0.32898),
                (46, 'audio', 276668, 0.37019, 0.55919),
                (48, 'image', 8203, 0.27112, 0.47272),
                (49, 'audio', 547532, 0.19123, 0.30906),
                (51, 'image', 8308, 0.36312, 0.45237),
                (52, 'audio', 560652, 0.27086, 0.42128),
                (54, 'image', 4222, 0.32085, 0.39496),
                (55, 'audio', 800844, 0.23821, 0.37303),
                (57, 'image', 4513, 0.44429, 0.31558),
                (58, 'audio', 378268, 0.29229, 0.45134))
        AS t(media_id, kind, n_bytes, f0, f2)
"""


def _md5int_centroid_values(n_cells: int, seed: int) -> str:
    """``(cell, pos, w)`` VALUES rows for the md5int centroid oracles:
    read the gate parquet directly (outside Spark), sort by the hashlib
    md5 rank (bit-identical to the Spark-side ``md5_rank_expr``), run the
    SAME numpy ``_lloyd``, quantize to ``round(c·2²⁰)`` ints."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from sparktax.simsearch import _lloyd

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    rows.sort(
        key=lambda r: (
            int(hashlib.md5(f"{r[0]}:{seed}".encode()).hexdigest()[:15], 16),
            r[0],
        )
    )
    X = np.array([r[1] for r in rows[:4096]], dtype=float)
    C = _lloyd(X, n_cells, 10, seed)
    Cq = np.round(C * (1 << 20)).astype(np.int64)
    return ", ".join(
        f"({i}, {j}, {int(Cq[i, j])})"
        for i in range(Cq.shape[0])
        for j in range(Cq.shape[1])
    )


def _semantic_dedup_sql(
    threshold: float = 0.2, n_cells: int = 8, seed: int = 42
) -> str:
    """DuckDB replica of md5int SemDeDup: same quantized cell assignment
    as the IVF oracle (rk=1 cell per vector), within-cell pairs a<b scored
    by the 6dp-rounded cosine, b dropped when any smaller-id same-cell
    vector scores ≥ threshold — kept (vec_id, cell) bit-identical."""
    w_values = _md5int_centroid_values(n_cells, seed)
    return f"""
        WITH w(cell, pos, w) AS (VALUES {w_values}),
        qv AS (
            SELECT vec_id AS id, i - 1 AS pos,
                   round(embedding[i]::DOUBLE * 1048576)::BIGINT AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        ),
        dots AS (
            SELECT id, cell, sum(q * w) AS s
            FROM qv JOIN w USING (pos) GROUP BY 1, 2
        ),
        ranked AS (
            SELECT id, cell,
                   row_number() OVER (PARTITION BY id
                       ORDER BY s DESC, cell DESC) AS rk
            FROM dots
        ),
        cells AS (SELECT id, cell FROM ranked WHERE rk = 1),
        pairs AS (
            SELECT x.id AS a, y.id AS b
            FROM cells x JOIN cells y USING (cell)
            WHERE x.id < y.id
        ),
        scored AS (
            SELECT pairs.a, pairs.b,
                   round(list_cosine_similarity(
                       ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)
                       AS score
            FROM pairs
            JOIN embeddings ea ON ea.vec_id = pairs.a
            JOIN embeddings eb ON eb.vec_id = pairs.b
        ),
        dropped AS (SELECT DISTINCT b FROM scored WHERE score >= {threshold})
        SELECT id AS vec_id, cell FROM cells
        WHERE id NOT IN (SELECT b FROM dropped)
    """


def _ivf_sql(
    k: int = 4, n_cells: int = 16, n_probe: int = 4, seed: int = 42
) -> str:
    """DuckDB replica of the md5int IVF probe. The centroids are
    recomputed HERE, outside Spark: read the gate's parquet directly, sort
    by the hashlib md5 rank (bit-identical to the Spark-side
    ``md5_rank_expr``), run the SAME numpy ``_lloyd``, quantize to
    ``round(c·2²⁰)`` ints, and embed them as literal VALUES. Assignment is
    then all-integer in both engines; rerank is the proven rounded-cosine
    pattern. The gate runs at sf0.01 (driver contract);
    ``SPARK_GRAFT_ORACLE_SF_DIR`` overrides for local checks at other
    scales."""
    w_values = _md5int_centroid_values(n_cells, seed)
    return f"""
        WITH w(cell, pos, w) AS (VALUES {w_values}),
        qv AS (
            SELECT vec_id AS id, i - 1 AS pos,
                   round(embedding[i]::DOUBLE * 1048576)::BIGINT AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        ),
        dots AS (
            SELECT id, cell, sum(q * w) AS s
            FROM qv JOIN w USING (pos) GROUP BY 1, 2
        ),
        ranked AS (
            SELECT id, cell,
                   row_number() OVER (PARTITION BY id
                       ORDER BY s DESC, cell DESC) AS rk
            FROM dots
        ),
        corpus_cells AS (SELECT id AS neighbor_id, cell FROM ranked
                         WHERE rk = 1),
        q5 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
        probe AS (
            SELECT id AS query_id, cell FROM ranked
            WHERE rk <= {n_probe} AND id IN (SELECT vec_id FROM q5)
        ),
        cand AS (
            SELECT DISTINCT p.query_id, c.neighbor_id
            FROM probe p JOIN corpus_cells c USING (cell)
            WHERE p.query_id <> c.neighbor_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   round(list_cosine_similarity(
                       qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]), 6)
                       AS score
            FROM cand
            JOIN embeddings qe ON qe.vec_id = cand.query_id
            JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def _pq_codebook_values(
    m_sub: int = 8, n_codes: int = 16, seed: int = 42
) -> tuple[str, int]:
    """Codebooks for the PQ oracles, recomputed OUTSIDE Spark: read the
    gate parquet, sort by the hashlib md5 rank (bit-identical to the
    Spark ``md5_rank_expr`` sample order), run the SAME numpy L2 Lloyd
    per subspace (seed+m), quantize to ``round(c·2²⁰)`` ints, and emit
    them as a VALUES list ``(sub, subpos, code, cw)``. Returns the
    VALUES string and sub_dim."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from sparktax.pq import _lloyd_l2

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    rows.sort(
        key=lambda r: (
            int(hashlib.md5(f"{r[0]}:{seed}".encode()).hexdigest()[:15], 16),
            r[0],
        )
    )
    X = np.array([r[1] for r in rows[:4096]], dtype=float)
    sub_dim = X.shape[1] // m_sub
    cb = np.stack(
        [
            _lloyd_l2(X[:, m * sub_dim : (m + 1) * sub_dim], n_codes, 10, seed + m)
            for m in range(m_sub)
        ]
    )
    Cq = np.round(cb * (1 << 20)).astype(np.int64)
    values = ", ".join(
        f"({m}, {p}, {c}, {int(Cq[m, c, p])})"
        for m in range(m_sub)
        for c in range(n_codes)
        for p in range(sub_dim)
    )
    return values, sub_dim


def _pq_common_ctes(cb_values: str, sub_dim: int) -> str:
    """The CTE block shared by both PQ oracles: quantized vector
    elements keyed by (sub, subpos), integer encode distances → codes,
    the 5-query set, and the integer ADC lookup table."""
    return f"""
        cb(sub, subpos, code, cw) AS (VALUES {cb_values}),
        pqv AS (
            SELECT vec_id AS id, ((i - 1) // {sub_dim}) AS sub,
                   ((i - 1) % {sub_dim}) AS subpos,
                   round(embedding[i]::DOUBLE * 1048576)::BIGINT AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        ),
        dist AS (
            SELECT id, sub, code, sum((q - cw) * (q - cw)) AS d
            FROM pqv JOIN cb USING (sub, subpos) GROUP BY 1, 2, 3
        ),
        codes AS (
            SELECT id, sub, code FROM (
                SELECT id, sub, code,
                       row_number() OVER (PARTITION BY id, sub
                           ORDER BY d ASC, code ASC) AS rk
                FROM dist
            ) WHERE rk = 1
        ),
        q5 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5),
        lut AS (
            SELECT pqv.id AS query_id, cb.sub, cb.code,
                   sum(pqv.q * cb.cw) AS w
            FROM pqv JOIN cb USING (sub, subpos)
            WHERE pqv.id IN (SELECT vec_id FROM q5)
            GROUP BY 1, 2, 3
        )
    """


def _pq_sql(k: int = 4, m_sub: int = 8, n_codes: int = 16, seed: int = 42) -> str:
    """DuckDB replica of the md5int ADC full scan (sparktax/pq.py:
    pq_topk): integer codes + integer LUT sums ⇒ scores and ranks are
    bit-identical."""
    cb_values, sub_dim = _pq_codebook_values(m_sub, n_codes, seed)
    return f"""
        WITH {_pq_common_ctes(cb_values, sub_dim)},
        scored AS (
            SELECT l.query_id, c.id AS neighbor_id, sum(l.w) AS score
            FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
            WHERE c.id <> l.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def _ivfpq_sql(
    k: int = 4,
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    n_codes: int = 16,
    rerank: int = 16,
    seed: int = 42,
) -> str:
    """DuckDB replica of the md5int IVF+PQ funnel (sparktax/pq.py:
    ivfpq_topk): the _ivf_sql coarse-cell machinery (md5-rank-trained
    centroids, integer assignment) prunes candidates, integer ADC ranks
    a shortlist of ``rerank``, and the 6dp-rounded cosine reranks —
    every stage deterministic in both engines."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from sparktax.simsearch import _lloyd

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    rows.sort(
        key=lambda r: (
            int(hashlib.md5(f"{r[0]}:{seed}".encode()).hexdigest()[:15], 16),
            r[0],
        )
    )
    X = np.array([r[1] for r in rows[:4096]], dtype=float)
    C = _lloyd(X, n_cells, 10, seed)
    Cq = np.round(C * (1 << 20)).astype(np.int64)
    w_values = ", ".join(
        f"({i}, {j}, {int(Cq[i, j])})"
        for i in range(Cq.shape[0])
        for j in range(Cq.shape[1])
    )
    cb_values, sub_dim = _pq_codebook_values(m_sub, n_codes, seed)
    return f"""
        WITH w(cell, pos, w) AS (VALUES {w_values}),
        qv AS (
            SELECT vec_id AS id, i - 1 AS pos,
                   round(embedding[i]::DOUBLE * 1048576)::BIGINT AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
        ),
        dots AS (
            SELECT id, cell, sum(q * w) AS s
            FROM qv JOIN w USING (pos) GROUP BY 1, 2
        ),
        ranked AS (
            SELECT id, cell,
                   row_number() OVER (PARTITION BY id
                       ORDER BY s DESC, cell DESC) AS rk
            FROM dots
        ),
        corpus_cells AS (SELECT id AS neighbor_id, cell FROM ranked
                         WHERE rk = 1),
        {_pq_common_ctes(cb_values, sub_dim)},
        probe AS (
            SELECT id AS query_id, cell FROM ranked
            WHERE rk <= {n_probe} AND id IN (SELECT vec_id FROM q5)
        ),
        cand AS (
            SELECT DISTINCT p.query_id, c.neighbor_id
            FROM probe p JOIN corpus_cells c USING (cell)
            WHERE p.query_id <> c.neighbor_id
        ),
        adc AS (
            SELECT cand.query_id, cand.neighbor_id, sum(l.w) AS s
            FROM cand
            JOIN codes c ON c.id = cand.neighbor_id
            JOIN lut l ON l.query_id = cand.query_id
                      AND l.sub = c.sub AND l.code = c.code
            GROUP BY 1, 2
        ),
        short AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY s DESC, neighbor_id) AS ark
                FROM adc
            ) WHERE ark <= {rerank}
        ),
        rescored AS (
            SELECT s.query_id, s.neighbor_id,
                   round(list_cosine_similarity(
                       qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]), 6)
                       AS score
            FROM short s
            JOIN embeddings qe ON qe.vec_id = s.query_id
            JOIN embeddings ce ON ce.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS rank
        FROM rescored
        QUALIFY rank <= {k}
    """


def _simhash_sql() -> str:
    """DuckDB replica of sparktax.textops.simhash: md5-prefix token hashes
    (hex parsed via the strpos('123456789abcdef', …) trick — '0' maps to 0
    because strpos returns 0 on miss), 64 per-bit majority sums, bit 63
    packed through a −2⁶³ offset so nothing overflows a signed BIGINT."""

    def hex8(col: str, off: int) -> str:
        return " + ".join(
            f"strpos('123456789abcdef', substr({col},{off + j},1))::BIGINT"
            f" * {16 ** (7 - j)}"
            for j in range(8)
        )

    votes = ", ".join(
        f"sum(({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) AS v{i}"
        for i in range(64)
    )
    pack = " + ".join(
        ["(CASE WHEN v63*2 > n THEN -9223372036854775807 - 1 ELSE 0 END)"]
        + [f"(CASE WHEN v{i}*2 > n THEN {1 << i} ELSE 0 END)" for i in range(63)]
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS tok
            FROM documents
        ),
        b AS (
            SELECT doc_id, ({hex8("md5(tok)", 1)}) AS hi,
                   ({hex8("md5(tok)", 9)}) AS lo
            FROM toks
        ),
        v AS (SELECT doc_id, count(*) AS n, {votes} FROM b GROUP BY doc_id),
        s AS (SELECT doc_id, ({pack})::BIGINT AS simhash FROM v)
        SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
        FROM documents d LEFT JOIN s USING (doc_id)
    """


def _minhash_sql(
    threshold: float = 0.5, n: int = 3, k: int = 64, bands: int = 16,
    seed: int = 42, max_id: int = 500,
) -> str:
    """DuckDB replica of sparktax.textops.minhash_near_duplicates with
    ``hasher="md5"``: base hash = first 15 hex chars of md5(shingle) as a
    60-bit integer (strpos hex trick) mod p; k permutation mins in one
    GROUP BY; band buckets are the comma-joined signature slices; exact
    Jaccard verify on the blocked candidates. Every stage is plain
    arithmetic, so the pair set and scores match Spark bit-for-bit."""
    from sparktax.link.minhash import _hash_params

    p = (1 << 31) - 1
    hex15 = " + ".join(
        f"strpos('123456789abcdef', substr(md5(shingle),{j + 1},1))::BIGINT"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    mins = ", ".join(
        f"min((x * {a} + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(_hash_params(k, seed))
    )
    r = k // bands
    band_rows = " UNION ALL ".join(
        f"SELECT id, {i} AS band, concat_ws(',', "
        + ", ".join(f"h{i * r + j}" for j in range(r))
        + ") AS bucket FROM sig"
        for i in range(bands)
    )
    return f"""
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
                   WHERE doc_id < {max_id}),
        sh AS (
            SELECT DISTINCT doc_id AS id, substr(t, i, {n}) AS shingle
            FROM d, LATERAL (SELECT unnest(range(1,
                 greatest(length(t) - {n - 1}, 1) + 1)) AS i)
            WHERE length(substr(t, i, {n})) > 0
        ),
        hx AS (SELECT id, shingle, ({hex15}) % {p} AS x FROM sh),
        sig AS (SELECT id, {mins} FROM hx GROUP BY id),
        buckets AS ({band_rows}),
        cand AS (
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM buckets x JOIN buckets y USING (band, bucket)
            WHERE x.id < y.id
        ),
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT c.a, c.b, count(*) AS ni
            FROM cand c
            JOIN sh sx ON sx.id = c.a
            JOIN sh sy ON sy.id = c.b AND sy.shingle = sx.shingle
            GROUP BY 1, 2
        )
        SELECT c.a, c.b,
               round(coalesce(ni, 0) / (sa.n + sb.n - coalesce(ni, 0)), 6)
                   AS jaccard
        FROM cand c
        LEFT JOIN inter USING (a, b)
        JOIN sizes sa ON sa.id = c.a
        JOIN sizes sb ON sb.id = c.b
        WHERE coalesce(ni, 0) / (sa.n + sb.n - coalesce(ni, 0)) >= {threshold}
    """


def _lang_sql() -> str:
    from sparktax.textops import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    toks = f"string_split({_NORM.format(c='text')}, ' ')"
    scores = ", ".join(
        f"len(list_intersect({toks}, {LANG_MARKERS[lang]!r})) AS {lang}"
        for lang in langs
    )
    best = f"greatest({', '.join(langs)})"
    case = " ".join(f"WHEN {lang} = best THEN '{lang}'" for lang in langs)
    return f"""
        WITH scored AS (SELECT doc_id, {scores} FROM documents),
        b AS (SELECT *, {best} AS best FROM scored)
        SELECT doc_id,
               CASE WHEN best <= 0 THEN 'und' {case} END AS lang_pred,
               best::INT AS lang_hits
        FROM b
    """


def _redact_pii_sql() -> str:
    """DuckDB twin of q_redact_pii: the same doc_id-derived PII
    augmentation, then the same ordered regexp chain (patterns imported
    from textops.PII_PATTERNS, so engine and oracle can never drift) with
    each count taken on the text AFTER the earlier patterns ran."""
    from sparktax.textops import PII_PATTERNS

    aug = """
        SELECT doc_id,
               coalesce(text, '')
               || ' contact user' || doc_id::VARCHAR
               || '@mail.example.com ph 555-'
               || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
               || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               || ' ssn ' || lpad((doc_id % 900)::VARCHAR, 3, '0') || '-'
               || lpad((doc_id % 90)::VARCHAR, 2, '0') || '-'
               || lpad((doc_id % 9000)::VARCHAR, 4, '0')
               || ' ip 10.' || (doc_id % 256)::VARCHAR || '.0.'
               || ((doc_id * 7) % 256)::VARCHAR AS t0
        FROM documents
    """
    ctes, prev = [f"s0 AS ({aug})"], "t0"
    carried: list[str] = []
    for i, (kind, pat) in enumerate(PII_PATTERNS, start=1):
        keep = ", ".join(["doc_id"] + carried)
        ctes.append(
            f"""s{i} AS (
                SELECT {keep},
                       len(regexp_extract_all({prev}, '{pat}'))::BIGINT
                           AS n_{kind},
                       regexp_replace({prev}, '{pat}', '<{kind.upper()}>',
                                      'g') AS t{i}
                FROM s{i - 1}
            )"""
        )
        carried.append(f"n_{kind}")
        prev = f"t{i}"
    counts = ", ".join(carried)
    return f"""
        WITH {', '.join(ctes)}
        SELECT doc_id, {prev} AS text, {counts} FROM s{len(PII_PATTERNS)}
    """


def oracle_sql() -> dict[str, str]:
    from sparktax.textops import LANG_MARKERS

    all_stop = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    norm = _NORM.format(c="text")
    return {
        "extract_triples": """
            SELECT CAST(l_orderkey AS VARCHAR) AS conv_id,
                   l_linenumber AS turn_idx,
                   'S' || l_suppkey AS subj,
                   'supplies_part' AS pred,
                   'P' || l_partkey AS obj
            FROM lineitem
        """,
        "extract_contextual": """
            WITH turns AS (
                SELECT *, row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_suppkey, l_partkey)
                           AS turn
                FROM lineitem
            ),
            stmts AS (
                SELECT CAST(l_orderkey AS VARCHAR) AS conv_id,
                       turn AS turn_idx,
                       CASE WHEN turn % 3 = 0 THEN NULL
                            ELSE 'S' || l_suppkey END AS subj_raw,
                       'supplies_part' AS pred,
                       'P' || l_partkey AS obj
                FROM turns
            ),
            resolved AS (
                SELECT conv_id, turn_idx, pred, obj,
                       last_value(subj_raw IGNORE NULLS) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS subj
                FROM stmts
            )
            SELECT conv_id, turn_idx, subj, pred, obj
            FROM resolved WHERE subj IS NOT NULL
        """,
        "kg_class_sizes": f"""
            WITH triples AS ({_KG_SQL})
            SELECT t AS class_node, count(*) AS n_instances
            FROM triples WHERE r = 0 GROUP BY t
        """,
        "kg_pattern_lookup": f"""
            WITH triples AS ({_KG_SQL})
            SELECT h, r, t FROM triples WHERE r = 0 AND t = {N_OFF + 7}
        """,
        "kg_existential": f"""
            SELECT DISTINCT o_orderkey + 10000000 AS order_node
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_nationkey = 3
        """,
        "kg_neighborhood": f"""
            WITH triples AS ({_KG_SQL})
            SELECT 'out' AS direction, r, t AS neighbor
            FROM triples WHERE h = {N_OFF + 3}
            UNION ALL
            SELECT 'in', r, h FROM triples WHERE t = {N_OFF + 3}
        """,
        "components": f"""
            WITH nodes AS (
                SELECT c_custkey + {C_OFF} AS node,
                       c_nationkey AS nk FROM customer
                UNION ALL
                SELECT n_nationkey + {N_OFF}, n_nationkey FROM nation
                UNION ALL
                SELECT r_regionkey + {R_OFF}, n_nationkey
                FROM region JOIN nation ON n_regionkey = r_regionkey
            ),
            comp AS (
                SELECT n_nationkey AS nk,
                       min(c_custkey + {C_OFF}) OVER (PARTITION BY n_regionkey)
                       AS component
                FROM nation JOIN customer ON c_nationkey = n_nationkey
                QUALIFY row_number() OVER (PARTITION BY n_nationkey
                                           ORDER BY c_custkey) = 1
            )
            SELECT DISTINCT nodes.node, comp.component
            FROM nodes JOIN comp ON nodes.nk = comp.nk
        """,
        "link_mentions": """
            SELECT m.mention_id, c.entity_id, round(c.prior, 2) AS prior
            FROM (SELECT s_suppkey AS mention_id,
                         trim(regexp_replace(regexp_replace(lower(upper(s_name)),
                              '[_\\-\\s]+', ' ', 'g'), '[^\\w ]', '', 'g'))
                         AS key FROM supplier) m
            JOIN (SELECT trim(regexp_replace(regexp_replace(lower(s_name),
                              '[_\\-\\s]+', ' ', 'g'), '[^\\w ]', '', 'g'))
                         AS key,
                         s_suppkey AS entity_id, s_acctbal AS prior
                  FROM supplier) c
            ON m.key = c.key
            QUALIFY row_number() OVER (PARTITION BY m.mention_id
                                       ORDER BY c.prior DESC, c.entity_id) = 1
        """,
        "dedup_fingerprint": f"""
            SELECT doc_id, md5({norm}) AS fp FROM documents
        """,
        "dedup_groups": f"""
            SELECT md5({norm}) AS fp,
                   min(doc_id) AS canonical_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        # batch-by-batch incremental exact dedup ≡ whole-corpus min-id per
        # fingerprint when batches are id-ordered (the index anti-join
        # only ever removes what the global window would)
        "dedup_incremental": f"""
            SELECT doc_id, fp FROM (
                SELECT doc_id, md5({norm}) AS fp,
                       row_number() OVER (PARTITION BY md5({norm})
                                          ORDER BY doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        """,
        "ngram_jaccard": """
            WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
                       WHERE doc_id < 200),
            sh AS (
                SELECT DISTINCT doc_id AS id, substr(t, i, 3) AS shingle
                FROM d, LATERAL (SELECT unnest(range(1,
                     greatest(length(t) - 2, 1) + 1)) AS i)
                WHERE length(substr(t, i, 3)) > 0
            ),
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            inter AS (
                SELECT x.id AS a, y.id AS b, count(*) AS ni
                FROM sh x JOIN sh y USING (shingle)
                WHERE x.id < y.id GROUP BY 1, 2
            )
            SELECT a, b,
                   round(ni / (sa.n + sb.n - ni), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = a
            JOIN sizes sb ON sb.id = b
            WHERE ni / (sa.n + sb.n - ni) >= 0.5
        """,
        "winnow_fingerprints": f"""
            WITH d AS (
                SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
                WHERE doc_id < 100
            ),
            g AS (
                SELECT doc_id, i, substr(t, i, 5) AS gram
                FROM d, LATERAL (SELECT unnest(range(1,
                     greatest(length(t) - 4, 0) + 1)) AS i)
                WHERE length(t) >= 5
            ),
            h AS (
                SELECT doc_id, i,
                       ({" + ".join(f"strpos('123456789abcdef', substr(md5(gram),{1 + j},1))::BIGINT * {16 ** (7 - j)}" for j in range(8))})
                           AS hv
                FROM g
            ),
            win AS (
                SELECT doc_id, i,
                       min(hv) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m
                FROM h
            )
            SELECT DISTINCT doc_id, m AS fp FROM win WHERE i >= 4
        """,
        "dedup_spans": _dedup_spans_sql(),
        "decontaminate": f"""
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split({norm}, ' '), x -> x <> '')
                           AS toks
                FROM documents
            ),
            dg AS (
                SELECT DISTINCT doc_id,
                       array_to_string(toks[i : i + 4], ' ') AS shingle
                FROM d, LATERAL (SELECT unnest(range(1,
                     greatest(len(toks) - 4, 1) + 1)) AS i)
                WHERE len(toks[i : i + 4]) >= 5
            ),
            p AS (
                SELECT doc_id AS probe_id,
                       substring(text, 1, 120) AS text
                FROM documents WHERE doc_id % 100 = 7
            ),
            pt AS (
                SELECT probe_id,
                       list_filter(string_split({norm}, ' '), x -> x <> '')
                           AS toks
                FROM p
            ),
            pg AS (
                SELECT DISTINCT probe_id,
                       array_to_string(toks[i : i + 4], ' ') AS shingle
                FROM pt, LATERAL (SELECT unnest(range(1,
                     greatest(len(toks) - 4, 1) + 1)) AS i)
                WHERE len(toks[i : i + 4]) >= 5
            )
            SELECT dg.doc_id, pg.probe_id, count(*) AS n_matches
            FROM dg JOIN pg USING (shingle)
            GROUP BY 1, 2
        """,
        "language_id": _lang_sql(),
        "redact_pii": _redact_pii_sql(),
        "pack_sequences": """
            WITH n AS (
                SELECT doc_id,
                       len(list_filter(regexp_split_to_array(
                           coalesce(text, ''), '\\s+'), x -> x <> ''))::BIGINT
                           AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tokens AS s
                FROM n
            )
            SELECT doc_id, n_tokens,
                   (s // 256)::BIGINT AS seq_id,
                   (s % 256)::BIGINT AS seq_offset,
                   (CASE WHEN n_tokens > 0 THEN (s + n_tokens - 1) // 256
                         ELSE s // 256 END)::BIGINT AS end_seq_id
            FROM c
        """,
        "chunk_documents": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(coalesce(text, ''),
                           '\\s+'), x -> x <> '') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS cs
                FROM t WHERE len(toks) > 0
            )
            SELECT doc_id,
                   (cs // 24)::BIGINT AS chunk_idx,
                   cs::BIGINT AS chunk_start,
                   len(toks[cs + 1 : cs + 32])::BIGINT AS n_chunk_tokens,
                   array_to_string(toks[cs + 1 : cs + 32], ' ') AS chunk_text
            FROM s
        """,
        "mix_corpora": _mix_corpora_sql(),
        "training_order": _training_order_sql(),
        "split_corpus": _split_corpus_sql(),
        "token_counts": f"""
            SELECT doc_id,
                   len(list_filter(string_split(coalesce(text, ''),
                       ' '), x -> x <> '' AND x <> chr(9)))::BIGINT AS ws_tokens,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT
                       AS bpe_ish_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH b AS (
                SELECT doc_id,
                       coalesce(text, '') AS txt,
                       list_filter(string_split({norm}, ' '), x -> x <> '')
                           AS toks
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                       length(txt) AS n_chars,
                       len(toks) AS n_tokens,
                       length(txt) - length(regexp_replace(txt,
                           '[^\\w\\s]', '', 'g')) AS punct,
                       len(list_filter(toks,
                           x -> list_contains({all_stop!r}, x))) AS stop_hits
                FROM b
            )
            SELECT doc_id, n_chars::BIGINT AS n_chars,
                   n_tokens::BIGINT AS n_tokens,
                   round(CASE WHEN n_chars > 0
                         THEN punct / n_chars ELSE 0 END, 6) AS punct_ratio,
                   round(CASE WHEN n_tokens > 0
                         THEN stop_hits / n_tokens ELSE 0 END, 6)
                         AS stopword_ratio,
                   round(least(n_tokens / 20.0, 1.0) * 0.4
                         + (1.0 - least(CASE WHEN n_chars > 0
                              THEN punct / n_chars ELSE 0 END * 4, 1.0)) * 0.3
                         + least(CASE WHEN n_tokens > 0
                              THEN stop_hits / n_tokens ELSE 0 END * 5,
                              1.0) * 0.3, 6) AS quality
            FROM m
        """,
        # Gopher repetition filters: token positions via the LATERAL
        # range-unnest idiom; bigrams via the same lead() window as Spark
        "repetition": """
            WITH base AS (
                SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
            ),
            lists AS (
                SELECT doc_id,
                       list_filter(string_split_regex(t, '\\s+'),
                                   x -> x <> '') AS l
                FROM base
            ),
            tok AS (
                SELECT doc_id, i, l[i] AS tok
                FROM lists, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i)
            ),
            tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
            ts AS (
                SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                       round(max(c)::DOUBLE / sum(c), 6) AS top_token_frac
                FROM tc GROUP BY doc_id
            ),
            big AS (
                SELECT doc_id, tok,
                       lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
                FROM tok
            ),
            bc AS (
                SELECT doc_id, tok, nxt, count(*) AS c FROM big
                WHERE nxt IS NOT NULL GROUP BY 1, 2, 3
            ),
            bs AS (
                SELECT doc_id,
                       round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
                FROM bc GROUP BY doc_id
            ),
            sents AS (
                SELECT doc_id,
                       list_filter(list_transform(
                           string_split_regex(t, '[.!?]'), s -> trim(s)),
                           s -> s <> '') AS sl
                FROM base
            )
            SELECT b.doc_id,
                   coalesce(n_tokens, 0) AS n_tokens,
                   coalesce(top_token_frac, 0.0) AS top_token_frac,
                   coalesce(top_bigram_frac, 0.0) AS top_bigram_frac,
                   CASE WHEN len(sl) > 0
                        THEN round(1.0 - len(list_distinct(sl))::DOUBLE
                                   / len(sl), 6)
                        ELSE 0.0 END AS dup_sentence_frac
            FROM base b
            JOIN sents USING (doc_id)
            LEFT JOIN ts USING (doc_id)
            LEFT JOIN bs USING (doc_id)
        """,
        "cosine_topk": _COSINE_TOPK_SQL,
        # ivf_topk at n_probe == n_cells probes every cell → candidate set
        # is the full corpus, so the result must equal brute force exactly:
        # same oracle as cosine_topk.
        "ivf_full_probe": _COSINE_TOPK_SQL,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                       FROM embeddings WHERE vec_id < 150)
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.emb, y.emb), 6) AS cosine
            FROM e x JOIN e y ON x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.emb, y.emb), 6) >= 0.3
        """,
        "agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "topk_window": """
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
            QUALIFY rk <= 3
        """,
        "join_dims": """
            SELECT c_custkey, c_name, n_name AS nation, r_name AS region
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_acctbal > 9000
        """,
        "set_ops": """
            SELECT DISTINCT c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
              AND c_custkey NOT IN
                  (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """,
        "bucketed_agg": """
            SELECT event_type, floor(value / 50)::BIGINT AS bucket,
                   count(*) AS n, round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1, 2
        """,
        "events_lag": """
            SELECT user_id, event_id,
                   round(epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)) / 1000000.0, 6) AS gap_s
            FROM events
        """,
        "asof_join": """
            WITH r AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'click'
                QUALIFY row_number() OVER (PARTITION BY user_id, ts
                    ORDER BY event_id DESC) = 1
            ),
            l AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'
            )
            SELECT l.event_id, l.user_id,
                   r.event_id AS click_event_id,
                   round(r.value, 6) AS click_value,
                   round(epoch_us(l.ts - r.ts) / 1000000.0, 6) AS gap_s
            FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "substring_search": """
            SELECT p_partkey, p_name FROM part
            WHERE lower(p_name) LIKE '%red%'
            ORDER BY p_partkey LIMIT 100
        """,
        "safe_divide": """
            WITH a AS (
                SELECT c_nationkey,
                       count(CASE WHEN c_acctbal > 0 THEN 1 END) AS pos,
                       count(CASE WHEN c_acctbal > 5000 THEN 1 END) AS rich
                FROM customer GROUP BY 1
            )
            SELECT c_nationkey,
                   round(CASE WHEN pos = 0 THEN 0.0
                         ELSE rich::DOUBLE / pos END, 6) AS rich_ratio
            FROM a
        """,
        "uri_shorten": """
            SELECT n_nationkey,
                   'dbr:' || replace(n_name, ' ', '_') AS short_uri,
                   '<LABEL:en>' AS label_norm,
                   'xsd:integer' AS typed_norm
            FROM nation
        """,
        "openke_filtered_scan": """
            WITH s AS (SELECT s_suppkey AS k, s_nationkey AS nat
                       FROM supplier WHERE s_suppkey <> 1)
            SELECT (100 + k)::BIGINT AS h, 0::BIGINT AS r,
                   (1 + nat)::BIGINT AS t FROM s
            UNION ALL
            SELECT 100 + k, 0, 0 FROM s WHERE k % 7 = 0
            UNION ALL
            SELECT 100 + k, 2, 1 + nat FROM s
        """,
        "rank_matrix": """
            SELECT n_regionkey, n_nationkey, count(*) AS n_cust,
                   rank() OVER (PARTITION BY n_regionkey
                       ORDER BY count(*) DESC, n_nationkey) AS rnk
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_regionkey, n_nationkey
        """,
        "type_freq_topk": """
            WITH counts AS (
                SELECT c_mktsegment, c_nationkey, count(*) AS n
                FROM customer GROUP BY 1, 2
            ),
            sizes AS (
                SELECT c_mktsegment, count(*) AS total FROM customer GROUP BY 1
            )
            SELECT c_mktsegment, c_nationkey, n,
                   round(n / total, 6) AS freq,
                   row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY n DESC, c_nationkey) AS rk
            FROM counts JOIN sizes USING (c_mktsegment)
            QUALIFY rk <= 3
        """,
        "centroids": """
            WITH e AS (
                SELECT label, vec_id, embedding::DOUBLE[] AS emb
                FROM embeddings
            ),
            dims AS (
                SELECT label, vec_id,
                       unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM e
            ),
            cent AS (
                SELECT label, pos, avg(val) AS m FROM dims GROUP BY 1, 2
            ),
            d2 AS (
                SELECT dims.label, dims.vec_id,
                       sum((dims.val - cent.m) * (dims.val - cent.m)) AS dd
                FROM dims JOIN cent
                ON dims.label = cent.label AND dims.pos = cent.pos
                GROUP BY 1, 2
            ),
            norms AS (
                SELECT label, sqrt(sum(m * m)) AS centroid_norm
                FROM cent GROUP BY 1
            )
            SELECT d2.label,
                   round(any_value(norms.centroid_norm), 5) AS centroid_norm,
                   round(sqrt(avg(d2.dd)), 5) AS radius
            FROM d2 JOIN norms ON d2.label = norms.label
            GROUP BY d2.label
        """,
        "centroid_distances": """
            WITH e AS (
                SELECT label, embedding::DOUBLE[] AS emb FROM embeddings
            ),
            dims AS (
                SELECT label, unnest(emb) AS val,
                       generate_subscripts(emb, 1) AS pos
                FROM e
            ),
            cent AS (SELECT label, pos, avg(val) AS m FROM dims GROUP BY 1, 2)
            SELECT x.label AS a, y.label AS b,
                   round(sqrt(sum((x.m - y.m) * (x.m - y.m))), 5) AS geom
            FROM cent x JOIN cent y ON x.pos = y.pos AND x.label < y.label
            GROUP BY 1, 2
        """,
        "simhash": _simhash_sql(),
        "minhash_neardup": _minhash_sql(
            threshold=0.5, n=3, k=64, bands=16, seed=42, max_id=500
        ),
        # seeded sample: rank on the exact integer value of the first 15
        # hex chars of md5(h || ':7') — bit-identical to the Spark side's
        # conv(substr(md5(..),1,15),16,10) — with h as tiebreak. strpos on
        # '123456789abcdef' maps '0'→0 (miss) and '1'..'f'→1..15.
        "sample_deterministic": f"""
            WITH kg AS ({_KG_SQL}),
            pool AS (SELECT DISTINCT h FROM kg WHERE r = 0 AND t = {N_OFF + 1}),
            keyed AS (
                SELECT h,
                       ({" + ".join(
                           f"strpos('123456789abcdef', substr(md5(h::VARCHAR || ':7'),{j + 1},1))::BIGINT * {16 ** (14 - j)}"
                           for j in range(15)
                       )}) AS k
                FROM pool
            )
            SELECT h FROM keyed ORDER BY k, h LIMIT 50
        """,
        # the blob pipeline (HAC → F-matrix → Hungarian → contraction) is
        # seeded end to end and recovers the planted 2-level taxonomy
        # exactly (pytest-asserted); the oracle is the literal gold edge
        # set, so any extraction regression hash-mismatches here.
        "taxonomy_blobs": """
            SELECT * FROM (VALUES
                ('B','A'),('C','A'),('D','B'),('E','B'),('F','C'),('G','C')
            ) AS t(child, parent)
        """,
        # sign-LSH with md5int planes: signatures are all-integer and
        # bit-identical across engines, so blocking + rerank oracle fully
        "lsh_topk": _LSH_TOPK_SQL,
        "embedding_neardup_lsh": _NEARDUP_LSH_SQL,
        # media lane: binary payloads aren't SQL-expressible, but the
        # fixture is seeded and the decode deterministic → literal gold
        "media_features": _MEDIA_GOLD_SQL,
        # IVF in the reproducible mode: centroids recomputed outside Spark
        # from the md5-rank sample, integer assignment, rounded rerank.
        # Added last + guarded: the builder reads the gate parquet, and a
        # missing testdata dir must degrade ivf_topk to rows-only rather
        # than break every oracle in the dict.
        **_maybe_ivf_oracle(),
        **_maybe_bpe_oracle(),
    }


def _maybe_ivf_oracle() -> dict[str, str]:
    # Narrow catch (round-4 advice): only the expected missing-gate-data
    # failures degrade to rows-only; a genuine bug in _ivf_sql (duckdb
    # error, numpy error, typo) must surface, not be silently masked.
    try:
        import duckdb

        missing = (FileNotFoundError, OSError, duckdb.IOException)
    except ImportError:
        return {}
    try:
        sql = _ivf_sql()
        # the persisted-index probe is the SAME computation (same
        # centroids, same quantized assignment) over bucketed storage
        return {
            "ivf_topk": sql,
            "ivf_topk_indexed": sql,
            "pq_topk": _pq_sql(),
            "ivfpq_topk": _ivfpq_sql(),
            "semantic_dedup": _semantic_dedup_sql(),
            "dsir_weights": _dsir_sql(),
            "perplexity": _perplexity_sql(),
            "dsir_select": _dsir_select_sql(),
        }
    except missing as e:
        import sys

        print(f"ivf/pq oracles degraded to rows-only: {e!r}", file=sys.stderr)
        return {}
