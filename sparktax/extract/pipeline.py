"""Spark-side batched triple/mention extraction (the Arrow lane).

Two paths, chosen by whether cross-turn context is needed:

* :func:`extract_triples` — **stateless per-turn** extraction via
  ``mapInPandas``. No shuffle at all: a narrow map over the transcript scan,
  which is the 100 TB throughput path (extraction cost scales linearly with
  input bytes; parallelism = input splits). Column pruning: only
  (conv_id, turn_idx, text) are read from the scan.

* :func:`extract_triples_contextual` — **cross-turn** extraction (pronoun
  coreference) via salted ``applyInPandas`` groups. Turn order inside a
  conversation is stabilized by ``turn_idx`` (input_hint), and hot
  conversations are handled by AQE skew splitting at the shuffle plus an
  explicit size cap inside the kernel.

Both match :func:`sparktax.extract.rules.reference_extract_pdf` exactly
(per-turn text-equality invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparktax.extract.rules import PRONOUNS, STATEMENT_RE

_TRIPLE_OUT = "conv_id string, turn_idx int, subj string, pred string, obj string"
_MENTION_OUT = (
    "conv_id string, turn_idx int, surface string, kind string, "
    "span_start int, span_end int"
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized statement extraction over one Arrow batch.

    ``Series.str.extractall`` runs the compiled regex per batch in C —
    no per-row Python function calls.
    """
    hits = pdf["text"].str.extractall(STATEMENT_RE)
    if hits.empty:
        return pd.DataFrame(
            {
                "conv_id": pd.Series(dtype="object"),
                "turn_idx": pd.Series(dtype="int32"),
                "subj": pd.Series(dtype="object"),
                "pred": pd.Series(dtype="object"),
                "obj": pd.Series(dtype="object"),
            }
        )
    hits.columns = ["subj", "pred", "obj"]
    rows = hits.index.get_level_values(0)
    out = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].values[rows],
            "turn_idx": pdf["turn_idx"].values[rows].astype("int32"),
            "subj": hits["subj"].values,
            "pred": hits["pred"].values,
            "obj": hits["obj"].values,
        }
    )
    return out


def extract_triples(transcripts: DataFrame, keep_pronouns: bool = False) -> DataFrame:
    """Stateless per-turn (subj, pred, obj) extraction. Zero-shuffle.

    Pronoun-subject statements are dropped (they need cross-turn context;
    see :func:`extract_triples_contextual`).
    """
    cols = transcripts.select("conv_id", "turn_idx", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _extract_batch(pdf)
            if not keep_pronouns and len(out):
                out = out[~out["subj"].isin(PRONOUNS)]
            yield out

    return cols.mapInPandas(gen, schema=_TRIPLE_OUT)


def extract_triples_contextual(
    transcripts: DataFrame, salt_buckets: int = 0
) -> DataFrame:
    """Cross-turn extraction with pronoun coreference.

    Groups by ``conv_id`` (one shuffle), orders turns by ``turn_idx`` inside
    the kernel, and resolves He/She/It/They to the most recent explicit
    subject in the conversation. ``salt_buckets`` > 0 additionally splits
    each conversation into hash buckets *only for the shuffle layout*
    decision — conversations must stay whole for coref, so salting here
    means pre-repartitioning by (conv_id) with a higher partition count and
    letting AQE split skewed partitions; the kernel itself caps memory by
    processing turns in order without materializing per-turn state.
    """
    cols = transcripts.select("conv_id", "turn_idx", "text")
    if salt_buckets:
        cols = cols.repartition(salt_buckets, "conv_id")

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        out = _extract_batch(pdf)
        if out.empty:
            return out
        out = out.sort_values(["turn_idx"], kind="mergesort")
        is_pron = out["subj"].isin(PRONOUNS)
        # last explicit subject before each statement (textual order is
        # preserved inside a turn by extractall's match index)
        explicit = out["subj"].where(~is_pron).ffill()
        out["subj"] = explicit
        return out[explicit.notna()]

    return cols.groupBy("conv_id").applyInPandas(per_conv, schema=_TRIPLE_OUT)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """Mention detection: every subject/object occurrence with char spans.

    Zero-shuffle ``mapInPandas``; downstream entity linking joins these
    against a broadcast candidate dictionary.
    """
    cols = transcripts.select("conv_id", "turn_idx", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs: list[tuple] = []
            texts = pdf["text"].fillna("")
            convs = pdf["conv_id"].values
            turns = pdf["turn_idx"].values
            for i, text in enumerate(texts.values):
                for m in STATEMENT_RE.finditer(text):
                    recs.append(
                        (convs[i], int(turns[i]), m.group(1), "subj", m.start(1), m.end(1))
                    )
                    recs.append(
                        (convs[i], int(turns[i]), m.group(3), "obj", m.start(3), m.end(3))
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "conv_id",
                    "turn_idx",
                    "surface",
                    "kind",
                    "span_start",
                    "span_end",
                ],
            )

    return cols.mapInPandas(gen, schema=_MENTION_OUT)


def add_mention_ids(mentions: DataFrame) -> DataFrame:
    """Assign globally-unique mention ids without a global sort.

    ``monotonically_increasing_id`` is partition-local and stable per plan —
    fine as an opaque key (never used for ordering).
    """
    return mentions.withColumn("mention_id", F.monotonically_increasing_id())
