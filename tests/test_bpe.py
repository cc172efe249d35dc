"""BPE trainer/encoder vs an independent pure-python replica (no shared
code with sparktax/bpe.py): same corpus, same tie-break contract."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparktax import bpe

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "low lower lowest new newer newest"),
    (3, "the the the cat cat"),
    (4, "banana bandana and a band ananas"),
    (5, ""),
    (6, None),
]
N_MERGES = 25


def _replica_train(texts, n_merges):
    wc = Counter(
        w for t in texts if t for w in t.split() if w
    )
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in wc.items()}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((rank, a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _replica_encode(text, merges):
    out = []
    for w in (text or "").split():
        if not w:
            continue
        syms = list(w) + ["</w>"]
        # apply merges strictly in rank order (equivalent to the engine's
        # lowest-rank-first loop: later merges can never unlock earlier ones)
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
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def trained(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=N_MERGES)
    return docs, merges, merges.orderBy("rank").collect()


def test_train_matches_replica(spark, trained):
    _, _, got = trained
    want = _replica_train([t for _, t in ROWS], N_MERGES)
    assert [(r.rank, r.left, r.right) for r in got] == want


def test_encode_matches_replica(spark, trained):
    docs, merges, rows = trained
    got = (
        bpe.encode_bpe(docs, merges)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    replica_merges = [(r.rank, r.left, r.right) for r in rows]
    for doc_id, text in ROWS:
        want = _replica_encode(text, replica_merges)
        assert got.loc[doc_id].n_bpe_tokens == len(want)
        assert got.loc[doc_id].bpe_text == " ".join(want)


def test_min_count_early_stop(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef"), (1, "gh ij kl")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, n_merges=50)  # every pair unique → none
    assert merges.count() == 0
    enc = bpe.encode_bpe(docs, merges).orderBy("doc_id").toPandas()
    # with no merges every doc is raw chars + </w> per word
    assert enc.n_bpe_tokens[0] == 9  # 3 words x (2 chars + </w>)
    assert enc.bpe_text[0].startswith("a b </w>")


def test_encode_word_roundtrip_property():
    """Property (hypothesis): for ANY word and ANY merge table, the
    encoded symbols concatenate back to word + '</w>' — BPE never loses
    or duplicates characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet="abcd", min_size=1, max_size=12),
        pair_seed=st.integers(0, 10**6),
    )
    def check(word, pair_seed):
        import random

        rng = random.Random(pair_seed)
        syms = ["a", "b", "c", "d", "</w>", "ab", "cd", "bc", "abc"]
        merges = []
        for rank in range(rng.randint(0, 8)):
            merges.append((rng.choice(syms), rng.choice(syms)))
        rank_of = {p: r for r, p in enumerate(dict.fromkeys(merges))}
        out = bpe.bpe_encode_word(word, rank_of)
        assert "".join(out) == word + "</w>"

    check()
