"""Round-6 equivalence probe: the old (interpreted-HOF) gram builders vs the
new codegen regex device, row-by-row, on adversarial inputs — newlines,
texts shorter than n, empty/whitespace-only strings, repeated chars, unicode
whitespace survivors, and a slice of the real sf0.01 documents table.

Exits non-zero on any mismatch, printing the offending row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparktax.session import get_spark
from sparktax.link.minhash import char_grams, shingle
from sparktax.textops import normalized_text, simhash, word_shingles

TRICKY = [
    (1, "hello world"),
    (2, "a"),
    (3, "ab"),
    (4, "abc"),
    (5, ""),
    (6, "   "),
    (7, "line one\nline two\n"),
    (8, "tabs\tand\nnewlines\r\nmix"),
    (9, "aaaaaaa"),
    (10, "punct, punct! and -- dashes"),
    (11, None),
    (12, "one"),
    (13, "one two"),
    (14, "one two three four five six seven eight nine ten"),
    (15, "Sømé unicode façade ünïcode"),
    (16, "x" * 500),
    (17, " leading and trailing "),
    (18, "a\nb"),
    (19, "\n\n\n"),
    (20, "word " * 50),
]


def old_char_grams(norm, n):
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def old_shingle(df, text_col, id_col, n):
    norm = F.lower(F.col(text_col))
    grams = F.array_distinct(old_char_grams(norm, n))
    return (
        df.select(F.col(id_col).alias("id"), grams.alias("_grams"))
        .select("id", F.explode("_grams").alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def old_word_shingles(df, n, text_col, id_col):
    toks = F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), grams.alias("_g"))
        .select("id", F.explode("_g").alias("shingle"))
        .filter(
            (F.col("shingle") != "")
            & (F.size(F.split(F.col("shingle"), " ")) >= n)
        )
    )


def old_simhash(documents, text_col="text"):
    from pyspark.sql import functions as F

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(F.lower(txt), r"\s+"), lambda t: t != "")
    md5h = F.md5(F.col("tok"))
    tok = documents.select("doc_id", F.explode_outer(toks).alias("tok")).select(
        "doc_id",
        F.conv(F.substring(md5h, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(md5h, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = [
        F.sum(
            F.coalesce(
                F.shiftright(F.col("lo" if i < 32 else "hi"), i % 32).bitwiseAND(
                    F.lit(1)
                ),
                F.lit(0),
            )
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(F.count("lo").alias("n"), *votes)
    sim = F.when(F.col("v63") * 2 > F.col("n"), F.lit(-(2**63))).otherwise(
        F.lit(0).cast("long")
    )
    for i in range(63):
        sim = sim + F.when(
            F.col(f"v{i}") * 2 > F.col("n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def rows_set(df):
    return sorted([tuple(r) for r in df.collect()])


def check(name, old_df, new_df):
    o, n = rows_set(old_df), rows_set(new_df)
    if o != n:
        only_old = [r for r in o if r not in set(n)][:10]
        only_new = [r for r in n if r not in set(o)][:10]
        print(f"MISMATCH {name}: old={len(o)} new={len(n)}")
        print("  only_old:", only_old)
        print("  only_new:", only_new)
        return False
    print(f"OK {name} ({len(o)} rows)")
    return True


def main():
    spark = get_spark(app="r06-equiv", cores="8")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(TRICKY, "doc_id int, text string")
    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    ok = True
    for n in (2, 3, 5):
        ok &= check(
            f"char_shingle_n{n}_tricky",
            old_shingle(df, "text", "doc_id", n),
            shingle(df, "text", "doc_id", n=n),
        )
        ok &= check(
            f"char_shingle_n{n}_real",
            old_shingle(real, "text", "doc_id", n),
            shingle(real, "text", "doc_id", n=n),
        )
    for n in (1, 2, 4, 8):
        ok &= check(
            f"word_shingles_n{n}_tricky",
            old_word_shingles(df, n, "text", "doc_id"),
            word_shingles(df, n, "text", "doc_id"),
        )
        ok &= check(
            f"word_shingles_n{n}_real",
            old_word_shingles(real, n, "text", "doc_id"),
            word_shingles(real, n, "text", "doc_id"),
        )
    ok &= check("simhash_tricky", old_simhash(df), simhash(df))
    ok &= check("simhash_real", old_simhash(real), simhash(real))

    spark.stop()
    if not ok:
        sys.exit(1)
    print("ALL EQUIVALENT")


if __name__ == "__main__":
    main()
