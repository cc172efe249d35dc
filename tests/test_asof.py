"""As-of join: union + window forward-fill plan vs a brute-force pandas
oracle (per left row: the max right ts ≤ left ts within the key)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparktax.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(5)
    n_l, n_r = 300, 200
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.randint(0, 12, n_l),
            "ts": rng.randint(0, 1000, n_l).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "k": rng.randint(0, 14, n_r),  # some keys never on the left
            "ts": rng.randint(0, 1000, n_r).astype("int64"),
            "payload": rng.rand(n_r).round(6),
        }
    )
    # dedupe right on (k, ts): deterministic-match precondition
    right = right.sort_values("rid").drop_duplicates(["k", "ts"], keep="last")
    return left, right


def _brute(left: pd.DataFrame, right: pd.DataFrame) -> dict[int, tuple]:
    out = {}
    for row in left.itertuples(index=False):
        cand = right[(right.k == row.k) & (right.ts <= row.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "rid"]).iloc[-1]
            out[row.lid] = (int(best.rid), float(best.payload), int(best.ts))
        else:
            out[row.lid] = (None, None, None)
    return out

def test_asof_join_matches_bruteforce(spark, frames):
    left, right = frames
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="k"
    ).toPandas()
    assert len(got) == len(left)  # every left row survives exactly once
    assert set(got.columns) == {"lid", "k", "ts", "rid", "payload", "ts_right"}
    want = _brute(left, right)
    for row in got.itertuples(index=False):
        rid = None if pd.isna(row.rid) else int(row.rid)
        exp = want[row.lid]
        assert rid == exp[0], (row.lid, rid, exp)
        if rid is not None:
            assert float(row.payload) == pytest.approx(exp[1])
            assert int(row.ts_right) == exp[2]


def test_asof_join_inclusive_tie_and_no_match(spark):
    left = pd.DataFrame({"lid": [1, 2], "k": [0, 0], "ts": [100, 50]})
    right = pd.DataFrame(
        {"rid": [7, 8], "k": [0, 0], "ts": [100, 60], "payload": [0.5, 0.9]}
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), on="k")
        .toPandas()
        .set_index("lid")
    )
    assert int(got.loc[1, "rid"]) == 7  # equal ts matches (inclusive)
    assert pd.isna(got.loc[2, "rid"])  # nothing at or before ts=50
