"""Round-4 session-7 operators — per-group Gini (hand-computed extremes,
tie invariance), session-concurrency endpoint sweep (known overlap layout),
Kaplan-Meier survival (hand-computed risk sets, censoring, zero-survival
NULL), Flesch readability (hand-counted text), lag-1 autocorrelation and
interarrival quantiles (known sequences)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from multiomics_biocypher_kg_ray.stages.events import (
    session_concurrency,
    survival_km,
)
from multiomics_biocypher_kg_ray.stages.relational import group_gini
from multiomics_biocypher_kg_ray.stages.text import doc_readability


def _ds(df: pd.DataFrame, blocks: int = 4):
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(blocks)


def _gini_ref(v: np.ndarray) -> int:
    s = np.sort(v.astype(np.int64))
    n = len(s)
    i = np.arange(1, n + 1, dtype=np.int64)
    gnum = int(((2 * i - n - 1) * s).sum())
    return int(np.floor((np.float64(gnum) * 1e6) / (np.float64(n) * np.float64(s.sum()))))


def test_gini_equality_concentration_and_ties():
    df = pd.DataFrame(
        {
            "g": ["eq"] * 4 + ["conc"] * 4 + ["mix"] * 6,
            "v": [5, 5, 5, 5] + [0, 0, 0, 100] + [3, 1, 4, 1, 5, 9],
        }
    )
    out = group_gini(_ds(df, 3), "g", "v").to_pandas().set_index("g")
    assert out.loc["eq", "gini_ppm"] == 0  # perfect equality
    # one order owns everything: G = (n-1)/n = 0.75
    assert out.loc["conc", "gini_ppm"] == 750_000
    assert out.loc["mix", "gini_ppm"] == _gini_ref(
        np.array([3, 1, 4, 1, 5, 9])
    )
    assert out.loc["mix", "total"] == 23
    assert out["n"].sort_index().tolist() == [4, 4, 6]


def test_gini_zero_total_is_null():
    df = pd.DataFrame({"g": ["z", "z"], "v": [0, 0]})
    out = group_gini(_ds(df, 2), "g", "v").to_pandas()
    assert out["gini_ppm"].isna().all()


def _sessions(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "start_ts": pa.array(
                    [r[0] for r in rows], pa.timestamp("us")
                ),
                "end_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    ).repartition(2)


def test_session_concurrency_triple_overlap_at_touch_point():
    # closed intervals: [0,10] is still open at t=10 when [10,20] starts
    out = session_concurrency(_sessions([(0, 10), (5, 15), (10, 20)]))
    row = out.to_pandas().iloc[0]
    assert row["n_sessions"] == 3
    assert row["peak"] == 3
    assert row["at_us"] == 10  # earliest instant reaching the peak


def test_session_concurrency_disjoint():
    out = session_concurrency(_sessions([(0, 1), (10, 11), (20, 21)]))
    row = out.to_pandas().iloc[0]
    assert row["peak"] == 1 and row["at_us"] == 0 and row["n_sessions"] == 3


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    ).repartition(3)


DAY = 86_400_000_000


def test_survival_km_hand_computed_risk_sets():
    # corpus max M = 20 DAY (user Z). deaths need staleness >= 7 days.
    M = 20 * DAY
    rows = []
    rows += [(0, M), (0, M)]  # Z: dur 0, censored (staleness 0)
    rows += [(1, 0), (1, 1 * DAY)]  # A: dur 1, last = M-19d -> died
    rows += [(2, 0), (2, 1 * DAY)]  # B: dur 1, died
    rows += [(3, 0), (3, 2 * DAY)]  # C: dur 2, last = M-18d -> died
    rows += [(4, M - 2 * DAY - 100), (4, M - 100)]  # D: dur 2, censored (<7d)
    ev = _events(rows)
    out = (
        survival_km(ev, unit_us=DAY, censor_units=7)
        .to_pandas()
        .set_index("dur")
        .sort_index()
    )
    # dur 0: Z leaves censored, no deaths -> no row
    assert list(out.index) == [1, 2]
    # N=5; dur1: risk = 5-1(Z) = 4, deaths 2 -> ln(2/4)
    assert out.loc[1, "n_risk"] == 4 and out.loc[1, "n_died"] == 2
    step1 = int(np.floor(np.log(2.0 / 4.0) * 1e6))
    assert out.loc[1, "log_surv_e6"] == step1
    # dur2: risk = 5-3 = 2, deaths 1 (C); D censored
    assert out.loc[2, "n_risk"] == 2 and out.loc[2, "n_died"] == 1
    step2 = int(np.floor(np.log(1.0 / 2.0) * 1e6))
    assert out.loc[2, "log_surv_e6"] == step1 + step2


def test_survival_km_zero_survival_null_tail():
    # A and B (dur 1) both die; anchor Z keeps corpus max 10 days later
    M = 20 * DAY
    rows = [(0, M), (0, M)]
    rows += [(1, 9 * DAY), (1, 10 * DAY), (2, 9 * DAY), (2, 10 * DAY)]
    out = (
        survival_km(_events(rows), unit_us=DAY, censor_units=7)
        .to_pandas()
        .set_index("dur")
    )
    # dur 1: risk 2 (Z left at dur 0), deaths 2 -> survival 0 -> NULL
    assert out.loc[1, "n_risk"] == 2 and out.loc[1, "n_died"] == 2
    assert pd.isna(out.loc[1, "log_surv_e6"])


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_readability_hand_counted():
    out = (
        doc_readability(_docs(["The cat sat.", "xyz", ""]))
        .to_pandas()
        .set_index("doc_id")
    )
    # "The cat sat.": 3 words, 1 sentence run, vowel runs e/a/a = 3
    assert (
        out.loc[0, ["n_words", "n_sents", "n_syll"]].tolist() == [3, 1, 3]
    )
    assert out.loc[0, "flesch_milli"] == 206_835 - 1015 * 3 - 84_600
    # no punctuation: sents clamps to 1; 'y' counts as a vowel run
    assert out.loc[1, ["n_words", "n_sents", "n_syll"]].tolist() == [1, 0, 1]
    assert out.loc[1, "flesch_milli"] == 206_835 - 1015 - 84_600
    # empty text: no words -> NULL score
    assert pd.isna(out.loc[2, "flesch_milli"])


def test_autocorr_alternating_and_constant():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_value_autocorr,
    )
    import duckdb
    import os
    import tempfile

    # user 1: perfectly alternating values -> lag-1 autocorr == -1
    # user 2: constant -> zero variance -> NULL
    n = 8
    df = pd.DataFrame(
        {
            "event_id": range(2 * n),
            "user_id": [1] * n + [2] * n,
            "ts": pd.to_datetime(list(range(n)) * 2, unit="s"),
            "event_type": "click",
            "value": [1.0, 2.0] * (n // 2) + [5.0] * n,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_user_value_autocorr(d).to_pandas().set_index("user_id")
    assert out.loc[1, "autocorr_ppm"] in (-1_000_000, -1_000_001)
    assert pd.isna(out.loc[2, "autocorr_ppm"])
    assert (out["n"] == n - 1).all()


def test_interarrival_quantile_disc_semantics():
    from multiomics_biocypher_kg_ray.pipelines.queries import (
        q_user_interarrival_stats,
    )
    import os
    import tempfile

    # gaps for user 1: [1s, 2s, 100s] -> disc quantiles pick actual values
    ts = [0, 1, 3, 103]
    df = pd.DataFrame(
        {
            "event_id": range(4),
            "user_id": 1,
            "ts": pd.to_datetime(ts, unit="s"),
            "event_type": "click",
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q_user_interarrival_stats(d).to_pandas().iloc[0]
    assert out["n"] == 3
    assert out["min_v"] == 1e6 and out["max_v"] == 100e6
    assert out["q1"] == 1e6 and out["median"] == 2e6 and out["q3"] == 100e6
