import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from multiomics_biocypher_kg_ray.stages import events, relational


def test_to_cents_exact():
    t = pa.table({"v": [1.1, 185.22, 0.01, 99.999999999]})
    out = relational.to_cents(t, {"v": "cents"})
    assert out.column("cents").to_pylist() == [110, 18522, 1, 10000]


def test_preaggregate_matches_plain_groupby():
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 1000),
            "v": rng.randint(0, 100, 1000).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = relational.preaggregate(ds, ["k"], ["v"]).to_pandas().set_index("k")
    expected = df.groupby("k").agg(n=("v", "size"), v=("v", "sum"))
    for k in "abc":
        assert out.loc[k, "v"] == expected.loc[k, "v"]
        assert out.loc[k, "n"] == expected.loc[k, "n"]


def test_top_k_per_group_deterministic_ties():
    df = pd.DataFrame(
        {"g": ["x"] * 4, "score": [5, 5, 3, 9], "id": [4, 2, 7, 1]}
    )
    ds = ray.data.from_pandas(df)
    out = (
        relational.top_k_per_group(ds, ["g"], [("score", False), ("id", True)], 3)
        .to_pandas()
        .sort_values("rank")
    )
    assert list(out["id"]) == [1, 2, 4]  # tie on score=5 broken by id asc


def test_percentile_buckets_integer_math():
    df = pd.DataFrame(
        {"g": ["a"] * 5, "v": [10.0, 20.0, 30.0, 40.0, 50.0], "id": [1, 2, 3, 4, 5]}
    )
    out = (
        relational.percentile_buckets(ray.data.from_pandas(df), ["g"], "v", "id")
        .to_pandas()
        .sort_values("rnk")
    )
    assert list(out["id"]) == [5, 4, 3, 2, 1]
    assert list(out["pct"]) == [100, 75, 50, 25, 0]
    assert list(out["bucket"]) == ["top10", "top25", "mid", "mid", "low"]


def test_distribution_stats_quantiles():
    df = pd.DataFrame({"g": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 100.0]})
    out = relational.distribution_stats(
        ray.data.from_pandas(df), ["g"], "v"
    ).to_pandas()
    r = out.iloc[0]
    assert r["n"] == 5 and r["min_v"] == 1.0 and r["max_v"] == 100.0
    assert r["median"] == 3.0 and r["q1"] == 2.0 and r["q3"] == 4.0


def test_sessionize_gap():
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "ts": [
                base,
                base + pd.Timedelta(minutes=10),
                base + pd.Timedelta(minutes=90),  # > 30min gap → new session
                base + pd.Timedelta(minutes=95),
            ],
        }
    )
    out = (
        events.sessionize(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("session_idx")
    )
    assert list(out["session_idx"]) == [0, 1]
    assert list(out["n_events"]) == [2, 2]


def test_asof_last_marker():
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "event_type": ["purchase", "signup", "purchase", "purchase"],
            "ts": [base + pd.Timedelta(minutes=m) for m in (0, 5, 10, 20)],
        }
    )
    out = (
        events.asof_last_marker(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["event_id"]) == [1, 3, 4]
    assert pd.isna(out.iloc[0]["last_marker_ts"])  # purchase before any signup
    assert out.iloc[1]["last_marker_ts"] == base + pd.Timedelta(minutes=5)


def _pandas_sessionize(df, gap_minutes=30):
    import numpy as np

    out = []
    for k, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_minutes * 60_000_000
        sid = np.cumsum(new) - 1
        for s in range(sid.max() + 1):
            m = sid == s
            out.append(
                {
                    "user_id": k,
                    "session_idx": s,
                    "n_events": int(m.sum()),
                    "start_ts": pd.Timestamp(ts[m].min(), unit="us"),
                    "end_ts": pd.Timestamp(ts[m].max(), unit="us"),
                }
            )
    return (
        pd.DataFrame(out)
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )


def test_sessionize_hot_key_cross_block_stitching():
    """One user ≫ one block: sessions that straddle sorted-block boundaries
    must stitch exactly; result equals the pandas per-user reference."""
    import numpy as np

    from multiomics_biocypher_kg_ray.stages.events import sessionize

    rng = np.random.RandomState(17)
    rows = []
    eid = 0
    t0 = 1_700_000_000_000_000
    # hot user 1: 20k events in bursts separated by > and < the 30-min gap
    t = t0
    for burst in range(300):
        t += rng.randint(1, 90) * 60_000_000  # inter-burst gap, some > 30min
        for _ in range(rng.randint(10, 120)):
            t += rng.randint(1, 300) * 1_000_000  # within-burst seconds
            rows.append({"user_id": 1, "event_id": eid, "ts": pd.Timestamp(t, unit="us")})
            eid += 1
    # a few cold users
    for u in range(2, 12):
        t = t0 + u * 1_000_000
        for _ in range(5):
            t += rng.randint(1, 40) * 60_000_000
            rows.append({"user_id": u, "event_id": eid, "ts": pd.Timestamp(t, unit="us")})
            eid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=512, batch_format="pyarrow")

    got = (
        sessionize(ds)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    expect = _pandas_sessionize(df)
    pd.testing.assert_frame_equal(
        got[expect.columns].astype(expect.dtypes.to_dict()), expect
    )


def test_sessionize_long_chain_spanning_many_blocks():
    """One session whose events span MANY sorted blocks (every inter-block
    boundary merges, intermediate blocks hold a single run of the hot key):
    the distributed stitch must walk the whole chain to one session row,
    while interleaved multi-session users straddling the same boundaries
    index correctly."""
    import numpy as np

    from multiomics_biocypher_kg_ray.stages.events import sessionize

    rows = []
    eid = 0
    t0 = 1_700_000_000_000_000
    # hot user 1: 20k events 1s apart — ONE session across ~80 blocks of 256
    for i in range(20_000):
        rows.append({"user_id": 1, "event_id": eid, "ts": pd.Timestamp(t0 + i * 1_000_000, unit="us")})
        eid += 1
    # user 2: alternating short bursts with > gap separation — many sessions,
    # some straddling block edges
    t = t0
    for burst in range(200):
        t += 45 * 60_000_000  # 45min > 30min gap
        for _ in range(7):
            t += 1_000_000
            rows.append({"user_id": 2, "event_id": eid, "ts": pd.Timestamp(t, unit="us")})
            eid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=256, batch_format="pyarrow")
    got = (
        sessionize(ds)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    expect = _pandas_sessionize(df)
    assert (expect["user_id"] == 1).sum() == 1  # the chain really is one session
    pd.testing.assert_frame_equal(
        got[expect.columns].astype(expect.dtypes.to_dict()), expect
    )


def test_asof_hot_key_cross_block_carry():
    """Carry-forward across sorted-block boundaries: a purchase whose last
    signup lives many blocks earlier must still resolve; purchases before
    any signup stay null."""
    import numpy as np

    from multiomics_biocypher_kg_ray.stages.events import asof_last_marker

    rows = []
    eid = 0
    t0 = 1_700_000_000_000_000
    # user 1: early purchase (no marker yet), one signup, then a long tail
    # of purchases that spans MANY blocks
    rows.append({"user_id": 1, "event_id": eid, "ts": pd.Timestamp(t0, unit="us"), "event_type": "purchase"}); eid += 1
    signup_ts = t0 + 60_000_000
    rows.append({"user_id": 1, "event_id": eid, "ts": pd.Timestamp(signup_ts, unit="us"), "event_type": "signup"}); eid += 1
    for i in range(5000):
        rows.append({"user_id": 1, "event_id": eid,
                     "ts": pd.Timestamp(signup_ts + (i + 1) * 1_000_000, unit="us"),
                     "event_type": "purchase"}); eid += 1
    # user 2: purchases only — always null
    rows.append({"user_id": 2, "event_id": eid, "ts": pd.Timestamp(t0, unit="us"), "event_type": "purchase"}); eid += 1
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=256, batch_format="pyarrow")
    out = asof_last_marker(ds).to_pandas()
    assert len(out) == 5002
    tail = out[(out["user_id"] == 1) & (out["ts"] > pd.Timestamp(signup_ts, unit="us"))]
    assert (tail["last_marker_ts"] == pd.Timestamp(signup_ts, unit="us")).all()
    early = out[(out["user_id"] == 1) & (out["ts"] == pd.Timestamp(t0, unit="us"))]
    assert early["last_marker_ts"].isna().all()
    assert out[out["user_id"] == 2]["last_marker_ts"].isna().all()


def test_distribution_stats_hot_group_matches_numpy():
    """One group ≫ one block: exact cont AND disc quantiles must equal the
    numpy whole-group reference (the path never holds a group in one task)."""
    import numpy as np

    from multiomics_biocypher_kg_ray.stages.relational import distribution_stats

    rng = np.random.RandomState(23)
    vals = rng.randint(0, 10000, size=30000).astype("float64")
    rows = [{"g": "hot", "v": float(x)} for x in vals]
    rows += [{"g": "cold", "v": float(i)} for i in range(7)]
    ds = ray.data.from_items(rows).map_batches(
        lambda t: t, batch_size=1024, batch_format="pyarrow"
    )
    for method, np_method in (("cont", "linear"), ("disc", "inverted_cdf")):
        out = (
            distribution_stats(ds, ["g"], "v", method=method)
            .to_pandas().set_index("g")
        )
        for gname, gvals in (("hot", vals), ("cold", np.arange(7, dtype="float64"))):
            qs = np.percentile(gvals, [25, 50, 75], method=np_method)
            assert out.loc[gname, "n"] == len(gvals)
            assert out.loc[gname, "min_v"] == gvals.min()
            assert out.loc[gname, "max_v"] == gvals.max()
            assert out.loc[gname, "q1"] == qs[0], (method, gname)
            assert out.loc[gname, "median"] == qs[1]
            assert out.loc[gname, "q3"] == qs[2]


def test_asof_ts_tie_marker_after_target_is_null():
    """ADVICE r2 repro: target and marker share (user_id, ts) with the marker
    HIGHER by event_id — the window (ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING) must NOT see the marker, at any block layout."""
    from multiomics_biocypher_kg_ray.stages.events import asof_last_marker

    t0 = 1_700_000_000_000_000
    rows = [
        {"user_id": 1, "event_id": 1, "ts": pd.Timestamp(t0, unit="us"), "event_type": "purchase"},
        {"user_id": 1, "event_id": 2, "ts": pd.Timestamp(t0, unit="us"), "event_type": "signup"},
    ]
    # long tail so the sort splits user 1 across many blocks
    for i in range(3000):
        rows.append({"user_id": 1, "event_id": 3 + i,
                     "ts": pd.Timestamp(t0 + (i + 1) * 1_000_000, unit="us"),
                     "event_type": "purchase"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=128, batch_format="pyarrow")
    out = asof_last_marker(ds).to_pandas().sort_values("event_id")
    first = out[out["event_id"] == 1]
    assert first["last_marker_ts"].isna().all()  # tie, marker after → NULL
    tail = out[out["event_id"] >= 3]
    assert (tail["last_marker_ts"] == pd.Timestamp(t0, unit="us")).all()


def test_asof_markerless_hot_key_stays_distributed():
    """A hot key with many targets and NO markers: every pending row must
    resolve to NULL through the distributed resolve pass (pendings never
    funnel into a single stitch task)."""
    from multiomics_biocypher_kg_ray.stages.events import asof_last_marker

    t0 = 1_700_000_000_000_000
    rows = [
        {"user_id": 1, "event_id": i,
         "ts": pd.Timestamp(t0 + i * 1_000_000, unit="us"), "event_type": "purchase"}
        for i in range(20000)
    ]
    # one cold user with a marker to keep the summary path exercised
    rows.append({"user_id": 2, "event_id": 30000, "ts": pd.Timestamp(t0, unit="us"), "event_type": "signup"})
    rows.append({"user_id": 2, "event_id": 30001, "ts": pd.Timestamp(t0 + 1, unit="us"), "event_type": "purchase"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    ).map_batches(lambda t: t, batch_size=512, batch_format="pyarrow")
    out = asof_last_marker(ds).to_pandas()
    assert len(out) == 20001
    assert out[out["user_id"] == 1]["last_marker_ts"].isna().all()
    assert (out[out["user_id"] == 2]["last_marker_ts"]
            == pd.Timestamp(t0, unit="us")).all()


def test_majority_vote_non_string_values():
    """ADVICE r2: non-string value columns must keep count-desc, value-ASC
    (numeric order) tie-break through the packed-argmax path."""
    from multiomics_biocypher_kg_ray.stages.relational import majority_vote

    df = pd.DataFrame({"g": ["a"] * 3 + ["b"] * 4, "v": [10, 10, 2, -5, -5, 10, 10]})
    out = majority_vote(ray.data.from_pandas(df), ["g"], "v").to_pandas().sort_values("g")
    assert out[out.g == "a"].iloc[0]["consensus"] == 10
    assert out[out.g == "b"].iloc[0]["consensus"] == -5  # tie → numeric asc
    df2 = pd.DataFrame({"g": ["a"] * 3, "v": [1.5, -2.25, -2.25]})
    out2 = majority_vote(ray.data.from_pandas(df2), ["g"], "v").to_pandas()
    assert out2.iloc[0]["consensus"] == -2.25 and out2.iloc[0]["n_votes"] == 2


# -------------------------------------------------- hopping windows / range join


def _ts(us_list):
    return pa.array(np.array(us_list, dtype="int64")).cast(pa.timestamp("us"))


def test_hopping_window_agg_matches_bruteforce():
    HOP, WIN = 900_000_000, 3_600_000_000  # 15 min hop, 1h window, in us
    rng = np.random.RandomState(7)
    ts = rng.randint(0, 20 * 3_600, 500).astype("int64") * 1_000_000
    key = rng.choice(["a", "b"], 500)
    val = rng.randint(0, 50, 500).astype("float64")
    t = pa.table({"ts": _ts(ts), "k": key, "v": val})
    out = (
        events.hopping_window_agg(
            ray.data.from_arrow(t).repartition(4),
            ["k"],
            [("v", "count"), ("v", "max")],
            window_s=3600,
            hop_s=900,
            out_names=["n", "mx"],
        )
        .to_pandas()
        .set_index(["k", "window_start"])
        .sort_index()
    )
    # brute force: every hop-aligned start w with w <= t < w + window
    rows = {}
    for tt, kk, vv in zip(ts, key, val):
        base = (tt // HOP) * HOP
        w = base
        while w > tt - WIN:
            r = rows.setdefault((kk, pd.Timestamp(w, unit="us")), [0, -1.0])
            r[0] += 1
            r[1] = max(r[1], vv)
            w -= HOP
    assert len(out) == len(rows)
    for (kk, ws), (n, mx) in rows.items():
        assert out.loc[(kk, ws), "n"] == n
        assert out.loc[(kk, ws), "mx"] == mx


def test_hopping_window_rejects_non_multiple():
    t = pa.table({"ts": _ts([0]), "k": ["a"], "v": [1.0]})
    try:
        events.hopping_window_agg(
            ray.data.from_arrow(t), ["k"], [("v", "count")], window_s=100, hop_s=7
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_range_join_multi_bucket_intervals_and_closedness():
    from multiomics_biocypher_kg_ray.stages.joins import range_join

    SEC = 1_000_000
    # interval A spans 5 buckets (bucket_s=10); B is length-0 half-open (empty);
    # C shares its end with a point (kept only when closed="both")
    iv = pa.table(
        {
            "iv_id": ["A", "B", "C"],
            "s": _ts([5 * SEC, 30 * SEC, 40 * SEC]),
            "e": _ts([47 * SEC, 30 * SEC, 55 * SEC]),
        }
    )
    pts = pa.table(
        {
            "pt_id": list(range(7)),
            "ts": _ts([x * SEC for x in [0, 5, 14, 30, 46, 47, 55]]),
        }
    )
    for closed, expect in (
        ("left", {(5, "A"), (14, "A"), (30, "A"), (46, "A"), (46, "C"), (47, "C")}),
        (
            "both",
            {
                (5, "A"), (14, "A"), (30, "A"), (46, "A"), (47, "A"),
                (30, "B"), (46, "C"), (47, "C"), (55, "C"),
            },
        ),
    ):
        out = range_join(
            ray.data.from_arrow(pts).repartition(3),
            ray.data.from_arrow(iv).repartition(2),
            point_ts="ts",
            start_col="s",
            end_col="e",
            bucket_s=10,
            closed=closed,
            num_partitions=4,
        ).to_pandas()
        got = {
            (int(r.ts.timestamp()), r.iv_id) for r in out.itertuples()
        }
        assert got == expect, (closed, got)
        # exactly-once: no duplicate (point, interval) pairs across buckets
        assert len(out) == len(got)


def test_range_join_rejects_overlapping_columns():
    from multiomics_biocypher_kg_ray.stages.joins import range_join

    t = pa.table({"x": [1], "ts": _ts([0]), "s": _ts([0]), "e": _ts([1])})
    try:
        range_join(
            ray.data.from_arrow(t),
            ray.data.from_arrow(t),
            point_ts="ts",
            start_col="s",
            end_col="e",
            bucket_s=10,
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_range_join_agg_matches_bruteforce_unaligned():
    from multiomics_biocypher_kg_ray.stages.joins import range_join_agg

    SEC = 1_000_000
    rng = np.random.RandomState(11)
    pts_ts = rng.randint(0, 1000, 400).astype("int64") * SEC + rng.randint(
        0, 1_000_000, 400
    )  # NOT bucket-aligned
    vals = rng.randint(0, 100, 400).astype("float64")
    s = rng.randint(0, 900, 30).astype("int64") * SEC + rng.randint(0, 999, 30)
    lens = rng.randint(1, 120, 30).astype("int64") * SEC + rng.randint(0, 999, 30)
    e = s + lens
    pts = pa.table({"ts": _ts(pts_ts), "v": vals})
    iv = pa.table({"iv_id": list(range(30)), "s": _ts(s), "e": _ts(e)})
    for closed in ("left", "both"):
        out = (
            range_join_agg(
                ray.data.from_arrow(pts).repartition(5),
                ray.data.from_arrow(iv).repartition(3),
                point_ts="ts",
                start_col="s",
                end_col="e",
                fine_s=10,
                aggs=[("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")],
                out_names=["n", "sv", "mn", "mx"],
                closed=closed,
            )
            .to_pandas()
            .set_index("iv_id")
            .sort_index()
        )
        expect = {}
        for i in range(30):
            if closed == "left":
                m = (pts_ts >= s[i]) & (pts_ts < e[i])
            else:
                m = (pts_ts >= s[i]) & (pts_ts <= e[i])
            if m.sum():
                expect[i] = (
                    int(m.sum()),
                    float(vals[m].sum()),
                    float(vals[m].min()),
                    float(vals[m].max()),
                )
        assert set(out.index) == set(expect), closed
        for i, (n, sv, mn, mx) in expect.items():
            row = out.loc[i]
            assert (row["n"], row["sv"], row["mn"], row["mx"]) == (n, sv, mn, mx), (
                closed,
                i,
            )


def test_range_join_agg_aligned_has_no_partial_branch():
    # bucket-aligned intervals: the partial branch is EMPTY and must not
    # break the join/union plumbing
    from multiomics_biocypher_kg_ray.stages.joins import range_join_agg

    SEC = 1_000_000
    pts = pa.table(
        {"ts": _ts([x * SEC for x in [5, 15, 25, 35]]), "v": [1.0, 2.0, 3.0, 4.0]}
    )
    iv = pa.table({"iv_id": ["A"], "s": _ts([10 * SEC]), "e": _ts([30 * SEC])})
    out = range_join_agg(
        ray.data.from_arrow(pts),
        ray.data.from_arrow(iv),
        point_ts="ts",
        start_col="s",
        end_col="e",
        fine_s=10,
        aggs=[("v", "count"), ("v", "sum")],
        out_names=["n", "sv"],
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n"] == 2 and out.iloc[0]["sv"] == 5.0


def test_range_join_agg_all_intervals_sub_bucket():
    # intervals strictly inside one fine bucket: the FULL branch is empty
    from multiomics_biocypher_kg_ray.stages.joins import range_join_agg

    SEC = 1_000_000
    pts = pa.table({"ts": _ts([3 * SEC, 7 * SEC, 12 * SEC]), "v": [1.0, 2.0, 4.0]})
    iv = pa.table({"iv_id": ["A"], "s": _ts([2 * SEC]), "e": _ts([8 * SEC])})
    out = range_join_agg(
        ray.data.from_arrow(pts),
        ray.data.from_arrow(iv),
        point_ts="ts",
        start_col="s",
        end_col="e",
        fine_s=100,
        aggs=[("v", "count"), ("v", "sum")],
        out_names=["n", "sv"],
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n"] == 2 and out.iloc[0]["sv"] == 3.0


def test_range_join_negative_timestamps_floor_bucketing():
    # ADVICE r3: points were bucketed with trunc-toward-zero division while
    # intervals were exploded with numpy floor — a pre-epoch point could land
    # one bucket above its interval and the qualifying pair silently dropped.
    from multiomics_biocypher_kg_ray.stages.joins import range_join

    SEC = 1_000_000
    # interval covers [-25s, -5s); points at -25, -15, -6 all qualify.
    # With bucket_s=10 and trunc division, -6s buckets to 0 while the
    # interval explode floors to bucket -1 — the (-6, A) pair was lost.
    iv = pa.table({"iv_id": ["A"], "s": _ts([-25 * SEC]), "e": _ts([-5 * SEC])})
    pts = pa.table({"pt_id": [0, 1, 2, 3], "ts": _ts([-25 * SEC, -15 * SEC, -6 * SEC, -5 * SEC])})
    out = range_join(
        ray.data.from_arrow(pts).repartition(2),
        ray.data.from_arrow(iv),
        point_ts="ts",
        start_col="s",
        end_col="e",
        bucket_s=10,
        closed="left",
        num_partitions=4,
    ).to_pandas()
    assert sorted(out["pt_id"].tolist()) == [0, 1, 2]
    assert len(out) == 3  # exactly-once, no cross-bucket duplicates


def test_hour_bucket_pre_epoch_floors_down():
    t = pa.table({"ts": _ts([-1, 0, 1, -3_600_000_000])})
    out = events.add_hour_bucket(t)
    hours = out.column("hour").cast(pa.int64()).to_pylist()
    hour_us = 3_600_000_000
    assert hours == [-hour_us, 0, 0, -hour_us]


def test_key_skew_report_matches_duckdb():
    import duckdb

    from multiomics_biocypher_kg_ray.stages.relational import key_skew_report

    rng = np.random.RandomState(5)
    # Zipf-ish skew: one hot key holding ~30% of rows.
    keys = np.concatenate(
        [np.full(3000, 7), rng.randint(0, 500, size=7000)]
    ).astype("int64")
    df = pd.DataFrame({"user_id": keys})
    out = (
        key_skew_report(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(8),
            "user_id",
            top_n=10,
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.sql(
        "WITH c AS (SELECT user_id, count(*)::BIGINT n FROM t GROUP BY 1), "
        "s AS (SELECT sum(n)::BIGINT tot FROM c) "
        "SELECT user_id, n, ((n * 1000000) // tot)::BIGINT share_ppm "
        "FROM c CROSS JOIN s ORDER BY n DESC, user_id LIMIT 10"
    ).df()
    assert (out["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()
    assert (out["share_ppm"].to_numpy() == ref["share_ppm"].to_numpy()).all()
    assert out["user_id"].iloc[0] == 7 and out["share_ppm"].iloc[0] >= 290000


def test_group_zscore_matches_duckdb_and_nulls_zero_variance():
    import duckdb

    from multiomics_biocypher_kg_ray.stages.relational import group_zscore

    rng = np.random.RandomState(17)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1205, dtype="int64"),
            "event_type": np.concatenate(
                [rng.choice(["a", "b"], size=1200), np.array(["const"] * 5)]
            ),
            "cents": np.concatenate(
                [
                    rng.randint(-2000, 9000, size=1200),
                    np.full(5, 42),  # zero-variance group
                ]
            ).astype("int64"),
        }
    )
    out = (
        group_zscore(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(6),
            ["event_type"],
            "cents",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.sql(
        "WITH st AS (SELECT event_type, count(*)::BIGINT n, sum(cents)::BIGINT s, "
        "sum(cents*cents)::BIGINT s2 FROM t GROUP BY 1) "
        "SELECT event_id, CASE WHEN (n::DOUBLE * s2 - s::DOUBLE * s) > 0.0 "
        "THEN floor(((n * cents - s) * 1000000.0::DOUBLE) "
        "/ sqrt(n::DOUBLE * s2 - s::DOUBLE * s))::BIGINT ELSE NULL END z "
        "FROM t JOIN st USING (event_type) ORDER BY event_id"
    ).df()
    a = out["zscore_ppm"].to_numpy(dtype="float64", na_value=np.nan)
    b = ref["z"].to_numpy(dtype="float64", na_value=np.nan)
    assert np.array_equal(a, b, equal_nan=True)
    assert out.loc[out["event_type"] == "const", "zscore_ppm"].isna().all()


def test_cohort_retention_multi_month():
    import duckdb

    from multiomics_biocypher_kg_ray.stages.events import cohort_retention

    rng = np.random.RandomState(31)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 300, size=n).astype("int64"),
            "ts": pd.Timestamp("2023-06-15")
            + pd.to_timedelta(rng.randint(0, 400, size=n), unit="D"),
        }
    )
    out = (
        cohort_retention(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(7)
        )
        .to_pandas()
        .sort_values(["cohort_ym", "month_offset"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    ref = con.sql(
        "WITH m AS (SELECT DISTINCT user_id::BIGINT u, "
        "(date_part('year', ts)::BIGINT * 12 + date_part('month', ts)::BIGINT) ym "
        "FROM events), c AS (SELECT u, min(ym) cohort_ym FROM m GROUP BY 1) "
        "SELECT c.cohort_ym, (m.ym - c.cohort_ym) month_offset, count(*)::BIGINT n_users "
        "FROM m JOIN c USING (u) GROUP BY 1,2 ORDER BY 1,2"
    ).df()
    assert len(out) > 10
    assert (out["cohort_ym"].to_numpy() == ref["cohort_ym"].to_numpy()).all()
    assert (out["month_offset"].to_numpy() == ref["month_offset"].to_numpy()).all()
    assert (out["n_users"].to_numpy() == ref["n_users"].to_numpy()).all()
    # offset 0 row exists for every cohort (a user is active in their own cohort month)
    z = out[out["month_offset"] == 0]
    assert set(z["cohort_ym"]) == set(out["cohort_ym"].unique())


def test_event_transitions_and_funnel_small():
    from multiomics_biocypher_kg_ray.stages.events import (
        event_transitions,
        funnel_2step,
    )

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_id": [10, 11, 12, 20, 21, 30],
            "event_type": ["signup", "view", "purchase", "signup", "signup", "purchase"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00",
                    "2024-01-01 00:05",
                    "2024-01-01 00:10",
                    "2024-02-01 00:00",
                    "2024-02-01 00:01",
                    "2024-03-01 00:00",
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    tr = (
        event_transitions(ds)
        .to_pandas()
        .set_index(["prev_type", "event_type"])["n"]
        .to_dict()
    )
    assert tr == {
        ("signup", "view"): 1,
        ("view", "purchase"): 1,
        ("signup", "signup"): 1,
    }
    fun = funnel_2step(ds, "signup", "purchase").to_pandas().iloc[0]
    # users 1 and 2 signed up; only user 1 purchased after; user 3 purchased
    # without signup (not counted)
    assert fun["n_a"] == 2 and fun["n_ab"] == 1 and fun["conv_ppm"] == 500000


def test_debounce_events_small():
    from multiomics_biocypher_kg_ray.stages.events import debounce_events

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 8],
            "event_type": ["click", "click", "click", "view", "click"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:30",  # within 60s of #1 -> dropped
                    "2024-01-01 00:02:00",  # 90s after #2 -> kept (lag vs #2)
                    "2024-01-01 00:00:10",  # different type -> kept
                    "2024-01-01 00:00:20",  # different user -> kept
                ]
            ),
        }
    )
    out = (
        debounce_events(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(3),
            gap_us=60_000_000,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out["event_id"]) == [1, 3, 4, 5]


def test_snapshot_diff_statuses():
    from multiomics_biocypher_kg_ray.stages.relational import snapshot_diff

    old = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array(["a", "b", "c"])}
    )
    new = pa.table(
        {"k": pa.array([2, 3, 4], pa.int64()), "v": pa.array(["b", "X", "d"])}
    )
    out = (
        snapshot_diff(
            ray.data.from_arrow(old).repartition(2),
            ray.data.from_arrow(new).repartition(2),
            "k",
            "v",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = {(r.k, r.status) for r in out.itertuples()}
    assert got == {("1", "removed"), ("3", "changed"), ("4", "added")}
    chg = out[out["status"] == "changed"].iloc[0]
    assert chg["old_val"] == "c" and chg["new_val"] == "X"


def test_psi_drift_zero_for_identical_and_positive_for_shifted():
    from multiomics_biocypher_kg_ray.stages.relational import psi_drift

    rng = np.random.RandomState(43)
    a = pa.table({"v": pa.array(rng.randint(0, 10000, 5000).astype("int64"))})
    edges = [1000, 3000, 7000]
    same = (
        psi_drift(
            ray.data.from_arrow(a).repartition(4),
            ray.data.from_arrow(a).repartition(2),
            "v",
            edges,
        )
        .to_pandas()
    )
    assert same["psi_q"].sum() == 0  # identical snapshots -> PSI exactly 0
    shifted = pa.table(
        {"v": pa.array((rng.randint(0, 10000, 5000) + 5000).astype("int64"))}
    )
    drift = (
        psi_drift(
            ray.data.from_arrow(a), ray.data.from_arrow(shifted), "v", edges
        )
        .to_pandas()
    )
    assert drift["psi_q"].sum() > 200_000  # major-shift threshold 0.2
    assert len(drift) == len(edges) + 1


def test_group_corr_matches_numpy_and_nulls_degenerate_groups():
    from multiomics_biocypher_kg_ray.stages.relational import group_corr

    rng = np.random.RandomState(23)
    n = 900
    k = rng.randint(0, 30, size=n).astype("int64")
    x = rng.randint(-500, 500, size=n).astype("int64")
    y = (2 * x + rng.randint(-300, 300, size=n)).astype("int64")
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    # degenerate groups: zero x-variance, and a singleton
    df = pd.concat(
        [
            df,
            pd.DataFrame({"k": [90] * 6, "x": [7] * 6, "y": [1, 2, 3, 4, 5, 6]}),
            pd.DataFrame({"k": [91], "x": [3], "y": [4]}),
        ],
        ignore_index=True,
    )
    out = (
        group_corr(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(7),
            ["k"],
            "x",
            "y",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        g = df[df["k"] == row["k"]]
        assert row["n"] == len(g)
        if g["x"].nunique() < 2 or g["y"].nunique() < 2:
            assert pd.isna(row["corr_ppm"])
        else:
            r = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(row["corr_ppm"] - np.floor(r * 1e6)) <= 1, (row["k"], r)
    assert pd.isna(out.loc[out["k"] == 90, "corr_ppm"]).all()
    assert pd.isna(out.loc[out["k"] == 91, "corr_ppm"]).all()
    # strongly positive overall relationship: most groups near +1
    real = out[out["k"] < 30]["corr_ppm"].dropna()
    assert (real > 800000).mean() > 0.9


def test_profile_table_counts_nulls_distincts_minmax():
    from multiomics_biocypher_kg_ray.stages.relational import profile_table

    df = pd.DataFrame(
        {
            "i": pd.array([5, None, -3, 10, 10, 2], dtype="Int64"),
            "s": ["b", "a", None, "a", "zz", None],
        }
    )
    out = (
        profile_table(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(3),
            ["i"],
            ["s"],
        )
        .to_pandas()
        .set_index("col_name")
    )
    assert out.loc["i", "n"] == 6 and out.loc["i", "n_null"] == 1
    assert out.loc["i", "n_distinct"] == 4
    # numeric compare, not lexicographic: min is -3, not "10"
    assert out.loc["i", "min_val"] == "-3" and out.loc["i", "max_val"] == "10"
    assert out.loc["s", "n_null"] == 2 and out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_val"] == "a" and out.loc["s", "max_val"] == "zz"


def test_profile_table_all_null_column():
    from multiomics_biocypher_kg_ray.stages.relational import profile_table

    df = pd.DataFrame({"i": pd.array([None, None], dtype="Int64")})
    out = (
        profile_table(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            ["i"],
            [],
        )
        .to_pandas()
        .set_index("col_name")
    )
    assert out.loc["i", "n"] == 2 and out.loc["i", "n_null"] == 2
    assert out.loc["i", "n_distinct"] == 0
    assert pd.isna(out.loc["i", "min_val"]) and pd.isna(out.loc["i", "max_val"])


def test_scd2_intervals_collapses_runs():
    from multiomics_biocypher_kg_ray.stages.events import scd2_intervals

    df = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype="int64"),
            "user_id": np.array([1, 1, 1, 1, 2, 2, 2, 2], dtype="int64"),
            "event_type": ["a", "a", "b", "a", "x", "x", "x", "y"],
            "ts": pd.to_datetime([1, 2, 3, 4, 1, 2, 3, 4], unit="s"),
        }
    )
    out = (
        scd2_intervals(
            ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(3),
            "user_id",
            "ts",
            "event_id",
            "event_type",
        )
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == ["a", "b", "a", "x", "y"]
    # half-open chaining: each valid_to is the next change's valid_from
    u1 = out[out["user_id"] == 1]
    assert u1["valid_to"].iloc[0] == u1["valid_from"].iloc[1]
    assert u1["valid_to"].iloc[1] == u1["valid_from"].iloc[2]
    assert pd.isna(u1["valid_to"].iloc[2])  # current value open-ended
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 2 and pd.isna(u2["valid_to"].iloc[1])


def test_mad_outliers_exact_small():
    import numpy as np

    from multiomics_biocypher_kg_ray.stages.relational import mad_outliers

    # group g: values 0..8 plus one glitch 1000.
    # sorted: 0..8,1000 (n=10) -> disc median = ceil(0.5*10)=rank5 -> 4
    # abs devs: 4,3,2,1,0,1,2,3,4,996 sorted 0,1,1,2,2,3,3,4,4,996
    # MAD = rank5 -> 2; k=3 -> flag |v-4| > 6 -> only 1000
    vals = list(range(9)) + [1000]
    t = pa.table(
        {
            "rid": pa.array(range(10), pa.int64()),
            "g": pa.array(["g"] * 10, pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = mad_outliers(
        ray.data.from_arrow(t).repartition(3), ["g"], "v", k=3
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["v"] == 1000 and r["med"] == 4 and r["mad"] == 2 and r["abs_dev"] == 996
