"""Deterministic sampling / dataset-splitting operators for training-data
pipelines — hash-based train/val/test splits and (stratified) subsampling.

The reference has no sampling (its builds are exhaustive); a 100 TB corpus
pipeline needs splits and samples that are (a) DETERMINISTIC — re-running
the pipeline, at any parallelism, on any cluster, assigns every row the
same split, (b) KEY-STABLE — all rows sharing a key (one conversation, one
document) land in the same split so no near-duplicate leakage across
train/val, and (c) STREAMING — a pure map_batches filter/annotate, no
shuffle, no driver state, no RNG whose stream depends on block order.

All assignment derives from ``md5(salt || ':' || key)`` so every operator
here has an exact DuckDB oracle twin (``oracle_rel.sql_hash_split`` /
``sql_deterministic_sample``): bucket = first-8-hex-chars as uint32 modulo
``PRECISION``, compared against cumulative weight thresholds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

PRECISION = 1_000_000


_KEYABLE = (pa.types.is_integer, pa.types.is_string, pa.types.is_large_string)


def _check_key_col(col: "pa.ChunkedArray | pa.Array", key_col: str) -> None:
    """Split/sample keys must be non-null ints or strings.

    ``_buckets`` hashes ``str(key)``, so a NULL would hash the literal
    ``'None'`` and receive a real deterministic split — while the SQL twin's
    ``md5(salt || ':' || NULL)`` is NULL and falls through to the CASE ELSE.
    Rather than silently diverge from the oracle (or silently accept null
    keys into train/val), reject them. Float/timestamp keys are rejected for
    the same reason: their ``str()`` need not match DuckDB's VARCHAR cast.
    """
    if col.null_count:
        raise ValueError(f"split key column {key_col!r} contains nulls")
    typ = col.type
    if not any(check(typ) for check in _KEYABLE):
        raise TypeError(
            f"split key column {key_col!r} has type {typ}; only integer and "
            "string keys hash identically in the engine and the SQL oracle"
        )


def _buckets_py(keys, salt: str) -> np.ndarray:
    """Reference per-key md5 bucket (kept as the fallback and as the twin
    the vectorized path is property-tested against)."""
    md5 = hashlib.md5
    pre = (salt + ":").encode("utf-8")
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(k).encode("utf-8")).digest()[:4], "big")
            % PRECISION
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def _buckets(col: "pa.ChunkedArray | pa.Array", salt: str) -> np.ndarray:
    """md5-derived bucket in [0, PRECISION) per key — the same math as the
    SQL twin: ('0x' || substr(md5(salt || ':' || key), 1, 8))::UBIGINT %
    PRECISION.

    Vectorized via an embedded per-worker DuckDB connection (``threads=1``
    — the task already owns exactly one CPU): DuckDB's md5/substr/cast run
    as C vector kernels over the Arrow column zero-copy, ~4× the per-key
    Python md5 loop this replaces, and bit-identical to the oracle BY
    CONSTRUCTION since it is the same engine evaluating the same
    expression. DuckDB preserves input order for ORDER-BY-less projections
    (``preserve_insertion_order``, on by default; asserted in tests against
    the Python twin). Falls back to the Python loop if duckdb is absent."""
    try:
        import duckdb
    except ImportError:  # pragma: no cover - duckdb is baked into this env
        return _buckets_py(col.to_pylist(), salt)
    from ..state.broadcast import state_key, task_state

    con = task_state(state_key("sampling_duckdb"), duckdb.connect)
    con.execute("SET threads=1")
    tbl = pa.table({"k": col}) if not isinstance(col, pa.Table) else col
    con.register("_bucket_keys", tbl)
    esc = salt.replace("'", "''")
    out = con.execute(
        f"SELECT (('0x' || substr(md5('{esc}:' || k), 1, 8))::UBIGINT"
        f" % {PRECISION})::BIGINT AS b FROM _bucket_keys"
    ).arrow()
    con.unregister("_bucket_keys")
    return out["b"].to_numpy()


def _thresholds(splits: list[tuple[str, float]]) -> list[tuple[str, int]]:
    total = sum(w for _, w in splits)
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    acc, out = 0.0, []
    for name, w in splits:
        acc += w / total
        out.append((name, min(PRECISION, round(acc * PRECISION))))
    out[-1] = (out[-1][0], PRECISION)  # close the last interval exactly
    return out


def _assign_fn(
    batch: pa.Table, key_col: str, salt: str, cuts: list[tuple[str, int]], out_col: str
) -> pa.Table:
    _check_key_col(batch.column(key_col), key_col)
    b = _buckets(batch.column(key_col), salt)
    # cuts are ascending cumulative thresholds; the first (name, hi) with
    # v < hi is searchsorted(his, v, side="right") — one numpy kernel plus a
    # small-array take instead of a rows×splits Python loop
    his = np.array([hi for _, hi in cuts], dtype=np.int64)
    idx = np.searchsorted(his, b, side="right")
    names = pc.take(
        pa.array([name for name, _ in cuts], pa.string()),
        pa.array(idx, pa.int64()),
    )
    return batch.append_column(out_col, names)


def hash_split(
    ds: "ray.data.Dataset",
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
    out_col: str = "split",
) -> "ray.data.Dataset":
    """Annotate every row with a deterministic split name (e.g.
    [("train", 0.8), ("val", 0.1), ("test", 0.1)]). Weights are normalized;
    interval edges are exact integer bucket cuts so engine and oracle agree
    row-for-row. Pure map; consume with a filter per split or write
    partitioned by ``out_col``."""
    cuts = _thresholds(splits)
    return ds.map_batches(
        _assign_fn,
        fn_kwargs={"key_col": key_col, "salt": salt, "cuts": cuts, "out_col": out_col},
        batch_format="pyarrow",
    )


def _sample_fn(batch: pa.Table, key_col: str, salt: str, cut: int) -> pa.Table:
    _check_key_col(batch.column(key_col), key_col)
    b = _buckets(batch.column(key_col), salt)
    return batch.filter(pa.array(b < cut))


def deterministic_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    rate: float,
    salt: str = "sample",
) -> "ray.data.Dataset":
    """Keep a deterministic ~``rate`` fraction of keys (all rows of a kept
    key survive together). Streaming filter; no RNG, no shuffle."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    cut = round(rate * PRECISION)
    return ds.map_batches(
        _sample_fn,
        fn_kwargs={"key_col": key_col, "salt": salt, "cut": cut},
        batch_format="pyarrow",
    )


def stratified_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling (e.g. keep 100% of rare classes,
    1% of the head class). ``rates`` maps stratum value → keep rate; strata
    absent from the map use ``default_rate``. The rate table is a constant
    captured in the task closure (class-count-bounded, not data-bounded)."""
    strata_vals = list(rates.keys())
    # per-row cut via index_in against the (class-count-bounded) rate table:
    # absent strata map to the appended default slot — no per-row dict.get
    cut_table = np.array(
        [round(rates[s] * PRECISION) for s in strata_vals]
        + [round(default_rate * PRECISION)],
        dtype=np.int64,
    )
    value_set = pa.array(strata_vals)
    dflt_slot = len(strata_vals)

    def fn(batch: pa.Table) -> pa.Table:
        _check_key_col(batch.column(key_col), key_col)
        b = _buckets(batch.column(key_col), salt)
        inv = pc.fill_null(
            pc.index_in(batch.column(stratum_col), value_set=value_set), dflt_slot
        )
        row_cuts = cut_table[inv.to_numpy(zero_copy_only=False).astype(np.int64)]
        return batch.filter(pa.array(b < row_cuts))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_counts(
    ds: "ray.data.Dataset",
    key_col: str,
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> "ray.data.Dataset":
    """(split, n_rows, n_keys) summary of a hash_split assignment — the
    verification rollup (key counts are distinct via fastagg, no driver set)."""
    from .fastagg import sorted_grouped_agg

    assigned = hash_split(ds, key_col, splits, salt=salt)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["split", key_col])

    # distinct (split, key) pairs first, then per-split counts — both
    # group-count-proportional, both Arrow-native
    pairs = sorted_grouped_agg(
        assigned.map_batches(project, batch_format="pyarrow"),
        ["split", key_col],
        [(key_col, "count")],
        out_names=["n_rows_key"],
    )
    return sorted_grouped_agg(
        pairs,
        ["split"],
        [("n_rows_key", "sum"), ("n_rows_key", "count")],
        out_names=["n_rows", "n_keys"],
    )


def group_cap(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    key_col: str,
    cap: int,
    salt: str = "cap",
) -> "ray.data.Dataset":
    """Per-group row cap — keep at most ``cap`` rows per group, selected by a
    DETERMINISTIC md5 priority over ``key_col`` (ties broken by the key
    itself). The standard training-corpus "at most K documents per domain"
    operator: capping the head domains of a crawl so no single site dominates
    the mixture, while the selection is reproducible at any parallelism.

    Priority is the same ``md5(salt || ':' || key) % PRECISION`` bucket as
    ``hash_split`` (exact DuckDB twin ``oracle_rel.sql_doc_group_cap``), so
    which rows survive is a pure function of (salt, key) — re-runs, resumes
    and re-partitions all keep the same rows. Selection rides
    ``relational.top_k_per_group`` (global range-partitioned sort + split
    numbering): no group is ever materialized in one task, so a hot domain
    holding billions of rows streams through like any other — the scale
    shape a per-group ``map_groups`` head() would not have.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from .relational import top_k_per_group

    def annotate(batch: pa.Table) -> pa.Table:
        _check_key_col(batch.column(key_col), key_col)
        b = _buckets(batch.column(key_col), salt)
        return batch.append_column("_prio", pa.array(b, pa.int64()))

    kept = top_k_per_group(
        ds.map_batches(annotate, batch_format="pyarrow"),
        group_cols,
        [("_prio", True), (key_col, True)],
        cap,
        rank_col=None,
    )
    return kept.map_batches(
        lambda t: t.drop_columns(["_prio"]), batch_format="pyarrow"
    )


def mixture_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    target_shares: dict[str, float],
    salt: str = "mix",
) -> "ray.data.Dataset":
    """Domain-mixture resampling: downsample each stratum so the OUTPUT
    mixture is proportional to ``target_shares`` — the corpus-reweighting
    operator ("40% web, 20% code, …") of a training-data pipeline. Never
    upsamples: the largest achievable output T = min_s(n_s / w_s) is used,
    so the binding stratum keeps 100% of its rows and every other stratum
    keeps rate_s = (w_s · T) / n_s. Shares are relative weights (scale-
    invariant); strata absent from ``target_shares`` are dropped.

    Phase 1 counts rows per stratum (stratum-cardinality-bounded fastagg →
    driver — domains, not rows); phase 2 is the same streaming md5-bucket
    filter as ``stratified_sample``. Keep-cuts are computed as
    floor(rate · PRECISION) with the EXACT float-op order of the DuckDB twin
    (``oracle_rel.sql_doc_mixture_sample``): (w·T)/n are IEEE-identical
    doubles on both sides, so engine and oracle keep row-identical sets.
    ``ds`` is consumed twice (count pass + filter pass); at scale the count
    pass reads only ``stratum_col`` — re-reading beats materializing.
    """
    from .fastagg import sorted_grouped_agg

    counts_rows = sorted_grouped_agg(
        ds.select_columns([stratum_col]),
        [stratum_col],
        [(stratum_col, "count")],
        out_names=["n"],
    ).take_all()
    n_by = {r[stratum_col]: int(r["n"]) for r in counts_rows}
    obs = [s for s, w in target_shares.items() if w > 0 and n_by.get(s)]
    if not obs:
        raise ValueError("no stratum with positive target share has any rows")
    T = min(n_by[s] / target_shares[s] for s in obs)
    cut_list = [
        int(np.floor(target_shares[s] * T / n_by[s] * PRECISION)) for s in obs
    ]
    cut_table = np.array(cut_list + [0], dtype=np.int64)  # absent strata drop
    value_set = pa.array(obs)
    dflt_slot = len(obs)

    def fn(batch: pa.Table) -> pa.Table:
        _check_key_col(batch.column(key_col), key_col)
        b = _buckets(batch.column(key_col), salt)
        inv = pc.fill_null(
            pc.index_in(batch.column(stratum_col), value_set=value_set), dflt_slot
        )
        row_cuts = cut_table[inv.to_numpy(zero_copy_only=False).astype(np.int64)]
        return batch.filter(pa.array(b < row_cuts))

    return ds.map_batches(fn, batch_format="pyarrow")


def _hash60_py(keys, salt: str) -> np.ndarray:
    """Python twin of ``_hash60`` (first 15 md5 hex nibbles = top 60 bits)."""
    md5 = hashlib.md5
    pre = (salt + ":").encode("utf-8")
    return np.fromiter(
        (
            int.from_bytes(md5(pre + str(k).encode("utf-8")).digest()[:8], "big") >> 4
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def _hash60(col: "pa.ChunkedArray | pa.Array", salt: str) -> np.ndarray:
    """60-bit md5 key hash — the high-dispersion sibling of ``_buckets`` for
    ORDERING (a 20-bit bucket is fine for rate cuts but would leave ~N/2²⁰
    same-bucket runs ordered by raw key in a shuffle). Same embedded-DuckDB
    vectorization; twin expression: ('0x' || substr(md5(salt||':'||k), 1,
    15))::UBIGINT — 15 hex chars = 60 bits, always positive in int64."""
    try:
        import duckdb
    except ImportError:  # pragma: no cover - duckdb is baked into this env
        return _hash60_py(col.to_pylist(), salt)
    from ..state.broadcast import state_key, task_state

    con = task_state(state_key("sampling_duckdb"), duckdb.connect)
    con.execute("SET threads=1")
    tbl = pa.table({"k": col})
    con.register("_h60_keys", tbl)
    esc = salt.replace("'", "''")
    out = con.execute(
        f"SELECT ('0x' || substr(md5('{esc}:' || k), 1, 15))::UBIGINT::BIGINT"
        " AS h FROM _h60_keys"
    ).arrow()
    con.unregister("_h60_keys")
    return out["h"].to_numpy()


def shuffle_positions(
    ds: "ray.data.Dataset",
    key_col: str,
    salt: str = "shuffle",
    pos_col: str = "shuffle_pos",
) -> "ray.data.Dataset":
    """Deterministic global training-order shuffle: every row gets a 0-based
    position that is a pure function of (salt, key set) — the reproducible
    replacement for ``random_shuffle`` when an epoch's example order must be
    re-derivable on any cluster at any parallelism (resume mid-epoch, audit
    which examples a step saw, bisect a loss spike to its data window).

    Position = rank of the row's 60-bit md5 hash (ties broken by the unique
    key), assigned by one distributed range-partitioned sort + the
    order-preserving split numbering of ``canonicalize.zip_with_index`` — no
    driver state, no RNG. Epochs = different salts. The DuckDB twin is
    ``row_number() OVER (ORDER BY hash, key) - 1``.
    """

    def annotate(batch: pa.Table) -> pa.Table:
        _check_key_col(batch.column(key_col), key_col)
        h = _hash60(batch.column(key_col), salt)
        return batch.append_column("_h60", pa.array(h, pa.int64()))

    from .canonicalize import zip_with_index

    out = zip_with_index(
        ds.map_batches(annotate, batch_format="pyarrow").sort(["_h60", key_col]),
        col=pos_col,
    )
    return out.map_batches(lambda t: t.drop_columns(["_h60"]), batch_format="pyarrow")


def distinct_kmv(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> "ray.data.Dataset":
    """Per-group approximate COUNT(DISTINCT value) via a KMV (k-minimum-
    values) sketch — the classic mergeable distinct-count sketch: hash every
    value uniformly into [0, 2⁶⁰), keep the ``k`` smallest distinct hashes
    per group; if the group retains a full ``k``, the k-th smallest hash h₍ₖ₎
    estimates density and distinct ≈ (k−1)·2⁶⁰/h₍ₖ₎ [Bar-Yossef et al. 2002];
    groups with fewer than ``k`` distinct hashes report their EXACT count.
    Emits (keys…, n_kept, distinct_est).

    Determinism / oracle parity: the hash is the md5-derived ``_hash60``
    (same embedded-DuckDB kernel as the split operators), so a DuckDB twin
    computes the IDENTICAL sketch — the estimate itself is oracle-checked
    bit-for-bit, not just "close to truth" (accuracy vs true distinct is
    pytest-checked separately).

    Scale shape: min-k is a semilattice, so per-batch pruning to k rows per
    group bounds the exchange at k·groups·blocks rows regardless of input
    size; the global k-smallest then rides ``sorted_distinct`` (cross-batch
    duplicate hashes collapse) + hot-key-safe ``ranked_over`` — no group ever
    occupies one task, no full value set is ever collected anywhere.
    """
    import pandas as pd

    from ..arrow_util import pa_from_pandas
    from .fastagg import sorted_distinct, sorted_grouped_agg
    from .relational import ranked_over

    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(kk, pa.string()) for kk in keys] + [("_h", pa.int64())]
            ).empty_table()
        h = _hash60(t.column(value_col), salt)
        frame = pd.DataFrame({kk: t.column(kk).to_pandas() for kk in keys})
        frame["_h"] = h
        frame = frame.drop_duplicates().sort_values(
            keys + ["_h"], kind="mergesort"
        )
        pos = frame.groupby(keys, sort=False).cumcount().to_numpy()
        return pa_from_pandas(frame[pos < k])

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    dist = sorted_distinct(pruned, keys + ["_h"])
    ranked = ranked_over(dist, keys, [("_h", True)], rank_col="_rn")
    kept = ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("_rn"), k)).drop_columns(
            ["_rn"]
        ),
        batch_format="pyarrow",
    )
    agg = sorted_grouped_agg(
        kept, keys, [("_h", "count"), ("_h", "max")], out_names=["n_kept", "kth"]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(kk, pa.string()) for kk in keys]
                + [("n_kept", pa.int64()), ("distinct_est", pa.int64())]
            ).empty_table()
        n_kept = t.column("n_kept").to_numpy(zero_copy_only=False)
        kth = t.column("kth").to_numpy(zero_copy_only=False).astype(np.float64)
        # ((k-1)·2⁶⁰)/h₍ₖ₎ with the same float-op order as the SQL twin
        est = np.where(
            n_kept >= k,
            np.floor(((float(k) - 1.0) * 1152921504606846976.0) / kth),
            n_kept.astype(np.float64),
        ).astype(np.int64)
        return t.drop_columns(["kth"]).append_column(
            "distinct_est", pa.array(est, pa.int64())
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def distinct_hll(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    salt: str = "hll",
) -> "ray.data.Dataset":
    """Per-group approximate COUNT(DISTINCT value) via a HyperLogLog sketch
    with m = 64 registers [Flajolet et al. 2007] — the constant-size
    complement to ``distinct_kmv``: a KMV sketch costs k rows per group in
    the exchange, HLL costs ≤ 64 regardless of k-vs-accuracy tuning, and
    register-max is the textbook mergeable semilattice. Emits
    (keys…, n_set_regs, hll_est).

    Hash layout (twin: ``oracle_rel.sql_event_user_hll``): the md5-derived
    60-bit ``_hash60`` splits into register = top 6 bits (h >> 54) and a
    50-bit tail (h & 2⁵⁰−1; the middle 4 bits are discarded so the tail is
    exactly representable in a double). rank = leading zeros of the tail
    + 1 = 51 − bit_length(tail), 51 when the tail is all zeros. The engine
    gets bit_length from ``np.frexp`` (exact for ints < 2⁵³); the twin gets
    it from a max-k join against a 50-row powers-of-two VALUES table —
    both exact integer semantics, so the SKETCH matches bit-for-bit and
    the estimate is oracle-checked for identity (accuracy vs true distinct
    is pytest-checked separately).

    Estimator, mirrored double op order both engines: Σ2^(−M[j]) scaled by
    2⁵¹ stays integer (Σ 2^(51−rank) + zeros·2⁵¹ ≤ 64·2⁵¹ < 2⁶³);
    raw = floor(α₆₄·m²·2⁵¹ / S) with α₆₄ = 0.709; linear-counting
    correction floor(m·ln(m/zeros)) when raw ≤ 2.5m and zeros > 0 (the
    small-range regime where HLL registers are mostly empty). No 32-bit
    large-range correction — the hash space is 60-bit.

    Scale shape: per-batch (keys, reg, rank) max-combine → one fastagg max
    at groups×64 cardinality → one group-cardinality fastagg. Pure
    streaming; a group with 10¹² values still exchanges ≤ 64 rows."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    REG = pa.schema(
        [(kk, typ[kk]) for kk in keys]
        + [("_reg", pa.int64()), ("_rank", pa.int64())]
    )
    TAIL_BITS = 50
    TAIL_MASK = (1 << TAIL_BITS) - 1

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return REG.empty_table()
        h = _hash60(t.column(value_col), salt)
        reg = h >> 54
        tail = h & TAIL_MASK
        # bit_length via frexp: exact for 0 < tail < 2^53
        bl = np.frexp(tail.astype(np.float64))[1]  # 0 for tail == 0
        rank = np.where(tail > 0, TAIL_BITS + 1 - bl, TAIL_BITS + 1)
        g = pa.Table.from_arrays(
            [t.column(kk) for kk in keys]
            + [pa.array(reg, pa.int64()), pa.array(rank, pa.int64())],
            schema=REG,
        )
        # in-batch max-combine: bounds emitted rows at groups×64 per batch
        agg = g.group_by(keys + ["_reg"]).aggregate([("_rank", "max")])
        return agg.rename_columns(keys + ["_reg", "_rank"])

    rmax = sorted_grouped_agg(
        drop_empty_blocks(
            ds.select_columns(keys + [value_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            REG,
        ),
        keys + ["_reg"],
        [("_rank", "max")],
        out_names=["_rank"],
    )
    MID = pa.schema(
        [(kk, typ[kk]) for kk in keys]
        + [("_one", pa.int64()), ("_s", pa.int64())]
    )

    def scaled(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        r = t.column("_rank").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(kk) for kk in keys]
            + [
                pa.array(np.ones(t.num_rows, np.int64)),
                pa.array(
                    np.left_shift(np.int64(1), TAIL_BITS + 1 - r), pa.int64()
                ),
            ],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(rmax.map_batches(scaled, batch_format="pyarrow"), MID),
        keys,
        [("_one", "sum"), ("_s", "sum")],
        out_names=["n_set_regs", "_s"],
    )
    OUT = pa.schema(
        [(kk, typ[kk]) for kk in keys]
        + [("n_set_regs", pa.int64()), ("hll_est", pa.int64())]
    )
    M = 64
    SCALE = np.float64(1 << (TAIL_BITS + 1))  # 2^51

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n_set = t.column("n_set_regs").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = t.column("_s").to_numpy(zero_copy_only=False).astype(np.int64)
        zeros = M - n_set
        stot = (s + zeros * (1 << (TAIL_BITS + 1))).astype(np.float64)
        raw = np.floor(
            (np.float64(0.709) * np.float64(M) * np.float64(M) * SCALE) / stot
        )
        small = (raw <= np.float64(2.5) * np.float64(M)) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = np.floor(
                np.float64(M) * np.log(np.float64(M) / np.maximum(zeros, 1))
            )
        est = np.where(small, lin, raw).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column(kk) for kk in keys]
            + [t.column("n_set_regs"), pa.array(est, pa.int64())],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finish, batch_format="pyarrow"), OUT)


def cms_estimate(
    ds: "ray.data.Dataset",
    value_col: str,
    k: int = 20,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> "ray.data.Dataset":
    """Count-Min-Sketch frequency audit [Cormode & Muthukrishnan 2005] —
    builds a ``depth``×``width`` CMS over the values of ``value_col`` and
    reports, for the top-``k`` TRUE values, ``(value, true_n, cms_est)``
    ordered by (true_n DESC, value): the sketch's one-sided error
    (cms_est ≥ true_n always; the gap is the collision mass) measured
    against exact truth. The third sketch family beside KMV and HLL —
    point-frequency queries in O(depth·width) memory; run this audit at a
    sample scale to size width before trusting the sketch at corpus scale.

    Hashes are the md5-derived ``_hash60`` with per-row salts
    ``{salt}{r}`` mod ``width`` — the DuckDB twin computes the identical
    cells, so the estimates match bit-for-bit.

    Scale shape: exact counts via ONE value-cardinality fastagg; the CMS
    cells build FROM that aggregate (depth stateless maps + one
    depth·width-cell fastagg — equivalent to hashing raw rows, cheaper);
    the finished cell table is ≤ depth·width rows (a constant) and rides
    the driver once; top-k truth via global sort-limit."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    typ = dict(zip(ds.schema().names, ds.schema().types))
    vt = typ[value_col]
    CNT = pa.schema([(value_col, vt), ("n", pa.int64())])
    cnt = sorted_grouped_agg(
        ds.select_columns([value_col]),
        [value_col],
        [(value_col, "count")],
        out_names=["n"],
    ).materialize()  # consumed by the cell build AND the top-k

    CELL = pa.schema(
        [("_row", pa.int64()), ("_cell", pa.int64()), ("_n", pa.int64())]
    )

    def cells_r(r: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return CELL.empty_table()
            h = _hash60(t.column(value_col), f"{salt}{r}") % width
            return pa.Table.from_arrays(
                [
                    pa.array(np.full(t.num_rows, r, np.int64)),
                    pa.array(h, pa.int64()),
                    pc.cast(t.column("n"), pa.int64()),
                ],
                schema=CELL,
            )

        return fn

    parts = cnt.map_batches(cells_r(0), batch_format="pyarrow")
    for r in range(1, depth):
        parts = parts.union(cnt.map_batches(cells_r(r), batch_format="pyarrow"))
    cells = sorted_grouped_agg(
        drop_empty_blocks(parts, CELL),
        ["_row", "_cell"],
        [("_n", "sum")],
        out_names=["_n"],
    ).take_all()  # ≤ depth·width rows — constant-size sketch by definition
    table = np.zeros((depth, width), dtype=np.int64)
    for row in cells:
        table[int(row["_row"]), int(row["_cell"])] = int(row["_n"])

    topk = cnt.sort(["n", value_col], descending=[True, False]).limit(k)
    OUT = pa.schema([(value_col, vt), ("true_n", pa.int64()), ("cms_est", pa.int64())])

    def estimate(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        est = np.full(t.num_rows, np.iinfo(np.int64).max, np.int64)
        for r in range(depth):
            h = _hash60(t.column(value_col), f"{salt}{r}") % width
            est = np.minimum(est, table[r, h])
        return pa.Table.from_arrays(
            [t.column(value_col), pc.cast(t.column("n"), pa.int64()),
             pa.array(est, pa.int64())],
            schema=OUT,
        )

    return topk.map_batches(estimate, batch_format="pyarrow")


def importance_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    weight_ppm_col: str,
    salt: str = "imp",
) -> "ray.data.Dataset":
    """Deterministic importance-weighted sampling: keep a row iff its md5
    bucket < the row's OWN acceptance threshold ``weight_ppm_col`` (integer
    parts-per-PRECISION in [0, 1e6]) — quality-weighted corpus subsampling
    where high-scoring documents survive at a higher rate, with zero RNG and
    the usual key-stability guarantee (same key + same weight ⇒ same
    verdict at any parallelism). The caller computes the weight column with
    INTEGER math so the DuckDB twin is exact; a float weight would need the
    PRECISION-quantize-first treatment.

    Pure streaming filter — no shuffle, no driver state; the md5 bucket is
    the same embedded-DuckDB vectorized kernel as the split operators."""

    def flt(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        _check_key_col(batch.column(key_col), key_col)
        b = _buckets(batch.column(key_col), salt)
        w = batch.column(weight_ppm_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return batch.filter(pa.array(b < w))

    return ds.map_batches(flt, batch_format="pyarrow")


def split_target_ppm(splits: list[tuple[str, float]]) -> dict[str, int]:
    """Normalized split weights as integer ppm (floor) — computed ONCE in
    Python and inlined as literals into the SQL twin, so engine and oracle
    share the identical quantization with zero in-database float ops."""
    total = float(sum(w for _, w in splits))
    return {name: int((w / total) * 1_000_000) for name, w in splits}


def split_balance_audit(
    ds: "ray.data.Dataset",
    key_col: str,
    strata_cols: list[str],
    splits: list[tuple[str, float]],
    salt: str = "split",
) -> "ray.data.Dataset":
    """Training-data QA: does every stratum (e.g. language, source) hit its
    target share in every split? Emits one row per (stratum, split):
    ``strata + (split, n, stratum_total, share_ppm, target_ppm, dev_ppm)``
    where ``share_ppm = n·10⁶ // stratum_total`` and ``dev_ppm`` is the
    signed deviation from the split's normalized target — the audit that
    catches a rare language landing 100% in train by hash accident, which
    the aggregate split counts (``order_split_counts``) cannot see.

    Scale shape: one streaming ``hash_split`` annotate over the minimum
    column set, ONE (strata × split)-cardinality fastagg, a second fastagg
    over that tiny result for stratum totals, one tiny hash join — the raw
    corpus flows exactly once. Deterministic: md5 buckets, integer
    arithmetic throughout (targets pre-quantized by ``split_target_ppm``)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .joins import hash_join

    ann = hash_split(
        ds.select_columns([key_col] + strata_cols), key_col, splits, salt=salt
    )

    ONE = pa.schema(
        [(c, pa.string()) for c in strata_cols]
        + [("split", pa.string()), ("_one", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return ONE.empty_table()
        return pa.Table.from_arrays(
            [t.column(c) for c in strata_cols]
            + [
                t.column("split"),
                pa.array(np.ones(t.num_rows, dtype=np.int64)),
            ],
            schema=ONE,
        )

    counts = sorted_grouped_agg(
        ann.map_batches(prep, batch_format="pyarrow"),
        strata_cols + ["split"],
        [("_one", "sum")],
        out_names=["n"],
    )
    CNT = pa.schema(
        [(c, pa.string()) for c in strata_cols]
        + [("split", pa.string()), ("n", pa.int64())]
    )
    counts = drop_empty_blocks(counts, CNT).materialize()
    totals = sorted_grouped_agg(
        counts, strata_cols, [("n", "sum")], out_names=["stratum_total"]
    )
    TOT = pa.schema(
        [(c, pa.string()) for c in strata_cols] + [("stratum_total", pa.int64())]
    )
    j = hash_join(counts, drop_empty_blocks(totals, TOT), on=tuple(strata_cols))

    targets = split_target_ppm(splits)
    OUT = pa.schema(
        [(c, pa.string()) for c in strata_cols]
        + [
            ("split", pa.string()),
            ("n", pa.int64()),
            ("stratum_total", pa.int64()),
            ("share_ppm", pa.int64()),
            ("target_ppm", pa.int64()),
            ("dev_ppm", pa.int64()),
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t.column("stratum_total").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        share = (n * 1_000_000) // np.maximum(tot, 1)
        tgt = np.array(
            [targets[s] for s in t.column("split").to_pylist()], dtype=np.int64
        )
        return pa.Table.from_arrays(
            [t.column(c) for c in strata_cols]
            + [
                t.column("split"),
                pa.array(n, pa.int64()),
                pa.array(tot, pa.int64()),
                pa.array(share, pa.int64()),
                pa.array(tgt, pa.int64()),
                pa.array(share - tgt, pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(j.map_batches(score, batch_format="pyarrow"), OUT)


def group_sample_k(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    k: int = 10,
    salt: str = "evalsample",
) -> "ray.data.Dataset":
    """Deterministic per-group sample: the ``k`` rows with the smallest
    (md5-hash, id) per group — the zero-RNG reservoir replacement for
    carving fixed-size per-source eval sets (key-stable: a group's sample
    only changes where membership changes, never with partitioning or
    arrival order).

    Scale shape: one ``_hash60`` per row (embedded-DuckDB vectorized), then
    the hot-key-safe global-sort ``ranked_over`` — a group with 10⁹ rows
    never lands in one task. Twin: row_number() over the identical md5
    expression."""
    import pyarrow.compute as pc

    from .fastagg import drop_empty_blocks
    from .relational import ranked_over

    def with_hash(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        h = _hash60(t.column(id_col), salt)
        return t.append_column("_h", pa.array(h, pa.int64()))

    hashed = drop_empty_blocks(ds.map_batches(with_hash, batch_format="pyarrow"))
    ranked = ranked_over(
        hashed, [group_col], [("_h", True), (id_col, True)], rank_col="_rk"
    )
    return ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("_rk"), k)).drop_columns(
            ["_rk", "_h"]
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
