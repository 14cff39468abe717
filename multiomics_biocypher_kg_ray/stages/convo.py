"""Conversation-level rollups over raw transcript turns — the payload-native
QA family a transcript corpus needs BEFORE extraction: role/tool composition
per conversation, repeated-turn template detection (agent-loop spam), and
tool-call sequence mining.

Reference analog: the per-source row-count / composition audits the reference
runs before adapter ingestion (``multiomics_kg/gene_id_utils.py`` count
reports, CLAUDE.md:429 table) — re-expressed over conversation turns.

Scale notes: every operator here is per-batch Arrow combiners + one fastagg
merge (conversation- or template-cardinality groups); the only string build
is ``tool_sequences``' ordered collect, which rides the segmented
``sorted_collect`` (no whole-group tasks, hot conversations stitch via
block-bounded partials).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def conv_role_stats(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per conversation: (conv_id, n_turns, n_user, n_tool, n_chars) — the
    composition audit (who talks, how often tools fire, how much text) that
    catches malformed conversations before they reach extraction."""
    from .fastagg import sorted_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("_n", pa.int64()),
                    ("_u", pa.int64()),
                    ("_t", pa.int64()),
                    ("_c", pa.int64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "_n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "_u": pc.cast(
                    pc.equal(t.column("role"), "user"), pa.int64()
                ),
                "_t": pc.cast(
                    pc.not_equal(pc.fill_null(t.column("tool"), ""), ""),
                    pa.int64(),
                ),
                "_c": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
            }
        )

    return sorted_grouped_agg(
        transcripts.map_batches(partial, batch_format="pyarrow"),
        ["conv_id"],
        [("_n", "sum"), ("_u", "sum"), ("_t", "sum"), ("_c", "sum")],
        out_names=["n_turns", "n_user", "n_tool", "n_chars"],
    )


def turn_templates(
    transcripts: "ray.data.Dataset", min_convs: int = 2, k: int = 50
) -> "ray.data.Dataset":
    """Repeated-turn templates: turn texts appearing in ≥ ``min_convs``
    DISTINCT conversations, top-``k`` by total occurrences — the agent-loop /
    boilerplate detector (a stuck agent repeats the same turn across runs;
    a system banner repeats across every conversation). Emits
    (text, n_convs, n_turns).

    Scale shape: per-batch (text, conv) count partials → ONE fastagg on
    (text, conv) → ONE fastagg on text computing both n_convs (row count)
    and n_turns (sum) — no count-distinct shuffle, no join."""
    from .fastagg import sorted_grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("text", pa.string()),
                    ("conv_id", pa.string()),
                    ("_c", pa.int64()),
                ]
            ).empty_table()
        g = t.group_by(["text", "conv_id"]).aggregate([("text", "count")])
        return g.rename_columns(["text", "conv_id", "_c"])

    pair = sorted_grouped_agg(
        transcripts.map_batches(partial, batch_format="pyarrow"),
        ["text", "conv_id"],
        [("_c", "sum")],
        out_names=["_c"],
    )

    def as_counts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("text", pa.string()), ("_one", pa.int64()), ("_c", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "text": t.column("text"),
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "_c": t.column("_c"),
            }
        )

    agg = sorted_grouped_agg(
        pair.map_batches(as_counts, batch_format="pyarrow"),
        ["text"],
        [("_one", "sum"), ("_c", "sum")],
        out_names=["n_convs", "n_turns"],
    )
    flt = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_convs"), min_convs))
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
    return flt.sort(["n_turns", "text"], descending=[True, False]).limit(k)


def tool_sequences(
    transcripts: "ray.data.Dataset", k: int = 20
) -> "ray.data.Dataset":
    """Tool-call pattern mining: each conversation's ordered sequence of
    non-empty ``tool`` values joined with ',', then the top-``k`` sequences
    by conversation count — (seq, n_convs). The workflow-shape census of an
    agent-transcript corpus.

    Scale shape: the ordered per-conv collect rides ``sorted_collect``
    (segmented, hot-conv safe); sequence counting is template-cardinality
    fastagg; only top-``k`` rows leave the sort."""
    from .fastagg import sorted_grouped_agg
    from .relational import sorted_collect

    calls = transcripts.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "tool"]).filter(
            pc.not_equal(pc.fill_null(t.column("tool"), ""), "")
        )
        if t.num_columns
        else t,
        batch_format="pyarrow",
    )
    seqs = sorted_collect(calls, ["conv_id"], "turn_idx", [("tool", "seq")], sep=",")

    def as_one(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [("seq", pa.string()), ("_one", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "seq": t.column("seq"),
                "_one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    counts = sorted_grouped_agg(
        seqs.map_batches(as_one, batch_format="pyarrow"),
        ["seq"],
        [("_one", "sum")],
        out_names=["n_convs"],
    )
    return counts.sort(["n_convs", "seq"], descending=[True, False]).limit(k)


def response_latency(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation assistant response latency: for every assistant turn
    that directly follows a user turn, latency = ts − previous turn's ts;
    emits ``(conv_id, n_responses, total_latency_us, min_latency_us,
    max_latency_us)`` — the turn-cadence audit an agent-transcript corpus
    needs before latency-sensitive curation (stalled tools, replayed logs,
    clock skew all surface here). Conversations with no user→assistant
    adjacency drop out (GROUP BY after filter, mirrored in the twin).

    Scale shape: ONE segmented lag scan (``window.lag_over``) over a packed
    int64 — ``ts_us·4 + role_code`` (role ∈ {user=0, assistant=1, other=2};
    ts_us < 2⁵¹ so the pack is lossless in int64) — recovers both the
    previous timestamp (``// 4``) and the previous role (``% 4``) from a
    single lag column, halving the scan cost vs two windows; then one
    conversation-cardinality fastagg. The twin lags ts and role separately —
    identical semantics because the pack is bijective."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import lag_over

    PACKED = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("role", pa.string()),
            ("packed", pa.int64()),
        ]
    )

    def pack(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PACKED.empty_table()
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        role = t.column("role")
        code = pc.if_else(
            pc.equal(role, "user"),
            pa.scalar(0, pa.int64()),
            pc.if_else(
                pc.equal(role, "assistant"),
                pa.scalar(1, pa.int64()),
                pa.scalar(2, pa.int64()),
            ),
        )
        packed = pc.add(pc.multiply(ts_us, pa.scalar(4, pa.int64())), code)
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pc.cast(t.column("turn_idx"), pa.int64()),
                role,
                packed,
            ],
            schema=PACKED,
        )

    lagged = lag_over(
        transcripts.map_batches(pack, batch_format="pyarrow"),
        "conv_id",
        ["turn_idx"],
        "packed",
        out_col="prev_packed",
    )

    LAT = pa.schema([("conv_id", pa.string()), ("latency_us", pa.int64())])

    def latency(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return LAT.empty_table()
        prev = t.column("prev_packed")
        keep = pc.and_kleene(
            pc.equal(t.column("role"), "assistant"),
            pc.equal(pc.subtract(prev, pc.multiply(
                pc.divide(prev, pa.scalar(4, pa.int64())), pa.scalar(4, pa.int64())
            )), pa.scalar(0, pa.int64())),
        )
        t2 = t.filter(pc.fill_null(keep, False))
        if t2.num_rows == 0:
            return LAT.empty_table()
        prev_ts = pc.divide(t2.column("prev_packed"), pa.scalar(4, pa.int64()))
        cur_ts = pc.divide(t2.column("packed"), pa.scalar(4, pa.int64()))
        return pa.Table.from_arrays(
            [t2.column("conv_id"), pc.subtract(cur_ts, prev_ts)], schema=LAT
        )

    lat = drop_empty_blocks(
        lagged.map_batches(latency, batch_format="pyarrow"), LAT
    )
    return sorted_grouped_agg(
        lat,
        ["conv_id"],
        [
            ("latency_us", "count"),
            ("latency_us", "sum"),
            ("latency_us", "min"),
            ("latency_us", "max"),
        ],
        out_names=[
            "n_responses",
            "total_latency_us",
            "min_latency_us",
            "max_latency_us",
        ],
    )


def turn_taking(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Turn-taking dynamics per conversation: over adjacent turn pairs
    (ordered by ``turn_idx``), emits ``(conv_id, n_pairs, n_switches,
    switch_ppm, sum_abs_len_delta)`` — how often the speaker role changes
    hands (switch_ppm = n_switches·10⁶ // n_pairs) and how much turn
    length swings between neighbors (Σ |len(text) − len(prev text)|).
    The dialogue-structure audit run before turn-pair construction:
    monologue runs (agent loops, pasted logs) show low switch rates, and
    erratic length deltas flag truncation or concatenated records.

    Reference analog: the per-conversation composition audits of
    ``conv_role_stats`` extended to ORDERED structure (reference
    ``multiomics_kg/gene_id_utils.py`` count reports have no ordered
    analog — this is the transcript-native addition).

    Scale shape: ONE segmented lag scan (``window.lag_over``) over a packed
    int64 — ``char_len·4 + role_code`` (role ∈ {user=0, assistant=1,
    other=2}; len < 2⁵¹ so the pack is lossless) — recovers the previous
    turn's role (``% 4``) and length (``// 4``) from a single lag column;
    then one conversation-cardinality fastagg. The DuckDB twin lags role
    and length separately — identical semantics, the pack is bijective."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    from .window import lag_over

    PACKED = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("packed", pa.int64()),
        ]
    )
    FOUR = pa.scalar(4, pa.int64())

    def pack(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PACKED.empty_table()
        role = t.column("role")
        code = pc.if_else(
            pc.equal(role, "user"),
            pa.scalar(0, pa.int64()),
            pc.if_else(
                pc.equal(role, "assistant"),
                pa.scalar(1, pa.int64()),
                pa.scalar(2, pa.int64()),
            ),
        )
        ln = pc.cast(pc.utf8_length(pc.fill_null(t.column("text"), "")), pa.int64())
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pc.cast(t.column("turn_idx"), pa.int64()),
                pc.add(pc.multiply(ln, FOUR), code),
            ],
            schema=PACKED,
        )

    lagged = lag_over(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
        .map_batches(pack, batch_format="pyarrow"),
        "conv_id",
        ["turn_idx"],
        "packed",
        out_col="prev_packed",
    )

    PAIR = pa.schema(
        [("conv_id", pa.string()), ("_sw", pa.int64()), ("_dl", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PAIR.empty_table()
        t = t.filter(pc.is_valid(t.column("prev_packed")))
        if t.num_rows == 0:
            return PAIR.empty_table()
        cur, prev = t.column("packed"), t.column("prev_packed")
        # role = packed % 4, len = packed // 4 (both non-negative)
        cur_role = pc.subtract(cur, pc.multiply(pc.divide(cur, FOUR), FOUR))
        prev_role = pc.subtract(prev, pc.multiply(pc.divide(prev, FOUR), FOUR))
        sw = pc.cast(pc.not_equal(cur_role, prev_role), pa.int64())
        dl = pc.abs_checked(
            pc.subtract(pc.divide(cur, FOUR), pc.divide(prev, FOUR))
        )
        return pa.Table.from_arrays(
            [t.column("conv_id"), sw, dl], schema=PAIR
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(lagged.map_batches(pairs, batch_format="pyarrow"), PAIR),
        ["conv_id"],
        [("_sw", "count"), ("_sw", "sum"), ("_dl", "sum")],
        out_names=["n_pairs", "n_switches", "sum_abs_len_delta"],
    )
    OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_pairs", pa.int64()),
            ("n_switches", pa.int64()),
            ("switch_ppm", pa.int64()),
            ("sum_abs_len_delta", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        n = t.column("n_pairs").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("n_switches").to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = s * 1_000_000 // np.maximum(n, 1)
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                t.column("n_pairs"),
                t.column("n_switches"),
                pa.array(ppm, pa.int64()),
                t.column("sum_abs_len_delta"),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finalize, batch_format="pyarrow"), OUT)


def conv_echo_rate(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Lexical echo per conversation: of the DISTINCT whitespace terms the
    user utters, what fraction does the assistant also use —
    ``(conv_id, n_user_terms, n_echoed, echo_ppm)`` with echo_ppm =
    n_echoed·10⁶ // n_user_terms (pure integer; NULL when the user says
    nothing). The lexical-alignment / parroting screen run before turn
    text feeds extraction — high echo flags template loops, near-zero
    echo flags off-topic responses.

    Shape: tokens explode per (conv, role-flag) as a stateless vectorized
    list-flatten, collapse immediately to DISTINCT (conv, term) with max
    role indicators (one term-cardinality fastagg — never carries raw
    token duplicates past the first shuffle), then a conv-cardinality
    fastagg folds Σu and Σu·a. Same whitespace-split convention as the
    DuckDB twin's ``string_split(text, ' ')`` (no empty-token filtering —
    both engines see identical term sets)."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg

    TOK = pa.schema(
        [("conv_id", pa.string()), ("_term", pa.string()),
         ("_u", pa.int64()), ("_a", pa.int64())]
    )

    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return TOK.empty_table()
        toks = pc.split_pattern(pc.fill_null(t.column("text"), ""), " ")
        toks = toks.combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.chunk(0) if toks.num_chunks else pa.array([], pa.list_(pa.string()))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        idx = pa.array(parent)
        isu = pc.cast(pc.equal(t.column("role"), "user"), pa.int64())
        isa = pc.cast(pc.equal(t.column("role"), "assistant"), pa.int64())
        return pa.Table.from_arrays(
            [
                t.column("conv_id").take(idx),
                toks.flatten(),
                isu.take(idx),
                isa.take(idx),
            ],
            schema=TOK,
        )

    terms = sorted_grouped_agg(
        drop_empty_blocks(
            transcripts.select_columns(["conv_id", "role", "text"]).map_batches(
                explode, batch_format="pyarrow"
            ),
            TOK,
        ),
        ["conv_id", "_term"],
        [("_u", "max"), ("_a", "max")],
        out_names=["_u", "_a"],
    )
    MID = pa.schema(
        [("conv_id", pa.string()), ("_u", pa.int64()), ("_ua", pa.int64())]
    )

    def both(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        u = t.column("_u").to_numpy(zero_copy_only=False).astype(np.int64)
        a = t.column("_a").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [t.column("conv_id"), pa.array(u, pa.int64()), pa.array(u * a, pa.int64())],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(terms.map_batches(both, batch_format="pyarrow"), MID),
        ["conv_id"],
        [("_u", "sum"), ("_ua", "sum")],
        out_names=["n_user_terms", "n_echoed"],
    )
    OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_user_terms", pa.int64()),
            ("n_echoed", pa.int64()),
            ("echo_ppm", pa.int64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        u = t.column("n_user_terms").to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column("n_echoed").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = u > 0
        ppm = np.where(ok, e * 1_000_000 // np.maximum(u, 1), 0)
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pa.array(u, pa.int64()),
                pa.array(e, pa.int64()),
                pa.array(ppm.astype(np.int64), pa.int64(), mask=~ok),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(agg.map_batches(finalize, batch_format="pyarrow"), OUT)


def qa_pairs(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Instruction-pair extraction: every assistant turn directly preceded
    by a user turn becomes ``(conv_id, turn_idx, prompt, response,
    prompt_chars, response_chars)`` — THE supervised-pair constructor an
    instruction-tuning corpus is built from (reference analog: the
    extraction adapters turn raw rows into typed training units; here the
    unit is the dialogue pair itself). Pairs where the previous turn is
    not a user turn (tool output, assistant self-continuation) are
    excluded — the same strictness as ``response_latency``.

    Scale shape: one distributed hash join of the assistant stream against
    the user stream on (conv_id, prev_idx) — both sides row-proportional,
    text rides the join once, no per-conversation task ever sees a whole
    conversation."""
    from .fastagg import drop_empty_blocks
    from .joins import hash_join

    U = pa.schema([("conv_id", pa.string()), ("_pidx", pa.int64()),
                   ("prompt", pa.string())])
    A = pa.schema([("conv_id", pa.string()), ("_pidx", pa.int64()),
                   ("turn_idx", pa.int64()), ("response", pa.string())])

    def users(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return U.empty_table()
        t = t.filter(pc.equal(t.column("role"), "user"))
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pc.cast(t.column("turn_idx"), pa.int64()),
                pc.fill_null(t.column("text"), ""),
            ],
            schema=U,
        )

    def assts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return A.empty_table()
        t = t.filter(pc.equal(t.column("role"), "assistant"))
        idx = pc.cast(t.column("turn_idx"), pa.int64())
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pc.subtract(idx, pa.scalar(1, pa.int64())),
                idx,
                pc.fill_null(t.column("text"), ""),
            ],
            schema=A,
        )

    cols = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    joined = hash_join(
        drop_empty_blocks(cols.map_batches(assts, batch_format="pyarrow"), A),
        drop_empty_blocks(cols.map_batches(users, batch_format="pyarrow"), U),
        on=("conv_id", "_pidx"),
    )
    OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("prompt", pa.string()),
            ("response", pa.string()),
            ("prompt_chars", pa.int64()),
            ("response_chars", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return OUT.empty_table()
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                t.column("turn_idx"),
                t.column("prompt"),
                t.column("response"),
                pc.cast(pc.utf8_length(t.column("prompt")), pa.int64()),
                pc.cast(pc.utf8_length(t.column("response")), pa.int64()),
            ],
            schema=OUT,
        )

    return drop_empty_blocks(
        joined.map_batches(finish, batch_format="pyarrow"), OUT
    )


def tool_latency(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-TOOL call latency over agent transcripts: for every turn that
    carries a tool call, latency = next turn's ts − this turn's ts (the
    wall the conversation waited on that tool before anything else
    happened); emits ``(tool, n_calls, total_latency_us, max_latency_us)``.
    The tool-health leaderboard an agent-transcript pipeline curates
    against — a stalled retriever shows up here long before it shows up in
    loss curves. A conversation's final turn has no successor and drops
    out (mirrored in the twin).

    Scale shape: ONE segmented lead scan (``window.lead_over``) on ts per
    conversation in turn order, then one tool-cardinality fastagg."""
    from .fastagg import drop_empty_blocks, sorted_grouped_agg
    from .window import lead_over

    PREP = pa.schema(
        [
            ("conv_id", pa.string()),
            ("_ti", pa.int64()),
            ("tool", pa.string()),
            ("_ts_us", pa.int64()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return PREP.empty_table()
        return pa.Table.from_arrays(
            [
                t.column("conv_id"),
                pc.cast(t.column("turn_idx"), pa.int64()),
                pc.fill_null(t.column("tool"), ""),
                pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
            ],
            schema=PREP,
        )

    led = lead_over(
        drop_empty_blocks(
            transcripts.map_batches(prep, batch_format="pyarrow"), PREP
        ),
        "conv_id",
        ["_ti"],
        "_ts_us",
        out_col="_next_us",
    )
    MID = pa.schema(
        [("tool", pa.string()), ("_one", pa.int64()), ("_lat", pa.int64())]
    )

    def lat(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MID.empty_table()
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("_next_us")),
                pc.not_equal(t.column("tool"), ""),
            )
        )
        if t.num_rows == 0:
            return MID.empty_table()
        return pa.Table.from_arrays(
            [
                t.column("tool"),
                pa.array(np.ones(t.num_rows, np.int64)),
                pc.subtract(t.column("_next_us"), t.column("_ts_us")),
            ],
            schema=MID,
        )

    agg = sorted_grouped_agg(
        drop_empty_blocks(led.map_batches(lat, batch_format="pyarrow"), MID),
        ["tool"],
        [("_one", "sum"), ("_lat", "sum"), ("_lat", "max")],
        out_names=["n_calls", "total_latency_us", "max_latency_us"],
    )
    return agg
