"""Hierarchy / ontology-DAG operators (SURVEY §2.9).

Reference analogs, reimplemented:
- ``dag_closure`` — BFS-up ancestry closure including the seeds themselves
  (``multiomics_kg/utils/go_utils.py:207-253`` ``compute_ancestry_closure``).
- ``dag_levels`` — per-node (min_depth, max_depth, is_best_effort) from the
  roots, ``is_best_effort = min != max`` (``go_utils.py:255-290``
  ``compute_go_levels``).
- ``tree_prune`` — seed-based bidirectional prune of a dot-segment-coded
  tree: walk UP to the root and DOWN to all leaves from each seed; seeds
  absent from the curated hierarchy are remapped to their nearest ancestor
  by dot-segment truncation (J6), unresolvable seeds are reported, never
  silently dropped (``multiomics_kg/download/build_kegg_metabolism_xrefs.py:
  597-672`` ``_prune_tcdb`` / ``find_ancestor``).

Scale contract: hierarchies are 10²–10⁴ nodes (GO ~30K terms is the
largest), so closures are computed DRIVER-SIDE and broadcast; only the
entity→term edge fan-out is distributed (SURVEY §2.9 "→ Ray Data"). Every
function here is pure data-in/data-out so the result can be ``ray.put`` once
and probed inside ``map_batches`` — see ``relational.tree_rollup`` for the
distributed consumption pattern.
"""

from __future__ import annotations

from collections import defaultdict, deque

import pyarrow as pa


def dag_closure(parents: dict[str, list[str]], seeds: set[str] | None = None) -> pa.Table:
    """Ancestry closure: (node, ancestor) for every ancestor reachable via
    any parent edge, INCLUDING the node itself (go_utils closure contract).

    ``parents`` maps node → parent list (absent key = root). ``seeds``
    restricts the closure to nodes reachable upward from the seed set;
    default = all nodes."""
    nodes = set(parents)
    for ps in parents.values():
        nodes.update(ps)
    start = nodes if seeds is None else (set(seeds) & nodes)

    rows_node: list[str] = []
    rows_anc: list[str] = []
    memo: dict[str, frozenset[str]] = {}

    def up(n: str) -> frozenset[str]:
        got = memo.get(n)
        if got is not None:
            return got
        acc = {n}
        stack = [n]
        seen = {n}
        while stack:
            cur = stack.pop()
            for p in parents.get(cur, ()):  # cycle-safe via seen
                if p in nodes and p not in seen:
                    seen.add(p)
                    acc.add(p)
                    stack.append(p)
        memo[n] = frozenset(acc)
        return memo[n]

    for n in sorted(start):
        for a in sorted(up(n)):
            rows_node.append(n)
            rows_anc.append(a)
    return pa.table({"node": rows_node, "ancestor": rows_anc})


def dag_levels(parents: dict[str, list[str]]) -> pa.Table:
    """Per-node depth from the roots over a DAG:
    (node, min_depth, max_depth, is_best_effort) where is_best_effort marks
    nodes whose min and max root-path depths disagree (go_utils:255-290).

    min_depth: multi-source BFS from the roots. max_depth: longest-path DP
    over the DAG (iterative relaxation; terminates because the graph is a
    DAG — cyclic inputs raise). Orphans (unreachable from any root) are
    omitted, matching the reference's orphan side-list."""
    nodes = set(parents)
    children: dict[str, list[str]] = defaultdict(list)
    for c, ps in parents.items():
        for p in ps:
            nodes.add(p)
            children[p].append(c)
    roots = sorted(n for n in nodes if not parents.get(n))

    min_d: dict[str, int] = {r: 0 for r in roots}
    dq = deque(roots)
    while dq:
        cur = dq.popleft()
        for ch in children.get(cur, ()):  # BFS: first visit = min depth
            if ch not in min_d:
                min_d[ch] = min_d[cur] + 1
                dq.append(ch)

    # longest path: process in topological order (Kahn over reachable set)
    indeg = {n: 0 for n in min_d}
    for c in min_d:
        for p in parents.get(c, ()):
            if p in min_d:
                indeg[c] += 1
    max_d: dict[str, int] = {r: 0 for r in roots}
    dq = deque(n for n, d in indeg.items() if d == 0)
    processed = 0
    while dq:
        cur = dq.popleft()
        processed += 1
        for ch in children.get(cur, ()):
            if ch not in min_d:
                continue
            max_d[ch] = max(max_d.get(ch, 0), max_d.get(cur, 0) + 1)
            indeg[ch] -= 1
            if indeg[ch] == 0:
                dq.append(ch)
    if processed != len(min_d):
        raise ValueError("dag_levels: cycle detected among reachable nodes")

    ns = sorted(min_d)
    return pa.table(
        {
            "node": ns,
            "min_depth": pa.array([min_d[n] for n in ns], pa.int64()),
            "max_depth": pa.array([max_d[n] for n in ns], pa.int64()),
            "is_best_effort": pa.array([min_d[n] != max_d[n] for n in ns], pa.bool_()),
        }
    )


def find_ancestor(code: str, hierarchy: set[str]) -> str | None:
    """Nearest curated ancestor by dot-segment truncation:
    '3.A.1.35' → '3.A.1' → '3.A' → '3' — first hit wins; None if no prefix
    exists (build_kegg_metabolism_xrefs.py:648-672 semantics)."""
    parts = code.split(".")
    for n in range(len(parts) - 1, 0, -1):
        cand = ".".join(parts[:n])
        if cand in hierarchy:
            return cand
    return None


def tree_prune(
    hierarchy: set[str], seeds: "list[str] | set[str]"
) -> tuple[set[str], dict[str, str]]:
    """Bidirectional prune of a dot-segment-coded tree from data seeds.

    For each seed: walk UP (all dot-prefixes that exist) and DOWN (all
    hierarchy codes extending the seed by '.'-segments). Seeds absent from
    the hierarchy anchor at ``find_ancestor``; unresolvable seeds map to ''
    in the alias dict (caller reports them — 'no silent caps').

    Returns (kept_codes, seed_aliases) where seed_aliases has one entry per
    seed NOT in the curated hierarchy."""
    # parent/children structure is implied by the code strings themselves
    kept: set[str] = set()
    by_prefix: dict[str, list[str]] = defaultdict(list)
    for code in hierarchy:
        head = code.split(".", 1)[0]
        by_prefix[head].append(code)

    def walk_up(code: str) -> None:
        parts = code.split(".")
        for n in range(len(parts), 0, -1):
            anc = ".".join(parts[:n])
            if anc in hierarchy:
                if anc in kept:
                    return
                kept.add(anc)

    def walk_down(code: str) -> None:
        pref = code + "."
        for cand in by_prefix.get(code.split(".", 1)[0], ()):  # same tree only
            if cand == code or cand.startswith(pref):
                kept.add(cand)

    aliases: dict[str, str] = {}
    for seed in sorted(set(seeds)):
        if seed in hierarchy:
            walk_up(seed)
            walk_down(seed)
            continue
        anchor = find_ancestor(seed, hierarchy)
        if anchor is None:
            aliases[seed] = ""
            continue
        aliases[seed] = anchor
        walk_up(anchor)
        walk_down(anchor)
    return kept, aliases


def rollup_then_prune(
    hierarchy: set[str],
    own: dict[str, set[str]],
    seeds: "list[str] | set[str]",
) -> tuple[dict[str, set[str]], set[str], dict[str, str]]:
    """A12 composition: bottom-up property-set union over the FULL tree
    BEFORE pruning (``build_kegg_metabolism_xrefs.py:27-43,674-708`` — TCDB
    substrate rollup), then the seed-based bidirectional prune. Because the
    rollup ran pre-prune, every kept ancestor's set is SINGLE-HOP complete:
    it already contains the contributions of descendants the prune removed.

    Returns (rolled_sets_full_tree, kept_codes, seed_aliases)."""
    rolled = {c: set(own.get(c, ())) for c in hierarchy}
    # deepest-first: each node folds into its immediate dot-prefix parent
    for code in sorted(hierarchy, key=lambda c: c.count("."), reverse=True):
        if "." in code:
            parent = code.rsplit(".", 1)[0]
            if parent in rolled:
                rolled[parent] |= rolled[code]
    kept, aliases = tree_prune(hierarchy, seeds)
    return rolled, kept, aliases
