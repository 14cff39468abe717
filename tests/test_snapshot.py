"""Snapshot regression: the committed golden sample of the sf0.001 KG build
must be byte-stable under refactors (reference ``tests/kg_validity`` snapshot
semantics, ``/root/reference/CLAUDE.md:408-417``).

A red run here means the build SEMANTICS changed. If the change is deliberate,
regenerate with ``python tools/generate_snapshot.py`` and review the fixture
diff; never regenerate to silence an unexplained mismatch.
"""

import json
import os
import sys

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kg_snapshot.json")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def snapshot():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def rebuilt():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from generate_snapshot import build_snapshot

    return build_snapshot(SF_DIR)


def test_snapshot_counts(snapshot, rebuilt):
    assert rebuilt["counts"] == snapshot["counts"]


def test_snapshot_table_hashes(snapshot, rebuilt):
    """Whole-table value hashes over canonically sorted nodes/edges/rollups —
    any semantic drift in extraction, linking, canonicalization, dedup,
    evidence union, degree or ranking turns this red."""
    assert rebuilt["hashes"] == snapshot["hashes"]


def test_snapshot_node_rows(snapshot, rebuilt):
    assert rebuilt["nodes"] == snapshot["nodes"]


def test_snapshot_edge_sample(snapshot, rebuilt):
    assert rebuilt["edge_sample"] == snapshot["edge_sample"]
