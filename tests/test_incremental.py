"""Incremental ingest: merge of per-batch builds equals the one-shot build."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from multiomics_biocypher_kg_ray.pipelines.kg import (
    read_graph,
    run_kg_incremental,
    run_kg_to_parquet,
)
from multiomics_biocypher_kg_ray.sources.transcripts import transcripts_dataset
from multiomics_biocypher_kg_ray.stages import materialize

SF = "/root/testdata/sf0.001"


def _halves():
    ts = transcripts_dataset(SF).materialize()
    a = ts.map_batches(
        lambda t: t.filter(pc.is_in(pc.utf8_slice_codeunits(t.column("conv_id"), start=-1, stop=99), value_set=pa.array(list("02468")))),
        batch_format="pyarrow",
    )
    b = ts.map_batches(
        lambda t: t.filter(pc.is_in(pc.utf8_slice_codeunits(t.column("conv_id"), start=-1, stop=99), value_set=pa.array(list("13579")))),
        batch_format="pyarrow",
    )
    return ts, a, b


def _sorted(ds, keys):
    return ds.to_pandas().sort_values(keys).reset_index(drop=True)


def test_run_kg_incremental_equals_full_build(tmp_path):
    ts, a, b = _halves()
    base_dir = str(tmp_path / "base")
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")

    run_kg_to_parquet(a, base_dir)
    manifest = run_kg_incremental(base_dir, b, inc_dir)
    run_kg_to_parquet(ts, full_dir)

    inc_nodes, inc_edges = read_graph(inc_dir)
    full_nodes, full_edges = read_graph(full_dir)
    pd.testing.assert_frame_equal(
        _sorted(inc_nodes, ["id"]), _sorted(full_nodes, ["id"])
    )
    pd.testing.assert_frame_equal(
        _sorted(inc_edges, ["src", "pred", "dst"]),
        _sorted(full_edges, ["src", "pred", "dst"]),
    )
    lin = manifest["lineage"]
    assert lin["base_dir"] == base_dir
    assert lin["base_edges"] is not None and lin["delta_edges"] > 0
    assert manifest["edges"] == full_edges.count()


def test_merge_edges_associative_three_way():
    # three deltas merged in different groupings produce identical tables
    def edges(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([r[0] for r in rows]),
                    "pred": pa.array([r[1] for r in rows]),
                    "dst": pa.array([r[2] for r in rows]),
                    "weight": pa.array([r[3] for r in rows], pa.int64()),
                    "evidence": pa.array([r[4] for r in rows]),
                }
            )
        )

    e1 = edges([("a", "p", "b", 2, "r1"), ("a", "p", "c", 1, "")])
    e2 = edges([("a", "p", "b", 3, "r2|r1"), ("x", "q", "y", 1, "r3")])
    e3 = edges([("a", "p", "b", 1, "r4")])

    left = materialize.merge_edges(materialize.merge_edges(e1, e2), e3)
    right = materialize.merge_edges(e1, materialize.merge_edges(e2, e3))
    l = _sorted(left, ["src", "pred", "dst"])
    r = _sorted(right, ["src", "pred", "dst"])
    pd.testing.assert_frame_equal(l, r)
    ab = l[(l["src"] == "a") & (l["dst"] == "b")].iloc[0]
    assert ab["weight"] == 6
    assert ab["evidence"] == "r1|r2|r4"
