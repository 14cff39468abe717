"""ST7 external-lookup cache actor: each distinct key computed once
cluster-wide, Parquet persistence warms a restarted actor, enrich stage is
vectorized fan-out."""

import pyarrow as pa
import ray
import ray.data

from multiomics_biocypher_kg_ray.state.lookup_cache import (
    LookupCacheActor,
    enrich_with_cache,
)


def _mk_lookup():
    # nested fn → cloudpickle serializes by VALUE (test modules are not
    # importable inside Ray workers/actors)
    def slow_lookup(keys):
        # deterministic stand-in for an external API (no network in sandbox)
        return [f"val_{k.upper()}" for k in keys]

    return slow_lookup


def test_enrich_computes_each_key_once_and_fans_out(tmp_path):
    spill = str(tmp_path / "cache.parquet")
    actor = LookupCacheActor.remote(_mk_lookup(), spill)
    rows = [{"k": f"k{i % 7}", "i": i} for i in range(500)]
    ds = ray.data.from_items(rows).map_batches(
        lambda t: t, batch_size=64, batch_format="pyarrow"
    )
    out = enrich_with_cache(ds, actor, "k", "v").to_pandas()
    assert len(out) == 500
    assert (out["v"] == "val_" + out["k"].str.upper()).all()
    stats = ray.get(actor.stats.remote())
    assert stats["entries"] == 7  # 7 distinct keys, each computed once
    assert stats["misses"] == 7
    assert ray.get(actor.persist.remote()) == 7

    # restart: a fresh actor warms from the spill — zero new misses
    ray.kill(actor)
    actor2 = LookupCacheActor.remote(_mk_lookup(), spill)
    got = ray.get(actor2.get_or_compute.remote(["k0", "k6"]))
    assert got == {"k0": "val_K0", "k6": "val_K6"}
    assert ray.get(actor2.stats.remote())["misses"] == 0
    ray.kill(actor2)


def test_enrich_handles_null_keys():
    actor = LookupCacheActor.remote(_mk_lookup(), None)
    t = pa.table({"k": pa.array(["a", None, "b"], pa.string())})
    out = enrich_with_cache(ray.data.from_arrow(t), actor, "k", "v").to_pandas()
    assert out["v"].tolist() == ["val_A", None, "val_B"]
    ray.kill(actor)
