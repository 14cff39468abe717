"""Two-box-proxy scaling evidence (round-4 verdict task 6).

The single-box 8→32-CPU scaling pair plateaus at 0.557 because the box's
shared memory/decode/object-store path saturates (see BASELINE.md). If that
plateau is a PER-BOX resource limit (as claimed) and not engine
serialization, then TWO CONCURRENT half-width jobs in separate Ray
instances should deliver ≈ the throughput of... equally-split shared
bandwidth — i.e. aggregate ≈ the single-job full-width rate, NOT 2× (the
box has one memory subsystem either way). The diagnostic split is:

- If the engine itself serialized (a global lock, a driver bottleneck),
  two INDEPENDENT processes would still aggregate ≈ 2× one job — each has
  its own driver/GIL/scheduler. Failing to reach 2× while the roofline
  probe shows linear DRAM scaling would implicate the engine.
- Here the roofline probe (tools/roofline_probe.py) shows raw DRAM
  bandwidth DOES scale to 32 procs, so the expectation is: two 16-CPU
  jobs aggregate ≈ the 32-CPU single-job rate (shared I/O+decode ceiling),
  and BOTH well above one 16-CPU job — evidence the plateau is a box
  resource, not engine serialization.

Runs: one 16-CPU headline job (baseline), then two concurrent 16-CPU jobs
in separate processes/Ray instances on the SAME pre-generated input.
Prints one JSON line; paste the numbers into BASELINE.md.

Usage: python tools/two_box_proxy.py  [env: GRAFT_TB_TURNS=128000000]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TURNS = int(os.environ.get("GRAFT_TB_TURNS", "128000000"))
CPUS = int(os.environ.get("GRAFT_TB_CPUS", "16"))
REPEATS = int(os.environ.get("GRAFT_TB_REPEATS", "2"))


def run_job(ncpu: int) -> subprocess.Popen:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_BENCH_TURNS=str(TURNS),
        GRAFT_BENCH_REPEATS="1",
        GRAFT_HEADLINE_ONLY="1",
    )
    return subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def result_of(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    if p.returncode != 0:
        raise RuntimeError(f"bench subprocess failed rc={p.returncode}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> int:
    # warm the transcript cache once (bench generates + caches per sf/reps)
    warm = run_job(CPUS)
    r = result_of(warm)
    n_turns = r["turns"]

    single_tps = []
    for _ in range(REPEATS):
        r = result_of(run_job(CPUS))
        single_tps.append(r["turns_per_sec"])
    single = max(single_tps)

    pair_runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        a, b = run_job(CPUS), run_job(CPUS)
        ra, rb = result_of(a), result_of(b)
        wall = time.time() - t0
        pair_runs.append(
            {
                "tps_a": ra["turns_per_sec"],
                "tps_b": rb["turns_per_sec"],
                "aggregate_tps": round(2 * n_turns / wall, 1),
                "wall": round(wall, 1),
            }
        )
    best = max(pair_runs, key=lambda d: d["aggregate_tps"])

    out = {
        "metric": "two_box_proxy",
        "turns_per_job": n_turns,
        "cpus_per_job": CPUS,
        "single_job_tps": single,
        "two_jobs": best,
        "all_pair_runs": pair_runs,
        "single_runs_tps": single_tps,
        "aggregate_over_single": round(best["aggregate_tps"] / single, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
