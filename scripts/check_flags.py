#!/usr/bin/env python3
"""Per-gate bench flag analysis against the blessed baseline.

Replays graft.Bench's in-run regression criteria (ratio > 1.5 AND
absolute excess > 1.0 s — see Bench.scala / BASELINE.md round-14) over
recorded JSON lines, so a judge or driver can compute flag sets and the
forward/reverse de-correlation intersection without hand-parsing:

    python3 scripts/check_flags.py RUN.json [RUN2.json ...] [--base BASELINE.json]

With one run: prints that run's flag set vs the baseline.
With two+ runs: prints each run's flags AND the intersection across all
runs — the de-correlation protocol's verdict (empty intersection =
positional host weather, non-empty = order-independent drift to
adjudicate). The baseline defaults to the newest BASELINE_r*.json in the
repo root (the guard's DEFENDED reference).

Accepts both record shapes: the raw bench stdout line and the driver's
escaped-tail envelope (backslashes stripped before parsing, like
Bench.baselineQueries). A record that parses to an empty query map is
reported as TRUNCATED, mirroring the bench's loud-warning behavior.
"""
import json
import re
import sys
from pathlib import Path

RATIO = 1.5
ABS_S = 1.0


def queries_of(path):
    text = Path(path).read_text().replace("\\", "")
    m = re.search(r'"queries":\{([^}]*)\}', text)
    if not m:
        return {}
    return {
        k: float(v)
        for k, v in re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9Ee+-]+)', m.group(1))
    }


def total_of(path):
    text = Path(path).read_text().replace("\\", "")
    m = re.search(r'"metric":"total","value":([0-9.]+)', text)
    return float(m.group(1)) if m else None


def newest_blessed(root):
    cands = sorted(
        root.glob("BASELINE_r*.json"),
        key=lambda p: int(re.search(r"\d+", p.name).group()),
    )
    return cands[-1] if cands else None


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    base_arg = next((a.split("=", 1)[1] for a in argv if a.startswith("--base")), None)
    if not args:
        print(__doc__)
        return 2
    root = Path(__file__).resolve().parent.parent
    base_path = Path(base_arg) if base_arg else newest_blessed(root)
    if base_path is None or not base_path.exists():
        print("no blessed BASELINE_r*.json found and no --base given", file=sys.stderr)
        return 2
    base = queries_of(base_path)
    if not base:
        print(f"{base_path.name}: TRUNCATED baseline (empty query map)", file=sys.stderr)
        return 2
    print(f"baseline: {base_path.name} ({len(base)} gates)")
    flag_sets = []
    for run in args:
        qs = queries_of(run)
        if not qs:
            print(f"{run}: TRUNCATED record (empty query map) — skipped")
            continue
        flags = {
            k: (round(v, 2), round(base[k], 2), round(v / base[k], 2))
            for k, v in qs.items()
            if k in base and v > base[k] * RATIO and v - base[k] > ABS_S
        }
        flag_sets.append(set(flags))
        tot = total_of(run)
        print(f"\n{run}: total={tot} s, {len(qs)} gates, {len(flags)} flags")
        for k in sorted(flags):
            got, b, ratio = flags[k]
            print(f"  FLAG {k}: {got} s vs {b} s (x{ratio})")
    if len(flag_sets) >= 2:
        inter = set.intersection(*flag_sets)
        print(f"\nintersection across {len(flag_sets)} runs: "
              f"{sorted(inter) if inter else '{} (positional weather)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
