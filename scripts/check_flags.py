#!/usr/bin/env python3
"""Per-gate bench flag analysis against the blessed baselines (two-sided).

Replays graft.Bench's in-run regression criteria over recorded JSON
lines, so a judge or driver can compute flag sets and the
forward/reverse de-correlation intersection without hand-parsing:

  - ENVELOPE leg: ratio > 1.5 vs the newest BASELINE_r*.json (a MAX
    envelope — the hard ceiling), AND absolute excess > 1.0 s.
  - MEDIAN leg (round 15+): ratio > 3.0 vs the newest
    BASELINE_r*_median.json (per-gate quiet-window medians — the drift
    detector that closes the envelope's stall-headroom blind spot),
    AND absolute excess > 1.0 s.

    python3 scripts/check_flags.py RUN.json [RUN2.json ...] \
        [--base=BASELINE.json] [--median=MEDIAN.json]

With one run: prints that run's flag set vs both legs.
With two+ runs: prints each run's flags AND the intersection across all
runs — the de-correlation protocol's verdict (empty intersection =
positional host weather, non-empty = order-independent drift to
adjudicate).

Accepts both record shapes: the raw bench stdout line and the driver's
escaped-tail envelope (backslashes stripped before parsing, like
Bench.baselineQueries). A record that parses to an empty query map is
reported as TRUNCATED, mirroring the bench's loud-warning behavior.
"""
import re
import sys
from pathlib import Path

ENVELOPE_RATIO = 1.5
MEDIAN_RATIO = 3.0
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


def newest(root, pattern, exclude=None):
    cands = sorted(
        (p for p in root.glob(pattern) if exclude is None or not exclude(p)),
        key=lambda p: int(re.search(r"\d+", p.name).group()),
    )
    return cands[-1] if cands else None


def newest_blessed(root):
    return newest(root, "BASELINE_r*.json",
                  exclude=lambda p: "_median" in p.name)


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    opts = [a for a in argv if a.startswith("--")]
    bad = [a for a in opts if "=" not in a]
    if bad:
        print(f"option(s) missing '=VALUE': {' '.join(bad)} "
              "(use --base=FILE / --median=FILE)", file=sys.stderr)
        return 2
    base_arg = next((a.split("=", 1)[1] for a in opts if a.startswith("--base")), None)
    med_arg = next((a.split("=", 1)[1] for a in opts if a.startswith("--median")), None)
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
    med_path = Path(med_arg) if med_arg else newest(root, "BASELINE_r*_median.json")
    if med_arg and not Path(med_arg).exists():
        print(f"--median file not found: {med_arg}", file=sys.stderr)
        return 2
    median = queries_of(med_path) if med_path is not None and med_path.exists() else {}
    print(f"envelope: {base_path.name} ({len(base)} gates, x{ENVELOPE_RATIO})")
    if median:
        print(f"median:   {med_path.name} ({len(median)} gates, x{MEDIAN_RATIO})")
    elif med_path is not None and med_path.exists():
        # Mirror the Scala guard's loud truncation warning — "none found"
        # would misreport a committed-but-truncated median as never blessed.
        print(f"median:   {med_path.name} is TRUNCATED (empty query map) — "
              "drift leg disarmed (envelope only)")
    else:
        print("median:   none found — drift leg disarmed (envelope only)")
    legs = [("envelope", base, ENVELOPE_RATIO)] + (
        [("median", median, MEDIAN_RATIO)] if median else []
    )
    flag_sets = []
    for run in args:
        qs = queries_of(run)
        if not qs:
            print(f"{run}: TRUNCATED record (empty query map) — skipped")
            continue
        flags = {}
        for leg, ref, ratio in legs:
            for k, v in qs.items():
                if k in ref and v > ref[k] * ratio and v - ref[k] > ABS_S:
                    prev = flags.get(k)
                    cand = (leg, round(v, 2), round(ref[k], 2), round(v / ref[k], 2))
                    if prev is None or cand[3] > prev[3]:
                        flags[k] = cand
        flag_sets.append(set(flags))
        tot = total_of(run)
        print(f"\n{run}: total={tot} s, {len(qs)} gates, {len(flags)} flags")
        for k in sorted(flags):
            leg, got, b, ratio = flags[k]
            print(f"  FLAG {k}: {got} s vs {b} s (x{ratio}, {leg} leg)")
    if len(flag_sets) >= 2:
        inter = set.intersection(*flag_sets)
        print(f"\nintersection across {len(flag_sets)} runs: "
              f"{sorted(inter) if inter else '{} (positional weather)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
