"""Two-parallelism scaling measurement → BENCH/BASELINE.md +
BENCH/SCALING_r{N}.json.

Runs bench_cdc.py in two fresh JVMs — local[N] and local[4N] — on the
SAME generated change stream, per the BASELINE.md protocol, and records
events/sec at both plus scaling_efficiency = T(4N) / (4 × T(N)).

Besides the human-readable BENCH/BASELINE.md table, every run emits a
machine-readable per-round artifact (round-4 verdict item 5):
BENCH/SCALING_r{N}.json carries EVERY trial at both levels (including
stalled ones — nothing is silently dropped), the efficiency, and a
protocol hash over the measurement parameters so rounds are comparable
only when the protocol actually matched. The round number defaults to
latest CORRECTNESS_r{N}.json + 1 (the round being built).

Usage: python tools/run_scaling.py [--n 8] [--events 4000000] [--trials 2]
"""

from __future__ import annotations

import argparse
import datetime
import glob
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _current_round() -> int:
    """The round being BUILT: latest driver CORRECTNESS_r{N} + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def run_once(cores: int, events: int, convs: int, slices: int, mode: str) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench_cdc.py"),
            "--cores", str(cores),
            "--events", str(events),
            "--convs", str(convs),
            "--slices", str(slices),
            "--mode", mode,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--convs", type=int, default=40_000)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--mode", choices=["cow", "mor"], default="cow")
    ap.add_argument(
        "--no-write", action="store_true",
        help="print the table but keep the curated BENCH/BASELINE.md",
    )
    ap.add_argument(
        "--round", type=int, default=None,
        help="round number for BENCH/SCALING_r{N}.json (default: latest "
        "CORRECTNESS_r{N} + 1)",
    )
    args = ap.parse_args()

    results = {args.n: [], 4 * args.n: []}
    for trial in range(args.trials):
        for cores in (args.n, 4 * args.n):
            r = run_once(cores, args.events, args.convs, args.slices, args.mode)
            results[cores].append(r)
            print(f"trial {trial} cores={cores}: {r['steady_state_events_per_sec']} ev/s "
                  f"steady-state ({r['wall_sec']}s total)", flush=True)

    best_n = max(r["steady_state_events_per_sec"] for r in results[args.n])
    best_4n = max(r["steady_state_events_per_sec"] for r in results[4 * args.n])
    eff = best_4n / (4 * best_n)

    md = f"""# BENCH — CDC apply throughput & scaling (measured)

Protocol per BASELINE.md: identical job + identical deterministically
generated change stream (seed 42), two parallelism levels in separate
JVMs, best of {args.trials} trials each (noisy-neighbor variance on the
shared box is excluded by taking the best steady-state run).

- Input: {args.events:,} change events over {args.convs:,} conversations,
  ~30% hot-key skew on one conversation, ~10% event-time disorder,
  additive `tool` column appearing mid-stream.
- Job: binlog tail → pre-validate → salted LWW dedup → bucketed
  {'copy-on-write' if args.mode == 'cow' else 'merge-on-read'} MERGE
  into the lake table (64 buckets) → lineage counters + ledger commit.
  {args.slices} LSN slices.
- Machine: single host, local[N] task threads (no real cluster in this
  sandbox; see BASELINE.md "Measurement methodology").

Throughput is steady-state events/sec (first batch excluded: JVM/JIT
warmup), best of the trials per level; runs are strictly serial (no
co-tenant work).

| cores | steady-state ev/s (best) | total wall sec | all trials (ss ev/s) |
|---|---|---|---|
| local[{args.n}] | {best_n:,.0f} | {min(r['wall_sec'] for r in results[args.n])} | {[r['steady_state_events_per_sec'] for r in results[args.n]]} |
| local[{4*args.n}] | {best_4n:,.0f} | {min(r['wall_sec'] for r in results[4*args.n])} | {[r['steady_state_events_per_sec'] for r in results[4*args.n]]} |

**scaling_efficiency = {best_4n:,.0f} / (4 × {best_n:,.0f}) = {eff:.3f}**
(target ≥ 0.8)

Correctness gate on the same engine+stream shape: replay equality vs the
DuckDB oracle (`python -m pytest -x -q`, tests/test_cdc_e2e.py) and the
driver-gated `cdc_replay` query.

Measured {datetime.datetime.now(datetime.timezone.utc).strftime('%Y-%m-%d %H:%M UTC')}.
"""
    protocol = {
        "seed": 42,
        "events": args.events,
        "convs": args.convs,
        "slices": args.slices,
        "mode": args.mode,
        "levels": [args.n, 4 * args.n],
        "trials": args.trials,
        "steady_state": "first two batches excluded (JVM/JIT warmup)",
        "selection": "best-of-trials per level (shared-box stall exclusion)",
    }
    artifact = {
        "round": args.round if args.round is not None else _current_round(),
        "protocol": protocol,
        "protocol_hash": hashlib.md5(
            json.dumps(protocol, sort_keys=True).encode()
        ).hexdigest()[:12],
        "trials": {
            str(cores): [
                {
                    "steady_state_events_per_sec": r["steady_state_events_per_sec"],
                    "wall_sec": r["wall_sec"],
                    "events": r["events"],
                }
                for r in rs
            ]
            for cores, rs in results.items()
        },
        "best_events_per_sec": {str(args.n): best_n, str(4 * args.n): best_4n},
        "scaling_efficiency": round(eff, 4),
        "criterion": {"target": 0.8, "met": eff >= 0.8},
        "measured_utc": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M UTC"
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    if not args.no_write:
        # BASELINE.md is CURATED (multi-round narrative) — only
        # overwrite on request; the JSON artifact below always lands.
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md)
    sc_path = os.path.join(
        REPO, "BENCH", f"SCALING_r{artifact['round']:02d}.json"
    )
    with open(sc_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {sc_path}")
    print(md)
    print(json.dumps({"n": best_n, "4n": best_4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
