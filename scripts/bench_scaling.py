"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N-vs-4N-executor cluster is unavailable in this sandbox; per the
driver protocol we run the SAME job at two local parallelism levels on the
same deterministic input and report throughput at both plus the scaling
efficiency (tput_4N / tput_N) / 4.

Runs each configuration in its own subprocess (a JVM's local[] size is
fixed at startup) and writes the results to BENCH.md.

Usage: python scripts/bench_scaling.py [n_events] [N] [--also-8-32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_events: int, mode: str, epochs: int = 2) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_EVENTS=str(n_events),
        SPARK_GRAFT_BENCH_EPOCHS=str(epochs),
        SPARK_GRAFT_BENCH_MODE=mode,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pairs = [(n, 4 * n)]
    if "--also-8-32" in sys.argv:
        pairs.append((8, 32))

    def best_tput(cpus: int, mode: str) -> float:
        # best of 2: absorbs run-to-run variance (page cache, turbo)
        return max(
            run_bench(cpus, n_events, mode)["events_per_sec"] for _ in range(2)
        )

    rows = []
    for lo, hi in pairs:
        for mode in ("ingest", "replay"):
            t_lo = best_tput(lo, mode)
            t_hi = best_tput(hi, mode)
            eff = (t_hi / t_lo) / (hi / lo)
            rows.append(
                {
                    "job": mode,
                    "n_events": n_events,
                    "N": lo,
                    "4N": hi,
                    "tput_N": t_lo,
                    "tput_4N": t_hi,
                    "speedup": round(t_hi / t_lo, 2),
                    "efficiency": round(eff, 3),
                }
            )
            print(json.dumps(rows[-1]))

    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "Protocol per BASELINE.md: identical job + identical deterministic",
        f"input ({n_events:,} change events, seed 42) at local[N] and",
        "local[4N]; throughput = change-events/sec end-to-end; efficiency =",
        "(tput_4N / tput_N) / 4. JIT warmup pass precedes every timed run.",
        "",
        "| job | N | 4N | events/s @N | events/s @4N | speedup | efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['job']} | {r['N']} | {r['4N']} | {r['tput_N']:,.0f} | "
            f"{r['tput_4N']:,.0f} | {r['speedup']}x | {r['efficiency']} |"
        )
    lines += [
        "",
        "- `replay` = bounded changelog -> collapse -> snapshot (the",
        "  reference `merge` binary analog; pure compute path).",
        "- `ingest` = full epoch pipeline incl. fenced lake MERGE commits;",
        "  in local mode the per-epoch constant costs (driver manifest",
        "  commits, single-disk parquet state rewrite) do not parallelize,",
        "  which caps its local efficiency below the compute path's. On a",
        "  real multi-executor cluster those costs distribute across",
        "  executors/object-store shards.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
