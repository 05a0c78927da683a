"""Closing-run bench with an INTERLEAVED prior-round control.

VERDICT r05 item 8: cross-round battery drift kept needing "host
window" explanations inferred from separate same-day probes. This
makes the window a MEASURED ratio: every closing run alternates the
current tree's bench with the previous round's gated code (a git
worktree pinned to the control commit), pair by pair, in the same
window —

    current → control → current → control ...

and reports, per pair and aggregated, current/control ratios for the
battery total, each common headline query, and the extraction
throughput at both levels. A ratio ≈ 1.0 on unchanged queries says
"same window, same engine"; a ratio that moves only where the code
moved is a real change; a uniform shift across unchanged queries in
BOTH trees is the window itself and cancels out of the comparison.

Usage:
    python tools/paired_control.py <control_commit> [pairs=2]

Env (forwarded to both sides): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
OCR_BENCH_LEVELS, OCR_BENCH_REPS, OCR_BENCH_REPLICATION. Each side
runs with OCR_BENCH_JVMS=1 per pass (the pairing supplies the
repetition; one JVM pair per pass keeps passes short so the window is
actually shared). Writes BENCH/paired_control_last.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench(cwd: Path) -> dict:
    env = dict(os.environ, OCR_BENCH_JVMS="1")
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        raise SystemExit(f"bench failed in {cwd}: rc={r.returncode}\n{r.stderr[-2000:]}")
    # Round 7: the LAST stdout line is the driver-facing <1 KB summary
    # (no per-query dict any more); the per-query record we pair on is
    # the full-record line / sidecar. Pick the newest line that carries
    # a per-query "queries" dict (control worktrees at older commits
    # still emit it last — this handles both formats).
    for line in reversed(lines):
        rec = json.loads(line)
        if isinstance(rec.get("queries"), dict):
            return rec
    raise SystemExit(f"no bench line with a queries dict in {cwd}")


def _ensure_worktree(commit: str) -> Path:
    wt = Path(f"/tmp/ocr_ctrl_{commit[:12]}")
    if not (wt / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wt), commit],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return wt


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    commit = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ctrl = _ensure_worktree(commit)

    passes: list[dict] = []
    for i in range(pairs):
        # ARM-ORDER ROTATION (round-6 run-2 finding): with a fixed
        # current-first order, the first arm of every pass eats any
        # cold-start cost (page cache, corpus build) and the second arm
        # inherits a warmed host — a systematic bias the interleaving
        # itself cannot cancel. Alternate which side runs first so the
        # first-runner penalty lands on each arm equally across pairs.
        if i % 2 == 0:
            cur = _run_bench(REPO)
            con = _run_bench(ctrl)
        else:
            con = _run_bench(ctrl)
            cur = _run_bench(REPO)
        passes.append(
            {"pass": i, "first_arm": "current" if i % 2 == 0 else "control",
             "current": cur, "control": con}
        )
        print(
            json.dumps(
                {
                    "pass": i,
                    "battery_cur": cur["value"],
                    "battery_ctl": con["value"],
                    "eff_auto_cur": cur["extraction"]["scaling_efficiency"],
                    "eff_auto_ctl": con["extraction"]["scaling_efficiency"],
                }
            ),
            flush=True,
        )

    common = sorted(
        set(passes[0]["current"]["queries"]) & set(passes[0]["control"]["queries"])
    )
    per_query = {}
    for q in common:
        cur_best = min(p["current"]["queries"][q] for p in passes)
        ctl_best = min(p["control"]["queries"][q] for p in passes)
        per_query[q] = {
            "cur_best": cur_best,
            "ctl_best": ctl_best,
            "ratio": round(cur_best / ctl_best, 3) if ctl_best else None,
        }
    ratios = [v["ratio"] for v in per_query.values() if v["ratio"]]

    def tps(p, side, key):
        return p[side]["extraction"][key]

    summary = {
        "control_commit": commit,
        "pairs": pairs,
        "battery_cur_best": min(p["current"]["value"] for p in passes),
        "battery_ctl_best": min(p["control"]["value"] for p in passes),
        "per_query_ratio_median": round(statistics.median(ratios), 3),
        "tps_high_cur_best": max(
            tps(p, "current", "turns_per_sec_high") for p in passes
        ),
        "tps_high_ctl_best": max(
            tps(p, "control", "turns_per_sec_high") for p in passes
        ),
        "tps_low_cur_best": max(tps(p, "current", "turns_per_sec_low") for p in passes),
        "tps_low_ctl_best": max(tps(p, "control", "turns_per_sec_low") for p in passes),
        "per_query": per_query,
    }
    out = {"summary": summary, "passes": passes}
    sidecar = REPO / "BENCH" / "paired_control_last.json"
    sidecar.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
