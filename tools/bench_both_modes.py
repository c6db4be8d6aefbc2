"""Per-round latency/throughput artifact: run bench.py in BOTH modes.

bench.py prints exactly one JSON line (driver contract) for whichever
NLE_BENCH_MODE is set; historical artifacts that mixed un-labeled modes
were ambiguous (VERDICT r2). This tool runs the two regimes back to back
in fresh processes — `single` (sequential per-image latency) first, then
`stream` (pipelined serving throughput, the headline) — and writes ONE
JSONL artifact where every line carries its `mode`, so the ~1.1 vs ~1.7
MP/s split is tracked per round instead of re-derived.

Run on the TPU (one job at a time; cwd must be /root/repo for the axon
plugin):

    cd /root/repo && python tools/bench_both_modes.py [--out=BENCH_MODES.json]
"""

import json
import os
import subprocess
import sys
import time


def run_mode(mode: str) -> dict:
    env = dict(os.environ, NLE_BENCH_MODE=mode)
    proc = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py mode={mode} failed rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    # The contract is ONE JSON line on stdout; take the last non-empty line
    # defensively (warnings from deps may precede it).
    line = [l for l in proc.stdout.strip().splitlines() if l.strip()][-1]
    rec = json.loads(line)
    assert rec.get("mode") == mode, rec
    return rec


def main() -> int:
    out_path = "BENCH_MODES.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        else:
            print(f"unknown argument {a!r}", file=sys.stderr)
            return 2
    lines = []
    for mode in ("single", "stream"):
        rec = run_mode(mode)
        rec["ts"] = round(time.time(), 1)
        lines.append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_path, "w") as fh:
        for rec in lines:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
