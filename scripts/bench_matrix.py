"""Capture all three flagship bench lines as one committed artifact.

Runs `bench.py` in its three modes (closed-loop rollout / full train step /
WOSAC M=32 protocol, reference: prosim/rollout/gpu_utils.py:179-228), each in
a fresh process with the honest configuration (real demo scenes, host loader
in the timed loop, all condition types), and writes the JSON lines — which
already carry the device-only companion number, the host stage breakdown,
and the LLM arch disclosure — to docs/evidence/bench_matrix.json.

Usage:
    python scripts/bench_matrix.py [--iters 20] [--out docs/evidence/bench_matrix.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mode(mode: str, iters: int, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--mode", mode, "--iters", str(iters), *extra]
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    line = None
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            line = json.loads(ln)
    if line is None:
        raise RuntimeError(
            f"bench --mode {mode} produced no JSON line (rc={p.returncode}).\n"
            f"stderr tail: {p.stderr[-2000:]}")
    line["wall_s"] = round(time.time() - t0, 1)
    return line


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--wosac-iters", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs/evidence/bench_matrix.json"))
    args = ap.parse_args()

    matrix = {}
    matrix["rollout"] = run_mode("rollout", args.iters)
    print(json.dumps(matrix["rollout"]), flush=True)
    matrix["train"] = run_mode("train", args.iters)
    print(json.dumps(matrix["train"]), flush=True)
    matrix["wosac_m32"] = run_mode("wosac", args.wosac_iters)
    print(json.dumps(matrix["wosac_m32"]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(matrix, f, indent=2)
    print("->", args.out, flush=True)


if __name__ == "__main__":
    main()
