"""Profile the closed-loop rollout on TPU and print the top ops by time.

Captures a jax.profiler trace of steady-state bench iterations and parses
the trace.json.gz directly (tensorboard's converter is broken against the
installed TF): aggregates 'X' (complete) events on the TPU device track.

    python scripts/profile_rollout.py [--batch 64] [--iters 2] [--mode rollout]
"""

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

# share bench.py's persistent compile cache: the profiled forward is the
# same program, so profiling a freshly-benched build starts hot
import os as _os
_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             "/root/.cache/jax_comp_cache")
_os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_hlo_metadata(dump_dir):
    """Map op names -> source metadata from an --xla_dump_to text dump.

    For fusions, collect the metadata of every op INSIDE the fused
    computation so trace time can be attributed to model source lines."""
    import re

    meta = {}          # op name -> set of "file:line op_type"
    fusion_calls = {}  # fusion op name -> called computation name
    comp_ops = {}      # computation name -> set of metadata strings
    files = sorted(glob.glob(f"{dump_dir}/*jit__lambda*.txt")) or sorted(
        glob.glob(f"{dump_dir}/*.txt"))
    if not files:
        return {}
    # prefer the largest (optimized) module text
    path = max(files, key=lambda p: Path(p).stat().st_size)
    cur_comp = None
    for line in open(path):
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+)[^=]*\([^)]*\)\s*->", line)
        if m and "{" in line:
            cur_comp = m.group(1)
            comp_ops.setdefault(cur_comp, set())
            continue
        om = re.search(r"%?([\w\.\-]+) = ", line)
        if not om:
            continue
        name = om.group(1)
        md = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)"[^}]*source_line=(\d+)', line)
        tag = ""
        if md:
            tag = md.group(1)
        if src:
            tag += f" [{Path(src.group(1)).name}:{src.group(2)}]"
        fc = re.search(r'(?:fusion|calls)=%?([\w\.\-]+)', line)
        if "fusion(" in line and fc:
            fusion_calls[name] = fc.group(1)
        if tag and cur_comp:
            comp_ops[cur_comp].add(tag)
        if tag:
            meta.setdefault(name, set()).add(tag)
    # expand fusions to their computations' metadata
    for fname, cname in fusion_calls.items():
        if cname in comp_ops:
            meta.setdefault(fname, set()).update(comp_ops[cname])
    return meta


def parse_trace(trace_dir, top=40, hlo_meta=None):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # find TPU device pids (process names like '/device:TPU:0' or 'TPU:0')
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "host" not in n.lower()}

    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            total += dur
    print(f"\ndevice-track total: {total:.1f} ms over {len(agg)} op names")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:10.1f} ms  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")
        if hlo_meta and name in hlo_meta:
            for tag in sorted(hlo_meta[name])[:6]:
                print(f"{'':22s}| {tag[:120]}")
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--obs-agents", type=int, default=160)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--mode", default="rollout", choices=["rollout", "train"])
    ap.add_argument("--out", default="/tmp/prosim_profile")
    ap.add_argument("--parse-only", default=None)
    ap.add_argument("--hlo-dump", default=None,
                    help="--xla_dump_to dir; joins op times to source lines")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    if args.parse_only:
        meta = load_hlo_metadata(args.hlo_dump) if args.hlo_dump else None
        parse_trace(args.parse_only, hlo_meta=meta)
        return

    from prosim_tpu.config import get_config
    from prosim_tpu.data.synthetic import make_synthetic_batch
    from prosim_tpu.models.prosim import ProSim

    config = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", str(args.lanes),
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", str(args.obs_agents),
        "DATASET.FORMAT.PAD.NUM_AGENTS", str(args.agents),
        "MODEL.DTYPE", "bfloat16",
    ] + list(args.opts))
    model = ProSim(config, dtype=jnp.bfloat16)
    batch = make_synthetic_batch(
        config, batch_size=args.batch, num_lanes=args.lanes,
        num_obs_agents=args.obs_agents, num_agents=args.agents, num_replan=8,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    if args.mode == "train":
        from prosim_tpu.train.optim import build_optimizer
        from prosim_tpu.train.train_step import make_train_step

        optimizer = build_optimizer(config, params)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(model, optimizer, config))
        params, opt_state, losses = step(params, opt_state, batch, key)
        float(losses["full_loss"])
        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                params, opt_state, losses = step(
                    params, opt_state, batch, jax.random.fold_in(key, i)
                )
            float(losses["full_loss"])
    else:
        fwd = jax.jit(
            lambda p, b, k: model.forward(p, b, "rollout", k)["rollout_traj"].sum()
        )
        float(fwd(params, batch, key))  # compile + warm
        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                out = fwd(params, batch, jax.random.fold_in(key, i))
            float(out)

    meta = load_hlo_metadata(args.hlo_dump) if args.hlo_dump else None
    parse_trace(args.out, hlo_meta=meta)


if __name__ == "__main__":
    main()
