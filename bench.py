"""Benchmark: full 8 s closed-loop scene rollouts per second on one chip.

Flagship configuration (the default, captured as BENCH_r{N}.json by the
driver): REAL demo-cache scenes with the host loader in the timed loop and
ALL prompt-condition types active (goal + action-tag + drag-point +
LLM text through the condition transformer) — the promptable path a user
actually deploys, not a synthetic best case. The JSON line also carries
FLOPs/MFU from XLA's compiled cost analysis.

Other modes: `--mode train` (full jitted train step), `--mode wosac`
(WOSAC protocol: B scenes x M=32 stochastic replicas per compiled rollout,
reference: prosim/rollout/gpu_utils.py:179-228), `--synthetic`
(demo-shaped random batches, the round-1/2 configuration).

Prints ONE JSON line. `vs_baseline` compares against the per-chip share of
the BASELINE.json target (>=100 scene rollouts/sec on a v5e-8 => 12.5 per
chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax

# The environment may preset JAX_PLATFORMS to a plugin name that can fail to
# initialize transiently (remote-TPU tunnel). Retry before falling back to
# auto-selection -- a silent CPU fallback would turn the bench into an
# hours-long CPU compile and report a bogus number.
import os


def _tpu_visible():
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


# A remote-TPU tunnel can transiently fail init or degrade to proxying the
# remote host's CPU; benching there would report a bogus number. The plugin
# caches its connection for the process lifetime, so retry by re-exec'ing a
# fresh interpreter (up to 12 times, then run on whatever is available).
if not _tpu_visible():
    _retries = int(os.environ.get("PROSIM_BENCH_RETRY", "0"))
    if _retries < 12:
        print(f"bench: no TPU visible (attempt {_retries + 1}); "
              "retrying in a fresh process...", file=sys.stderr, flush=True)
        time.sleep(10)
        os.environ["PROSIM_BENCH_RETRY"] = str(_retries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", None)
print(f"bench: backend={jax.default_backend()} devices={jax.devices()}",
      file=sys.stderr, flush=True)

# Persistent compilation cache: the full-size rollout graph can take a long
# time to compile through a remote-TPU tunnel; cache it so repeat runs (and
# the driver's bench invocation) start hot.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/root/.cache/jax_comp_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TARGET_PER_CHIP = 100.0 / 8.0  # BASELINE.json: >=100 scenes/s on v5e-8
DEMO_CACHE = "/root/reference/demo_dataset/trajdata_cache"

# Peak dense bf16 matmul throughput per chip, for the MFU figure. Matched by
# substring against jax.devices()[0].device_kind; unknown kinds fall back to
# v5e (the BASELINE hardware) and the JSON records the assumption.
PEAK_BF16_FLOPS = [
    ("v6", 918e12),          # Trillium
    ("v5p", 459e12),
    ("v5", 197e12),          # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
]


def _peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in PEAK_BF16_FLOPS:
        if sub in kind:
            return kind, peak
    return kind, 197e12


def _cost_analysis(jitted, *args):
    """flops + HBM bytes per invocation via an explicit lower().compile().

    Entirely best-effort: the remote-TPU tunnel's chipless AOT compile helper
    can SIGABRT on graphs the normal execution path compiles fine, so a
    failure here must never take the bench down — it only drops the MFU
    fields. Retried once (the helper failure is sometimes transient)."""
    for _ in range(2):
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", -1))
            byts = float(ca.get("bytes accessed", -1))
            return (flops if flops > 0 else None), (byts if byts > 0 else None)
        except Exception as e:
            print(f"bench: cost_analysis compile failed ({type(e).__name__}); "
                  "retrying", file=sys.stderr, flush=True)
            time.sleep(5)
    return None, None


COND_TYPES = {
    "none": [],
    "goal": ["goal"],
    "tags": ["goal", "v_action_tag", "drag_point"],
    "text": ["llm_text_OneText"],
    "all": ["goal", "v_action_tag", "drag_point", "llm_text_OneText"],
}


def _real_batches(config, cache_dir, batch_size, n_batches):
    """Distinct collated demo-cache batches (train split so conditions are
    sampled; the 16 demo scenes cycle with per-element condition reseeding)."""
    from prosim_tpu.data.dataset import ProSimImitationDataset
    from prosim_tpu.data.formatter import collate

    cfg2 = config.clone()
    cfg2.defrost()
    cfg2.DATASET.SOURCE.TRAIN = ["waymo_train"]
    cfg2.freeze()
    ds = ProSimImitationDataset(cfg2, "train", cache_dir)
    assert len(ds) > 0, f"no scenes under {cache_dir}"
    out = []
    for b in range(n_batches):
        singles = [
            ds.get_scene_batch((b * batch_size + i) % len(ds),
                               seed=b * batch_size + i, device=False)
            for i in range(batch_size)
        ]
        out.append((singles, ds))
    return out


def _loader_in_loop(ds, batch_size, n_iters, num_workers=1, prefetch=3):
    """Host data pipeline in the timed loop: ONE pipeline thread re-formats,
    slab-collates, and device-transfers scene batches ahead of the consumer
    (steady-state: raw scene reads are cached; formatting, condition
    sampling, collation, and the host->device transfer are real per-iter
    work). One worker is the measured optimum on the single-core bench host
    (see prosim_tpu/data/loader.py)."""
    from prosim_tpu.data.loader import pipelined_batches

    def pairs():
        for n in range(n_iters * batch_size):
            yield n % len(ds), n

    return pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs(), batch_size, num_workers=num_workers, prefetch=prefetch,
    )


def _host_stage_breakdown(ds, batch_size, config):
    """Decompose steady-state host work per batch (ms): raw scene read,
    format (cold + cached), condition sampling, slab collate, device
    transfer. Run OUTSIDE the timed loop; recorded in the bench JSON so a
    below-par capture names its own bottleneck (VERDICT r3 task 1)."""
    from prosim_tpu.data.formatter import format_scene
    from prosim_tpu.data.loader import (PackedTransfer, SlabCollator,
                                        safe_device_put)

    import numpy as np

    idxs = [i % len(ds) for i in range(batch_size)]
    # warm every cache (scene, format, tag)
    singles = [ds.get_scene_batch(j, seed=10_000 + i, device=False)
               for i, j in enumerate(idxs)]
    out = {}
    t0 = time.perf_counter()
    for j in idxs:
        env, name, _ = ds.index[j]
        ds._load(env, name)
    out["raw_read"] = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    for j in idxs[: max(1, batch_size // 4)]:  # cold format is slow; sample
        env, name, ts = ds.index[j]
        format_scene(ds._load(env, name), ds.config, ts, ds.split,
                     np.random.default_rng(0))
    out["format_cold"] = ((time.perf_counter() - t0) * 1000
                          * batch_size / max(1, batch_size // 4))

    t0 = time.perf_counter()
    singles = [ds.get_scene_batch(j, seed=20_000 + i, device=False)
               for i, j in enumerate(idxs)]
    out["format_cached_plus_cond"] = (time.perf_counter() - t0) * 1000

    collator = SlabCollator(singles[0], batch_size)
    t0 = time.perf_counter()
    host_batch = collator.collate(singles, transfer=None)
    out["slab_collate"] = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    dev = safe_device_put(host_batch)
    jax.block_until_ready(dev)
    out["device_transfer_tree"] = (time.perf_counter() - t0) * 1000

    # the loop's real path: pack into one buffer, one RPC, on-device unpack
    pt = PackedTransfer(host_batch)
    dev = pt(host_batch)  # build + compile unpack
    jax.block_until_ready(jax.tree.leaves(dev)[0])
    t0 = time.perf_counter()
    dev = pt(host_batch)
    jax.block_until_ready(jax.tree.leaves(dev)[0])
    out["device_transfer_packed"] = (time.perf_counter() - t0) * 1000
    return {k: round(v, 1) for k, v in out.items()}


def _bank_stage_breakdown(bank, ds, batch_size):
    """Per-batch host work on the BANKED transport — the path the timed loop
    actually runs when the scene bank is up (r4's breakdown measured the
    streaming path regardless; VERDICT r4 weak #5). Stages: condition
    sampling, condition collation, condition host->device transfer (via the
    transport the loop used), and full on-device assembly."""
    import numpy as np

    from prosim_tpu.data.formatter import collate_conditions

    pairs = [(i % len(ds), 55_000 + i) for i in range(batch_size)]
    [bank.sample_conditions(i, s) for i, s in pairs]  # warm caches
    out = {}
    t0 = time.perf_counter()
    rows_conds = [bank.sample_conditions(i, s) for i, s in pairs]
    out["cond_sample"] = (time.perf_counter() - t0) * 1000
    rows = np.asarray([r for r, _ in rows_conds])
    conds = [c for _, c in rows_conds]
    if conds[0] is not None:
        t0 = time.perf_counter()
        conds_host = collate_conditions(conds)
        out["cond_collate"] = (time.perf_counter() - t0) * 1000
        bank._ship_conditions(conds_host)  # warm (compile)
        t0 = time.perf_counter()
        dev = bank._ship_conditions(conds_host)
        jax.block_until_ready(jax.tree.leaves(dev))
        out["cond_transfer"] = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    b = bank.assemble(rows, conds if conds[0] is not None else None)
    jax.block_until_ready(jax.tree.leaves(b))
    out["assemble_total"] = (time.perf_counter() - t0) * 1000
    return {k: round(v, 1) for k, v in out.items()}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--obs-agents", type=int, default=160)
    ap.add_argument("--agents", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--mode", default="rollout",
                    choices=["rollout", "train", "wosac"],
                    help="closed-loop inference, full training step, or the "
                         "WOSAC M-replica protocol")
    ap.add_argument("--replicas", type=int, default=32,
                    help="stochastic replicas per scene in --mode wosac")
    ap.add_argument("--wosac-scenes", type=int, default=4,
                    help="scenes per compiled rollout in --mode wosac "
                         "(B*M rows roll out together)")
    ap.add_argument("--conditions", default="all",
                    choices=sorted(COND_TYPES),
                    help="prompt-condition types through the condition "
                         "transformer (promptable-path bench)")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic demo-shaped batches instead of the demo "
                         "trajdata cache")
    ap.add_argument("--no-loader", action="store_true",
                    help="reuse pre-staged device batches instead of running "
                         "the host loader inside the timed loop")
    ap.add_argument("--no-scene-bank", action="store_true",
                    help="force the streaming loader instead of the "
                         "HBM-resident scene bank (data/scene_bank.py)")
    ap.add_argument("--cache-dir", default=DEMO_CACHE)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="extra config KEY VALUE overrides")
    args = ap.parse_args()

    real_data = (not args.synthetic) and os.path.isdir(args.cache_dir)
    if not args.synthetic and not real_data:
        print(f"bench: cache {args.cache_dir} absent -> synthetic",
              file=sys.stderr)

    from prosim_tpu.config import get_config
    from prosim_tpu.models.prosim import ProSim
    import jax.numpy as jnp
    import numpy as np

    cond_types = COND_TYPES[args.conditions]
    batch_size = args.wosac_scenes if args.mode == "wosac" else args.batch
    config = get_config(opts=[
        "DATASET.FORMAT.PAD.NUM_LANES", str(args.lanes),
        "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", str(args.obs_agents),
        "DATASET.FORMAT.PAD.NUM_AGENTS", str(args.agents),
        "MODEL.DTYPE", args.dtype,
        "PROMPT.CONDITION.TYPES", repr(cond_types),
        # conditions must actually be SAMPLED for the batch to carry them:
        # 'fix' + rate 1.0 = every eligible agent conditioned, the heaviest
        # honest promptable load
        "PROMPT.CONDITION.SAMPLE_MODE.TRAIN", "fix",
        "PROMPT.CONDITION.SAMPLE_MODE.VAL", "fix",
        "PROMPT.CONDITION.RANDOM_SAMPLE.TRAIN", "True",
        "PROMPT.CONDITION.SAMPLE_RATE", "1.0",
    ] + list(args.opts))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = ProSim(config, dtype=dtype)

    loader = None
    bank = None
    bank_info = None
    if real_data:
        # The warmup/compile batch MUST take the same host->device path as
        # the timed-loop batches: a batch arriving with a different
        # placement/committed-ness would miss the jit executable cache and
        # hide a ~20 s recompile inside the timed loop (observed: 25 -> 13
        # scenes/s). So build the scene bank (the default transport) first
        # and warm up through it.
        staged = _real_batches(config, args.cache_dir, batch_size, 1)
        _, ds = staged[0]
        if not args.no_loader and not args.no_scene_bank:
            # HBM-resident scene bank: scene tensors ship once, per-iter
            # host->device traffic is the sampled conditions only (measured
            # tunnel: ~29 MB/s, a full 0.26 GB batch = ~9 s of wire vs
            # ~2.5 s device compute) — see data/scene_bank.py
            try:
                from prosim_tpu.data.scene_bank import (DeviceSceneBank,
                                                        banked_batches)

                t0 = time.perf_counter()
                bank = DeviceSceneBank(ds)
                bank_info = {
                    "scene_bank": True,
                    "bank_scenes": len(bank.keys),
                    "bank_mb": round(
                        bank.per_scene_bytes * len(bank.keys) / 1e6, 1),
                    "bank_build_s": round(time.perf_counter() - t0, 1),
                }
            except ValueError as e:
                print(f"bench: scene bank unavailable ({e}); streaming",
                      file=sys.stderr, flush=True)
        if bank is not None:
            if ds.cond_gen.types:
                # The transport's relative cost varies with tunnel weather
                # (r4: packed measured SLOWER than per-leaf in one capture,
                # 8-10x FASTER in another) — so measure both here, use the
                # winner in the timed loop, and record both numbers so the
                # capture adjudicates itself.
                from prosim_tpu.data.formatter import collate_conditions

                conds = [bank.sample_conditions(i % len(ds), 77_000 + i)[1]
                         for i in range(batch_size)]
                ct = bank.measure_cond_transport(collate_conditions(conds))
                bank.cond_transport = min(ct, key=ct.get)
                bank_info["cond_transfer_ms"] = ct
                bank_info["cond_transport"] = bank.cond_transport
            batch = next(banked_batches(
                ds, [(i % len(ds), i) for i in range(batch_size)],
                batch_size, bank=bank))
        else:
            batch = next(_loader_in_loop(ds, batch_size, n_iters=1))
    else:
        from prosim_tpu.data.synthetic import make_synthetic_batch

        batch = make_synthetic_batch(
            config,
            batch_size=batch_size,
            num_lanes=args.lanes,
            num_obs_agents=args.obs_agents,
            num_agents=args.agents,
            num_replan=8,
        )
    params = model.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    # NOTE: measurements must end in a host fetch of a value derived from
    # the LAST iteration's output. Through the remote-TPU tunnel,
    # jax.block_until_ready returns before the device queue drains, so a
    # block-based timing over-reports throughput by orders of magnitude
    # (verified: dispatch-only loops "finish" in ms while the device needs
    # seconds per batch). Device execution is FIFO, so fetching a scalar
    # from the final output bounds the full pipeline.
    scenes_per_iter = batch_size
    if args.mode == "train":
        from prosim_tpu.train.optim import build_optimizer
        from prosim_tpu.train.train_step import make_train_step

        optimizer = build_optimizer(config, params)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(model, optimizer, config))
        cost_args = (step, params, opt_state, batch, key)
        params, opt_state, losses = step(params, opt_state, batch, key)
        float(losses["full_loss"])  # compile + warmup + drain

        def run_iter(p_state, b, k):
            p, s = p_state
            p, s, losses = step(p, s, b, k)
            return (p, s), losses["full_loss"]

        state = (params, opt_state)
        metric = "train_scenes_per_sec_per_chip"
    elif args.mode == "wosac":
        from prosim_tpu.rollout.rollout import parallel_rollout

        M = args.replicas
        roll = jax.jit(
            lambda p, b, k: parallel_rollout(model, p, b, M, k)
            ["rollout_traj"].sum())
        cost_args = (roll, params, batch, key)
        float(roll(params, batch, key))

        def run_iter(state, b, k):
            return state, roll(params, b, k)

        state = None
        metric = "wosac_m32_scene_rollouts_per_sec_per_chip"
    else:
        fwd = jax.jit(
            lambda p, b, k: model.forward(p, b, "rollout", k)["rollout_traj"].sum()
        )
        cost_args = (fwd, params, batch, key)
        float(fwd(params, batch, key))  # compile + warmup + drain

        def run_iter(state, b, k):
            return state, fwd(params, b, k)

        state = None
        metric = "closed_loop_scene_rollouts_per_sec_per_chip"

    flops_per_iter, bytes_per_iter = _cost_analysis(*cost_args)

    # Warm EVERY jit the timed loop touches: the per-iter fold_in is a tiny
    # compile, but the remote compile service's latency is long-tailed
    # (observed 1-20+ s) and would otherwise land inside iteration 0.
    jax.block_until_ready(jax.random.fold_in(key, 0))

    loader_in_loop = real_data and not args.no_loader
    device_only = None
    if loader_in_loop:
        # device-only companion: same compiled fn on the pre-staged batch, so
        # the JSON separates device throughput from host-loader overhead
        n_dev = max(4, args.iters // 2)
        t0 = time.perf_counter()
        st, o = state, None
        for i in range(n_dev):
            st, o = run_iter(st, batch, jax.random.fold_in(key, 1000 + i))
        float(o)
        device_only = round(scenes_per_iter * n_dev / (time.perf_counter() - t0), 3)

        def pairs():
            for n in range(args.iters * batch_size):
                yield n % len(ds), n

        if bank is not None:
            from prosim_tpu.data.scene_bank import banked_batches

            loader = banked_batches(ds, pairs(), batch_size, bank=bank)
        else:
            bank_info = {"scene_bank": False}
            loader = _loader_in_loop(ds, batch_size, args.iters)
        # let the prefetch queue fill so the measurement is steady-state
        # overlap, not a cold host pipeline
        time.sleep(2.0)

    t0 = time.perf_counter()
    out = None
    iter_s = []  # host-side pacing per iteration (loader next + dispatch)
    for i in range(args.iters):
        ti = time.perf_counter()
        b = next(loader) if loader_in_loop else batch
        state, out = run_iter(state, b, jax.random.fold_in(key, i))
        iter_s.append(time.perf_counter() - ti)
    t_drain = time.perf_counter()
    float(out)  # forced fetch: waits for every queued iteration
    dt = time.perf_counter() - t0

    scenes_per_sec = scenes_per_iter * args.iters / dt

    # Worst-case self-diagnosis (VERDICT r4 task 1d): if any iteration took
    # >5x the device-only time, the capture is host/transport-bound — print
    # per-iteration timings so a bad capture names its own cause.
    iter_stats = {
        "min_ms": round(min(iter_s) * 1000, 1),
        "p50_ms": round(sorted(iter_s)[len(iter_s) // 2] * 1000, 1),
        "max_ms": round(max(iter_s) * 1000, 1),
        "drain_ms": round((time.perf_counter() - t_drain) * 1000, 1),
    }
    if device_only is not None and device_only > 0:
        dev_iter_s = scenes_per_iter / device_only
        if max(iter_s) > 5.0 * dev_iter_s:
            print("bench: WORST-CASE GUARD — iteration(s) exceeded 5x the "
                  f"device-only time ({dev_iter_s:.2f}s): per-iter seconds = "
                  f"{[round(s, 2) for s in iter_s]}",
                  file=sys.stderr, flush=True)

    # agent-steps/sec/chip (BASELINE.md tracked metric): valid policy agents
    # per scene x 80 closed-loop steps (8 replans x 10 Hz chunks)
    agents_per_scene = float(np.asarray(batch.prompt.mask).sum()) / batch_size
    steps = int(batch.fut_obs.feat.shape[1]) * config.ROLLOUT.POLICY.REPLAN_FREQ
    mult = args.replicas if args.mode == "wosac" else 1
    agent_steps = scenes_per_sec * mult * agents_per_scene * steps

    kind, peak = _peak_flops()
    result = {
        "metric": metric,
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / TARGET_PER_CHIP, 3),
        "agent_steps_per_sec_per_chip": round(agent_steps, 1),
        "conditions": args.conditions,
        "mode": args.mode,
        "real_data": real_data,
        "loader_in_loop": loader_in_loop,
        "batch": batch_size,
        "device_kind": kind,
    }
    if args.mode == "wosac":
        result["replicas"] = args.replicas
    if loader_in_loop:
        result["iter_stats"] = iter_stats
    if device_only is not None:
        result["device_only_scenes_per_sec"] = device_only
        # breakdown of the transport the timed loop ACTUALLY used
        result["host_ms_per_batch"] = (
            _bank_stage_breakdown(bank, ds, batch_size) if bank is not None
            else _host_stage_breakdown(ds, batch_size, config))
    if bank_info:
        result.update(bank_info)
    if "llm_text_OneText" in cond_types:
        # disclose the text-encoder scale: WEIGHTS_PATH unset means the
        # jitted text path runs LlamaConfig.tiny() random weights (8B
        # weights are not present in this environment), not 8B-scale work
        llm_cfg = config.MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM
        result["llm_arch"] = (
            llm_cfg.ARCH if llm_cfg.ARCH != "auto"
            else ("llama3_8b" if llm_cfg.WEIGHTS_PATH else "tiny"))
    if flops_per_iter:
        iters_per_sec = scenes_per_sec / scenes_per_iter
        result["tflops_per_scene"] = round(
            flops_per_iter / scenes_per_iter / 1e12, 4)
        result["mfu"] = round(flops_per_iter * iters_per_sec / peak, 4)
        result["assumed_peak_tflops"] = round(peak / 1e12, 1)
        if result["mfu"] < 0.01:
            # low MFU is expected at demo-model scale: HIDDEN_DIM=128
            # gather/attention work is HBM- and VPU-bound, not MXU-bound
            result["mfu_note"] = "demo-scale model is memory-bound, not MXU-bound"
    if bytes_per_iter:
        iters_per_sec = scenes_per_sec / scenes_per_iter
        result["hbm_gb_per_sec"] = round(bytes_per_iter * iters_per_sec / 1e9, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
