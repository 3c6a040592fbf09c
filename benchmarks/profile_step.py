"""Profiler-guided attribution for the train step and the sampling chain.

Captures a `jax.profiler` trace of either the XL/2 bs128 train step or the
256^2 CFG sampling step, then parses the TensorBoard trace
(`plugins/profile/<run>/<host>.trace.json.gz`, Chrome-trace events) and prints the
top device ops aggregated by kernel category and by individual fusion —
the "where do the milliseconds go" table the reference never had
(its only instrumentation is steps/sec logging, train.py:213-226).

Usage:
    python benchmarks/profile_step.py --mode train --batch 128
    python benchmarks/profile_step.py --mode sample --batch 8 --steps 10
    python benchmarks/profile_step.py --parse-only /tmp/fdt_profile
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# trace parsing
# ---------------------------------------------------------------------------

def parse_trace(logdir: str, top: int = 25):
    """Aggregate device-op durations from the newest trace under `logdir`.

    Uses the per-op metadata the TPU profiler attaches to every event on the
    device's "XLA Ops" lane: `hlo_category` (the compiler's own taxonomy),
    `source` (the python file:line the op traces back to), `model_flops` and
    `bytes_accessed` (per-op roofline numbers).
    """
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # individual op events live on the device's "XLA Ops" thread lane;
    # "XLA Modules"/"Steps" lanes are whole-program spans (double-counting)
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if re.search(r"TPU|/device:|Chip", pname, re.I):
                device_pids.add(e["pid"])
    op_lanes = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in device_pids
                and "XLA Ops" in e.get("args", {}).get("name", "")):
            op_lanes.add((e["pid"], e.get("tid")))

    stat = lambda: collections.defaultdict(
        lambda: {"us": 0.0, "n": 0, "flops": 0, "bytes": 0})
    by_op, by_cat, by_src = stat(), stat(), stat()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        dur = e.get("dur", 0)  # microseconds
        if dur <= 0:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        src = a.get("source", "?")
        # keep repo-relative sources readable
        src = re.sub(r"^/root/repo/", "", src)
        src = re.sub(r"^/opt/venv/lib/python[^/]+/site-packages/", "", src)
        flops = int(a.get("model_flops", 0) or 0)
        bts = int(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        base = re.sub(r"\.\d+$", "", e.get("name", "?"))
        for agg, key in ((by_op, base), (by_cat, cat), (by_src, src)):
            s = agg[key]
            s["us"] += dur
            s["n"] += 1
            s["flops"] += flops
            s["bytes"] += bts

    total = sum(s["us"] for s in by_cat.values())
    if total == 0:
        raise RuntimeError(
            f"no device op events found in {path} — op lanes seen: "
            f"{sorted(op_lanes)}")

    def table(agg, title, k):
        print(f"\n-- {title} --")
        rows = sorted(agg.items(), key=lambda kv: -kv[1]["us"])[:k]
        for name, s in rows:
            tf = s["flops"] / s["us"] / 1e6 if s["us"] else 0   # Tflop/s
            gb = s["bytes"] / s["us"] / 1e3 if s["us"] else 0   # GB/s
            print(f"{s['us'] / 1e3:9.2f} ms {100 * s['us'] / total:5.1f}% "
                  f"x{s['n']:<6d}{tf:7.1f} Tf/s {gb:8.1f} GB/s  {name[:70]}")

    print(f"\ntrace: {path}")
    print(f"total device op time: {total / 1e3:.2f} ms")
    table(by_cat, "by hlo_category", 15)
    table(by_src, "by python source line", top)
    table(by_op, f"top {top} ops", top)
    return by_op, by_cat, by_src, total


# ---------------------------------------------------------------------------
# workload capture
# ---------------------------------------------------------------------------


def capture_train(args, logdir):
    import jax
    import jax.numpy as jnp

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.train import create_train_state, make_train_step

    latent = args.image_size // 8
    model = DiT_models[args.model](
        input_size=latent, dtype=jnp.bfloat16, remat=True,
        remat_policy=args.remat_policy, attn_backend=args.attn_backend,
        scan_unroll=args.scan_unroll)
    schedule = create_diffusion("").schedule
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   mixed_precision=True,
                                   mu_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(model, schedule, tx), donate_argnums=(0,))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1),
                                    (args.batch, 4, latent, latent)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (args.batch,),
                                     0, 1000)}
    for _ in range(2):  # compile + settle
        state, m = step(state, batch, jax.random.PRNGKey(3))
        float(m["loss"])
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            state, m = step(state, batch, jax.random.PRNGKey(3))
            float(m["loss"])


def capture_sample(args, logdir):
    import jax
    import jax.numpy as jnp

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models

    latent = args.image_size // 8
    model = DiT_models[args.model](input_size=latent, dtype=jnp.bfloat16,
                                   attn_backend=args.attn_backend)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4, latent, latent)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    diffusion = create_diffusion(str(args.steps))
    n = args.batch
    y = jnp.concatenate([jnp.arange(n) % 1000, jnp.full((n,), 1000)])

    @jax.jit
    def run(params, rng):
        z = jax.random.normal(rng, (n, 4, latent, latent))
        z = jnp.concatenate([z, z], 0)
        apply = lambda x, t: model.apply(params, x, t, y,
                                         method=model.forward_with_cfg,
                                         cfg_scale=1.5)
        return diffusion.p_sample_loop(apply, z.shape, noise=z, rng=rng,
                                       clip_denoised=False)[:n]

    float(run(params, jax.random.PRNGKey(0)).sum())
    with jax.profiler.trace(logdir):
        float(run(params, jax.random.PRNGKey(1)).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "sample"], default="train")
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10,
                    help="sampling steps to trace (sample mode)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--attn-backend", default="auto")
    ap.add_argument("--remat-policy", default="nothing")
    ap.add_argument("--scan-unroll", type=int, default=1)
    ap.add_argument("--logdir", default="/tmp/fdt_profile")
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse an existing trace dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.parse_only, args.top)
        return

    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()

    os.makedirs(args.logdir, exist_ok=True)
    if args.mode == "train":
        capture_train(args, args.logdir)
    else:
        capture_sample(args, args.logdir)
    parse_trace(args.logdir, args.top)


if __name__ == "__main__":
    main()
