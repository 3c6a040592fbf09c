"""Isolate the optimizer+EMA update cost at DiT-XL/2 scale (675M params).

Compares three implementations of the same mixed-precision AdamW+EMA step
(bf16 params/grads/mu, fp32 nu/master/ema):

- optax:  masterize(optax.adamw) + update_ema (the --fused-optimizer=off path)
- xla:    the same math hand-fused into one tree.map pass (_update_math) —
          what --fused-optimizer uses; measured 36.0 ms/step (v5e, 675M)
- pallas: the explicit Pallas kernel (use_pallas=True) — measured 42.1
          ms/step on a flat buffer and OOM-prone on real trees (layout
          copies); kept for kernel experiments

Prints one JSON line per variant. The lower bound is pure HBM bandwidth:
~21.6 GB of state traffic per step (~24 ms at v5e's ~0.9 TB/s)."""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import optax


def xl_tree():
    """Leaf sizes shaped like DiT-XL/2's stacked param tree."""
    key = jax.random.PRNGKey(0)
    shapes = [
        (28, 1152, 3, 16, 72),   # qkv kernels
        (28, 16, 72, 1152),      # proj kernels
        (28, 1152, 4608),        # fc1
        (28, 4608, 1152),        # fc2
        (28, 1152, 6912),        # adaLN
        (1001, 1152),            # label embed
        (256, 1152), (1152, 1152),
        (16, 1152), (1152, 32),
    ]
    return {f"p{i}": jax.random.normal(key, s, jnp.bfloat16) * 0.02
            for i, s in enumerate(shapes)}


def main():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants", default="optax,xla,pallas")
    args = ap.parse_args()

    from fast_dit_tpu.ops import fused_update as fu
    from fast_dit_tpu.train.mixed_precision import masterize
    from fast_dit_tpu.train.train_lib import update_ema

    # memory: each variant builds (and donates) its OWN ~12 GB state and
    # frees it before the next variant runs; only `grads` (1.35 GB) is shared
    grads = jax.tree.map(lambda p: jnp.full(p.shape, 1e-4, p.dtype), xl_tree())
    n = sum(p.size for p in jax.tree.leaves(grads))
    lr, ema_d = 1e-4, 0.9999

    def time_step(step, state):
        # host-sync EVERY step by fetching one element of the updated ema:
        # on this runtime, bare block_until_ready over a chain of donated
        # programs has produced phantom timings (CLAUDE.md). The fetch
        # depends on the step's output, so it cannot complete early. The
        # per-step tunnel round-trip biases all variants equally; it is
        # measured separately below and reported as rtt_ms so the
        # execution-only cost is value - rtt.
        def sync(s):
            return float(jax.tree.leaves(s[2])[0].ravel()[0])

        state = step(state)          # compile + warm
        sync(state)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state = step(state)
            sync(state)
        per_step = (time.perf_counter() - t0) / args.steps
        # pure fetch round-trip on an already-materialized buffer
        t0 = time.perf_counter()
        for _ in range(args.steps):
            sync(state)
        rtt = (time.perf_counter() - t0) / args.steps
        return per_step, rtt

    results = {}

    def finish(name, step, state):
        per_step, rtt = time_step(step, state)
        results[name] = per_step
        # print immediately: on this runtime, back-to-back ~12 GB
        # alloc/free cycles can still exhaust HBM (prefer one variant per
        # process), and partial results should survive that
        print(json.dumps({
            "metric": f"optimizer+EMA update ({name}), {n/1e6:.0f}M params",
            "value": round(per_step * 1e3, 2), "unit": "ms/step",
            "rtt_ms": round(rtt * 1e3, 2),
            "exec_ms": round((per_step - rtt) * 1e3, 2)}),
            flush=True)
        step.clear_cache()

    if "optax" in args.variants:
        tx = masterize(optax.adamw(lr, weight_decay=0.0, mu_dtype=jnp.bfloat16))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_optax(state):
            p, o, e = state
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            e = update_ema(e, o.master, ema_d)
            return p, o, e

        fresh = xl_tree()
        ema = jax.tree.map(lambda p: p.astype(jnp.float32), fresh)
        finish("optax", step_optax, (fresh, tx.init(fresh), ema))
        del fresh, ema

    if "xla" in args.variants:
        # identical math to the Pallas kernel, left to XLA's fuser
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_xla(state):
            p, (c, m, v, w), e = state
            c = c + 1
            t = c.astype(jnp.float32)
            bc1 = 1.0 / (1.0 - 0.9 ** t)
            bc2 = 1.0 / (1.0 - 0.999 ** t)
            out = jax.tree.map(
                lambda g, mm, vv, ww, ee: fu._update_math(
                    g, mm, vv, ww, ee, bc1, bc2, lr=lr, b1=0.9, b2=0.999,
                    eps=1e-8, wd=0.0, ema_decay=ema_d,
                    mu_dtype=jnp.bfloat16, p_dtype=jnp.bfloat16),
                grads, m, v, w, e)
            unzip = lambda i: jax.tree.map(lambda _, o: o[i], grads, out)
            return unzip(0), (c, unzip(1), unzip(2), unzip(3)), unzip(4)

        fresh = xl_tree()
        s0 = fu.fused_adamw_ema_init(fresh)
        ema = jax.tree.map(jnp.copy, s0.master)
        finish("xla", step_xla, (fresh, (s0.count, s0.mu, s0.nu, s0.master), ema))
        del fresh, s0, ema

    if "pallas" in args.variants:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_pallas(state):
            p, o, e = state
            p, o, e = fu.fused_adamw_ema_apply(o, grads, p, e, lr=lr,
                                               ema_decay=ema_d,
                                               use_pallas=True)
            return p, o, e

        fresh = xl_tree()
        s0 = fu.fused_adamw_ema_init(fresh)
        ema = jax.tree.map(jnp.copy, s0.master)
        finish("pallas", step_pallas, (fresh, s0, ema))
        del fresh, s0, ema



if __name__ == "__main__":
    main()
