"""obj_interact TRAINING cost breakdown (round 3).

The train-step ablation (tools/ablate_train.py, docs/DESIGN.md) put
the 2-layer region transformer at 447 ms of the 1.353 s accum-8 step.
This tool times fwd+bwd of `encoder_apply` alone at the exact
microbatch shapes (B=30, R=1000, D=1024, 6 heads, bf16, drop 0.2) to
attribute that cost:

  * threefry    — baseline: dropout RNG via JAX's default threefry
                  (the (B, R, R) attention-prob masks alone draw
                  6 heads x 2 layers x 30M bits per microbatch)
  * rbg         — same math, `rbg` PRNG impl (XLA RngBitGenerator —
                  hardware RNG path on TPU)
  * no_dropout  — drop=0.0 upper bound (isolates ALL dropout cost:
                  RNG + mask traffic)
  * remat       — threefry + jax.checkpoint (the --remat train config)

Prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

B, R, D, HEADS, HID, LAYERS = 30, 1000, 1024, 6, 512, 2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.models import transformer as xf

    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, LAYERS)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D), jnp.bfloat16)

    def loss(p, x, rng, drop):
        out = xf.encoder_apply(p, x, n_heads=HEADS, drop=drop,
                               train=True, rng=rng)[-1]
        return jnp.sum(out.astype(jnp.float32))

    def timed(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    key_tf = jax.random.PRNGKey(2)
    key_rbg = jax.random.key(2, impl="rbg")

    variants = {
        "threefry": (jax.jit(jax.grad(functools.partial(loss, drop=0.2))),
                     (params, x, key_tf)),
        "rbg": (jax.jit(jax.grad(functools.partial(loss, drop=0.2))),
                (params, x, key_rbg)),
        "no_dropout": (jax.jit(jax.grad(functools.partial(loss, drop=0.0))),
                       (params, x, key_tf)),
        "remat": (jax.jit(jax.grad(
            lambda p, x, rng: jax.checkpoint(
                functools.partial(loss, drop=0.2))(p, x, rng))),
            (params, x, key_tf)),
        # round-3 follow-up: remat re-measured under rbg — the old
        # "no change" verdict was taken when threefry RNG hid the
        # (B, R, R) prob-tensor save/restore traffic
        "rbg_remat": (jax.jit(jax.grad(
            lambda p, x, rng: jax.checkpoint(
                functools.partial(loss, drop=0.2))(p, x, rng))),
            (params, x, key_rbg)),
    }
    results = {}
    for name, (fn, args) in variants.items():
        s = timed(fn, *args)
        results[name] = round(s * 1e3, 2)
        print(json.dumps({"variant": name, "ms": results[name],
                          "x8_microbatches_ms": round(s * 8e3, 1)}),
              flush=True)
    print(json.dumps({"objattn_train_ablation": results}))


if __name__ == "__main__":
    main()
