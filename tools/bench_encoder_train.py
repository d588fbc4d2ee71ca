"""Hardware A/B: fused TRAIN encoder-layer kernel vs the XLA schedule.

Times fwd+bwd of the 2-layer obj_interact region transformer at the
exact training microbatch shapes (B=30, R=1000, D=1024, HID=512,
drop=0.2, bf16) — the ~289 ms/step bucket from the round-3 train
decomposition (docs/DESIGN.md).  Variants:

  * xla_rbg     — models/transformer.encoder_apply + jax.grad, rbg
                  dropout keys (the current training default)
  * fused       — ops/pallas/encoder_layer_train custom-vjp kernel
                  (in-kernel hash dropout, bwd recomputes in VMEM)
  * fused btX/Y — fwd/bwd batch-tile sweep
  * xla_nodrop  — drop=0 upper bound for context

Prints one JSON line per variant plus a summary line.
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

B, R, D, HEADS, HID, LAYERS, DROP = 30, 1000, 1024, 6, 512, 2, 0.2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.models import transformer as xf
    from grounded_video_description_tpu.ops.pallas import (
        encoder_layer_train as fet)

    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, LAYERS)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D), jnp.bfloat16)
    key_rbg = jax.random.key(2, impl="rbg")

    def loss_xla(p, x, rng, drop):
        out = xf.encoder_apply(p, x, n_heads=HEADS, drop=drop,
                               train=True, rng=rng)[-1]
        return jnp.sum(out.astype(jnp.float32))

    def loss_fused(p, x, rng, bt_fwd, bt_bwd):
        out = fet.encoder_apply_fused_train(
            p, x, n_heads=HEADS, drop=DROP, rng=rng,
            bt_fwd=bt_fwd, bt_bwd=bt_bwd)[-1]
        return jnp.sum(out.astype(jnp.float32))

    def timed(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    variants = {
        "xla_rbg": (jax.jit(jax.grad(functools.partial(loss_xla,
                                                       drop=DROP))),
                    (params, x, key_rbg)),
        "xla_nodrop": (jax.jit(jax.grad(functools.partial(loss_xla,
                                                          drop=0.0))),
                       (params, x, key_rbg)),
    }
    for bt_fwd, bt_bwd in ((4, 2), (4, 1), (2, 2), (6, 3)):
        variants[f"fused bt{bt_fwd}/{bt_bwd}"] = (
            jax.jit(jax.grad(functools.partial(
                loss_fused, bt_fwd=bt_fwd, bt_bwd=bt_bwd))),
            (params, x, key_rbg))

    results = {}
    for name, (fn, args) in variants.items():
        try:
            s = timed(fn, *args)
        except Exception as e:  # OOM/VMEM at some tile sizes is data
            print(json.dumps({"variant": name,
                              "error": str(e)[:200]}), flush=True)
            continue
        results[name] = round(s * 1e3, 2)
        print(json.dumps({"variant": name, "ms": results[name],
                          "x8_microbatches_ms": round(s * 8e3, 1)}),
              flush=True)
    print(json.dumps({"encoder_train_bench": results}))


if __name__ == "__main__":
    main()
