"""Hardware A/B: per-(row, head) fused attention TRAIN primitive.

Times fwd+bwd of the 2-layer obj_interact region transformer at the
exact training microbatch shapes (B=30, R=1000, D=1024, HID=512,
drop=0.2, bf16) across the three attention schedules of
models/transformer._mha:

  * xla     — batched einsums + rbg dropout (current default)
  * pallas  — Pallas fwd + Pallas bwd (ops/pallas/attention_train.py);
              probs + masks never reach HBM in either pass
  * hybrid  — XLA fwd (probs hit HBM once), Pallas bwd
  * *_nodrop — drop=0 variants for context

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

    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, LAYERS)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D), jnp.bfloat16)
    key_rbg = jax.random.key(2, impl="rbg")

    def loss(p, x, rng, impl, drop):
        out = xf.encoder_apply(p, x, n_heads=HEADS, drop=drop,
                               train=True, rng=rng,
                               attn_train_impl=impl)[-1]
        return jnp.sum(out.astype(jnp.float32))

    def timed(fn, *args, iters=10):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    variants = {}
    for impl in ("xla", "pallas", "hybrid"):
        variants[impl] = (
            jax.jit(jax.grad(functools.partial(loss, impl=impl,
                                               drop=DROP))),
            (params, x, key_rbg))
        variants[f"{impl}_nodrop"] = (
            jax.jit(jax.grad(functools.partial(loss, impl=impl,
                                               drop=0.0))),
            (params, x, key_rbg))

    results = {}
    for name, (fn, args) in variants.items():
        try:
            s = timed(fn, *args)
        except Exception as e:  # VMEM OOM etc. is data, not failure
            print(json.dumps({"variant": name,
                              "error": str(e)[:300]}), flush=True)
            continue
        results[name] = round(s * 1e3, 2)
        print(json.dumps({"variant": name, "ms": results[name],
                          "x8_microbatches_ms": round(s * 8e3, 1)}),
              flush=True)
    print(json.dumps({"attn_train_bench": results}))


if __name__ == "__main__":
    main()
