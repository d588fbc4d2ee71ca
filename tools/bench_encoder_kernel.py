"""A/B the fused obj_interact encoder-layer kernel on hardware.

Times the jitted 2-layer region encoder at the flagship eval shape
(B=100, R=1000, D=1024, 6 heads, bf16, inference) three ways:

  * xla    — transformer.encoder_apply einsum schedule (current default)
  * fused  — ops/pallas/encoder_layer.py whole-layer kernel
  * fused_bt2 / fused_bt8 — batch-tile sweep

Prints one JSON line per variant; the end-to-end effect is measured
separately by `python bench.py` with --use_pallas_encoder.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

B, R, D, HEADS, HID, LAYERS = 100, 1000, 1024, 6, 512, 2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.models import transformer as xf
    from grounded_video_description_tpu.ops.pallas.encoder_layer import (
        encoder_apply_fused)

    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, LAYERS)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D), jnp.bfloat16)

    def timed(fn, iters=10):
        out = fn(x)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters

    # reduce the (100, 1000, 1024) output ON DEVICE: a raw readback of
    # 205 MB through the axon tunnel takes ~1.3 s and would dominate
    # the timing (the greedy bench only reads back (B, 20) tokens)
    def reduced(fn):
        return jax.jit(lambda a: jnp.sum(fn(a).astype(jnp.float32)))

    variants = {
        "xla": reduced(lambda a: xf.encoder_apply(
            params, a, n_heads=HEADS, drop=0.0, train=False)[-1]),
        "fused_bt4": reduced(lambda a: encoder_apply_fused(
            params, a, n_heads=HEADS, bt=4)[-1]),
        "fused_bt2": reduced(lambda a: encoder_apply_fused(
            params, a, n_heads=HEADS, bt=2)[-1]),
        "fused_bt5": reduced(lambda a: encoder_apply_fused(
            params, a, n_heads=HEADS, bt=5)[-1]),
        "fused_bt4_dp256": reduced(lambda a: encoder_apply_fused(
            params, a, n_heads=HEADS, bt=4, pad_to=256)[-1]),
    }
    which = sys.argv[1:] or list(variants)
    results = {}
    for name in which:
        t0 = time.perf_counter()
        s = timed(variants[name])
        results[name] = round(s * 1e3, 2)
        print(json.dumps({"variant": name, "ms": results[name],
                          "first_call_s": round(time.perf_counter() - t0,
                                                1)}), flush=True)
    # numerical sanity on-device (bf16 tolerance, small readback)
    if "xla" in which and any(k.startswith("fused") for k in which):
        diff = jax.jit(lambda a: jnp.max(jnp.abs(
            xf.encoder_apply(params, a, n_heads=HEADS, drop=0.0,
                             train=False)[-1].astype(jnp.float32)
            - encoder_apply_fused(params, a, n_heads=HEADS,
                                  bt=4)[-1].astype(jnp.float32))))(x)
        print(json.dumps({"max_abs_diff_bf16": float(np.asarray(diff))}))
    print(json.dumps({"encoder_kernel_ab": results}))


if __name__ == "__main__":
    main()
