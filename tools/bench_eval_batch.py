"""Greedy-decode batch-size sweep on one chip.

The reference evaluates at batch 100 because that is what fits a
single GPU's 9 GB (README.md:103, 123); bench.py keeps B=100 as the
headline for baseline continuity.  But eval batch size is NOT a
workload parameter — segments are independent — so on a 16 GB-HBM v5e
the production-serving question is: where does caps/s/chip peak?

Two levers scale with B:
  * the decode scan is latency-bound (~18 ms / 20 steps at B=100,
    docs/DESIGN.md): each step's weight streams amortize over more
    batch rows, and the sequential-step overhead is shared;
  * encode is compute-bound and should scale ~linearly (flat caps/s).

Prints one JSON line per batch size (caps/s, ms/batch, MFU) and a
summary line.  Run on the real chip; compiles are cached.

Usage: python tools/bench_eval_batch.py [--batches 100 200 400]
       [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PEAK_BF16_FLOPS = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[100, 200, 400])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.models import GVDModel

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        learning_rate_decay_start=-1).validate()
    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))

    results = {}
    for B in args.batches:
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(cfg, B, seed=0).items()
                 if k != "seg_id"}
        try:
            compiled = jax.jit(model.sample_greedy).lower(
                variables, batch).compile()
            out = compiled(variables, batch)
            np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = compiled(variables, batch)
            np.asarray(out[0])
            dt = (time.perf_counter() - t0) / args.iters
            try:
                fl = float(compiled.cost_analysis()["flops"])
            except Exception:
                fl = 0.0
            rec = {"batch": B, "caps_per_sec": round(B / dt, 1),
                   "ms_per_batch": round(dt * 1e3, 2)}
            if fl > 0:
                rec["mfu"] = round(fl / dt / PEAK_BF16_FLOPS, 3)
            results[B] = rec
        except Exception as e:
            rec = {"batch": B, "error": repr(e)[:300]}
            results[B] = rec
        print(json.dumps(rec), flush=True)

    print(json.dumps({"bench_eval_batch": results}))


if __name__ == "__main__":
    main()
