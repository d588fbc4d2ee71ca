"""Train-step component ablation at flagship dims (VERDICT r3 follow-up).

Times the accum-8 train step with individual components disabled to
attribute the 1.35 s step, the same methodology as round 2's decode
ablation (docs/DESIGN.md).  Variants:

  * full            — baseline (obj_interact, T=480 temporal path)
  * no_obj_interact — drops the 2-layer region transformer
  * t64             — temporal path at 64 frames instead of 480
                      (isolates the sequential BiRNN recurrence cost;
                      the per-frame matmuls scale too, but those are
                      ~1/8 of the scan latency at T=480)
  * no_dropout      — all dropout rates 0 (residual RNG+mask cost
                      after the rbg switch)
  * seq4            — seq_length 4 instead of 20 (isolates the decode
                      scan + per-step supervision; ~4/5 of that
                      bucket removed)
  * accum4/accum16  — accumulation granularity re-sweep (microbatch
                      60 / 15) under the rbg RNG default

Prints one JSON line per variant.  Select a subset by name on argv.
Each variant is a fresh compile (~1-2 min on the tunnel,
service-load dependent).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def time_step(cfg, iters=5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.init_state()
    step_fn = trainer.make_train_step(donate=False)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, cfg.batch_size,
                                         seed=0).items()
             if k != "seg_id"}
    rng = trainer.rng  # respects cfg.rng_impl
    out = step_fn(state.params, state.model_state, state.opt_state,
                  batch, rng, 5e-4)
    np.asarray(out[3]["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step_fn(state.params, state.model_state, state.opt_state,
                      batch, rng, 5e-4)
    np.asarray(out[3]["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    from grounded_video_description_tpu.config import GVDConfig

    base = dict(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        grad_accum=8, batch_size=240, remat=False,
        learning_rate_decay_start=-1)

    variants = {
        "full": {},
        "no_obj_interact": {"obj_interact": False},
        "t64": {"t_attn_size": 64},
        "no_dropout": {"drop_prob_lm": 0.0, "loc_drop": 0.0,
                       "enc_drop": 0.0},
        "seq4": {"seq_length": 4},
        "accum4": {"grad_accum": 4},
        "accum16": {"grad_accum": 16},
    }
    if len(sys.argv) > 1:
        variants = {k: variants[k] for k in sys.argv[1:]}
    results = {}
    for name, over in variants.items():
        cfg = GVDConfig(**{**base, **over}).validate()
        s = time_step(cfg)
        results[name] = round(s, 4)
        print(json.dumps({"variant": name, "step_seconds": results[name],
                          "seg_per_sec": round(240 / s, 1)}), flush=True)
    print(json.dumps({"ablation": results}))


if __name__ == "__main__":
    main()
