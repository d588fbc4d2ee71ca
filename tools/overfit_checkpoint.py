"""Overfit a flagship-dims checkpoint on synthetic data (VERDICT r3
next-7).

The bf16 kernel promotion policy (docs/DESIGN.md) anchored its token
-agreement numbers on INIT weights, with a stated assumption that
trained-weights margins are wider.  This tool produces the trained
checkpoint to test that: it runs the real 4-loss train step at
flagship dims (vocab 4905, rnn 1024, 1000 ROIs, bf16, batch 240
accum 8 — the exact BENCH_TRAIN config) over a small cycled pool of
synthetic batches until the LM loss collapses (strong overfit = sharp,
non-random logit margins), then saves params + BN state as a flat npz
(utils/params_io.py) for tools/encoder_agreement.py,
tools/quantize_report.py and tools/bench_decode_kernel.py --params.

Run on the real chip (~1 s/step at 230 seg/s).

Usage: python tools/overfit_checkpoint.py [--steps 300] [--pool 8]
       [--out /tmp/gvd_trained.npz]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pool", type=int, default=2,
                    help="distinct synthetic batches cycled (device-"
                         "resident; at flagship dims each is ~1.7 GB "
                         "with bf16 features — 8 f32 batches was ~27 GB "
                         "and OOMed the 16 GB v5e HBM)")
    ap.add_argument("--batch", type=int, default=240)
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--out", default="/tmp/gvd_trained.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine.trainer import Trainer
    from grounded_video_description_tpu.utils.params_io import (
        save_variables)

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        grad_accum=args.accum, remat=False, batch_size=args.batch,
        learning_rate_decay_start=-1).validate()
    trainer = Trainer(cfg)
    state = trainer.init_state()
    step_fn = trainer.make_train_step(donate=True)

    # the two big feature tensors go to device as bf16 (the model casts
    # to cfg.dtype anyway); everything geometric/integer stays f32/int
    def _to_device(b):
        out = {}
        for k, v in b.items():
            if k == "seg_id":
                continue
            if k in ("seg_feat", "ppls_feat"):
                v = v.astype(jnp.bfloat16)
            out[k] = jnp.asarray(v)
        return out

    pool = [_to_device(synthetic_batch(cfg, args.batch, seed=s))
            for s in range(args.pool)]

    params, mstate, opt = state.params, state.model_state, state.opt_state
    rng = trainer.rng
    t0 = time.perf_counter()
    first_loss = None
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        params, mstate, opt, metrics = step_fn(
            params, mstate, opt, pool[i % args.pool], sub, args.lr)
        if i % 25 == 0 or i == args.steps - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            if first_loss is None:
                first_loss = m["loss"]
            print(json.dumps({"step": i, **m,
                              "elapsed_s": round(
                                  time.perf_counter() - t0, 1)}),
                  flush=True)

    save_variables(args.out, {"params": params, "state": mstate})
    print(json.dumps({
        "saved": args.out, "steps": args.steps,
        "first_loss": first_loss,
        "final_loss": round(float(metrics["loss"]), 4),
        "final_lm": round(float(metrics["lm_loss"]), 4)}), flush=True)


if __name__ == "__main__":
    main()
