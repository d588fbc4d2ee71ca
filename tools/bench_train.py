"""Train-step benchmark at flagship dims, with MFU accounting.

Measures the jitted supervised train step (4-loss MLE objective,
reference main.py:197-311 semantics) at the reference's global batch
240 (README.md / main.py:556: 30 per GPU x 8 V100s) on ONE chip, via
gradient accumulation.  Reports segments/s, the optimized-HLO FLOP
count from XLA's cost model, and MFU against the v5e bf16 peak.

Writes BENCH_TRAIN.json at the repo root and prints it.

Usage:  python tools/bench_train.py [--accum 8] [--batch 240]
        [--remat] [--iters 5]
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

PEAK_BF16_FLOPS = 197e12   # v5e bf16 peak ("TPU v5 lite")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--accum", type=int, default=8)
    ap.add_argument("--batch", type=int, default=240)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--probs_remat", action="store_true",
                    help="selective remat of the obj_interact "
                         "(B, R, R) attention probs only")
    ap.add_argument("--donate", action="store_true",
                    help="donate params/opt-state buffers as the real "
                         "driver does (cfg.donate_buffers) — frees "
                         "~750 MB of duplicated state at the cost of "
                         "threading state through the timing loop")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_TRAIN.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine.trainer import Trainer

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        grad_accum=args.accum, remat=args.remat, batch_size=args.batch,
        obj_interact_probs_remat=args.probs_remat,
        learning_rate_decay_start=-1,
    ).validate()

    trainer = Trainer(cfg)
    state = trainer.init_state()
    step_fn = trainer.make_train_step(donate=args.donate)

    B = args.batch
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, B, seed=0).items()
             if k != "seg_id"}
    rng = trainer.rng  # respects cfg.rng_impl

    lowered = step_fn.lower(state.params, state.model_state,
                            state.opt_state, batch, rng, 5e-4)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    try:
        flops_per_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_step = 0.0
    if args.accum > 1 and flops_per_step > 0:
        # XLA's cost model counts a scan body ONCE regardless of trip
        # count, so the accum-scan step under-reports by ~accum x.
        # Honest accounting: compile the accum=1 step at microbatch
        # size and scale (optimizer-update flops are ~0.01% and
        # negligible in the double count).
        cfg1 = cfg.replace(grad_accum=1, batch_size=B // args.accum)
        tr1 = Trainer(cfg1)
        st1 = tr1.init_state()
        mb = {k: v[: B // args.accum] for k, v in batch.items()}
        c1 = tr1.make_train_step(donate=False).lower(
            st1.params, st1.model_state, st1.opt_state, mb, rng,
            5e-4).compile()
        try:
            flops_per_step = float(
                c1.cost_analysis()["flops"]) * args.accum
        except Exception:
            pass

    p, ms, os_ = state.params, state.model_state, state.opt_state
    p, ms, os_, out3 = compiled(p, ms, os_, batch, rng, 5e-4)
    np.asarray(out3["loss"])          # host readback sync (CLAUDE.md)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, ms, os_, out3 = compiled(p, ms, os_, batch, rng, 5e-4)
    np.asarray(out3["loss"])
    dt = time.perf_counter() - t0

    step_s = dt / args.iters
    seg_per_sec = B / step_s
    rec = {
        "metric": "supervised_train_seg_per_sec_per_chip",
        "value": round(seg_per_sec, 1),
        "unit": "segments/s",
        "config": (f"batch {B}, grad_accum {args.accum} (microbatches of "
                   f"{B // args.accum}), remat={args.remat}, "
                   f"probs_remat={args.probs_remat}, "
                   f"donate={args.donate}, bfloat16, "
                   "obj_interact, 4-loss supervised, full ANet dims "
                   "(rnn 1024, vocab 4905, 1000 ROIs)"),
        "step_seconds": round(step_s, 4),
        "compile_seconds": round(compile_s, 1),
    }
    if flops_per_step > 0:
        achieved = flops_per_step / step_s
        rec["flops_per_step"] = flops_per_step
        rec["tflops_per_sec"] = round(achieved / 1e12, 1)
        rec["mfu"] = round(achieved / PEAK_BF16_FLOPS, 3)
    measured = os.path.join(ROOT, "BASELINE_MEASURED.json")
    if os.path.isfile(measured):
        with open(measured) as f:
            m = json.load(f)
        ref = m.get("reference_cpu_train_seg_per_sec")
        if ref:
            rec["reference_cpu_train_seg_per_sec"] = ref
            rec["vs_reference_cpu_measured"] = round(seg_per_sec / ref, 1)
    rec["method"] = (
        "one v5e chip via the axon tunnel, "
        f"{args.iters} timed iterations after compile+warmup, host-"
        "readback sync; FLOPs from XLA compiled.cost_analysis() on the "
        "optimized HLO; MFU vs 197 bf16 TFLOP/s v5e peak; gradient "
        "exactness of the accumulated step tested in "
        "tests/test_trainer.py")
    print(json.dumps(rec))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
