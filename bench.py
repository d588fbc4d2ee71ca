"""Benchmark: the three production workloads on one TPU chip, in ONE
JSON line.

* greedy decoding — the reference's production inference path
  (model.py:492-624 at batch 100 / 1000 ROIs / 480 frames / 20 tokens,
  README.md:103-123); the headline metric.
* beam search (beam 3 and 5) — the reference's quality decode
  (model.py:627-742); ours advances all beams on-device in one scan.
* supervised training — 4-loss MLE step at the reference's global
  batch 240 (README.md:74-89) on one chip via grad accumulation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
with the greedy number as the headline and beam/train sub-records.

Baselines (BASELINE.md "Measured baselines"):
  * vs_baseline — against REFERENCE_CAPS_PER_SEC = 60.0, the estimated
    single-V100 throughput for this workload (batch 100 / ~1.6 s per
    batched decode; the reference needs >= 9 GB GPU RAM at batch 100,
    README.md:123).  Kept as the headline denominator for continuity
    with round 1; it is an estimate, clearly labeled.
  * vs_ref_cpu_measured — against the ACTUAL reference implementation
    executed in this environment (torch CPU, tools/measure_baseline.py,
    recorded in BASELINE_MEASURED.json).  Fully measured, method
    documented; also reports ours-on-the-same-CPU so the framework-
    efficiency ratio (ours/theirs on identical silicon) is visible.
"""

from __future__ import annotations

import json
import os
import time

# persistent compile cache: the axon service's first-compile latency is
# highly variable; caching makes repeat benchmark runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gvd_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

REFERENCE_CAPS_PER_SEC = 60.0   # single-GPU reference estimate (see above)
PEAK_BF16_FLOPS = 197e12        # v5e bf16 peak ("TPU v5 lite" chip)


def _timed(compiled, args, iters, sync):
    """iters timed calls after one warmup; sync via host readback
    (np.asarray — block_until_ready is unreliable through the axon
    tunnel, CLAUDE.md)."""
    import numpy as np

    out = compiled(*args)
    np.asarray(sync(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    np.asarray(sync(out))
    return (time.perf_counter() - t0) / iters


def _flops(compiled):
    try:
        return float(compiled.cost_analysis()["flops"])
    except Exception:
        return 0.0


def bench_decode(rec):
    import jax
    import jax.numpy as jnp

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.models import GVDModel

    B = 100
    cfg = GVDConfig(
        vocab_size=4905,          # ANet-Entities scale
        detect_size=431,
        seq_per_img=1,
        drop_prob_lm=0.5,
        obj_interact=True,
        dtype="bfloat16",         # MXU at full rate; softmax/loss in f32
        learning_rate_decay_start=-1,
    ).validate()

    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, B, seed=0).items()
             if k != "seg_id"}

    # ---- greedy (headline) ----
    compiled = jax.jit(model.sample_greedy).lower(variables, batch).compile()
    fl = _flops(compiled)
    dt = _timed(compiled, (variables, batch), iters=10,
                sync=lambda o: o[0])
    caps = B / dt
    rec.update({
        "metric": "greedy_captions_per_sec_per_chip",
        "value": round(caps, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps / REFERENCE_CAPS_PER_SEC, 2),
    })
    if fl > 0:
        rec["tflops_per_sec"] = round(fl / dt / 1e12, 1)
        rec["mfu"] = round(fl / dt / PEAK_BF16_FLOPS, 3)

    # ---- beam 3 / 5 (same model, same batch) ----
    from functools import partial

    for w in (3, 5):
        try:
            cb = jax.jit(partial(model.sample_beam, beam_size=w)).lower(
                variables, batch).compile()
            flb = _flops(cb)
            dtb = _timed(cb, (variables, batch), iters=5,
                         sync=lambda o: o[0])
            rec[f"beam{w}_captions_per_sec"] = round(B / dtb, 1)
            if flb > 0:
                rec[f"beam{w}_mfu"] = round(flb / dtb / PEAK_BF16_FLOPS, 3)
        except Exception as e:          # keep the headline alive
            rec[f"beam{w}_error"] = repr(e)[:200]
    return rec


def bench_train(rec, batch_size=240, accum=8, iters=4):
    """Supervised 4-loss train step, batch 240 / accum 8 / no remat —
    the recommended single-chip flagship setting (docs/DESIGN.md)."""
    import jax.numpy as jnp

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.engine.trainer import Trainer

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        grad_accum=accum, remat=False, batch_size=batch_size,
        learning_rate_decay_start=-1,
    ).validate()
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size, seed=0).items()
             if k != "seg_id"}
    rng = trainer.rng
    compiled = trainer.make_train_step(donate=False).lower(
        state.params, state.model_state, state.opt_state, batch, rng,
        5e-4).compile()
    dt = _timed(compiled,
                (state.params, state.model_state, state.opt_state,
                 batch, rng, 5e-4),
                iters=iters, sync=lambda o: o[3]["loss"])
    rec["train_seg_per_sec"] = round(batch_size / dt, 1)
    rec["train_step_seconds"] = round(dt, 4)
    # XLA counts a scan body once regardless of trip count, so the
    # accum-scan step under-reports FLOPs ~accum-fold; compile the
    # accum=1 microbatch step and scale (tools/bench_train.py method)
    cfg1 = cfg.replace(grad_accum=1, batch_size=batch_size // accum)
    tr1 = Trainer(cfg1)
    st1 = tr1.init_state()
    mb = {k: v[: batch_size // accum] for k, v in batch.items()}
    fl = _flops(tr1.make_train_step(donate=False).lower(
        st1.params, st1.model_state, st1.opt_state, mb, rng,
        5e-4).compile()) * accum
    if fl > 0:
        rec["train_tflops_per_sec"] = round(fl / dt / 1e12, 1)
        rec["train_mfu"] = round(fl / dt / PEAK_BF16_FLOPS, 3)
    return rec


def main():
    rec = {}
    bench_decode(rec)
    try:
        bench_train(rec)
    except Exception as e:              # keep the headline alive
        rec["train_error"] = repr(e)[:200]
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.isfile(measured):
        with open(measured) as f:
            m = json.load(f)
        ref_cpu = m.get("reference_cpu_caps_per_sec")
        if ref_cpu:
            rec["ref_cpu_measured_caps_per_sec"] = ref_cpu
            rec["vs_ref_cpu_measured"] = round(rec["value"] / ref_cpu, 1)
            rec["cpu_framework_speedup"] = m.get("cpu_framework_speedup")
        ref_tr = m.get("reference_cpu_train_seg_per_sec")
        if ref_tr and "train_seg_per_sec" in rec:
            rec["train_vs_ref_cpu_measured"] = round(
                rec["train_seg_per_sec"] / ref_tr, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
