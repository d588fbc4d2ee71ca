"""Benchmark: caption-generation throughput on one TPU chip.

Measures greedy decoding (the reference's production inference path,
model.py:492-624 at batch 100 / 1000 ROIs / 480 frames / 20 tokens,
README.md:103-123) end-to-end on device, full-size model dims
(rnn 1024, 1600 classes, 2048-d regions).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

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


def main():
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

    import numpy as np

    fn = jax.jit(model.sample_greedy)
    # compile via an explicit lower() so the optimized-HLO FLOP count
    # is available for MFU accounting (VERDICT r2 §missing-3)
    compiled = fn.lower(variables, batch).compile()
    try:
        flops_per_call = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_call = 0.0
    # warmup (np.asarray forces a device->host readback:
    # block_until_ready does not fully synchronize through the axon
    # tunnel, so we sync on data)
    out = compiled(variables, batch)
    np.asarray(out[0])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(variables, batch)
    np.asarray(out[0])
    dt = time.perf_counter() - t0

    caps_per_sec = B * iters / dt
    rec = {
        "metric": "greedy_captions_per_sec_per_chip",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / REFERENCE_CAPS_PER_SEC, 2),
    }
    if flops_per_call > 0:
        achieved = flops_per_call * iters / dt
        rec["tflops_per_sec"] = round(achieved / 1e12, 1)
        rec["mfu"] = round(achieved / PEAK_BF16_FLOPS, 3)
    measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    if os.path.isfile(measured):
        with open(measured) as f:
            m = json.load(f)
        ref_cpu = m.get("reference_cpu_caps_per_sec")
        if ref_cpu:
            rec["ref_cpu_measured_caps_per_sec"] = ref_cpu
            rec["vs_ref_cpu_measured"] = round(caps_per_sec / ref_cpu, 1)
            rec["cpu_framework_speedup"] = m.get("cpu_framework_speedup")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
