"""Greedy-decode megakernel vs XLA scan: hardware measurement
(VERDICT r3 next-6).

Times `GVDModel.sample_greedy` at eval flagship dims (B=100, R=1000,
T=480, rnn 1024, vocab 4905->4906, bf16, 20 tokens) with
`use_pallas_decode` off (the lax.scan path) and on (the fused
megakernel, ops/pallas/decode_scan.py), and reports on-chip token /
logprob agreement between the two — the bf16 promotion-policy inputs
(docs/DESIGN.md §bf16 kernel promotion policy).

Prints one JSON line per variant plus an `agreement` record.  Run on
the real chip; budget >= 20 min cold (Pallas compile through the axon
tunnel, CLAUDE.md).

Usage: python tools/bench_decode_kernel.py [--iters 10] [--bt 4]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bt", type=int, default=4)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--params", default=None,
                    help="trained flat-npz weights "
                         "(tools/overfit_checkpoint.py); default init")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.data import synthetic_batch
    from grounded_video_description_tpu.models import GVDModel

    B = args.batch
    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        learning_rate_decay_start=-1).validate()

    model = GVDModel(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.params:
        from grounded_video_description_tpu.utils.params_io import (
            load_variables)
        variables = jax.device_put(load_variables(args.params, variables))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, B, seed=0).items()
             if k != "seg_id"}

    outs = {}
    for name, c in (("xla_scan", cfg),
                    ("fused_kernel",
                     cfg.replace(use_pallas_decode=True))):
        m = GVDModel(c)
        t0 = time.perf_counter()
        compiled = jax.jit(m.sample_greedy).lower(
            variables, batch).compile()
        compile_s = time.perf_counter() - t0
        out = compiled(variables, batch)
        np.asarray(out[0])                     # sync: host readback
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = compiled(variables, batch)
        np.asarray(out[0])
        dt = (time.perf_counter() - t0) / args.iters
        outs[name] = out
        print(json.dumps({
            "variant": name, "ms_per_batch": round(dt * 1e3, 2),
            "captions_per_sec": round(B / dt, 1),
            "compile_s": round(compile_s, 1)}), flush=True)

    a, b = outs["xla_scan"], outs["fused_kernel"]
    seq_a, seq_b = np.asarray(a[0]), np.asarray(b[0])
    lp_a, lp_b = np.asarray(a[1]), np.asarray(b[1])
    att_a, att_b = np.asarray(a[2]), np.asarray(b[2])
    tok_agree = float((seq_a == seq_b).mean())
    # compare logprobs / att2 only where the token streams agree
    same = seq_a == seq_b
    print(json.dumps({
        "metric": "decode_kernel_agreement",
        "weights": args.params or "init",
        "token_agreement": round(tok_agree, 4),
        "caption_exact": round(float((seq_a == seq_b).all(1).mean()), 4),
        "logprob_mad_on_agreeing": round(
            float(np.abs(lp_a - lp_b)[same].mean()), 6),
        "att2_mad": round(float(np.abs(att_a - att_b).mean()), 6),
    }), flush=True)


if __name__ == "__main__":
    main()
