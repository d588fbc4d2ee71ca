"""Quantify --quantize_banks quality at flagship dims (VERDICT r2 #6).

Decodes N synthetic batches at full ANet dims (batch 100, 1000 ROIs,
rnn 1024, vocab 4905) with and without int8 attention banks and
reports per-batch and aggregate:
  * token agreement (fraction of positions with identical tokens,
    counting the post-EOS tail as agreeing only if both are EOS),
  * exact-sentence agreement,
  * grounding-attention argmax agreement (the att2 box indices the
    evaluator would emit),
  * throughput for both paths.

Writes QUANTIZE_REPORT.json at the repo root and prints it.

Usage: python tools/quantize_report.py [--batches 5] [--beam 1]
       [--params ckpt.npz]   (trained flat-npz weights,
                              tools/overfit_checkpoint.py; default init)
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
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=100)
    ap.add_argument("--params", default=None)
    ap.add_argument("--group_size", type=int, default=128,
                    help="int8 scale granularity: columns per scale "
                         "group (0 = one scale per row, the round-2 "
                         "scheme) — the control for attributing "
                         "agreement deltas to granularity vs rounding "
                         "noise")
    ap.add_argument("--out",
                    default=os.path.join(ROOT, "QUANTIZE_REPORT.json"))
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

    model_bf = GVDModel(cfg)
    model_q = GVDModel(cfg.replace(quantize_banks=True,
                                   quantize_group_size=args.group_size))
    variables = jax.jit(model_bf.init)(jax.random.PRNGKey(0))
    if args.params:
        from grounded_video_description_tpu.utils.params_io import (
            load_variables)
        variables = jax.device_put(load_variables(args.params, variables))

    fn_bf = jax.jit(model_bf.sample_greedy)
    fn_q = jax.jit(model_q.sample_greedy)

    n_frm, n_prop = cfg.num_sampled_frm, cfg.num_prop_per_frm
    tok_agree, sent_agree, attn_agree = [], [], []
    t_bf = t_q = 0.0
    for b in range(args.batches):
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_batch(cfg, args.batch_size, seed=b).items()
                 if k != "seg_id"}
        t0 = time.perf_counter()
        s_bf, _, a_bf, _ = fn_bf(variables, batch)
        s_bf = np.asarray(s_bf)
        t_bf += time.perf_counter() - t0
        t0 = time.perf_counter()
        s_q, _, a_q, _ = fn_q(variables, batch)
        s_q = np.asarray(s_q)
        t_q += time.perf_counter() - t0
        a_bf, a_q = np.asarray(a_bf), np.asarray(a_q)

        tok_agree.append(float(np.mean(s_bf == s_q)))
        sent_agree.append(float(np.mean(np.all(s_bf == s_q, axis=1))))
        # the grounding argmax the evaluator gathers boxes from
        # (engine/evaluator.py:108-110), over generated (non-EOS) words
        ind_bf = a_bf.reshape(*s_bf.shape, n_frm, n_prop).argmax(-1)
        ind_q = a_q.reshape(*s_q.shape, n_frm, n_prop).argmax(-1)
        live = (s_bf > 0) & (s_q > 0)
        attn_agree.append(
            float(np.mean((ind_bf == ind_q)[live])) if live.any()
            else 1.0)
        print(f"batch {b}: tok {tok_agree[-1]:.4f} "
              f"sent {sent_agree[-1]:.4f} attn {attn_agree[-1]:.4f}")

    # first batch includes compile; time the steady state only
    rec = {
        "metric": "quantize_banks_quality_flagship",
        "weights": args.params or "init",
        "group_size": args.group_size or "per-row",
        "batches": args.batches,
        "batch_size": args.batch_size,
        "token_agreement_mean": round(float(np.mean(tok_agree)), 4),
        "token_agreement_min": round(float(np.min(tok_agree)), 4),
        "sentence_agreement_mean": round(float(np.mean(sent_agree)), 4),
        "attn_argmax_agreement_mean": round(float(np.mean(attn_agree)), 4),
        "note": ("agreement vs the bf16 path on synthetic batches at "
                 "full dims; timing excluded (first calls include "
                 "compile) — throughput is bench.py's job"),
    }
    print(json.dumps(rec))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
