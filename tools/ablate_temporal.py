"""Temporal-path TRAINING bucket attribution + schedule sweep.

The round-3 full-step decomposition attributed ~216 ms/step to the
temporal path (t_attn_size-64 variant delta) and closed it with a
single verdict — the Pallas BiRNN VJP kernel was rejected at ~3% of
the step — but the bucket was never decomposed INTERNALLY, and the
round-4 decode-scan discovery (scan-body remat and unroll COMPOUND:
remat kills per-step residual stores, unroll batches the recompute
matmuls into the MXU) was never tried on the 480-step BiGRU scan.

This tool times the temporal encode path (reference model.py:145-156,
303-305: att_embed rgb/motion projections + BN + 2-layer BiGRU + window
mask + ctx2att) as a standalone jitted fwd+bwd (value_and_grad wrt
params AND the segs_feat input, matching the real step) at the exact
training microbatch shapes (sb=30, T=480, rgb 2048 + motion 1024,
rnn 1024, bf16, enc_drop 0.2 with rbg keys), same methodology as
tools/ablate_decode.py.  Components:

  * full          — the whole bucket (current schedule: unroll 8, no remat)
  * proj_only     — projections + dropout + BN + relu + mask + ctx2att
                    (no BiRNN): the non-recurrent floor
  * birnn_only    — the 2-layer BiGRU alone on a precomputed input
  * birnn_unroll{1,4,16,32}          — unroll sweep, residual-storing
  * birnn_remat_unroll{1,8,16,32,64} — body-remat + unroll sweep
  * full_remat_unroll{N}             — whole bucket with the winning
                                       BiRNN schedule, end-to-end check

Prints one JSON line per component (ms/microbatch and x8 = ms/step).
Run on the real chip; compiles are cached.

Usage: python tools/ablate_temporal.py [component ...] [--iters 20]
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


def build(component: str):
    import jax
    import jax.numpy as jnp

    from grounded_video_description_tpu.config import GVDConfig
    from grounded_video_description_tpu.models import GVDModel
    from grounded_video_description_tpu.nn.core import (
        batch_norm, birnn, dropout, linear)

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        learning_rate_decay_start=-1).validate()
    model = GVDModel(cfg)
    full_params = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, bn_state = full_params["params"], full_params["state"]

    sb, T = 30, cfg.t_attn_size
    bf = jnp.bfloat16
    ks = iter(jax.random.split(jax.random.PRNGKey(7), 8))
    segs_feat = jax.random.normal(next(ks), (sb, T, cfg.fc_feat_size), bf)
    sample_idx = jnp.stack(
        [jnp.full((sb,), 10), jnp.full((sb,), 400)], axis=1)
    rng = jax.random.key(3, impl="rbg")
    r = jax.random.split(rng, 4)

    tp = {k: params[k] for k in ("att_embed_rgb", "att_embed_motion",
                                 "att_embed_aux", "context_enc",
                                 "ctx2att")}
    drop = cfg.drop_prob_lm

    def temporal(p, segs, *, use_birnn=True, unroll=8, remat=False):
        """models/gvd.py:287-310 verbatim semantics."""
        rgb = segs[:, :, :cfg.rgb_feat_size]
        motion = segs[:, :, cfg.rgb_feat_size:]
        conv = jnp.concatenate([
            dropout(r[0], jax.nn.relu(linear(p["att_embed_rgb"], rgb)),
                    drop, train=True),
            dropout(r[1], jax.nn.relu(linear(p["att_embed_motion"],
                                             motion)),
                    drop, train=True)], axis=-1)
        conv, _ = batch_norm(p["att_embed_aux"], bn_state["bn"], conv,
                             train=True)
        conv = jax.nn.relu(conv)
        if use_birnn:
            conv = birnn(p["context_enc"], conv, mode=cfg.t_attn_mode,
                         hidden=cfg.rnn_size // 2,
                         dropout_rate=cfg.enc_drop,
                         train=True, rng=r[2],
                         unroll=unroll, remat=remat)
        t_ids = jnp.arange(T)[None, :]
        inside = ((t_ids >= sample_idx[:, :1])
                  & (t_ids < sample_idx[:, 1:2]))
        conv = jnp.where(inside[..., None], conv, 0.0)
        return linear(p["ctx2att"], conv)

    def scalarize(out):
        return jnp.mean(out.astype(jnp.float32))

    if component == "full" or component.startswith("full_"):
        unroll, remat = 8, False
        if "_remat" in component:
            remat = True
        if "_unroll" in component:
            unroll = int(component.rpartition("_unroll")[2])

        def loss(p, segs):
            return scalarize(temporal(p, segs, unroll=unroll, remat=remat))
        return loss, (tp, segs_feat)

    if component == "proj_only":
        def loss(p, segs):
            return scalarize(temporal(p, segs, use_birnn=False))
        return loss, (tp, segs_feat)

    if component.startswith("birnn"):
        unroll = 8
        remat = "_remat" in component
        if "_unroll" in component:
            unroll = int(component.rpartition("_unroll")[2])
        x = jax.random.normal(next(ks), (sb, T, cfg.rnn_size), bf)

        def loss(p, x_):
            out = birnn(p["context_enc"], x_, mode=cfg.t_attn_mode,
                        hidden=cfg.rnn_size // 2,
                        dropout_rate=cfg.enc_drop, train=True, rng=r[2],
                        unroll=unroll, remat=remat)
            return scalarize(out)
        return loss, (tp, x)

    raise SystemExit(f"unknown component {component!r}")


COMPONENTS = ["full", "proj_only", "birnn_only",
              "birnn_unroll1", "birnn_unroll4", "birnn_unroll16",
              "birnn_unroll32",
              "birnn_remat_unroll1", "birnn_remat_unroll8",
              "birnn_remat_unroll16", "birnn_remat_unroll32",
              "birnn_remat_unroll64"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("components", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    names = args.components or COMPONENTS

    import jax
    import numpy as np

    results = {}
    for name in names:
        loss, fargs = build(name)

        def scalar(*a, _l=loss):
            return _l(*a)
        f = jax.jit(jax.grad(scalar, argnums=tuple(range(len(fargs)))))
        out = f(*fargs)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*fargs)
        np.asarray(jax.tree.leaves(out)[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results[name] = round(ms, 2)
        print(json.dumps({"component": name, "ms_per_microbatch": ms,
                          "ms_per_step_x8": round(ms * 8, 1)}),
              flush=True)
    print(json.dumps({"ablate_temporal": results}))


if __name__ == "__main__":
    main()
