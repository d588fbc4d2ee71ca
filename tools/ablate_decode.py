"""Decode-scan TRAINING bucket attribution (VERDICT r3 next-1).

The round-3 full-step decomposition left one bucket without an
internal attribution: "decode scan + per-step supervision" (~234 ms of
the 1.043 s batch-240/accum-8 step, from the seq4 variant).  This tool
times each component of that bucket as a standalone jitted fwd+bwd at
the EXACT training microbatch shapes (sb=30, R=1000, T=480, L=20,
rnn 1024, att_hid 512, vis_enc 2048, vocab 4905->4906, bf16), the same
methodology as tools/ablate_rest.py:

  * scan          — the 20-step core_step scan (2 LSTM cells +
                    temporal attention + region attention + dropout)
  * scan_no_region / scan_no_temporal / scan_lstm_only — the scan with
    components removed (drop-one attribution)
  * scan_unroll2 / scan_unroll4 — lax.scan unroll sweep (lever)
  * scan_remat    — jax.checkpoint on the scan body (residual-traffic
                    vs recompute trade at microbatch-30; the flagship
                    accum-8 config runs remat OFF)
  * logit_lm      — vocab head + log_softmax + masked-NLL gather
  * grounder      — word<->region scorer + att2/grd losses
  * embeds        — word + visual-word embedding lookups

Every timing is ms per microbatch fwd+bwd (value_and_grad wrt params
AND activations, matching the real step where bank gradients flow to
the encoder); x8 gives the per-step share.  Prints one JSON line per
component.  Run on the real chip; compiles are cached.

Usage: python tools/ablate_decode.py [component ...] [--iters 20]
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
    from grounded_video_description_tpu import losses as L

    cfg = GVDConfig(
        vocab_size=4905, detect_size=431, seq_per_img=1,
        drop_prob_lm=0.5, obj_interact=True, dtype="bfloat16",
        learning_rate_decay_start=-1).validate()
    model = GVDModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))["params"]

    sb, R, T, Lq = 30, 1000, cfg.t_attn_size, cfg.seq_length
    H, E = cfg.rnn_size, cfg.input_encoding_size
    A, VE = cfg.att_hid_size, cfg.vis_encoding_size
    bf = jnp.bfloat16
    kb = jax.random.PRNGKey(7)
    ks = iter(jax.random.split(kb, 16))
    norm = lambda *s: jax.random.normal(next(ks), s, bf)  # noqa: E731

    banks = {
        "fc": norm(sb, H),
        "conv": norm(sb, T, H), "p_conv": norm(sb, T, A),
        "pool": norm(sb, R, H), "p_pool": norm(sb, R, A),
        "g_pool": norm(sb, R, VE),
    }
    att_mask = jax.random.uniform(next(ks), (sb, R + 1)) < 0.3
    att_mask = att_mask.at[:, 0].set(False)
    step_pnt = jnp.broadcast_to(att_mask[None], (Lq, sb, R + 1))
    xt_steps = norm(Lq, sb, E)
    # rbg dropout keys, matching the training default
    rng = jax.random.key(3, impl="rbg")
    step_rngs = jax.random.split(rng, Lq)

    core = params["core"]

    def make_scan(variant: str, unroll: int = 1, remat: bool = False):
        from grounded_video_description_tpu.nn import lstm_cell
        from grounded_video_description_tpu.nn.core import dropout
        from grounded_video_description_tpu.ops.attention import (
            region_attention, temporal_attention)
        from grounded_video_description_tpu.models.gvd import CoreState

        def step(c, bk, xt, pmask, srng, state):
            """models/gvd.py::core_step with components toggled."""
            att_in = jnp.concatenate([bk["fc"], xt], axis=1)
            h_att, (h_att_, c_att) = lstm_cell(
                c["att_lstm"], att_in, (state.h_att, state.c_att))
            att = (temporal_attention(c["attn"], h_att, bk["conv"],
                                      bk["p_conv"])
                   if variant in ("full", "no_region") else 0.0)
            if variant in ("full", "no_temporal"):
                att2, att2_w, _ = region_attention(
                    c["attn2"], h_att, bk["pool"], bk["p_pool"],
                    att_mask[:, 1:], pmask[:, 1:],
                    mode=cfg.region_attn_mode)
            else:
                att2, att2_w = 0.0, jnp.zeros((sb, R), bf)
            if variant == "full":
                lang_in = att + att2
            elif variant == "no_region":
                lang_in = att
            elif variant == "no_temporal":
                lang_in = att2
            else:                       # lstm_only
                lang_in = h_att
            lang_lstm_in = jnp.concatenate([lang_in, h_att], axis=1)
            h_lang, (h_lang_, c_lang) = lstm_cell(
                c["lang_lstm"], lang_lstm_in,
                (state.h_lang, state.c_lang))
            out = dropout(srng, h_lang, cfg.drop_prob_lm, train=True)
            return out, CoreState(h_att_, c_att, h_lang_, c_lang), att2_w

        def loss(c, bk):
            def body(state, inp):
                xt, pmask, srng = inp
                out, new_state, att2_w = step(c, bk, xt, pmask, srng,
                                              state)
                return new_state, (out, att2_w)

            b = jax.checkpoint(body) if remat else body
            init = CoreState(*(jnp.zeros((sb, H), bf) for _ in range(4)))
            _, (outs, att2_ws) = jax.lax.scan(
                b, init, (xt_steps, step_pnt, step_rngs), unroll=unroll)
            return (jnp.mean(outs.astype(jnp.float32))
                    + jnp.mean(att2_ws.astype(jnp.float32)))

        return loss, (core, banks)

    if component.startswith("scan"):
        # grammar: scan[_no_region|_no_temporal|_lstm_only]
        #              [_remat][_unrollN]
        name = component
        unroll = 1
        if "_unroll" in name:
            name, _, n = name.rpartition("_unroll")
            unroll = int(n)
        remat = name.endswith("_remat")
        if remat:
            name = name[: -len("_remat")]
        variant = {"scan": "full", "scan_no_region": "no_region",
                   "scan_no_temporal": "no_temporal",
                   "scan_lstm_only": "lstm_only"}[name]
        loss, args = make_scan(variant, unroll=unroll, remat=remat)
        return loss, args

    if component == "logit_lm":
        x = norm(sb, Lq, H)
        tgt = jax.random.randint(next(ks), (sb, Lq), 0, cfg.vocab_size)

        def loss(p_, x_):
            lp = model.logit_logprobs(p_, x_)
            pick = jnp.take_along_axis(lp, tgt[..., None], axis=2)[..., 0]
            m = (tgt > 0).astype(jnp.float32)
            return -jnp.sum(pick * m) / jnp.maximum(jnp.sum(m), 1.0)

        return loss, (params, x)

    if component == "grounder":
        from grounded_video_description_tpu.ops.attention import grounder

        xt_vis = norm(sb, Lq, VE)
        att2_w = norm(sb, Lq, R).astype(jnp.float32)
        roi_labels = (jax.random.uniform(next(ks), (sb, Lq, R)) < 0.01
                      ).astype(jnp.float32)
        fmask = jnp.asarray(att_mask[:, 1:])

        def loss(xt_, gp_, aw_):
            gw = grounder(xt_, gp_, fmask, aw_)
            # att2/grd loss shape of lm_criterion (losses.py:30-60)
            lsm = jax.nn.log_softmax(gw, axis=2)
            sel = jnp.sum(lsm * roi_labels, axis=2)
            return -jnp.mean(sel)

        return loss, (xt_vis, banks["g_pool"], att2_w)

    if component == "embeds":
        toks = jax.random.randint(next(ks), (sb, Lq), 0, cfg.vocab_size)
        vtoks = jax.random.randint(next(ks), (sb, Lq), 0,
                                   cfg.detect_size + 1)

        def loss(p_):
            a = model.embed_words(p_, toks, train=False)
            b = model.embed_vis_words(p_, vtoks, train=False)
            return (jnp.mean(a.astype(jnp.float32))
                    + jnp.mean(b.astype(jnp.float32)))

        return loss, (params,)

    if component == "supervision":
        from grounded_video_description_tpu.data import synthetic_batch
        batch = {k: jnp.asarray(v) for k, v in
                 synthetic_batch(cfg, 240, seed=0).items()
                 if k != "seg_id"}

        def loss(b_):
            sup = model.supervision(b_)
            return jnp.sum(sup["roi_labels"]).astype(jnp.float32)

        return loss, (batch,)

    raise SystemExit(f"unknown component {component!r}")


COMPONENTS = ["scan", "scan_no_region", "scan_no_temporal",
              "scan_lstm_only", "scan_unroll2", "scan_unroll4",
              "scan_remat", "logit_lm", "grounder", "embeds"]


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
        if name == "supervision":        # parameter-free fwd only
            f = jax.jit(loss)
        else:
            def scalar(*a, _l=loss):
                return _l(*a)
            f = jax.jit(jax.grad(scalar, argnums=tuple(
                range(len(fargs)))))
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
    print(json.dumps({"ablate_decode": results}))


if __name__ == "__main__":
    main()
