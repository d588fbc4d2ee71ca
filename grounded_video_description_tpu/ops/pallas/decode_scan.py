"""Fused greedy-decode megakernel (Pallas/Mosaic).

The greedy caption decode (reference model.py:492-624; our
`GVDModel.sample_greedy` lax.scan) re-reads the attention banks from
HBM every token: at eval flagship dims (B=100, R=1000, T=480, rnn
1024, bf16) each of the 20 steps streams ~450 MB (pool 205 + p_pool
102 + conv 98 + p_conv 49) — ~9 GB per batch, an ~11 ms HBM floor of
the measured 18.2 ms decode scan (docs/DESIGN.md round-2 ablation).
The recurrence forbids cross-step fusion in XLA, so the only way past
the floor is VMEM residency across steps.

This kernel runs the ENTIRE decode — both LSTM cells, temporal +
region additive attention, the vocab logit + log-softmax, the
UNK-suppressed argmax (model.py:589-594), and the next-token
embedding — as ONE Pallas program:

  * grid = (B/bt, L), both sequential.  Weights are whole-array VMEM
    residents (fetched once); each batch tile's banks have a block
    index constant in t, so Mosaic fetches them once per tile and
    double-buffers the next tile's banks behind the current tile's 20
    steps;
  * recurrent state (h/c for both cells, the embedded next token)
    lives in f32 VMEM scratch across grid steps;
  * the next-token embedding lookup is a one-hot [bt, Ve] x [Ve, E]
    MXU matmul (gathers don't vectorize on TPU; a zero-padded one-hot
    contraction is exact);
  * per-step outputs: token + its logprob (written into an
    (Lp, B)-shaped pair of blocks resident per tile), and the masked
    region-attention logits (the grounding surface, AttModel.py:98-106
    semantics — pnt-masked scores, pre-softmax).

Numerics: matmuls accumulate f32 (MXU native), gate/softmax math f32,
tanh of the additive attentions in bf16 exactly like the XLA path.
Same-math reordering per the bf16 kernel promotion policy
(docs/DESIGN.md); parity is pinned in f32 interpret mode
(tests/test_pallas_decode.py) where tokens match the scan exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_VALUE = -1e8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lstm(x, h, c, wi, wh, b):
    """f32 gate math, bf16 weights (nn/core.py:79-87 contract)."""
    f32 = jnp.float32
    gates = (jax.lax.dot(x, wi, preferred_element_type=f32)
             + jax.lax.dot(h, wh, preferred_element_type=f32)
             + b.astype(f32))
    H = wh.shape[0]
    i = gates[:, :H]
    f = gates[:, H:2 * H]
    g = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:]
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _additive_scores(bank_p, h_att, w, b, alpha_w, alpha_b, xd):
    """alpha_net(tanh(p_bank + h2att(h))): (bt, N) f32 scores.

    tanh runs in the bank dtype (bf16 on TPU), matching the XLA path
    (ops/attention.py:86); the score reduction accumulates f32.
    alpha_b is a traced f32 scalar (SMEM)."""
    ah = (jax.lax.dot(h_att.astype(xd), w,
                      preferred_element_type=jnp.float32)
          + b.astype(jnp.float32))                     # (bt, A)
    dot = jnp.tanh(bank_p + ah[:, None, :].astype(xd))  # (bt, N, A)
    s = jnp.sum(dot.astype(jnp.float32)
                * alpha_w.astype(jnp.float32)[None, None, :], axis=2)
    return s + alpha_b                                 # (bt, N)


def _weighted_sum(weights_f32, bank, xd):
    """einsum('bn,bnd->bd') as per-row MXU dots (bt unrolled)."""
    bt = bank.shape[0]
    rows = []
    for j in range(bt):
        rows.append(jax.lax.dot(
            weights_f32[j:j + 1].astype(xd), bank[j],
            preferred_element_type=jnp.float32))       # (1, D)
    return jnp.concatenate(rows, axis=0)               # (bt, D)


def _first_argmax(x, *, axis):
    """First-index argmax via the iota-min trick (matches jnp.argmax
    tie-breaking; avoids relying on Mosaic argmax lowering)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    big = jnp.int32(np.iinfo(np.int32).max)
    idx = jnp.min(jnp.where(x == m, ii, big), axis=axis)
    return idx, m[..., 0]


def _kernel(alphab_ref, fc_ref, conv_ref, pconv_ref, pool_ref,
            ppool_ref, mneg_ref,
            awi_ref, awh_ref, ab_ref, lwi_ref, lwh_ref, lb_ref,
            thw_ref, thb_ref, taw_ref, lgw_ref, lgb_ref,
            rhw_ref, rhb_ref, raw_ref, emb_ref,
            toks_ref, lps_ref, att2_ref,
            ha_scr, ca_scr, hl_scr, cl_scr, xt_scr, *,
            L, V, unk):
    t = pl.program_id(1)
    f32 = jnp.float32
    xd = fc_ref.dtype

    @pl.when(t == 0)
    def _():
        ha_scr[...] = jnp.zeros_like(ha_scr)
        ca_scr[...] = jnp.zeros_like(ca_scr)
        hl_scr[...] = jnp.zeros_like(hl_scr)
        cl_scr[...] = jnp.zeros_like(cl_scr)
        # BOS: prev token 0 -> relu(embed row 0) (model.py:586, 441)
        row0 = jax.nn.relu(emb_ref[0:1, :].astype(f32))
        xt_scr[...] = jnp.broadcast_to(row0, xt_scr.shape)
        toks_ref[...] = jnp.zeros_like(toks_ref)
        lps_ref[...] = jnp.zeros_like(lps_ref)

    fc = fc_ref[0]                                      # (bt, H)
    xt = xt_scr[...].astype(xd)                         # (bt, E)

    # ---- attention LSTM (AttModel.py:134-139) ----
    att_in = jnp.concatenate([fc, xt], axis=1)
    h_att, c_att = _lstm(att_in, ha_scr[...], ca_scr[...],
                         awi_ref[...], awh_ref[...], ab_ref[0])
    ha_scr[...] = h_att
    ca_scr[...] = c_att

    # ---- temporal attention over T frames (AttModel.py:22-53) ----
    ts = _additive_scores(pconv_ref[...], h_att, thw_ref[...],
                          thb_ref[0], taw_ref[0], alphab_ref[0], xd)
    tw = jax.nn.softmax(ts, axis=1)
    att = _weighted_sum(tw, conv_ref[...], xd)          # (bt, H) f32

    # ---- region attention over Rp proposals (AttModel.py:56-108) ----
    rs = _additive_scores(ppool_ref[...], h_att, rhw_ref[...],
                          rhb_ref[0], raw_ref[0], alphab_ref[1], xd)
    # replace-style masking, matching ops/attention.py:104-105 exactly
    rs = jnp.where(mneg_ref[0] > 0, MIN_VALUE, rs)
    att2_ref[0, 0] = rs                   # grounding logits (pre-softmax)
    rw = jax.nn.softmax(rs, axis=1)
    att2 = _weighted_sum(rw, pool_ref[...], xd)         # (bt, H) f32

    # ---- language LSTM (att_input_mode 'both': att + att2) ----
    lang_in = jnp.concatenate(
        [(att + att2).astype(xd), h_att.astype(xd)], axis=1)
    h_lang, c_lang = _lstm(lang_in, hl_scr[...], cl_scr[...],
                           lwi_ref[...], lwh_ref[...], lb_ref[0])
    hl_scr[...] = h_lang
    cl_scr[...] = c_lang

    # ---- vocab logit + log-softmax (+ pad masking) ----
    logits = (jax.lax.dot(h_lang.astype(xd), lgw_ref[...],
                          preferred_element_type=f32)
              + lgb_ref[0].astype(f32))                 # (bt, Vp)
    cid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(cid >= V, MIN_VALUE, logits)
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m[:, 0] + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1))
    lp = logits - lse[:, None]                          # (bt, Vp)

    # ---- UNK-suppressed greedy pick (model.py:589-594) ----
    i1, v1 = _first_argmax(lp, axis=1)
    lp2 = jnp.where(cid == i1[:, None], MIN_VALUE, lp)
    i2, v2 = _first_argmax(lp2, axis=1)
    use_first = i1 != unk
    tok = jnp.where(use_first, i1, i2)
    lpv = jnp.where(use_first, v1, v2)

    toks_ref[0, pl.ds(t, 1), :] = tok[None, :]
    lps_ref[0, pl.ds(t, 1), :] = lpv[None, :].astype(lps_ref.dtype)

    # ---- embed the chosen token for the next step ----
    eid = jax.lax.broadcasted_iota(jnp.int32, (tok.shape[0],
                                               emb_ref.shape[0]), 1)
    onehot = (eid == tok[:, None]).astype(xd)
    xt_scr[...] = jax.nn.relu(jax.lax.dot(
        onehot, emb_ref[...], preferred_element_type=f32))


def greedy_decode_fused(params, enc, pnt_mask, *, seq_length: int,
                        vocab_size: int, unk_idx: int, bt: int = 4,
                        interpret: bool = False):
    """Runs the fused greedy decode.  Returns (seq (B, L) int32,
    seq_logprobs (B, L) f32, att2_weights (B, L, R) f32 — the
    pnt-masked region scores, matching core_step's att2_weight).

    `enc` is GVDModel.encode output; `params` the model params.
    Requirements (gated by the caller): topdown family,
    att_input_mode='both', region_attn_mode additive, sample_max,
    beta == 1, no bank quantization."""
    core = params["core"]
    fc = enc["fc_feats"]
    conv, p_conv = enc["conv_feats"], enc["p_conv_feats"]
    pool, p_pool = enc["pool_feats"], enc["p_pool_feats"]
    B, T, H = conv.shape
    R = pool.shape[1]
    A = p_pool.shape[2]
    E = params["embed"]["w"].shape[1]
    L = seq_length
    xd = conv.dtype

    assert B % bt == 0, (B, bt)
    Rp = _round_up(R, 128)
    Lp = _round_up(L, 8)
    Ve = _round_up(params["embed"]["w"].shape[0], 128)
    Vp = _round_up(params["logit"]["w"].shape[1], 128)

    def padn(x, axis, n):
        if x.shape[axis] == n:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, pad)

    pool_p = padn(pool, 1, Rp)
    ppool_p = padn(p_pool, 1, Rp)
    # 1.0 where the score must be replaced by MIN_VALUE: pnt-masked
    # proposals + the Rp alignment padding columns
    mneg = pnt_mask[:, 1:].astype(jnp.float32)
    if Rp > R:
        mneg = jnp.concatenate(
            [mneg, jnp.ones((B, Rp - R), jnp.float32)], axis=1)

    def w2(p):                           # (in, out) bf16 weight
        return p["w"].astype(xd)

    def b2(p, n):                        # (1, n) f32 bias row
        b = p.get("b")
        if b is None:
            b = jnp.zeros((n,), jnp.float32)
        return padn(b.astype(jnp.float32), 0, n)[None, :]

    attn, attn2 = core["attn"], core["attn2"]

    def ab(p):                            # traced alpha-net bias scalar
        b = p.get("b")
        return (jnp.zeros((), jnp.float32) if b is None
                else b.reshape(()).astype(jnp.float32))

    alphab = jnp.stack([ab(attn["alpha_net"]), ab(attn2["alpha_net"])])

    # Mosaic's block rule: the LAST TWO block dims must be divisible
    # by (8, 128) or equal the array dims.  bt (4) can't sit in a
    # sublane/lane slot, so per-row 2D arrays are reshaped to
    # (nb, bt, ...) and blocked (1, bt, ...) — every trailing dim then
    # equals its array dim.  3D banks (bt, T/Rp, H/A) are already legal.
    nb = B // bt
    operands = [
        alphab,
        fc.reshape(nb, bt, H), conv, p_conv, pool_p, ppool_p,
        mneg.reshape(nb, bt, Rp),
        core["att_lstm"]["wi"].astype(xd),
        core["att_lstm"]["wh"].astype(xd),
        core["att_lstm"]["b"].astype(jnp.float32)[None, :],
        core["lang_lstm"]["wi"].astype(xd),
        core["lang_lstm"]["wh"].astype(xd),
        core["lang_lstm"]["b"].astype(jnp.float32)[None, :],
        w2(attn["h2att"]), b2(attn["h2att"], A),
        attn["alpha_net"]["w"][:, 0].astype(jnp.float32)[None, :],
        padn(w2(params["logit"]), 1, Vp),
        padn(params["logit"]["b"].astype(jnp.float32), 0, Vp)[None, :],
        w2(attn2["h2att"]), b2(attn2["h2att"], A),
        attn2["alpha_net"]["w"][:, 0].astype(jnp.float32)[None, :],
        padn(params["embed"]["w"].astype(xd), 0, Ve),
    ]

    kern = functools.partial(_kernel, L=L, V=vocab_size, unk=unk_idx)

    res = pltpu.VMEM
    bank = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=res)
    whole = pl.BlockSpec(memory_space=res)

    grid = (nb, L)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        bank(1, bt, H), bank(bt, T, H), bank(bt, T, A),
        bank(bt, Rp, H), bank(bt, Rp, A), bank(1, bt, Rp),
    ] + [whole] * 15

    out_specs = [
        pl.BlockSpec((1, Lp, bt), lambda b, t: (b, 0, 0),
                     memory_space=res),
        pl.BlockSpec((1, Lp, bt), lambda b, t: (b, 0, 0),
                     memory_space=res),
        pl.BlockSpec((1, 1, bt, Rp), lambda b, t: (t, b, 0, 0),
                     memory_space=res),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, Lp, bt), jnp.int32),
        jax.ShapeDtypeStruct((nb, Lp, bt), jnp.float32),
        jax.ShapeDtypeStruct((L, nb, bt, Rp), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((bt, H), jnp.float32),   # h_att
        pltpu.VMEM((bt, H), jnp.float32),   # c_att
        pltpu.VMEM((bt, H), jnp.float32),   # h_lang
        pltpu.VMEM((bt, H), jnp.float32),   # c_lang
        pltpu.VMEM((bt, E), jnp.float32),   # embedded next token
    ]

    flops_step = 2 * bt * (
        (H + E) * 4 * H + H * 4 * H            # att lstm
        + H * A + T * A + T * H                # temporal
        + H * A + Rp * A + Rp * H              # region
        + 2 * H * 4 * H + H * 4 * H            # lang lstm
        + H * Vp + Ve * E)                     # logit + embed
    bytes_banks = (pool_p.size + ppool_p.size + conv.size
                   + p_conv.size) * 2
    toks, lps, att2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * nb * L,
            bytes_accessed=bytes_banks + 140 * 1024 * 1024,
            transcendentals=nb * L * bt * (T + Rp) * A),
        interpret=interpret,
    )(*operands)

    # (nb, Lp, bt) -> (B, L): tile-major rows back to batch order
    seq = jnp.moveaxis(toks[:, :L, :], 1, 2).reshape(B, L)
    seq_lp = jnp.moveaxis(lps[:, :L, :], 1, 2).reshape(B, L)
    seq_lp = seq_lp.astype(jnp.float32)
    # (L, nb, bt, Rp) -> (B, L, R)
    att2 = jnp.moveaxis(att2.reshape(L, B, Rp), 0, 1)
    return seq, seq_lp, att2[:, :, :R]
