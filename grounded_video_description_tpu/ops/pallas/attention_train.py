"""Per-(row, head) fused attention primitive for TRAINING.

This is the structural redesign called for by docs/DESIGN.md
§Training fused encoder-layer kernel: the whole-layer train kernel's
backward VMEM-OOMed because its unrolled bt x heads loops kept every
head's (Rp, Rp) f32 prob/grad temporaries live at once (260 M of
128 M).  Here the ONLY Pallas op is softmax(q k^T / scale) with prob
dropout, gridded one (batch-row, head) per step, so exactly one
(Rp, Rp) tile family is live at a time (~30 MB).  Everything else —
q/k/v/o projections, residual dropout, LayerNorm, FFN — stays XLA,
whose autodiff already schedules those matmul/elementwise shapes at
the roof.

What this buys over the XLA attention path in training:
  * XLA must materialize the (B, h, R, R) probs in HBM in the forward
    (no flash attention in the XLA fusion model) and autodiff saves
    probs + the dropout mask as residuals for the backward — ~360 MB
    per layer per microbatch of round-trip traffic at the flagship
    shapes.  Both kernels here regenerate probs (and the dropout
    mask, from the counter-hash) in VMEM; the only residuals are
    q, k, v.
  * The (B, h, R, R) Bernoulli draw disappears from the XLA graph
    (the hash mask is computed on the fly per tile).

Semantics: identical math to models/transformer.py:_mha's
head-sequential branch (reference: misc/transformer.py:86-123) —
shared sqrt(d_model) scale, softmax in the compute dtype, dropout on
the probs with nn/core.py:dropout statistics.  The dropout STREAM
differs (counter-hash, not threefry) which was never a parity
surface: the reference's torch stream was never matched either
(docs/DESIGN.md §Dropout RNG, §bf16 kernel promotion policy).

Numerics: scores accumulate f32 on bf16 operands and are scaled in
f32 before casting to the compute dtype for softmax (same as the
inference encoder kernel); the softmax backward runs in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grounded_video_description_tpu.ops.pallas.encoder_layer import MIN_VALUE
from grounded_video_description_tpu.ops.pallas.encoder_layer_train import (
    _dropped, uniform_hash)

# site class for the prob-dropout hash; keyed (seed, site + gb*8 + h)
# like the layer kernel so masks differ per (batch row, head)
_SITE_ATTN = np.uint32(0x40000000)


def _tile_probs(q, k, *, R, inv_scale, xd):
    """softmax((q k^T) * inv_scale) for one (Rp, dpp) tile pair, with
    padding columns >= R masked to MIN_VALUE before the softmax."""
    f32 = jnp.float32
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * inv_scale
    if s.shape[1] != R:
        cid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cid >= R, MIN_VALUE, s)
    s = s.astype(xd)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _salt(b, h, n_heads):
    # stride >= n_heads so (batch row, head) salts never collide; the
    # floor of 8 keeps masks bitwise-identical to the round-3 kernels
    # (which hard-coded stride 8) for every model in-tree (<= 8 heads)
    gb = b.astype(jnp.uint32)
    stride = np.uint32(max(int(n_heads), 8))
    return _SITE_ATTN + gb * stride + h.astype(jnp.uint32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                R, inv_scale, n_heads, drop):
    b = pl.program_id(0)
    h = pl.program_id(1)
    seed = seed_ref[0]
    q = q_ref[0, 0]                                   # (Rp, dpp)
    xd = q.dtype
    p = _tile_probs(q, k_ref[0, 0], R=R, inv_scale=inv_scale, xd=xd)
    if drop > 0.0:
        u = uniform_hash(p.shape, seed, _salt(b, h, n_heads))
        p = _dropped(p, u, drop)
    o = jax.lax.dot(p, v_ref[0, 0], preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, R, inv_scale, n_heads, drop):
    f32 = jnp.float32
    b = pl.program_id(0)
    h = pl.program_id(1)
    seed = seed_ref[0]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = g_ref[0, 0]
    xd = q.dtype
    # recompute pre-drop probs; regenerate the identical dropout mask
    p = _tile_probs(q, k, R=R, inv_scale=inv_scale, xd=xd)
    if drop > 0.0:
        u = uniform_hash(p.shape, seed, _salt(b, h, n_heads))
        pd = _dropped(p, u, drop)
    else:
        pd = p
    dv_ref[0, 0] = jax.lax.dot_general(
        pd, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dv_ref.dtype)
    dpd = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    # grad through the prob dropout, then softmax bwd on pre-drop probs
    dpp = _dropped(dpd, u, drop) if drop > 0.0 else dpd
    p32 = p.astype(f32)
    ds = p32 * (dpp - jnp.sum(dpp * p32, axis=1, keepdims=True))
    ds = (ds * inv_scale).astype(xd)
    dq_ref[0, 0] = jax.lax.dot(
        ds, k, preferred_element_type=f32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dk_ref.dtype)


def _pad_bhrd(x, Rp, dpp):
    B, H, R, d = x.shape
    if (Rp, dpp) != (R, d):
        x = jnp.pad(x, [(0, 0), (0, 0), (0, Rp - R), (0, dpp - d)])
    return x


def _block(Rp, dpp):
    return pl.BlockSpec((1, 1, Rp, dpp), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


def _call_params(flops, Rp, n_tiles):
    return dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=flops // (2 * Rp),
            transcendentals=n_tiles * Rp * Rp))


def _fwd_call(q, k, v, seed, scale, drop, interpret):
    B, H, R, d = q.shape
    Rp = -(-R // 128) * 128
    dpp = -(-d // 128) * 128
    qp, kp, vp = (_pad_bhrd(t, Rp, dpp) for t in (q, k, v))
    kern = functools.partial(_fwd_kernel, R=R,
                             inv_scale=np.float32(1.0 / scale),
                             n_heads=H, drop=drop)
    out = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_block(Rp, dpp)] * 3,
        out_specs=_block(Rp, dpp),
        out_shape=jax.ShapeDtypeStruct((B, H, Rp, dpp), q.dtype),
        interpret=interpret,
        **_call_params(2 * B * H * Rp * (2 * Rp * dpp), Rp, B * H),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp)
    return out[:, :, :R, :d]


def _bwd_call(q, k, v, seed, g, scale, drop, interpret):
    B, H, R, d = q.shape
    Rp = -(-R // 128) * 128
    dpp = -(-d // 128) * 128
    qp, kp, vp, gp = (_pad_bhrd(t, Rp, dpp) for t in (q, k, v, g))
    kern = functools.partial(_bwd_kernel, R=R,
                             inv_scale=np.float32(1.0 / scale),
                             n_heads=H, drop=drop)
    shp = jax.ShapeDtypeStruct((B, H, Rp, dpp), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_block(Rp, dpp)] * 4,
        out_specs=[_block(Rp, dpp)] * 3,
        out_shape=[shp, shp, shp],
        interpret=interpret,
        **_call_params(2 * B * H * Rp * (4 * Rp * dpp), Rp, B * H),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qp, kp, vp, gp)
    return (dq[:, :, :R, :d], dk[:, :, :R, :d], dv[:, :, :R, :d])


def _fwd_jnp(q, k, v, seed, scale, drop):
    """Plain-XLA forward with the SAME math and hash masks as the
    Pallas forward kernel (probs do hit HBM once here).  Pairs with
    the Pallas backward as the 'hybrid' schedule — the backward is
    where XLA pays for saved probs + masks, so a hybrid keeps XLA's
    well-scheduled batched forward while still killing the residuals."""
    f32 = jnp.float32
    B, H, R, d = q.shape
    xd = q.dtype
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=f32) * np.float32(1.0 / scale)
    s = s.astype(xd)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if drop > 0.0:
        # mask parity with the kernels: generated at the PADDED tile
        # shape (counter = row * Rp + col), then sliced
        Rp = -(-R // 128) * 128
        stride = np.uint32(max(H, 8))   # keep in lockstep with _salt
        salts = (_SITE_ATTN
                 + jnp.arange(B, dtype=jnp.uint32)[:, None] * stride
                 + jnp.arange(H, dtype=jnp.uint32)[None, :])
        u = jax.vmap(jax.vmap(
            lambda slt: uniform_hash((Rp, Rp), seed, slt)))(salts)
        p = _dropped(p, u[:, :, :R, :R], drop)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=f32).astype(xd)


def _make_primitive(fwd_impl):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
    def prim(q, k, v, seed, scale, drop, interpret=False):
        # self-attention only: _fwd_call/_bwd_call derive one Rp from
        # q.shape and apply it to k/v padding and column masking, so a
        # cross-attention call (q_len != kv_len) would mask wrongly
        assert q.shape == k.shape == v.shape, (q.shape, k.shape, v.shape)
        if fwd_impl == "pallas":
            return _fwd_call(q, k, v, seed, scale, drop, interpret)
        return _fwd_jnp(q, k, v, seed, scale, drop)

    def vjp_fwd(q, k, v, seed, scale, drop, interpret):
        return (prim(q, k, v, seed, scale, drop, interpret),
                (q, k, v, seed))

    def vjp_bwd(scale, drop, interpret, res, g):
        q, k, v, seed = res
        dq, dk, dv = _bwd_call(q, k, v, seed, g, scale, drop, interpret)
        return dq, dk, dv, np.zeros(np.shape(seed), jax.dtypes.float0)

    prim.defvjp(vjp_fwd, vjp_bwd)
    return prim


# Pallas fwd + Pallas bwd.  (B, h, R, d) q/k/v -> (B, h, R, d)
# attention output with in-kernel prob dropout; differentiable w.r.t.
# q, k, v.  seed is a traced int32 scalar keying the dropout hash;
# scale/drop are static.  One (batch row, head) tile per grid step.
mha_probs_dropout = _make_primitive("pallas")

# XLA fwd (identical masks) + Pallas bwd
mha_probs_dropout_hybrid = _make_primitive("jnp")
