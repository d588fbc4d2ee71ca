"""Fused transformer encoder layer for TRAINING: fwd + hand bwd.

The train-step decomposition (docs/DESIGN.md §Full step decomposition)
left three ~25% buckets, each needing a hand fwd+bwd kernel to move;
this is the tractable one — obj_interact fwd+bwd (~289 ms of the
1.043 s accum-8 step after the rbg switch).  The inference kernel
(encoder_layer.py) already showed the win shape: one pallas_call per
post-LN layer, tiled over batch, the (R, R) score/prob tensors never
touching HBM.  Training additionally needs

  * the three dropout sites of the XLA path (attention probs,
    MHA-residual, FFN-residual — models/transformer.py:176,193,199);
  * a backward pass.  XLA's autodiff saves the (B, h, R, R) prob
    tensor (and its dropout mask) as residuals — ~360 MB per layer per
    microbatch in HBM; here the bwd kernel RECOMPUTES attention
    flash-style in VMEM and regenerates the dropout masks, so the only
    residual is the layer input.

Dropout masks come from a counter-based hash (murmur3 finalizer x2)
implemented in plain jnp: the same code runs inside the kernel (fwd
and bwd regenerate identical masks), on any backend, and in the
pure-JAX oracle used by the tests — unlike pltpu.prng_*, which the
CPU interpreter does not emulate.  Masks are keyed on
(seed, site, GLOBAL batch row, head), so fwd and bwd may use
different batch-tile sizes.  The Bernoulli statistics match
nn/core.py:dropout; the stream differs, which was never a parity
surface (the reference's torch stream was never matched either —
docs/DESIGN.md §Dropout RNG).

Semantics matched (reference: misc/transformer.py:107-190 via
models/transformer.py:encoder_apply): post-LN layer with
unbiased-std LayerNorm, shared sqrt(d_model) head scale, uneven
torch-chunk heads (packed into zero-padded slots — exact, see
encoder_layer.py).  Numerics: matmuls accumulate f32 on bf16
operands; softmax runs in the compute dtype (as the XLA path);
LayerNorm statistics and all backward elementwise chains run in f32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grounded_video_description_tpu.ops.pallas.encoder_layer import (
    MIN_VALUE, _layer_norm_std, pack_layer_params)

# site-class offsets for the dropout hash counter (must not collide:
# site + gb*8 + h for probs, site + gb for the row sites)
_SITE_PROBS = np.uint32(0x10000000)
_SITE_RESID1 = np.uint32(0x20000000)
_SITE_RESID2 = np.uint32(0x30000000)


def _fmix32(x):
    """murmur3 finalizer: full-avalanche 32-bit mix (public domain)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def uniform_hash(shape, seed, salt):
    """(shape) f32 uniforms in [0, 1) from a counter-based hash.

    seed: traced int32/uint32 scalar; salt: traced uint32 scalar.
    Deterministic pure function — regenerating in the backward pass
    yields bit-identical masks on every backend.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ctr = rows * np.uint32(shape[1]) + cols
    salt = jnp.asarray(salt, jnp.uint32)      # numpy scalars would warn
    mix = _fmix32(seed.astype(jnp.uint32) + _fmix32(salt))
    h = _fmix32(ctr ^ mix)
    # h >> 8 fits in 24 bits, so the int32 bitcast is value-preserving;
    # Mosaic has no uint32->f32 convert but lowers int32->f32 fine
    h24 = jax.lax.bitcast_convert_type(h >> 8, jnp.int32)
    return h24.astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _dropped(x, u, rate):
    """nn/core.py:dropout semantics: keep where u >= rate, scale 1/keep."""
    keep = np.float32(1.0 - rate)
    return jnp.where(u >= np.float32(rate), x / keep.astype(x.dtype),
                     jnp.zeros((), x.dtype))


def _probs(q, k, b, h, *, R, Rp, dp, inv_scale, xd):
    """Pre-dropout attention probs (xd) for one (batch-row, head).

    q/k are the (bt*Rp, hdp) projections; rows/cols select the (b, h)
    tile.  Softmax in xd (matches the XLA path and the inference
    kernel)."""
    f32 = jnp.float32
    rows = slice(b * Rp, (b + 1) * Rp)
    cols = slice(h * dp, (h + 1) * dp)
    s = jax.lax.dot_general(
        q[rows, cols], k[rows, cols],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * inv_scale
    if Rp != R:
        cid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cid >= R, MIN_VALUE, s)
    s = s.astype(xd)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _attention(q, k, v, b, h, *, R, Rp, dp, inv_scale, xd, seed, gb,
               drop):
    """One (batch-row, head) attention output with prob dropout
    regenerated from (seed, gb, h)."""
    p = _probs(q, k, b, h, R=R, Rp=Rp, dp=dp, inv_scale=inv_scale, xd=xd)
    if drop > 0.0:
        u = uniform_hash((Rp, Rp), seed,
                         _SITE_PROBS + gb * np.uint32(8) + np.uint32(h))
        p = _dropped(p, u, drop)
    cols = slice(h * dp, (h + 1) * dp)
    o = jax.lax.dot(p, v[slice(b * Rp, (b + 1) * Rp), cols],
                    preferred_element_type=jnp.float32)
    return o.astype(xd)


def _ln_fwd(y32, gamma, beta, eps=1e-6):
    """unbiased-std LN forward returning (out32, normed32, sigma32)."""
    n = y32.shape[-1]
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.var(y32, axis=-1, keepdims=True) * (n / max(n - 1, 1))
    sigma = jnp.sqrt(var)
    normed = (y32 - mean) / (sigma + eps)
    return gamma * normed + beta, normed, sigma


def _ln_bwd(dout32, normed32, sigma32, gamma, eps=1e-6):
    """dy for out = gamma*normed + beta, normed = (y-mean)/(sigma+eps),
    sigma = unbiased std.  Derivation in tests/test_pallas_train.py's
    oracle (validated against jax.grad)."""
    n = normed32.shape[-1]
    c = sigma32 + eps
    dn = dout32 * gamma
    t = jnp.sum(dn * normed32, axis=-1, keepdims=True) / (
        (n - 1) * jnp.maximum(sigma32, 1e-30))
    return (dn - jnp.mean(dn, axis=-1, keepdims=True)) / c - normed32 * t


# --------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------- #

def _fwd_kernel(seed_ref, x_ref, wq_ref, wk_ref, wv_ref, wo_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
                o_ref, *, R, bt, n_heads, dp, scale, drop):
    f32 = jnp.float32
    i = pl.program_id(0)
    seed = seed_ref[0]
    Rp, D = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[...].reshape(bt * Rp, D)
    xd = x.dtype
    inv_scale = np.float32(1.0 / scale)
    q = jax.lax.dot(x, wq_ref[...], preferred_element_type=f32).astype(xd)
    k = jax.lax.dot(x, wk_ref[...], preferred_element_type=f32).astype(xd)
    v = jax.lax.dot(x, wv_ref[...], preferred_element_type=f32).astype(xd)
    obs = []
    for b in range(bt):
        gb = (i * bt + b).astype(jnp.uint32)
        os_ = []
        for h in range(n_heads):
            os_.append(_attention(q, k, v, b, h, R=R, Rp=Rp, dp=dp,
                                  inv_scale=inv_scale, xd=xd, seed=seed,
                                  gb=gb, drop=drop))
        obs.append(jnp.concatenate(os_, axis=1))
    attn = jnp.concatenate(obs, axis=0)
    acc = jax.lax.dot(attn, wo_ref[...], preferred_element_type=f32)
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID1 + gb)
            parts.append(_dropped(acc[b * Rp:(b + 1) * Rp], u, drop))
        acc = jnp.concatenate(parts, axis=0)
    x1, _, _ = _ln_fwd(x.astype(f32) + acc, g1_ref[0], be1_ref[0])
    x1c = x1.astype(xd)
    z1 = jax.lax.dot(x1c, w1_ref[...], preferred_element_type=f32)
    a1 = jnp.maximum(z1 + b1_ref[0], 0.0)
    f = jax.lax.dot(a1.astype(xd), w2_ref[...],
                    preferred_element_type=f32) + b2_ref[0]
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID2 + gb)
            parts.append(_dropped(f[b * Rp:(b + 1) * Rp], u, drop))
        f = jnp.concatenate(parts, axis=0)
    x2, _, _ = _ln_fwd(x1 + f, g2_ref[0], be2_ref[0])
    o_ref[...] = x2.astype(o_ref.dtype).reshape(bt, Rp, D)


# --------------------------------------------------------------------- #
# backward kernel
# --------------------------------------------------------------------- #

def _bwd_kernel(seed_ref, x_ref, g_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, g1_ref, be1_ref, g2_ref,
                be2_ref,
                dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dw1_ref,
                db1_ref, dw2_ref, db2_ref, dg1_ref, dbe1_ref, dg2_ref,
                dbe2_ref, *, R, bt, n_heads, dp, scale, drop):
    f32 = jnp.float32
    i = pl.program_id(0)
    seed = seed_ref[0]
    Rp, D = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[...].reshape(bt * Rp, D)
    g32 = g_ref[...].reshape(bt * Rp, D).astype(f32)
    xd = x.dtype
    inv_scale = np.float32(1.0 / scale)

    @pl.when(i == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dwo_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref, dg1_ref, dbe1_ref, dg2_ref, dbe2_ref):
            ref[...] = jnp.zeros_like(ref)

    # ---- recompute forward (probs are NOT kept; pass 2 regenerates) --
    q = jax.lax.dot(x, wq_ref[...], preferred_element_type=f32).astype(xd)
    k = jax.lax.dot(x, wk_ref[...], preferred_element_type=f32).astype(xd)
    v = jax.lax.dot(x, wv_ref[...], preferred_element_type=f32).astype(xd)
    obs = []
    for b in range(bt):
        gb = (i * bt + b).astype(jnp.uint32)
        os_ = []
        for h in range(n_heads):
            os_.append(_attention(q, k, v, b, h, R=R, Rp=Rp, dp=dp,
                                  inv_scale=inv_scale, xd=xd, seed=seed,
                                  gb=gb, drop=drop))
        obs.append(jnp.concatenate(os_, axis=1))
    attn = jnp.concatenate(obs, axis=0)
    acc = jax.lax.dot(attn, wo_ref[...], preferred_element_type=f32)
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID1 + gb)
            parts.append(_dropped(acc[b * Rp:(b + 1) * Rp], u, drop))
        acc = jnp.concatenate(parts, axis=0)
    x1, n1, s1 = _ln_fwd(x.astype(f32) + acc, g1_ref[0], be1_ref[0])
    x1c = x1.astype(xd)
    z1 = jax.lax.dot(x1c, w1_ref[...], preferred_element_type=f32)
    a1 = jnp.maximum(z1 + b1_ref[0], 0.0).astype(xd)
    f = jax.lax.dot(a1, w2_ref[...], preferred_element_type=f32) + b2_ref[0]
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID2 + gb)
            parts.append(_dropped(f[b * Rp:(b + 1) * Rp], u, drop))
        f = jnp.concatenate(parts, axis=0)
    _, n2, s2 = _ln_fwd(x1 + f, g2_ref[0], be2_ref[0])

    # ---- LN2 / FFN / LN1 backward --------------------------------- #
    dg2_ref_val = jnp.sum(g32 * n2, axis=0, keepdims=True)
    dg2_ref[...] += dg2_ref_val
    dbe2_ref[...] += jnp.sum(g32, axis=0, keepdims=True)
    dy2 = _ln_bwd(g32, n2, s2, g2_ref[0])
    df = dy2
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID2 + gb)
            parts.append(_dropped(dy2[b * Rp:(b + 1) * Rp], u, drop))
        df = jnp.concatenate(parts, axis=0)
    dx1 = dy2
    df_c = df.astype(xd)
    db2_ref[...] += jnp.sum(df, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        a1, df_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    da1 = jax.lax.dot_general(
        df_c, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dz1 = jnp.where(a1.astype(f32) > 0.0, da1, 0.0)
    dz1_c = dz1.astype(xd)
    db1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        x1c, dz1_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dx1 = dx1 + jax.lax.dot_general(
        dz1_c, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dg1_ref[...] += jnp.sum(dx1 * n1, axis=0, keepdims=True)
    dbe1_ref[...] += jnp.sum(dx1, axis=0, keepdims=True)
    dy1 = _ln_bwd(dx1, n1, s1, g1_ref[0])
    dx = dy1
    dacc = dy1
    if drop > 0.0:
        parts = []
        for b in range(bt):
            gb = (i * bt + b).astype(jnp.uint32)
            u = uniform_hash((Rp, D), seed, _SITE_RESID1 + gb)
            parts.append(_dropped(dy1[b * Rp:(b + 1) * Rp], u, drop))
        dacc = jnp.concatenate(parts, axis=0)
    dacc_c = dacc.astype(xd)
    dwo_ref[...] += jax.lax.dot_general(
        attn, dacc_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dattn = jax.lax.dot_general(
        dacc_c, wo_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(xd)

    # ---- attention backward (pass 2: probs regenerated per head) --- #
    dqs, dks, dvs = [], [], []
    for b in range(bt):
        gb = (i * bt + b).astype(jnp.uint32)
        rows = slice(b * Rp, (b + 1) * Rp)
        dq_b, dk_b, dv_b = [], [], []
        for h in range(n_heads):
            cols = slice(h * dp, (h + 1) * dp)
            p = _probs(q, k, b, h, R=R, Rp=Rp, dp=dp,
                       inv_scale=inv_scale, xd=xd)
            if drop > 0.0:
                u = uniform_hash(
                    (Rp, Rp), seed,
                    _SITE_PROBS + gb * np.uint32(8) + np.uint32(h))
                pd = _dropped(p, u, drop)
            else:
                pd = p
            do = dattn[rows, cols]
            dv_b.append(jax.lax.dot_general(
                pd, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(xd))
            dpd = jax.lax.dot_general(
                do, v[rows, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            # grad through the prob dropout, then softmax bwd on the
            # PRE-drop probs
            dpp = _dropped(dpd, u, drop) if drop > 0.0 else dpd
            p32 = p.astype(f32)
            ds = p32 * (dpp - jnp.sum(dpp * p32, axis=1, keepdims=True))
            ds = (ds * inv_scale).astype(xd)
            dq_b.append(jax.lax.dot(
                ds, k[rows, cols], preferred_element_type=f32).astype(xd))
            dk_b.append(jax.lax.dot_general(
                ds, q[rows, cols],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32).astype(xd))
        dqs.append(jnp.concatenate(dq_b, axis=1))
        dks.append(jnp.concatenate(dk_b, axis=1))
        dvs.append(jnp.concatenate(dv_b, axis=1))
    dq = jnp.concatenate(dqs, axis=0)
    dk = jnp.concatenate(dks, axis=0)
    dv = jnp.concatenate(dvs, axis=0)

    for w_ref, d in ((dwq_ref, dq), (dwk_ref, dk), (dwv_ref, dv)):
        w_ref[...] += jax.lax.dot_general(
            x, d, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)
    for w_ref, d in ((wq_ref, dq), (wk_ref, dk), (wv_ref, dv)):
        dx = dx + jax.lax.dot_general(
            d, w_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(bt, Rp, D)


# --------------------------------------------------------------------- #
# pallas_call wrappers + custom_vjp
# --------------------------------------------------------------------- #

def _pad_brd(x, Bp, Rp):
    B, R = x.shape[:2]
    if (Bp, Rp) != (B, R):
        x = jnp.pad(x, [(0, Bp - B), (0, Rp - R), (0, 0)])
    return x


def _resident(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _fwd_call(x, packed, seed, drop, n_heads, bt, interpret):
    B, R, D = x.shape
    (wq, wk, wv, wo, w1, b1, w2, b2, g1, be1, g2, be2) = packed
    Rp = -(-R // 128) * 128
    Bp = -(-B // bt) * bt
    xp = _pad_brd(x, Bp, Rp)
    hdp = wq.shape[-1]
    H = w1.shape[-1]
    kern = functools.partial(_fwd_kernel, R=R, bt=bt, n_heads=n_heads,
                             dp=hdp // n_heads, scale=math.sqrt(D),
                             drop=drop)
    out = pl.pallas_call(
        kern,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _resident((D, hdp)), _resident((D, hdp)), _resident((D, hdp)),
            _resident((hdp, D)),
            _resident((D, H)), _resident((1, H)),
            _resident((H, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
        ],
        out_specs=pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Rp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Rp * (4 * D * D + 2 * Rp * hdp + 2 * D * H),
            bytes_accessed=2 * Bp * Rp * D * x.dtype.itemsize,
            transcendentals=Bp * Rp * Rp * n_heads),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, wq, wk, wv, wo,
      w1, b1, w2, b2, g1, be1, g2, be2)
    return out[:B, :R]


def _bwd_call(x, packed, seed, g, drop, n_heads, bt, interpret):
    B, R, D = x.shape
    (wq, wk, wv, wo, w1, b1, w2, b2, g1, be1, g2, be2) = packed
    Rp = -(-R // 128) * 128
    Bp = -(-B // bt) * bt
    xp = _pad_brd(x, Bp, Rp)
    gp = _pad_brd(g, Bp, Rp)
    hdp = wq.shape[-1]
    H = w1.shape[-1]
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, R=R, bt=bt, n_heads=n_heads,
                             dp=hdp // n_heads, scale=math.sqrt(D),
                             drop=drop)
    shapes = [
        jax.ShapeDtypeStruct((Bp, Rp, D), x.dtype),          # dx
        jax.ShapeDtypeStruct((D, hdp), f32),                 # dwq
        jax.ShapeDtypeStruct((D, hdp), f32),                 # dwk
        jax.ShapeDtypeStruct((D, hdp), f32),                 # dwv
        jax.ShapeDtypeStruct((hdp, D), f32),                 # dwo
        jax.ShapeDtypeStruct((D, H), f32),                   # dw1
        jax.ShapeDtypeStruct((1, H), f32),                   # db1
        jax.ShapeDtypeStruct((H, D), f32),                   # dw2
        jax.ShapeDtypeStruct((1, D), f32),                   # db2
        jax.ShapeDtypeStruct((1, D), f32),                   # dg1
        jax.ShapeDtypeStruct((1, D), f32),                   # dbe1
        jax.ShapeDtypeStruct((1, D), f32),                   # dg2
        jax.ShapeDtypeStruct((1, D), f32),                   # dbe2
    ]
    outs = pl.pallas_call(
        kern,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _resident((D, hdp)), _resident((D, hdp)), _resident((D, hdp)),
            _resident((hdp, D)),
            _resident((D, H)), _resident((1, H)),
            _resident((H, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
        ],
        out_specs=[
            pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _resident((D, hdp)), _resident((D, hdp)), _resident((D, hdp)),
            _resident((hdp, D)),
            _resident((D, H)), _resident((1, H)),
            _resident((H, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
            _resident((1, D)), _resident((1, D)),
        ],
        out_shape=shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * Bp * Rp * (4 * D * D + 2 * Rp * hdp + 2 * D * H),
            bytes_accessed=4 * Bp * Rp * D * x.dtype.itemsize,
            transcendentals=3 * Bp * Rp * Rp * n_heads),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, gp, wq, wk, wv, wo,
      w1, b1, w2, b2, g1, be1, g2, be2)
    dx = outs[0][:B, :R]
    casted = [d.astype(p.dtype) for d, p in zip(outs[1:], packed)]
    return dx, tuple(casted)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_encoder_layer_train(x, packed, seed, drop, n_heads, bt_fwd,
                              bt_bwd, interpret):
    """One post-LN encoder layer with dropout: (B, R, D) -> (B, R, D).

    Differentiable w.r.t. x and packed (pack_layer_params output);
    seed is a traced int32 scalar keying the in-kernel dropout hash.
    """
    return _fwd_call(x, packed, seed, drop, n_heads, bt_fwd, interpret)


def _vjp_fwd(x, packed, seed, drop, n_heads, bt_fwd, bt_bwd, interpret):
    out = _fwd_call(x, packed, seed, drop, n_heads, bt_fwd, interpret)
    return out, (x, packed, seed)


def _vjp_bwd(drop, n_heads, bt_fwd, bt_bwd, interpret, res, g):
    x, packed, seed = res
    dx, dpacked = _bwd_call(x, packed, seed, g, drop, n_heads, bt_bwd,
                            interpret)
    seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)
    return dx, dpacked, seed_ct


fused_encoder_layer_train.defvjp(_vjp_fwd, _vjp_bwd)


def encoder_apply_fused_train(p, x, *, n_heads: int, drop: float, rng,
                              bt_fwd: int = 4, bt_bwd: int = 2,
                              pad_to: int = 16, interpret: bool = False):
    """Training drop-in for transformer.encoder_apply (no mask path):
    returns the per-layer encoding list.  Dropout seeds derive from
    `rng` per layer; drop=0.0 (or rng=None) disables the mask sites.
    """
    n_layers = len(p["layers"])
    if rng is not None and drop > 0.0:
        bits = jax.random.bits(rng, (n_layers,), jnp.uint32)
        seeds = jax.lax.bitcast_convert_type(bits, jnp.int32)
    else:
        drop = 0.0
        seeds = jnp.zeros((n_layers,), jnp.int32)
    encodings = []
    for li, lp in enumerate(p["layers"]):
        packed = pack_layer_params(lp, n_heads, x.dtype, pad_to=pad_to)
        x = fused_encoder_layer_train(
            x, packed, seeds[li], float(drop), n_heads, bt_fwd, bt_bwd,
            interpret)
        encodings.append(x)
    return encodings
