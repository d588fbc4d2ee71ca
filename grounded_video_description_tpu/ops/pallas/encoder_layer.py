"""Fused transformer ENCODER LAYER for the obj_interact region bank.

One pallas_call = one whole post-LN encoder layer at inference
(misc/transformer.py:107-190 semantics): QKV projections, per-head
attention with the (R, R) score matrix living ONLY in VMEM, output
projection, residual + LayerNorm(unbiased std), FFN, residual +
LayerNorm.  The XLA schedule materializes scores/probs in HBM four
times per head (~12 ms of pure score traffic per encode at B=100,
docs/DESIGN.md); here they never leave the chip.

Why this shape of kernel, given round 2's flash-MHA rejection: that
kernel ran one (batch, head) pair per grid step — 1200 steps of
~0.5 GFLOP whose per-step overhead outweighed the saved bandwidth.
This kernel tiles over BATCH only (grid of B/bt steps, tens of GFLOP
each): per step it computes the whole layer for `bt` rows, so the MXU
sees a long uninterrupted stream of large matmuls and the score
round-trips vanish.

Head packing: the reference chunks 1024 dims into 6 uneven heads
(171 x 5 + 169, transformer.py:118-123).  The caller packs each
head's projection columns into a zero-padded 16-aligned slot
(`pack_layer_params`); zero-padding a CONTRACTION dimension is exact,
so q.k dots, probs.v, and the output projection are equivalent to the
chunked layout while every kernel matmul runs on aligned shapes.

Inference-only: no dropout, no mask, no VJP (training keeps the XLA
einsum schedule).  Numerics: matmuls accumulate f32 on bf16 operands
(same as XLA); softmax and LayerNorm statistics run in f32 — the XLA
path computes these in bf16, so bf16 outputs differ by ~1 bf16 ulp
(the kernel is the more precise of the two); f32 parity is tested to
1e-5 in interpret mode (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_VALUE = -1e8


def _head_slices(d: int, n_heads: int):
    size = -(-d // n_heads)
    out, start = [], 0
    while start < d:
        out.append(slice(start, min(start + size, d)))
        start += size
    return out


def pack_layer_params(lp, n_heads: int, dtype, pad_to: int = 16):
    """Pack one encoder layer's params for the kernel.

    Returns (wq, wk, wv) as (D, h*dp) with each head's columns in a
    zero-padded dp-slot, wo as (h*dp, D) with the matching rows, plus
    the FFN / LN tensors reshaped 2D (TPU wants >= 2D operands)."""
    sa = lp["selfattn"]
    D = sa["wq"]["w"].shape[0]
    slices = _head_slices(D, n_heads)
    dp = -(-max(s.stop - s.start for s in slices) // pad_to) * pad_to

    def cols(w):
        """(D, h*dp): head h's columns in slot [h*dp, h*dp+|h|)."""
        out = jnp.zeros((D, len(slices) * dp), dtype)
        for h, s in enumerate(slices):
            out = out.at[:, h * dp: h * dp + (s.stop - s.start)].set(
                w[:, s].astype(dtype))
        return out

    def rows(w):
        """(h*dp, D): head h's rows in slot [h*dp, h*dp+|h|)."""
        out = jnp.zeros((len(slices) * dp, D), dtype)
        for h, s in enumerate(slices):
            out = out.at[h * dp: h * dp + (s.stop - s.start), :].set(
                w[s, :].astype(dtype))
        return out

    ff, ln1, ln2 = lp["ff"], lp["ln1"], lp["ln2"]
    two_d = lambda a: a.astype(jnp.float32).reshape(1, -1)
    return (
        cols(sa["wq"]["w"]), cols(sa["wk"]["w"]), cols(sa["wv"]["w"]),
        rows(sa["wo"]["w"]),
        ff["l1"]["w"].astype(dtype), two_d(ff["l1"]["b"]),
        ff["l2"]["w"].astype(dtype), two_d(ff["l2"]["b"]),
        two_d(ln1["gamma"]), two_d(ln1["beta"]),
        two_d(ln2["gamma"]), two_d(ln2["beta"]),
    )


def _layer_norm_std(x32, gamma, beta, eps=1e-6):
    """layer_norm_affine(use_std=True): divide by unbiased std + eps
    (transformer.py:66-77 via nn/core.py)."""
    n = x32.shape[-1]
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True) * (n / max(n - 1, 1))
    normed = (x32 - mean) / (jnp.sqrt(var) + eps)
    return gamma * normed + beta


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref, o_ref,
            *, R: int, bt: int, n_heads: int, dp: int, scale: float):
    f32 = jnp.float32
    Rp, D = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[...].reshape(bt * Rp, D)
    # one wide MXU matmul per projection for the whole tile (N = h*dp)
    # instead of 6 narrow per-head ones.  Mosaic requires 32-bit
    # accumulators; downcast after (same as XLA's bf16 einsum)
    xd = x.dtype
    q = jax.lax.dot(x, wq_ref[...],
                    preferred_element_type=f32).astype(xd)
    k = jax.lax.dot(x, wk_ref[...],
                    preferred_element_type=f32).astype(xd)
    v = jax.lax.dot(x, wv_ref[...],
                    preferred_element_type=f32).astype(xd)
    obs = []
    for b in range(bt):        # static: each batch row is independent
        rows = slice(b * Rp, (b + 1) * Rp)
        os_ = []
        for h in range(n_heads):
            cols_ = slice(h * dp, (h + 1) * dp)
            s = jax.lax.dot_general(
                q[rows, cols_], k[rows, cols_],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32) * (1.0 / scale)  # (Rp, Rp)
            if Rp != R:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col >= R, MIN_VALUE, s)
            # softmax in the compute dtype — the XLA path runs
            # jax.nn.softmax on bf16 scores, and the elementwise
            # passes over (Rp, Rp) are VPU-bound in f32
            s = s.astype(xd)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            os_.append(jax.lax.dot(
                p, v[rows, cols_],
                preferred_element_type=f32).astype(xd))       # (Rp, dp)
        obs.append(jnp.concatenate(os_, axis=1))          # (Rp, h*dp)
    attn = jnp.concatenate(obs, axis=0)                   # (bt*Rp, h*dp)
    acc = jax.lax.dot(attn, wo_ref[...],
                      preferred_element_type=f32)         # (bt*Rp, D)
    # residual + LN1 (f32 statistics; XLA runs them bf16)
    x1 = _layer_norm_std(x.astype(f32) + acc, g1_ref[0], be1_ref[0])
    x1c = x1.astype(x.dtype)
    # FFN + residual + LN2
    hdn = jax.lax.dot(x1c, w1_ref[...], preferred_element_type=f32)
    hdn = jnp.maximum(hdn + b1_ref[0], 0.0)
    f = jax.lax.dot(hdn.astype(x.dtype), w2_ref[...],
                    preferred_element_type=f32) + b2_ref[0]
    x2 = _layer_norm_std(x1 + f, g2_ref[0], be2_ref[0])
    o_ref[...] = x2.astype(o_ref.dtype).reshape(bt, Rp, D)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "bt", "interpret"))
def fused_encoder_layer(x: jnp.ndarray, packed, *, n_heads: int = 6,
                        bt: int = 4, interpret: bool = False
                        ) -> jnp.ndarray:
    """One post-LN encoder layer on a (B, R, D) bank.

    x: (B, R, D); packed: pack_layer_params(...) output.
    Returns (B, R, D) in x's dtype."""
    B, R, D = x.shape
    (wq, wk, wv, wo, w1, b1, w2, b2, g1, be1, g2, be2) = packed
    Rp = -(-R // 128) * 128
    Bp = -(-B // bt) * bt
    if (Rp, Bp) != (R, B):
        x = jnp.pad(x, [(0, Bp - B), (0, Rp - R), (0, 0)])
    hdp = wq.shape[-1]
    dp = hdp // n_heads
    H = w1.shape[-1]
    scale = math.sqrt(D)     # shared head scale (transformer.py:94)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, R=R, bt=bt, n_heads=n_heads,
                             dp=dp, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            resident((D, hdp)), resident((D, hdp)),
            resident((D, hdp)), resident((hdp, D)),
            resident((D, H)), resident((1, H)),
            resident((H, D)), resident((1, D)),
            resident((1, D)), resident((1, D)),
            resident((1, D)), resident((1, D)),
        ],
        out_specs=pl.BlockSpec((bt, Rp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Rp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Rp * (4 * D * D + 2 * Rp * dp * n_heads
                                 + 2 * D * H),
            bytes_accessed=2 * Bp * Rp * D * x.dtype.itemsize,
            transcendentals=Bp * Rp * Rp * n_heads),
        interpret=interpret,
    )(x, wq, wk, wv, wo, w1, b1, w2, b2, g1, be1, g2, be2)
    return out[:B, :R]


def encoder_apply_fused(p, x: jnp.ndarray, *, n_heads: int,
                        bt: int = 4, pad_to: int = 16,
                        interpret: bool = False):
    """Drop-in for transformer.encoder_apply at inference (no mask,
    no dropout): returns the per-layer encoding list."""
    encodings = []
    for lp in p["layers"]:
        packed = pack_layer_params(lp, n_heads, x.dtype, pad_to=pad_to)
        x = fused_encoder_layer(x, packed, n_heads=n_heads, bt=bt,
                                interpret=interpret)
        encodings.append(x)
    return encodings
