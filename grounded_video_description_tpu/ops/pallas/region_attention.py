"""Fused Pallas TPU kernel for the per-step region attention.

The hottest decode-time op (SURVEY.md §3: the 1000-ROI attention at
AttModel.py:96-106 runs every token for every beam): additive scores
over the projected region bank, dual masking, softmax, and the weighted
feature pool.  Unfused, this is 4 HBM round-trips of the (R, H) score
intermediates per step; the kernel keeps everything in VMEM and writes
only the (D,) pooled feature and (R,) grounding logits.

Per-program working set at production shapes (R=1024 padded, H=512,
D=1024, f32): 2 MB p_pool + 4 MB pool + scratch << 16 MB VMEM.

Numerically identical (up to f32 association) to
`ops.attention.region_attention` modes 'add'/'mix'; parity is tested in
interpret mode on CPU and on-device in the bench suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_VALUE = -1e8


def _kernel(p_pool_ref, att_h_ref, pool_ref, alpha_w_ref, alpha_b_ref,
            att_mask_ref, pnt_mask_ref, att_res_ref, grd_ref):
    # block shapes: p_pool (1, R, H); att_h (1, 1, H); pool (1, R, D);
    # alpha_w (1, H); alpha_b (1, 1); masks (1, R, 1) float (1 = masked)
    #
    # Layout rule: the R axis stays on sublanes end to end — scores are
    # an (R, 1) column and never transpose to a row (lane<->sublane
    # relayouts and M=1/N=1 MXU matmuls both lower catastrophically in
    # Mosaic).  Score head and weighted pool are VPU reductions.
    dot = jnp.tanh(p_pool_ref[0] + att_h_ref[0])              # (R, H)
    scores = jnp.sum(dot * alpha_w_ref[:], axis=1,
                     keepdims=True) + alpha_b_ref[0, 0]        # (R, 1)

    att_masked = jnp.where(att_mask_ref[0] != 0, MIN_VALUE, scores)
    grd_ref[0] = jnp.where(pnt_mask_ref[0] != 0, MIN_VALUE, att_masked)

    # masked softmax over R (sublane reduction)
    m = jnp.max(att_masked, axis=0, keepdims=True)
    e = jnp.exp(att_masked - m)
    w = e / jnp.sum(e, axis=0, keepdims=True)                  # (R, 1)

    # weighted pool: (R, 1) * (R, D) summed over R -> (1, D)
    att_res_ref[0] = jnp.sum(w * pool_ref[0], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_region_attention(p_pool_feats: jnp.ndarray, att_h: jnp.ndarray,
                           pool_feats: jnp.ndarray, alpha_w: jnp.ndarray,
                           alpha_b: jnp.ndarray, att_mask: jnp.ndarray,
                           pnt_mask: jnp.ndarray, *,
                           interpret: bool = False):
    """Additive region attention, fused.

    p_pool_feats: (B, R, H); att_h: (B, H); pool_feats: (B, R, D)
    alpha_w: (H, 1); alpha_b: (1,) or scalar
    att_mask / pnt_mask: (B, R) bool
    Returns (att_res (B, D), grd_logits (B, R)).
    """
    B, R, H = p_pool_feats.shape
    D = pool_feats.shape[-1]
    f32 = jnp.float32

    # pad R to the lane multiple; padded rows are masked out
    Rp = -(-R // 128) * 128
    if Rp != R:
        pad = [(0, 0), (0, Rp - R), (0, 0)]
        p_pool_feats = jnp.pad(p_pool_feats, pad)
        pool_feats = jnp.pad(pool_feats, pad)
        mask_pad = jnp.ones((B, Rp - R), bool)
        att_mask = jnp.concatenate([att_mask, mask_pad], axis=1)
        pnt_mask = jnp.concatenate([pnt_mask, mask_pad], axis=1)

    alpha_b = jnp.asarray(alpha_b, f32).reshape(1, 1)
    att_mask_f = att_mask.astype(f32)[:, :, None]   # (B, Rp, 1)
    pnt_mask_f = pnt_mask.astype(f32)[:, :, None]
    att_h3 = att_h.astype(f32)[:, None, :]          # (B, 1, H)

    grid = (B,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Rp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Rp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), f32),
            jax.ShapeDtypeStruct((B, Rp, 1), f32),
        ],
        interpret=interpret,
    )(p_pool_feats.astype(f32), att_h3,
      pool_feats.astype(f32), jnp.asarray(alpha_w, f32).reshape(1, -1), alpha_b,
      att_mask_f, pnt_mask_f)

    att_res, grd = out
    return att_res[:, 0], grd[:, :R, 0]
