"""Fused Pallas TPU kernel for the per-step region attention.

The hottest decode-time op (SURVEY.md §3: the 1000-ROI attention at
AttModel.py:96-106 runs every token for every beam): additive scores
over the projected region bank, dual masking, softmax, and the weighted
feature pool, in one pass over the bank.

Kernel layout (v2): grid = (batch tiles of 8 sublanes, ROI tiles of
256 lanes); a flash-attention-style online softmax carries running
(max, normalizer, accumulator) in VMEM scratch across the ROI tiles,
so the full (R, H) tanh intermediate never exists and HBM sees each
bank element exactly once.  v1 (one program per batch row, scores as
an (R, 1) column) lowered pathologically in Mosaic and was replaced.

Numerically identical (up to f32 association) to
`ops.attention.region_attention` modes 'add'/'mix'; parity is tested in
interpret mode on CPU (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_VALUE = -1e8
BT = 8       # batch rows per program (sublane tile)
RT = 128     # ROIs per grid step (lane tiles; block x2 double-buffer must fit VMEM)


def _kernel(p_pool_ref, att_h_ref, pool_ref, alpha_w_ref, alpha_b_ref,
            att_mask_ref, pnt_mask_ref, att_res_ref, grd_ref,
            m_scr, l_scr, acc_scr):
    # blocks: p_pool (BT, RT, H); att_h (BT, H); pool (BT, RT, D);
    # alpha_w (1, H); alpha_b (1, 1) SMEM; masks (BT, RT) float;
    # outputs: att_res (BT, D) (same block revisited across r),
    # grd (BT, RT); scratch: m/l (BT, 128), acc (BT, D).
    r = pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(r == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], MIN_VALUE)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    # additive scores for this ROI tile.  Banks arrive in the caller's
    # compute dtype (bf16 in production) and are upcast per-tile in
    # VMEM — casting in HBM before the call would double the traffic
    # of the very op this kernel exists to keep bandwidth-minimal.
    f32 = jnp.float32
    att_h = att_h_ref[:].astype(f32)                         # (BT, H)
    dot = jnp.tanh(p_pool_ref[:].astype(f32)
                   + att_h[:, None, :])                      # (BT, RT, H)
    scores = jnp.sum(dot * alpha_w_ref[0][None, None, :], axis=2)
    scores = scores + alpha_b_ref[0, 0]                      # (BT, RT)

    att_masked = jnp.where(att_mask_ref[:] != 0, MIN_VALUE, scores)
    grd_ref[:] = jnp.where(pnt_mask_ref[:] != 0, MIN_VALUE, att_masked)

    # online softmax update (scratch lane 0 carries the scalars)
    m_old = m_scr[:, :1]                                     # (BT, 1)
    l_old = l_scr[:, :1]
    tile_max = jnp.max(att_masked, axis=1, keepdims=True)    # (BT, 1)
    m_new = jnp.maximum(m_old, tile_max)
    corr = jnp.exp(m_old - m_new)
    p = jnp.exp(att_masked - m_new)                          # (BT, RT)
    l_new = l_old * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc_scr[:] * corr + jnp.sum(
        p[:, :, None] * pool_ref[:].astype(f32), axis=1)     # (BT, D)

    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new
    acc_scr[:] = acc_new

    @pl.when(r == n_r - 1)
    def _finalize():
        att_res_ref[:] = acc_scr[:] / l_scr[:, :1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_region_attention(p_pool_feats: jnp.ndarray, att_h: jnp.ndarray,
                           pool_feats: jnp.ndarray, alpha_w: jnp.ndarray,
                           alpha_b: jnp.ndarray, att_mask: jnp.ndarray,
                           pnt_mask: jnp.ndarray, *,
                           interpret: bool = False):
    """Additive region attention, fused.

    p_pool_feats: (B, R, H); att_h: (B, H); pool_feats: (B, R, D)
    alpha_w: (H, 1) or (1, H); alpha_b: (1,) or scalar
    att_mask / pnt_mask: (B, R) bool
    Returns (att_res (B, D), grd_logits (B, R)).
    """
    B, R, H = p_pool_feats.shape
    D = pool_feats.shape[-1]
    f32 = jnp.float32
    # the kernel accumulates in f32; return in the caller's compute
    # dtype so the decode scan carry keeps a stable type under bf16
    out_dtype = p_pool_feats.dtype

    # pad B to the batch tile and R to the ROI tile; padded rows/ROIs
    # are fully masked (their grd logits are dropped on return)
    Bp = -(-B // BT) * BT
    Rp = -(-R // RT) * RT
    if Bp != B:
        pb = [(0, Bp - B)]
        p_pool_feats = jnp.pad(p_pool_feats, pb + [(0, 0), (0, 0)])
        pool_feats = jnp.pad(pool_feats, pb + [(0, 0), (0, 0)])
        att_h = jnp.pad(att_h, pb + [(0, 0)])
        att_mask = jnp.pad(att_mask, pb + [(0, 0)],
                           constant_values=True)
        pnt_mask = jnp.pad(pnt_mask, pb + [(0, 0)],
                           constant_values=True)
    if Rp != R:
        pr = [(0, 0), (0, Rp - R)]
        p_pool_feats = jnp.pad(p_pool_feats, pr + [(0, 0)])
        pool_feats = jnp.pad(pool_feats, pr + [(0, 0)])
        att_mask = jnp.pad(att_mask, pr, constant_values=True)
        pnt_mask = jnp.pad(pnt_mask, pr, constant_values=True)

    alpha_b = jnp.asarray(alpha_b, f32).reshape(1, 1)
    alpha_w2 = jnp.asarray(alpha_w, f32).reshape(1, H)

    grid = (Bp // BT, Rp // RT)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, RT, H), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, RT, D), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BT, RT), lambda b, r: (b, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, RT), lambda b, r: (b, r),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, D), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, RT), lambda b, r: (b, r),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), f32),
            jax.ShapeDtypeStruct((Bp, Rp), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, 128), f32),   # running max (lane 0)
            pltpu.VMEM((BT, 128), f32),   # running normalizer
            pltpu.VMEM((BT, D), f32),     # running weighted sum
        ],
        interpret=interpret,
    )(p_pool_feats, att_h.astype(f32), pool_feats, alpha_w2, alpha_b,
      att_mask.astype(f32), pnt_mask.astype(f32))

    att_res, grd = out
    return (att_res[:B].astype(out_dtype),
            grd[:B, :R].astype(out_dtype))
