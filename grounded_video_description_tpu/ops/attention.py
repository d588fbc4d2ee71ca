"""Attention primitives (jnp reference implementations).

Behavioral contracts:
  * temporal additive attention over frame features —
    misc/AttModel.py:22-53 (`Attention`)
  * region attention with dual masking —
    misc/AttModel.py:56-108 (`Attention2`)
  * word<->region grounding scorer — misc/model.py:243-280 (`_grounder`)

These are written for XLA fusion: each is a couple of matmuls plus a
masked softmax, batched over everything.  A fused Pallas kernel for the
hot region-attention path lives in
``grounded_video_description_tpu.ops.pallas.region_attention`` and is
numerically interchangeable.

Mask convention: bool, True == masked (scores forced to MIN_VALUE
*before* softmax, identical to the reference's masked_fill_ ordering at
AttModel.py:99-103 — the returned grounding logits additionally carry
the pnt mask).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from grounded_video_description_tpu.nn import linear
from grounded_video_description_tpu.ops.quantize import dequantize

MIN_VALUE = -1e8


def temporal_attention(p, h: jnp.ndarray, att_feats: jnp.ndarray,
                       p_att_feats: jnp.ndarray) -> jnp.ndarray:
    """Additive attention over the temporal axis.

    p: {"h2att": linear(rnn->att_hid), "alpha_net": linear(att_hid->1)}
    h: (B, rnn); att_feats: (B, T, rnn); p_att_feats: (B, T, att_hid)
    returns: (B, rnn) attended feature.
    """
    att_h = linear(p["h2att"], h)                         # (B, H)
    p_att_feats = dequantize(p_att_feats, att_h.dtype)
    att_feats = dequantize(att_feats, att_h.dtype)
    dot = jnp.tanh(p_att_feats + att_h[:, None, :])       # (B, T, H)
    scores = linear(p["alpha_net"], dot)[..., 0]          # (B, T)
    weight = jax.nn.softmax(scores, axis=1)
    return jnp.einsum("bt,btd->bd", weight, att_feats)


def region_attention(p, h: jnp.ndarray, pool_feats: jnp.ndarray,
                     p_pool_feats: jnp.ndarray, att_mask: jnp.ndarray,
                     pnt_mask: jnp.ndarray, *, mode: str,
                     use_pallas: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Region attention with dual masking.

    p: {"h2att": linear, "alpha_net": optional linear}
    h: (B, rnn); pool_feats: (B, R, rnn); p_pool_feats: (B, R, att_hid)
    att_mask / pnt_mask: (B, R) bool, True == masked.
    mode: 'add' | 'mix'  -> additive scores
          'mix_mul'      -> elementwise-multiplicative scores
          'cat'          -> concat scores
          'dp'           -> dot-product scores
    Returns (att_res (B, rnn), grounding_logits (B, R), att_h (B, att_hid)).

    The attention softmax sees only ``att_mask``; the returned logits
    additionally carry ``pnt_mask`` (used for the grounding losses and
    the per-step argmax) — AttModel.py:98-106.
    """
    att_h = linear(p["h2att"], h)                         # (B, H)
    p_pool_feats = dequantize(p_pool_feats, att_h.dtype)
    pool_feats = dequantize(pool_feats, att_h.dtype)

    if use_pallas and mode in ("add", "mix"):
        from grounded_video_description_tpu.ops.pallas.region_attention \
            import fused_region_attention
        att_res, grd_logits = fused_region_attention(
            p_pool_feats, att_h, pool_feats,
            p["alpha_net"]["w"], p["alpha_net"].get("b", 0.0),
            att_mask, pnt_mask)
        return att_res, grd_logits, att_h

    if mode in ("add", "mix"):
        dot = jnp.tanh(p_pool_feats + att_h[:, None, :])
        scores = linear(p["alpha_net"], dot)[..., 0]
    elif mode == "mix_mul":
        dot = jnp.tanh(p_pool_feats * att_h[:, None, :])
        scores = linear(p["alpha_net"], dot)[..., 0]
    elif mode == "cat":
        R = p_pool_feats.shape[1]
        dot = jnp.concatenate(
            [p_pool_feats,
             jnp.broadcast_to(att_h[:, None, :], p_pool_feats.shape)], axis=-1)
        dot = jnp.tanh(dot)
        scores = linear(p["alpha_net"], dot)[..., 0]
        del R
    elif mode == "dp":
        scores = jnp.einsum("brh,bh->br", p_pool_feats, att_h)
    else:
        raise ValueError(f"unknown region_attn_mode {mode!r}")

    scores = jnp.where(att_mask, MIN_VALUE, scores)       # (B, R)
    grd_logits = jnp.where(pnt_mask, MIN_VALUE, scores)

    weight = jax.nn.softmax(scores, axis=1)
    att_res = jnp.einsum("br,brd->bd", weight, pool_feats)
    return att_res, grd_logits, att_h


def temporal_attention_beam(p, h: jnp.ndarray, att_feats: jnp.ndarray,
                            p_att_feats: jnp.ndarray) -> jnp.ndarray:
    """Beam variant sharing one attention bank across W beams.

    h: (B, W, rnn); att_feats: (B, T, rnn); p_att_feats: (B, T, H).
    Returns (B, W, rnn).  Identical math to `temporal_attention` on
    W-replicated banks, without materializing the W copies."""
    att_h = linear(p["h2att"], h)                         # (B, W, H)
    dot = jnp.tanh(p_att_feats[:, None] + att_h[:, :, None])
    scores = linear(p["alpha_net"], dot)[..., 0]          # (B, W, T)
    weight = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bwt,btd->bwd", weight, att_feats)


def region_attention_beam(p, h: jnp.ndarray, pool_feats: jnp.ndarray,
                          p_pool_feats: jnp.ndarray, att_mask: jnp.ndarray,
                          pnt_mask: jnp.ndarray, *, mode: str):
    """Beam variant of `region_attention` with shared banks.

    h: (B, W, rnn); pool/p_pool: (B, R, *); masks: (B, R).
    Returns (att_res (B, W, rnn), grd_logits (B, W, R), att_h)."""
    att_h = linear(p["h2att"], h)                         # (B, W, H)
    if mode in ("add", "mix"):
        dot = jnp.tanh(p_pool_feats[:, None] + att_h[:, :, None])
        scores = linear(p["alpha_net"], dot)[..., 0]      # (B, W, R)
    elif mode == "mix_mul":
        dot = jnp.tanh(p_pool_feats[:, None] * att_h[:, :, None])
        scores = linear(p["alpha_net"], dot)[..., 0]
    elif mode == "cat":
        B, W, H = att_h.shape
        R = p_pool_feats.shape[1]
        dot = jnp.concatenate([
            jnp.broadcast_to(p_pool_feats[:, None], (B, W, R, H)),
            jnp.broadcast_to(att_h[:, :, None], (B, W, R, H))], axis=-1)
        scores = linear(p["alpha_net"], jnp.tanh(dot))[..., 0]
    elif mode == "dp":
        scores = jnp.einsum("brh,bwh->bwr", p_pool_feats, att_h)
    else:
        raise ValueError(f"unknown region_attn_mode {mode!r}")

    scores = jnp.where(att_mask[:, None], MIN_VALUE, scores)
    grd_logits = jnp.where(pnt_mask[:, None], MIN_VALUE, scores)
    weight = jax.nn.softmax(scores, axis=-1)
    att_res = jnp.einsum("bwr,brd->bwd", weight, pool_feats)
    return att_res, grd_logits, att_h


def grounder(xt: jnp.ndarray, att_feats: jnp.ndarray, mask: jnp.ndarray,
             bias: Optional[jnp.ndarray] = None, *,
             alpha_params=None, additive_cat: bool = False) -> jnp.ndarray:
    """Word <-> region scorer (misc/model.py:243-280).

    xt:        (B, S, E) word-side embeddings.
    att_feats: (B, R, E) region-side embeddings.
    mask:      (B, R) or (B, S, R) bool, True == masked.
    bias:      broadcastable to (B, S, R), added pre-mask.
    alpha_params: when given, additive attention using this linear
                  head (region_attn_mode 'add'/'cat' on the model,
                  model.py:55-58); otherwise dot-product.
    returns:   (B, S, R) masked logits.
    """
    if alpha_params is not None:
        if additive_cat:
            B, S, E = xt.shape
            R = att_feats.shape[1]
            dot = jnp.concatenate([
                jnp.broadcast_to(xt[:, :, None, :], (B, S, R, E)),
                jnp.broadcast_to(att_feats[:, None, :, :], (B, S, R, E)),
            ], axis=-1)
        else:
            dot = xt[:, :, None, :] + att_feats[:, None, :, :]
        dot = jnp.tanh(dot)
        logits = linear(alpha_params, dot)[..., 0]        # (B, S, R)
    else:
        assert xt.shape[-1] == att_feats.shape[-1]
        logits = jnp.einsum("bse,bre->bsr", xt, att_feats)

    if bias is not None:
        logits = logits + bias

    if mask.ndim == 2:
        mask = mask[:, None, :]
    logits = jnp.where(mask, MIN_VALUE, logits)
    return logits
