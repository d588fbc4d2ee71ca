"""int8 quantization for the decode-time attention banks.

The greedy/beam decode loop is HBM-bound re-reading the (B, 1000, 1024)
pool and (B, 1000, 512) projected-pool banks every token.  Symmetric
int8 (abs-max / 127 scales) halves those bytes vs bfloat16;
dequantization fuses into the consuming tanh/matmul.

Two granularities (docs/DESIGN.md §int8 verdict):

* per-(row, 128-column group) — the default.  Each 128-wide slice of
  the feature axis gets its own scale, so a single outlier coordinate
  no longer inflates the quantization step for the whole 1024-wide
  row.  Scale overhead is f32/128 ≈ 3% of the int8 bytes; the group
  dequant is a reshape+broadcast-mul that XLA fuses into the consumer
  exactly like the per-row one.
* per-row (``group_size=None`` or a non-divisible width) — the round-2
  scheme, kept as the fallback and for odd widths.

Opt-in via ``--quantize_banks``; promotion to default is gated on the
0.99 token-agreement bar at trained weights (QUANTIZE_REPORT.json).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class QuantBank(NamedTuple):
    values: jnp.ndarray   # int8, same shape as the source
    scale: jnp.ndarray    # f32, source shape with last dim = n_groups


def quantize_rows(x: jnp.ndarray,
                  group_size: Optional[int] = 128) -> QuantBank:
    """Symmetric int8 quantization along the last axis.

    ``group_size`` columns share one abs-max scale; falls back to one
    scale per row when the width is not a multiple of ``group_size``.
    """
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    if group_size is not None and d % group_size == 0 and d > group_size:
        g = d // group_size
        xg = xf.reshape(*x.shape[:-1], g, group_size)
        amax = jnp.max(jnp.abs(xg), axis=-1)              # (..., G)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xg / scale[..., None]), -127, 127)
        return QuantBank(q.reshape(x.shape).astype(jnp.int8), scale)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return QuantBank(q.astype(jnp.int8), scale)


def dequantize(bank, dtype=jnp.float32) -> jnp.ndarray:
    if isinstance(bank, QuantBank):
        v, scale = bank.values, bank.scale
        g = scale.shape[-1]
        if g == 1:                                        # per-row
            return v.astype(dtype) * scale.astype(dtype)
        gs = v.shape[-1] // g                             # per-group
        vg = v.astype(dtype).reshape(*v.shape[:-1], g, gs)
        return (vg * scale.astype(dtype)[..., None]).reshape(v.shape)
    return bank
