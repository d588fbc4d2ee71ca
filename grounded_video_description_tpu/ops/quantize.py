"""Row-wise int8 quantization for the decode-time attention banks.

The greedy/beam decode loop is HBM-bound re-reading the (B, 1000, 1024)
pool and (B, 1000, 512) projected-pool banks every token.  Row-wise
symmetric int8 (abs-max / 127 scales) halves those bytes vs bfloat16;
dequantization fuses into the consuming tanh/matmul.  Opt-in via
`--quantize_banks` (off by default: introduces ~1e-2 relative error in
attention scores, which can flip rare argmax ties).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QuantBank(NamedTuple):
    values: jnp.ndarray   # int8, same shape as the source
    scale: jnp.ndarray    # f32, source shape with last dim = 1


def quantize_rows(x: jnp.ndarray) -> QuantBank:
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return QuantBank(q.astype(jnp.int8), scale)


def dequantize(bank, dtype=jnp.float32) -> jnp.ndarray:
    if isinstance(bank, QuantBank):
        return (bank.values.astype(dtype)
                * bank.scale.astype(dtype))
    return bank
