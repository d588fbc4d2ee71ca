"""Fused self-attention kernel for the obj_interact region encoder.

The reference's region self-attention (model.py:126-135, 2-layer
6-head transformer over the 1000-ROI bank) is the single biggest
chunk of the eval pipeline (~30.7 of the 80 ms greedy batch-100 call;
docs/DESIGN.md ablation).  The XLA path must materialize the per-head
(R, R) score matrix in HBM four times (write scores, read for
softmax, write probs, read for the PV matmul): ~9 GB per encode at
B=100 — bandwidth-bound.

This kernel runs one (batch, head) pair per grid step with the WHOLE
K/V bank resident in VMEM: scores and probabilities never touch HBM.
R=1000 and head_dim=171 fit comfortably (q/k/v ~1 MB each in f32,
scores 4 MB).  Unmasked, non-causal, inference-only (no dropout, no
VJP — the training path keeps the XLA einsum schedule).

Parity vs the einsum path is tested in interpret mode on CPU
(tests/test_pallas.py); the measured A/B lives in docs/DESIGN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_VALUE = -1e8


def _kernel(q_ref, k_ref, v_ref, o_ref, *, R: int):
    f32 = jnp.float32
    q = q_ref[0].astype(f32)                       # (Rp, d)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                # (Rp, Rp)
    Rp = scores.shape[1]
    if Rp != R:
        # padded keys must not receive probability mass
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col >= R, MIN_VALUE, scores)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=f32) / l
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         *, interpret: bool = False) -> jnp.ndarray:
    """Unmasked softmax(q k^T) v per leading index.

    q, k, v: (N, R, d) — N = batch*heads, q pre-scaled by the caller.
    Returns (N, R, d) in q's dtype.
    """
    N, R, d = q.shape
    Rp = -(-R // 128) * 128
    if Rp != R:
        pad = [(0, 0), (0, Rp - R), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kern = functools.partial(_kernel, R=R)
    out = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, Rp, d), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, d), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Rp, d), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Rp, d), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Rp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N * Rp * Rp * d,
            bytes_accessed=4 * N * Rp * d * q.dtype.itemsize,
            transcendentals=N * Rp * Rp),
        interpret=interpret,
    )(q, k, v)
    return out[:, :R]
