"""Fused bidirectional-RNN recurrence kernel (Pallas/Mosaic).

The temporal context encoder (reference model.py:145-156) runs a
BiGRU/BiLSTM over T=480 frame features.  The XLA `lax.scan` path
(nn/core.py:_scan_bidir) is latency-bound: each of the 480 sequential
steps lowers to several small kernels (~34 us/step measured on v5e at
batch 100 — ~30x the step's actual compute time).

This kernel runs the WHOLE recurrence as one Pallas program:

  * grid = (T,): Mosaic's pipeline streams the pre-computed input
    projections `gi[t]` HBM->VMEM with automatic double buffering;
  * the hidden (and cell) state lives in VMEM scratch, persisting
    across grid steps — zero HBM round-trips for the recurrent state;
  * both direction lanes are processed per step (lane 1 consumes
    time-reversed inputs, exactly like the scan path), as two MXU
    matmuls [B,H]x[H,G];
  * per-step output h goes back through the same pipeline to HBM.

Numerics match `_scan_bidir` (bf16 carry, f32 MXU accumulation —
same as the einsum path) to bf16 resolution; parity is tested in
interpret mode on CPU (tests/test_pallas.py) and the kernel is A/B'd
against the scan on hardware (docs/DESIGN.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_step(h, gi_t, wh, bh):
    """One GRU step for one lane: h (B,H), gi_t (B,3H), wh (H,3H).

    Gate math runs in f32 (the MXU accumulates f32 anyway; Mosaic
    also rejects mixed f32-scalar/bf16-vector broadcasts that
    jax.nn.sigmoid emits on bf16 operands); the result is cast back
    to the carry dtype at the caller's store."""
    gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) \
        + bh.astype(jnp.float32)
    gi_f = gi_t.astype(jnp.float32)
    h_f = h.astype(jnp.float32)
    H = h.shape[-1]
    ir, iz, in_ = gi_f[:, :H], gi_f[:, H:2 * H], gi_f[:, 2 * H:]
    hr, hz, hn = gh[:, :H], gh[:, H:2 * H], gh[:, 2 * H:]
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1.0 - z) * n + z * h_f


def _lstm_step(h, c, gi_t, wh):
    """One LSTM step for one lane: h/c (B,H), gi_t (B,4H), wh (H,4H).
    f32 gate math (see _gru_step)."""
    gates = gi_t.astype(jnp.float32) + jnp.dot(
        h, wh, preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = gates[:, :H]
    f = gates[:, H:2 * H]
    g = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:]
    c_f = c.astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * c_f + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _make_kernel(mode: str):
    if mode == "bigru":
        def kernel(gi_ref, wh_ref, bh_ref, out_ref, h_scr):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                h_scr[:] = jnp.zeros_like(h_scr)

            for k in (0, 1):
                h = h_scr[k]
                h_new = _gru_step(
                    h, gi_ref[0, k], wh_ref[k], bh_ref[k]).astype(h.dtype)
                h_scr[k] = h_new
                out_ref[0, k] = h_new
        return kernel

    def kernel(gi_ref, wh_ref, out_ref, h_scr, c_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        for k in (0, 1):
            h_new, c_new = _lstm_step(
                h_scr[k], c_scr[k], gi_ref[0, k], wh_ref[k])
            h_scr[k] = h_new.astype(h_scr.dtype)
            c_scr[k] = c_new.astype(c_scr.dtype)
            out_ref[0, k] = h_new.astype(out_ref.dtype)
    return kernel


def birnn_recurrence(gi: jnp.ndarray, wh: jnp.ndarray,
                     bh: jnp.ndarray | None, *, mode: str, hidden: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Run the fused recurrence.

    gi: (T, 2, B, G) pre-computed input projections (+bias), lane 1
        already time-reversed (see nn/core.py:_scan_bidir).
    wh: (2, H, G) hidden-to-hidden weights.  bh: (2, G) GRU hidden
        bias (None for LSTM — its bias is folded into gi).
    Returns ys (T, 2, B, H): per-step hidden states (lane 1 still in
    reversed time, caller un-reverses).
    """
    T, K, B, G = gi.shape
    assert K == 2 and G in (3 * hidden, 4 * hidden), (gi.shape, hidden)
    dtype = gi.dtype
    kernel = _make_kernel(mode)

    in_specs = [
        pl.BlockSpec((1, 2, B, G), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),           # wh resident
    ]
    operands = [gi, wh]
    if mode == "bigru":
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(bh[:, None, :].astype(dtype))    # (2, 1, G)
        scratch = [pltpu.VMEM((2, B, hidden), dtype)]
    else:
        scratch = [pltpu.VMEM((2, B, hidden), dtype),
                   pltpu.VMEM((2, B, hidden), dtype)]

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2, B, hidden), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, B, hidden), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * hidden * G,
            bytes_accessed=gi.size * gi.dtype.itemsize
            + T * 2 * B * hidden * 2,
            transcendentals=T * 2 * B * G),
        interpret=interpret,
    )(*operands)
