"""Minimal functional neural-net library (pure pytrees, no framework).

The model layer of this framework is deliberately built on plain
parameter pytrees + pure functions: everything jits, shards and scans
without module magic, and checkpoints are plain nested dicts.

Initializers mirror the PyTorch defaults the reference model trains
under (Linear: U(±1/sqrt(fan_in)) for weight *and* bias; Embedding:
N(0,1); recurrent cells: U(±1/sqrt(hidden))), so optimization behaves
comparably without copying any code.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Params = Dict
Initializer = jax.nn.initializers.Initializer


# --------------------------------------------------------------------- #
# initializers
# --------------------------------------------------------------------- #

def uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# --------------------------------------------------------------------- #
# linear
# --------------------------------------------------------------------- #

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": uniform_fan_in(kw, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = uniform_fan_in(kb, (out_dim,), in_dim)
    return p


def linear(p: Params, x: jnp.ndarray, *, precision=None) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), precision=precision)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# --------------------------------------------------------------------- #
# embedding
# --------------------------------------------------------------------- #

def embedding_init(key, num: int, dim: int) -> Params:
    return {"w": jax.random.normal(key, (num, dim))}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


# --------------------------------------------------------------------- #
# LSTM cell (gate order i, f, g, o — torch convention, for readability
# of any future weight import; fused as two matmuls for the MXU)
# --------------------------------------------------------------------- #

def lstm_cell_init(key, in_dim: int, hidden: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wi": uniform_fan_in(k1, (in_dim, 4 * hidden), hidden),
        "wh": uniform_fan_in(k2, (hidden, 4 * hidden), hidden),
        "b": uniform_fan_in(k3, (4 * hidden,), hidden),
    }


def lstm_cell(p: Params, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]):
    h, c = state
    gates = (jnp.dot(x, p["wi"].astype(x.dtype))
             + jnp.dot(h, p["wh"].astype(x.dtype))
             + p["b"].astype(x.dtype))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, (h_new, c_new)


# --------------------------------------------------------------------- #
# GRU cell (torch gate order r, z, n; n-gate uses r * (W_hn h + b_hn))
# --------------------------------------------------------------------- #

def _gru_cell_init(key, in_dim: int, hidden: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wi": uniform_fan_in(k1, (in_dim, 3 * hidden), hidden),
        "wh": uniform_fan_in(k2, (hidden, 3 * hidden), hidden),
        "bi": uniform_fan_in(k3, (3 * hidden,), hidden),
        "bh": uniform_fan_in(k4, (3 * hidden,), hidden),
    }


def _gru_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    gi = jnp.dot(x, p["wi"].astype(x.dtype)) + p["bi"].astype(x.dtype)
    gh = jnp.dot(h, p["wh"].astype(x.dtype)) + p["bh"].astype(x.dtype)
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1.0 - z) * n + z * h


# --------------------------------------------------------------------- #
# multi-layer bidirectional RNN over time (lax.scan per direction).
#
# Temporal-context encoder equivalent of the reference's
# nn.LSTM/nn.GRU(bidirectional=True, num_layers=2, dropout=p)
# (misc/model.py:145-156).  Layout: (B, T, D) batch-first.
# --------------------------------------------------------------------- #

def birnn_init(key, in_dim: int, hidden: int, num_layers: int, mode: str) -> Params:
    cell_init = _gru_cell_init if mode == "bigru" else lstm_cell_init
    layers = []
    d = in_dim
    for li in range(num_layers):
        kf, kb, key = jax.random.split(key, 3)
        layers.append({"fwd": cell_init(kf, d, hidden),
                       "bwd": cell_init(kb, d, hidden)})
        d = 2 * hidden
    return {"layers": layers}


def _scan_dir(cell_fn, p, xs, hidden, reverse: bool):
    """One direction of a recurrent layer.

    TPU optimization: the input projection (W_i @ x_t for every t) has
    no sequential dependency, so it is hoisted out of the scan into a
    single large (B*T, D) x (D, gates) MXU matmul; the scan body only
    carries the hidden-to-hidden matmul and the gate nonlinearity —
    roughly halving the latency-bound sequential work.
    """
    B, T, D = xs.shape
    h0 = jnp.zeros((B, hidden), xs.dtype)

    if cell_fn is lstm_cell:
        gi_all = jnp.dot(xs, p["wi"].astype(xs.dtype)) \
            + p["b"].astype(xs.dtype)                    # (B, T, 4H)
        carry0 = (h0, h0)

        def step(carry, gi):
            h, c = carry
            gates = gi + jnp.dot(h, p["wh"].astype(gi.dtype))
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new
    else:
        gi_all = jnp.dot(xs, p["wi"].astype(xs.dtype)) \
            + p["bi"].astype(xs.dtype)                   # (B, T, 3H)
        carry0 = h0

        def step(h, gi):
            gh = jnp.dot(h, p["wh"].astype(gi.dtype)) + p["bh"].astype(
                gi.dtype)
            ir, iz, in_ = jnp.split(gi, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

    gi_t = jnp.swapaxes(gi_all, 0, 1)  # (T, B, gates)
    _, ys = jax.lax.scan(step, carry0, gi_t, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def _scan_bidir(mode: str, lp, xs, hidden, use_pallas: bool = False,
                unroll: int = 8, remat: bool = False):
    """Both directions of one layer in a single scan: the backward
    lane consumes time-reversed inputs, so one T-step scan replaces
    two — halving the latency-bound sequential chain.  Per step the
    two directions' hidden matmuls run as one batched einsum.

    use_pallas: run the recurrence as the fused Pallas kernel
    (ops/pallas/birnn.py) — VMEM-resident state, streamed input
    projections; measured 1.22x the scan on v5e at the flagship
    eval shape (B=100, T=480, H=512, bf16).  The kernel defines no
    VJP, so callers must keep it off for differentiated (training)
    paths."""
    B, T, D = xs.shape
    fwd, bwd = lp["fwd"], lp["bwd"]
    dtypef = xs.dtype

    wi = jnp.stack([fwd["wi"], bwd["wi"]]).astype(dtypef)      # (2, D, G)
    wh = jnp.stack([fwd["wh"], bwd["wh"]]).astype(dtypef)      # (2, H, G)
    if mode == "bigru":
        bi = jnp.stack([fwd["bi"], bwd["bi"]]).astype(dtypef)
        bh = jnp.stack([fwd["bh"], bwd["bh"]]).astype(dtypef)
    else:
        bi = jnp.stack([fwd["b"], bwd["b"]]).astype(dtypef)

    gi = jnp.einsum("btd,kdg->tkbg", xs, wi)                   # (T,2,B,G)
    gi = gi + (bi[None, :, None, :] if mode == "bigru"
               else bi[None, :, None, :])
    gi = gi.at[:, 1].set(gi[::-1, 1])      # reverse time for bwd lane

    if use_pallas:
        from grounded_video_description_tpu.ops.pallas.birnn import (
            birnn_recurrence)
        ys = birnn_recurrence(gi, wh, bh if mode == "bigru" else None,
                              mode=mode, hidden=hidden)
        out = jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1)
        return jnp.swapaxes(out, 0, 1)

    h0 = jnp.zeros((2, B, hidden), dtypef)

    if mode == "bigru":
        def step(h, gi_t):
            gh = jnp.einsum("kbh,khg->kbg", h, wh) \
                + bh[:, None, :]
            ir, iz, in_ = jnp.split(gi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        carry0 = h0
        # unroll amortizes per-iteration loop overhead over the long
        # (480-step) latency-bound chain; remat checkpoints the scan
        # BODY (store only the h carry, recompute gate intermediates in
        # the backward) — the same residual-traffic/recompute trade
        # measured for the decode scan (docs/DESIGN.md §Decode-scan
        # training bucket)
        if remat:
            step = jax.checkpoint(step)
        _, ys = jax.lax.scan(step, carry0, gi, unroll=unroll)
    else:
        def step(carry, gi_t):
            h, c = carry
            gates = gi_t + jnp.einsum("kbh,khg->kbg", h, wh)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        if remat:
            step = jax.checkpoint(step)
        _, ys = jax.lax.scan(step, (h0, h0), gi, unroll=unroll)

    # ys: (T, 2, B, H); un-reverse the backward lane
    fwd_out = ys[:, 0]                                        # (T, B, H)
    bwd_out = ys[::-1, 1]
    out = jnp.concatenate([fwd_out, bwd_out], axis=-1)        # (T, B, 2H)
    return jnp.swapaxes(out, 0, 1)


def birnn(p: Params, x: jnp.ndarray, *, mode: str, hidden: int,
          dropout_rate: float = 0.0, train: bool = False, rng=None,
          use_pallas: bool = False, unroll: int = 8,
          remat: bool = False) -> jnp.ndarray:
    out = x
    n_layers = len(p["layers"])
    for li, lp in enumerate(p["layers"]):
        out = _scan_bidir(mode, lp, out, hidden,
                          use_pallas=use_pallas and not train,
                          unroll=unroll, remat=remat)
        if train and dropout_rate > 0.0 and li < n_layers - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            out = dropout(sub, out, dropout_rate, train=True)
    return out


# --------------------------------------------------------------------- #
# normalization
# --------------------------------------------------------------------- #

def layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free layer norm over the last axis (F.layer_norm with
    default weight/bias — matches model.py:307-308, 363-364).
    Statistics always in f32 (safe under bfloat16 compute)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def layer_norm_params_init(dim: int) -> Params:
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def layer_norm_affine(p: Params, x: jnp.ndarray, eps: float = 1e-6,
                      use_std: bool = False) -> jnp.ndarray:
    """Affine layer norm.  With ``use_std=True`` reproduces the
    transformer LayerNorm variant that divides by (std + eps) using the
    unbiased std (misc/transformer.py:66-77)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    if use_std:
        n = x.shape[-1]
        var = jnp.var(x, axis=-1, keepdims=True) * (n / max(n - 1, 1))
        normed = (x - mean) / (jnp.sqrt(var) + eps)
    else:
        var = jnp.var(x, axis=-1, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + eps)
    return p["gamma"].astype(x.dtype) * normed + p["beta"].astype(x.dtype)


def batch_norm_init(dim: int) -> Tuple[Params, Params]:
    """Returns (params, state) for BatchNorm1d over a (B, T, C) tensor
    normalizing per channel across (B, T) — the att_embed_aux layer
    (model.py:114-115, applied at model.py:396-398)."""
    params = {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
             "count": jnp.zeros(())}
    return params, state


def batch_norm(params: Params, state: Params, x: jnp.ndarray, *,
               train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """x: (B, T, C); returns (y, new_state)."""
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1))
        var = jnp.var(x32, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var.astype(x.dtype) + eps)
    y = params["gamma"].astype(x.dtype) * y + params["beta"].astype(x.dtype)
    return y, new_state


# --------------------------------------------------------------------- #
# dropout
# --------------------------------------------------------------------- #

def dropout(rng, x: jnp.ndarray, rate: float, *, train: bool,
            residual_name: Optional[str] = None) -> jnp.ndarray:
    """`residual_name` tags the mask and output with
    checkpoint_name so a names-based checkpoint
    policy (save_anything_except_these_names) can force them to be
    recomputed instead of stored — recomputation replays the same rng
    key through the same primitives, so the same mask and math are
    reproduced (equal up to XLA fusion rounding; verified in f64 by
    tests/test_transformer.py)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    if residual_name is not None:
        mask = checkpoint_name(mask, residual_name)
        out = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        return checkpoint_name(out, residual_name)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
