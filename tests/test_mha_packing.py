"""Packed vs head-sequential multi-head attention schedules must agree
exactly with the reference's uneven torch.chunk head semantics
(transformer.py:118-123); _mha switches schedule on KV length."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.models.transformer import (
    _head_slices, _mha, _mha_init)


def chunked_mha_reference(p, query, key_, value, n_heads, causal):
    """Slow head-by-head loop with the reference semantics."""
    from grounded_video_description_tpu.nn import linear

    d_model = query.shape[-1]
    q = linear(p["wq"], query)
    k = linear(p["wk"], key_)
    v = linear(p["wv"], value)
    scale = math.sqrt(d_model)
    outs = []
    for sl in _head_slices(d_model, n_heads):
        scores = jnp.einsum("bqd,bkd->bqk", q[..., sl], k[..., sl])
        if causal:
            T = k.shape[1]
            tri = jnp.triu(jnp.full((T, T), 1e10, scores.dtype), 1)
            scores = scores - tri[None]
        w = jax.nn.softmax(scores / scale, axis=-1)
        outs.append(jnp.einsum("bqk,bkd->bqd", w, v[..., sl]))
    return linear(p["wo"], jnp.concatenate(outs, axis=-1))


def test_packed_schedule_equals_reference_uneven_heads():
    # 22 dims over 6 heads -> ragged chunks 4,4,4,4,4,2; short KV
    # triggers the packed schedule
    d_model, n_heads = 22, 6
    p = _mha_init(jax.random.PRNGKey(0), d_model)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 5, d_model))
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, 7, d_model))
    got = _mha(p, q, kv, kv, n_heads=n_heads, causal=False,
               drop=0.0, train=False, rng=None)
    want = chunked_mha_reference(p, q, kv, kv, n_heads, causal=False)
    assert np.allclose(np.array(got), np.array(want), atol=1e-5)


def test_sequential_schedule_equals_reference_long_kv():
    # KV length > 256 triggers the head-sequential schedule
    d_model, n_heads = 16, 3
    p = _mha_init(jax.random.PRNGKey(3), d_model)
    q = jax.random.normal(jax.random.PRNGKey(4), (1, 4, d_model))
    kv = jax.random.normal(jax.random.PRNGKey(5), (1, 300, d_model))
    got = _mha(p, q, kv, kv, n_heads=n_heads, causal=False,
               drop=0.0, train=False, rng=None)
    want = chunked_mha_reference(p, q, kv, kv, n_heads, causal=False)
    assert np.allclose(np.array(got), np.array(want), atol=1e-5)


def test_packed_equals_chunked_causal():
    d_model, n_heads = 16, 3   # chunks 6,6,4
    p = _mha_init(jax.random.PRNGKey(3), d_model)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, d_model))
    got = _mha(p, x, x, x, n_heads=n_heads, causal=True,
               drop=0.0, train=False, rng=None)
    want = chunked_mha_reference(p, x, x, x, n_heads, causal=True)
    assert np.allclose(np.array(got), np.array(want), atol=1e-5)
