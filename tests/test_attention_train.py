"""Parity tests for the per-(row, head) fused attention TRAINING
primitive (ops/pallas/attention_train.py).

Same strategy as tests/test_pallas_train.py: the dropout masks come
from the plain-jnp counter-hash, so a pure-JAX oracle reproduces the
kernel math — including the exact masks — outside Pallas, making the
hand-written backward directly checkable against jax.grad of the
oracle (no finite differences).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_description_tpu.models import transformer as xf
from grounded_video_description_tpu.ops.pallas.attention_train import (
    _SITE_ATTN, mha_probs_dropout, mha_probs_dropout_hybrid)
from grounded_video_description_tpu.ops.pallas.encoder_layer_train import (
    _dropped, uniform_hash)

B, H, R, DH = 3, 2, 200, 24
SCALE = math.sqrt(H * DH)
SEED = jnp.int32(-987654321)


def _qkv(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return tuple(jax.random.normal(k, (B, H, R, DH), jnp.float32)
                 for k in ks)


def oracle(q, k, v, seed, *, drop):
    """Pure-JAX mirror of the kernels (same masks, same op order)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.float32(SCALE)
    p = jax.nn.softmax(s, axis=-1)
    if drop > 0.0:
        Rp = -(-R // 128) * 128
        rows = []
        for b in range(B):
            per_h = []
            for h in range(H):
                salt = _SITE_ATTN + np.uint32(b * 8 + h)
                per_h.append(uniform_hash((Rp, Rp), seed, salt)[:R, :R])
            rows.append(jnp.stack(per_h))
        p = _dropped(p, jnp.stack(rows), drop)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("drop", [0.0, 0.3])
@pytest.mark.parametrize("prim", [mha_probs_dropout,
                                  mha_probs_dropout_hybrid])
def test_forward_matches_oracle(prim, drop):
    q, k, v = _qkv()
    out = prim(q, k, v, SEED, SCALE, drop, True)
    ref = oracle(q, k, v, SEED, drop=drop)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("drop", [0.0, 0.3])
def test_gradients_match_oracle(drop):
    q, k, v = _qkv(1)
    w = jax.random.normal(jax.random.PRNGKey(7), (B, H, R, DH))

    def loss_prim(q, k, v):
        return jnp.sum(mha_probs_dropout(q, k, v, SEED, SCALE, drop, True)
                       * w)

    def loss_oracle(q, k, v):
        return jnp.sum(oracle(q, k, v, SEED, drop=drop) * w)

    g = jax.grad(loss_prim, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, go, "qkv"):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")


def test_hybrid_grads_equal_pallas_grads():
    q, k, v = _qkv(2)

    def s(prim):
        def f(q, k, v):
            return jnp.sum(prim(q, k, v, SEED, SCALE, 0.3, True) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(s(mha_probs_dropout), s(mha_probs_dropout_hybrid)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_seed_changes_output():
    q, k, v = _qkv(3)
    o1 = mha_probs_dropout(q, k, v, jnp.int32(1), SCALE, 0.3, True)
    o2 = mha_probs_dropout(q, k, v, jnp.int32(2), SCALE, 0.3, True)
    assert not np.allclose(o1, o2)


@pytest.mark.parametrize("impl", ["pallas", "hybrid"])
def test_encoder_apply_drop0_matches_xla(impl):
    """Integration: with drop=0 the train-time fused-attention encoder
    must equal the XLA schedule exactly (rng path and residual/LN/FFN
    math untouched; only the attention schedule differs)."""
    D, HID = 32, 24
    p = xf.encoder_init(jax.random.PRNGKey(0), D, HID, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 300, D), jnp.float32)
    rng = jax.random.PRNGKey(2)
    ref = xf.encoder_apply(p, x, n_heads=6, drop=0.0, train=True, rng=rng)
    out = xf.encoder_apply(p, x, n_heads=6, drop=0.0, train=True, rng=rng,
                           attn_train_impl=impl, pallas_interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
