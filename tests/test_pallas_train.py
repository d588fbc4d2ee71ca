"""Parity tests for the TRAINING fused encoder-layer kernel.

Strategy: the kernel's dropout masks come from a counter-hash
(encoder_layer_train.uniform_hash) implemented in plain jnp, so a
pure-JAX oracle below reproduces the kernel's math — including the
exact masks — outside Pallas.  That makes the hand-written backward
directly checkable against jax.grad of the oracle (no finite
differences, no statistical slack):

  * forward parity (interpret mode) vs the oracle, dropout ON;
  * full gradient parity (x + every packed param) vs jax.grad of the
    oracle, dropout ON, through batch/ROI padding;
  * drop=0 forward parity vs models/transformer.encoder_apply (ties
    the kernel math to the framework path the rest of the suite pins
    to the executing reference);
  * mask determinism + uniformity of the hash.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grounded_video_description_tpu.models import transformer as xf
from grounded_video_description_tpu.ops.pallas.encoder_layer import (
    MIN_VALUE, pack_layer_params)
from grounded_video_description_tpu.ops.pallas.encoder_layer_train import (
    _SITE_PROBS, _SITE_RESID1, _SITE_RESID2, _dropped,
    encoder_apply_fused_train, fused_encoder_layer_train, uniform_hash)

B, R, D, HEADS, HID = 3, 200, 32, 6, 24
SEED = jnp.int32(-1234567)


def _params(key=0):
    p = xf.encoder_init(jax.random.PRNGKey(key), D, HID, 1)
    return p["layers"][0]


def _x(key=1):
    return jax.random.normal(jax.random.PRNGKey(key), (B, R, D),
                             jnp.float32)


def oracle_layer(x, packed, seed, *, drop, n_heads):
    """Pure-JAX mirror of the kernel (same masks, same op order)."""
    wq, wk, wv, wo, w1, b1, w2, b2, g1, be1, g2, be2 = packed
    Bn, Rr, Dd = x.shape
    Rp = -(-Rr // 128) * 128
    xp = jnp.pad(x, [(0, 0), (0, Rp - Rr), (0, 0)])
    hdp = wq.shape[-1]
    dp = hdp // n_heads
    inv = np.float32(1.0 / math.sqrt(Dd))
    keepers = []
    for b in range(Bn):
        gb = np.uint32(b)
        xb = xp[b]
        q, k, v = xb @ wq, xb @ wk, xb @ wv
        os_ = []
        for h in range(n_heads):
            sl = slice(h * dp, (h + 1) * dp)
            s = (q[:, sl] @ k[:, sl].T) * inv
            cid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cid >= Rr, MIN_VALUE, s)
            p = jax.nn.softmax(s, axis=1)
            if drop > 0.0:
                u = uniform_hash((Rp, Rp), seed,
                                 _SITE_PROBS + gb * np.uint32(8)
                                 + np.uint32(h))
                p = _dropped(p, u, drop)
            os_.append(p @ v[:, sl])
        acc = jnp.concatenate(os_, axis=1) @ wo
        if drop > 0.0:
            u = uniform_hash((Rp, Dd), seed, _SITE_RESID1 + gb)
            acc = _dropped(acc, u, drop)
        x1 = _ln(xb + acc, g1[0], be1[0])
        f = jnp.maximum(x1 @ w1 + b1[0], 0.0) @ w2 + b2[0]
        if drop > 0.0:
            u = uniform_hash((Rp, Dd), seed, _SITE_RESID2 + gb)
            f = _dropped(f, u, drop)
        keepers.append(_ln(x1 + f, g2[0], be2[0])[:Rr])
    return jnp.stack(keepers)


def _ln(y, gamma, beta, eps=1e-6):
    n = y.shape[-1]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True) * (n / (n - 1))
    return gamma * (y - mean) / (jnp.sqrt(var) + eps) + beta


def _fused(x, packed, *, drop):
    return fused_encoder_layer_train(x, packed, SEED, drop, HEADS,
                                     2, 1, True)


def test_uniform_hash_deterministic_and_uniform():
    u1 = uniform_hash((256, 256), SEED, np.uint32(7))
    u2 = uniform_hash((256, 256), SEED, np.uint32(7))
    u3 = uniform_hash((256, 256), SEED, np.uint32(8))
    assert (np.asarray(u1) == np.asarray(u2)).all()
    assert not (np.asarray(u1) == np.asarray(u3)).all()
    assert abs(float(u1.mean()) - 0.5) < 0.01
    assert float(u1.min()) >= 0.0 and float(u1.max()) < 1.0
    # drop-rate statistics at the dropout call site
    assert abs(float((u1 < 0.2).mean()) - 0.2) < 0.01


@pytest.mark.parametrize("drop", [0.0, 0.3])
def test_forward_matches_oracle(drop):
    packed = pack_layer_params(_params(), HEADS, jnp.float32)
    got = jax.jit(lambda x: _fused(x, packed, drop=drop))(_x())
    want = oracle_layer(_x(), packed, SEED, drop=drop, n_heads=HEADS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_drop0_matches_framework_encoder():
    lp = _params()
    x = _x()
    got = encoder_apply_fused_train({"layers": [lp]}, x, n_heads=HEADS,
                                    drop=0.0, rng=jax.random.PRNGKey(3),
                                    bt_fwd=2, bt_bwd=1, interpret=True)[-1]
    want = xf.encoder_apply({"layers": [lp]}, x, n_heads=HEADS,
                            drop=0.0, train=True, rng=None)[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("drop", [0.0, 0.3])
def test_gradients_match_oracle(drop):
    packed = pack_layer_params(_params(), HEADS, jnp.float32)
    x = _x()
    w = jax.random.normal(jax.random.PRNGKey(4), (B, R, D), jnp.float32)

    def loss_kernel(x, packed):
        return jnp.sum(_fused(x, packed, drop=drop) * w)

    def loss_oracle(x, packed):
        return jnp.sum(oracle_layer(x, packed, SEED, drop=drop,
                                    n_heads=HEADS) * w)

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1)))(x, packed)
    go = jax.jit(jax.grad(loss_oracle, argnums=(0, 1)))(x, packed)
    names = ["x"] + ["wq", "wk", "wv", "wo", "w1", "b1", "w2", "b2",
                     "g1", "be1", "g2", "be2"]
    flat_k = [gk[0]] + list(gk[1])
    flat_o = [go[0]] + list(go[1])
    for name, a, b in zip(names, flat_k, flat_o):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=5e-4, atol=5e-5, err_msg=f"grad mismatch: {name}")


def test_seed_changes_masks_and_layers_differ():
    lp = _params()
    x = _x()
    p2 = {"layers": [lp, lp]}
    outs = encoder_apply_fused_train(p2, x, n_heads=HEADS, drop=0.5,
                                     rng=jax.random.PRNGKey(5),
                                     bt_fwd=2, bt_bwd=1, interpret=True)
    # two identical-parameter layers see different dropout seeds: the
    # second layer's transform of its input differs from the first's
    relay = encoder_apply_fused_train(
        p2, outs[0], n_heads=HEADS, drop=0.5,
        rng=jax.random.PRNGKey(5), bt_fwd=2, bt_bwd=1,
        interpret=True)[0]
    assert not np.allclose(np.asarray(relay), np.asarray(outs[1]))
