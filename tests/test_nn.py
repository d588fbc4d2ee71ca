"""Mini-NN library unit tests: recurrent cells, bidirectional fusion,
normalization semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.nn import (
    batch_norm, batch_norm_init, birnn, birnn_init, layer_norm,
    layer_norm_affine, layer_norm_params_init, lstm_cell, lstm_cell_init)
from grounded_video_description_tpu.nn.core import (
    _gru_cell, _gru_cell_init, _scan_bidir, _scan_dir)


def test_bidir_fused_scan_matches_two_pass():
    key = jax.random.PRNGKey(0)
    B, T, D, H = 3, 11, 8, 6
    for mode in ("bigru", "bilstm"):
        p = birnn_init(key, D, H, 1, mode)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
        lp = p["layers"][0]
        cell = _gru_cell if mode == "bigru" else lstm_cell
        fwd = _scan_dir(cell, lp["fwd"], x, H, reverse=False)
        bwd = _scan_dir(cell, lp["bwd"], x, H, reverse=True)
        want = jnp.concatenate([fwd, bwd], axis=-1)
        got = _scan_bidir(mode, lp, x, H)
        assert np.allclose(np.array(got), np.array(want), atol=1e-5), mode


def test_birnn_two_layer_shapes():
    key = jax.random.PRNGKey(0)
    p = birnn_init(key, 8, 6, 2, "bigru")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 8))
    out = birnn(p, x, mode="bigru", hidden=6)
    assert out.shape == (2, 7, 12)


def test_birnn_schedule_is_equivalence_preserving():
    """unroll/remat on the BiRNN scan are pure scheduling knobs: values
    AND gradients must match the plain schedule exactly (same trade the
    decode scan landed, docs/DESIGN.md §Decode-scan training bucket)."""
    key = jax.random.PRNGKey(0)
    B, T, D, H = 2, 13, 8, 6
    for mode in ("bigru", "bilstm"):
        p = birnn_init(key, D, H, 2, mode)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def vg(p_, x_, unroll, remat):
            def loss(p__, x__):
                out = birnn(p__, x__, mode=mode, hidden=H,
                            unroll=unroll, remat=remat)
                return jnp.sum(out ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1))(p_, x_)

        ref_v, ref_g = vg(p, x, 1, False)
        for unroll, remat in ((4, False), (1, True), (4, True)):
            v, g = vg(p, x, unroll, remat)
            assert np.allclose(float(v), float(ref_v), rtol=1e-6), mode
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
                np.testing.assert_allclose(np.array(a), np.array(b),
                                           rtol=1e-5, atol=1e-6)


def test_lstm_cell_gates():
    key = jax.random.PRNGKey(0)
    p = lstm_cell_init(key, 4, 3)
    x = jnp.ones((2, 4))
    h = jnp.zeros((2, 3))
    out, (h2, c2) = lstm_cell(p, x, (h, h))
    assert out.shape == (2, 3)
    assert np.allclose(np.array(out), np.array(h2))
    assert np.all(np.abs(np.array(c2)) < 1.0 + 1e-6)


def test_layer_norm_parameter_free():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16) * 5 + 3,
                    jnp.float32)
    y = np.array(layer_norm(x))
    assert np.allclose(y.mean(-1), 0, atol=1e-5)
    assert np.allclose(y.std(-1), 1, atol=1e-3)


def test_layer_norm_affine_std_variant():
    # (std + eps) with the unbiased std, transformer.py:66-77
    p = layer_norm_params_init(8)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8), jnp.float32)
    y = np.array(layer_norm_affine(p, x, eps=1e-6, use_std=True))
    xn = np.array(x)
    want = (xn - xn.mean(-1, keepdims=True)) / (
        xn.std(-1, ddof=1, keepdims=True) + 1e-6)
    assert np.allclose(y, want, atol=1e-5)


def test_batch_norm_train_vs_eval():
    p, s = batch_norm_init(4)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 10, 4) * 2 + 1,
                    jnp.float32)
    y, s2 = batch_norm(p, s, x, train=True)
    assert np.allclose(np.array(y).mean((0, 1)), 0, atol=1e-4)
    assert float(s2["count"]) == 1
    # eval mode uses running stats (mostly init -> different output)
    y_eval, s3 = batch_norm(p, s2, x, train=False)
    assert s3 is s2
    assert not np.allclose(np.array(y), np.array(y_eval))
