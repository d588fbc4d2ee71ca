"""int8 attention-bank quantization: numerics + decode agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import setup, batch_for


def test_quantize_roundtrip_error():
    from grounded_video_description_tpu.ops.quantize import (
        dequantize, quantize_rows)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 10, 32) * 3, jnp.float32)
    q = quantize_rows(x)
    assert q.values.dtype == jnp.int8
    y = dequantize(q)
    rel = np.abs(np.array(y) - np.array(x)).max() / np.abs(
        np.array(x)).max()
    assert rel < 1.5 / 127


def test_group_quantize_roundtrip_and_outlier_isolation():
    """Per-(row, 128-col group) scales: exact dequant layout, and a
    single outlier column no longer degrades the whole row."""
    from grounded_video_description_tpu.ops.quantize import (
        dequantize, quantize_rows)

    rng = np.random.RandomState(1)
    x = rng.randn(3, 5, 1024).astype(np.float32)
    x[..., 7] *= 50.0      # outlier confined to group 0

    q_grp = quantize_rows(jnp.asarray(x), group_size=128)
    assert q_grp.scale.shape == (3, 5, 8)
    y_grp = np.array(dequantize(q_grp))
    # groups 1..7 keep their own small scales -> tight error there
    err_grp = np.abs(y_grp[..., 128:] - x[..., 128:]).max()
    assert err_grp < (np.abs(x[..., 128:]).max() / 127) * 1.01

    q_row = quantize_rows(jnp.asarray(x), group_size=None)
    assert q_row.scale.shape == (3, 5, 1)
    y_row = np.array(dequantize(q_row))
    err_row = np.abs(y_row[..., 128:] - x[..., 128:]).max()
    assert err_grp < err_row / 4   # outlier poisons the per-row scale

    # non-divisible width falls back to per-row
    q_fb = quantize_rows(jnp.asarray(x[..., :100]), group_size=128)
    assert q_fb.scale.shape == (3, 5, 1)


def test_quantized_greedy_mostly_agrees():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg, B=2, seed=3)
    seq_full = np.array(fns["greedy"](variables, batch)[0])

    cfg_q, model_q, variables_q, fns_q = setup(quantize_banks=True)
    # same init seed -> same params
    seq_q = np.array(fns_q["greedy"](variables_q, batch)[0])
    agree = (seq_full == seq_q).mean()
    assert agree > 0.8, (agree, seq_full, seq_q)
