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


def test_quantized_greedy_mostly_agrees():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg, B=2, seed=3)
    seq_full = np.array(fns["greedy"](variables, batch)[0])

    cfg_q, model_q, variables_q, fns_q = setup(quantize_banks=True)
    # same init seed -> same params
    seq_q = np.array(fns_q["greedy"](variables_q, batch)[0])
    agree = (seq_full == seq_q).mean()
    assert agree > 0.8, (agree, seq_full, seq_q)
