"""Pallas fused region-attention kernel: numerical parity with the jnp
reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.ops.attention import region_attention
from grounded_video_description_tpu.ops.pallas.region_attention import (
    fused_region_attention)


def test_fused_region_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, R, H, D = 3, 40, 32, 64      # unaligned R exercises padding
    p_pool = jnp.asarray(rng.randn(B, R, H), jnp.float32)
    att_h = jnp.asarray(rng.randn(B, H), jnp.float32)
    pool = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    alpha_w = jnp.asarray(rng.randn(H, 1) * 0.1, jnp.float32)
    alpha_b = jnp.asarray([0.05], jnp.float32)
    att_mask = jnp.asarray(rng.rand(B, R) < 0.2)
    pnt_mask = att_mask | jnp.asarray(rng.rand(B, R) < 0.2)

    att_res, grd = fused_region_attention(
        p_pool, att_h, pool, alpha_w, alpha_b, att_mask, pnt_mask,
        interpret=True)

    params = {"h2att": {"w": jnp.eye(H), "b": jnp.zeros(H)},
              "alpha_net": {"w": alpha_w, "b": alpha_b}}
    ref_res, ref_grd, _ = region_attention(
        params, att_h, pool, p_pool, att_mask, pnt_mask, mode="add")

    assert np.allclose(np.array(att_res), np.array(ref_res), atol=1e-5)
    assert np.allclose(np.array(grd), np.array(ref_grd), atol=1e-3)


def test_fused_handles_fully_masked_row_padding():
    # all real ROIs masked: softmax sees only MIN_VALUE scores; the
    # result must still be finite (uniform over masked entries)
    B, R, H, D = 1, 8, 16, 16
    p_pool = jnp.zeros((B, R, H))
    att_h = jnp.zeros((B, H))
    pool = jnp.ones((B, R, D))
    alpha_w = jnp.ones((H, 1))
    alpha_b = jnp.zeros((1,))
    mask = jnp.ones((B, R), bool)
    att_res, grd = fused_region_attention(
        p_pool, att_h, pool, alpha_w, alpha_b, mask, mask, interpret=True)
    assert np.all(np.isfinite(np.array(att_res)))
    assert np.all(np.array(grd) <= -1e7)
