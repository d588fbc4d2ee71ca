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


def test_birnn_recurrence_matches_scan():
    """Fused BiRNN recurrence kernel (ops/pallas/birnn.py) vs the
    lax.scan path, both modes, interpret mode on CPU.  The kernel is
    the inference path of the temporal context encoder
    (model.py:145-156); training always uses the scan (no VJP)."""
    from grounded_video_description_tpu.nn import birnn_init
    from grounded_video_description_tpu.nn.core import _scan_bidir
    from grounded_video_description_tpu.ops.pallas.birnn import (
        birnn_recurrence)

    for mode in ("bigru", "bilstm"):
        B, T, H, D = 4, 12, 16, 24
        p = birnn_init(jax.random.PRNGKey(0), D, H, 1, mode)["layers"][0]
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, D),
                               jnp.float32)
        ref = _scan_bidir(mode, p, xs, H)

        fwd, bwd = p["fwd"], p["bwd"]
        wi = jnp.stack([fwd["wi"], bwd["wi"]])
        wh = jnp.stack([fwd["wh"], bwd["wh"]])
        if mode == "bigru":
            bi = jnp.stack([fwd["bi"], bwd["bi"]])
            bh = jnp.stack([fwd["bh"], bwd["bh"]])
        else:
            bi = jnp.stack([fwd["b"], bwd["b"]])
            bh = None
        gi = jnp.einsum("btd,kdg->tkbg", xs, wi) + bi[None, :, None, :]
        gi = gi.at[:, 1].set(gi[::-1, 1])
        ys = birnn_recurrence(gi, wh, bh, mode=mode, hidden=H,
                              interpret=True)
        out = jnp.swapaxes(
            jnp.concatenate([ys[:, 0], ys[::-1, 1]], axis=-1), 0, 1)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   atol=1e-5, err_msg=mode)


def test_birnn_via_flag_matches_scan():
    """`birnn(..., use_pallas=True)` (interpret via CPU fallback is
    not available — exercise the flag path off-TPU by asserting it
    falls back to identical scan results when train=True)."""
    from grounded_video_description_tpu.nn import birnn, birnn_init

    p = {"layers": birnn_init(jax.random.PRNGKey(2), 12, 8, 1,
                              "bigru")["layers"]}
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 12), jnp.float32)
    a = birnn(p, xs, mode="bigru", hidden=8)
    b = birnn(p, xs, mode="bigru", hidden=8, train=True, use_pallas=True)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_flash_self_attention_matches_einsum():
    """ops/pallas/mha.py vs the plain softmax(qk^T)v einsum,
    unaligned R (padding masked), interpret mode on CPU."""
    from grounded_video_description_tpu.ops.pallas.mha import (
        flash_self_attention)

    N, R, d = 5, 37, 19
    q = jax.random.normal(jax.random.PRNGKey(0), (N, R, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (N, R, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (N, R, d), jnp.float32)
    ref = jnp.einsum(
        "nqk,nkd->nqd",
        jax.nn.softmax(jnp.einsum("nqd,nkd->nqk", q, k), axis=-1), v)
    out = flash_self_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5)


def test_mha_pallas_path_matches_einsum_schedule(monkeypatch):
    """_mha(use_pallas=True) must reproduce the head-sequential
    einsum schedule on the long-KV branch (obj_interact shape class,
    T > 256)."""
    import grounded_video_description_tpu.models.transformer as xf
    import grounded_video_description_tpu.ops.pallas.mha as M

    orig = M.flash_self_attention
    monkeypatch.setattr(
        M, "flash_self_attention",
        lambda q, k, v: orig(q, k, v, interpret=True))

    B, T, D, h = 2, 300, 48, 6
    p = xf._mha_init(jax.random.PRNGKey(3), D)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, D), jnp.float32)
    a = xf._mha(p, x, x, x, n_heads=h, causal=False, drop=0.0,
                train=False, rng=None)
    b = xf._mha(p, x, x, x, n_heads=h, causal=False, drop=0.0,
                train=False, rng=None, use_pallas=True)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)


def test_fused_encoder_layer_matches_xla_path():
    """Fused encoder-layer kernel vs transformer.encoder_apply at
    inference: f32, unaligned B and R (padding masked + sliced),
    interpret mode on CPU."""
    from grounded_video_description_tpu.models import transformer as xf
    from grounded_video_description_tpu.ops.pallas.encoder_layer import (
        encoder_apply_fused)

    D, HEADS, HID, LAYERS = 64, 6, 32, 2        # uneven heads: 11x5+9
    B, R = 5, 150                                # unaligned on purpose
    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, LAYERS)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D), jnp.float32)

    ref = xf.encoder_apply(params, x, n_heads=HEADS, drop=0.0,
                           train=False)
    got = encoder_apply_fused(params, x, n_heads=HEADS, bt=2,
                              interpret=True)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_fused_encoder_layer_bf16_tolerance():
    """bf16 run stays within ~1 bf16 ulp of the XLA path (the kernel's
    f32 softmax/LN statistics are the more precise side)."""
    from grounded_video_description_tpu.models import transformer as xf
    from grounded_video_description_tpu.ops.pallas.encoder_layer import (
        encoder_apply_fused)

    D, HEADS, HID = 64, 6, 32
    B, R = 4, 128
    params = xf.encoder_init(jax.random.PRNGKey(0), D, HID, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D),
                          jnp.bfloat16)
    ref = xf.encoder_apply(params, x, n_heads=HEADS, drop=0.0,
                           train=False)[-1]
    got = encoder_apply_fused(params, x, n_heads=HEADS, bt=4,
                              interpret=True)[-1]
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
    assert float(diff.max()) < 0.1, float(diff.max())
