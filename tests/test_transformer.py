"""Masked-Transformer captioner family + obj_interact encoder tests."""

import jax
import numpy as np
import pytest

from helpers import setup, batch_for


def test_transformer_captioner_mle():
    cfg, model, variables, fns = setup(att_model="transformer")
    batch = batch_for(cfg)
    losses, _ = fns["mle_eval"](variables, batch)
    lm = float(losses["lm_loss"])
    assert np.isfinite(lm) and lm > 0
    # aux losses are zero for this family (no box supervision)
    assert float(losses["att2_loss"]) == 0.0
    assert float(losses["cls_loss"]) == 0.0
    # near log-vocab at init
    assert abs(lm - np.log(cfg.vocab_size)) < 1.6


def test_transformer_greedy_matches_teacher_forcing_consistency():
    cfg, model, variables, fns = setup(att_model="transformer")
    batch = batch_for(cfg)
    seq, lp, att2, sim = fns["greedy"](variables, batch)
    B = batch["ppls"].shape[0]
    assert seq.shape == (B, cfg.seq_length)
    assert np.all(np.array(seq) >= 0)
    assert np.all(np.array(seq) < cfg.vocab_size)
    # deterministic
    seq2 = fns["greedy"](variables, batch)[0]
    assert np.array_equal(np.array(seq), np.array(seq2))


def test_transformer_greedy_incremental_equals_parallel():
    """The scan-based incremental decode must agree with a
    teacher-forced parallel pass over its own prediction."""
    from grounded_video_description_tpu.models import transformer as xf
    from grounded_video_description_tpu.nn import linear
    import jax.numpy as jnp
    from functools import partial

    cfg, model, variables, fns = setup(att_model="transformer")
    batch = batch_for(cfg, B=1)
    p = variables["params"]
    enc, _ = jax.jit(partial(model.encode, train=False))(
        p, variables["state"], batch)
    encodings = model._transformer_encodings(
        p, enc["conv_feats"], enc["pool_feats"])

    T = 6
    pred = jax.jit(lambda pp, ee: xf.decoder_greedy(pp, ee, T, n_heads=6))(
        p["cap_model"], encodings)

    # teacher-force the predicted prefix; logits at position t must
    # re-produce prediction[t]
    tokens = jnp.concatenate(
        [jnp.zeros((1, 1), jnp.int32), pred[:, :-1]], axis=1)
    out = xf.decoder_apply(p["cap_model"], tokens, encodings,
                           n_heads=6, drop=0.0, train=False)
    logits = linear(p["cap_model"]["out"], out)
    re_pred = np.argmax(np.array(logits), axis=-1)
    assert np.array_equal(re_pred[0], np.array(pred)[0]), (
        re_pred[0], np.array(pred)[0])


def test_probs_remat_policy_is_equivalence_preserving():
    """save_anything_except_these_names("attn_probs") over the encoder
    is a pure scheduling knob: recomputing the tagged score/prob/mask
    tensors in the backward (same rng replay) computes the same math as
    the stored schedule — the contract behind
    cfg.obj_interact_probs_remat (models/gvd.py).

    Verified in float64: in f32 the two schedules fuse differently and
    XLA's reduction reassociation shows up at ~3% relative on heavily
    cancelling gradient leaves (values still agree exactly); at f64 the
    same reassociation noise is ~1e-12, which separates 'same math,
    different rounding' from a real semantic difference."""
    import jax.numpy as jnp
    from grounded_video_description_tpu.models import transformer as xf

    with jax.enable_x64():
        key = jax.random.PRNGKey(0)
        B, R, D = 2, 300, 24   # R > 256 -> the head-sequential branch
        p = xf.encoder_init(key, D, D * 2, 2)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, R, D))
        drop_rng = jax.random.PRNGKey(2)

        def loss(p_, x_, policy):
            def body(xx):
                return xf.encoder_apply(p_, xx, n_heads=6, drop=0.2,
                                        train=True, rng=drop_rng)[-1]
            if policy is not None:
                body = jax.checkpoint(body, policy=policy)
            return jnp.sum(body(x_) ** 2)

        pol = jax.checkpoint_policies.save_anything_except_these_names(
            "attn_probs")
        # long-KV (head-sequential) and short-KV (packed) branches
        for xi in (x, x[:, :64]):
            ref_v, ref_g = jax.jit(
                jax.value_and_grad(loss, argnums=(0, 1)),
                static_argnums=2)(p, xi, None)
            v, g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)),
                           static_argnums=2)(p, xi, pol)
            assert float(v) == float(ref_v)
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
                np.testing.assert_allclose(np.array(a), np.array(b),
                                           rtol=1e-9, atol=1e-12)


def test_obj_interact_changes_pool_feats():
    cfg_a, model_a, var_a, fns_a = setup(obj_interact=True)
    batch = batch_for(cfg_a)
    losses, _ = fns_a["mle_eval"](var_a, batch)
    assert np.isfinite(float(losses["lm_loss"]))
    assert "obj_interact" in var_a["params"]
