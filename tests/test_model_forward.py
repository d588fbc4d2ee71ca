"""End-to-end model forward/sample smoke + semantics tests on the tiny
config, CPU. Covers: MLE losses finite and well-shaped, GRD outputs,
greedy decode shapes + UNK suppression, determinism in eval mode,
attention-mode and transfer-mode variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import setup, batch_for


def test_mle_forward_losses_finite():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg)
    losses, _ = fns["mle_train"](variables, batch,
                                 rng=jax.random.PRNGKey(1))
    for k in ("lm_loss", "att2_loss", "ground_loss", "cls_loss"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["lm_loss"]) > 0
    # lm loss should be near log(vocab) at init
    assert abs(float(losses["lm_loss"]) - np.log(cfg.vocab_size)) < 1.5


def test_mle_forward_eval_deterministic():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg)
    out1, _ = fns["mle_eval"](variables, batch)
    out2, _ = fns["mle_eval"](variables, batch)
    for k in out1:
        assert np.allclose(np.array(out1[k]), np.array(out2[k]))


def test_grd_mode_outputs():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg)
    out = fns["grd"](variables, batch)
    B = batch["ppls"].shape[0]
    R = cfg.max_proposal
    assert out["sim_target"].shape == (B, cfg.max_gt_box, R)
    assert out["pred_cls"].shape == (B, R)
    assert out["att2_ind"].shape == (B, cfg.seq_length, cfg.num_sampled_frm)
    assert out["grd_ind"].shape == (B, cfg.seq_length, cfg.num_sampled_frm)
    assert int(jnp.max(out["att2_ind"])) < cfg.num_prop_per_frm


def test_greedy_sample_shapes_and_unk_suppression():
    cfg, model, variables, fns = setup()
    batch = batch_for(cfg)
    seq, lp, att2_w, sim = fns["greedy"](variables, batch)
    B = batch["ppls"].shape[0]
    assert seq.shape == (B, cfg.seq_length)
    assert lp.shape == (B, cfg.seq_length)
    assert att2_w.shape == (B, cfg.seq_length, cfg.max_proposal)
    assert sim.shape == (B, cfg.detect_size + 1, cfg.max_proposal)
    unk = cfg.vocab_size - 1
    assert not np.any(np.array(seq) == unk), "UNK must be suppressed"
    # greedy must be deterministic
    seq2 = fns["greedy"](variables, batch)[0]
    assert np.array_equal(np.array(seq), np.array(seq2))


@pytest.mark.parametrize("overrides", [
    dict(att_input_mode="region", enable_BUTD=True),
    dict(region_attn_mode="dp"),
    dict(region_attn_mode="add"),
    dict(att_input_mode="dual_region"),
    dict(transfer_mode="none"),
    dict(seq_per_img=3),
])
def test_model_variants(overrides):
    cfg, model, variables, fns = setup(**overrides)
    batch = batch_for(cfg)
    losses, _ = fns["mle_eval"](variables, batch)
    assert np.isfinite(float(losses["lm_loss"]))
    if overrides.get("transfer_mode") == "none":
        assert "vis_classifiers_bias" not in variables["params"]
