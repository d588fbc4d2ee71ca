"""Masking-semantics tests for the grounding-critical interactions
(SURVEY §7 'hard parts'): dual-mask ordering in region attention,
per-step frame-mask-on-proposals construction, grounder bias
composition (classifier bias + att2 logits), and loss masking."""

import jax
import jax.numpy as jnp
import numpy as np

from grounded_video_description_tpu.losses import lm_criterion
from grounded_video_description_tpu.ops.attention import (
    MIN_VALUE, grounder, region_attention)


def _attn_params(H):
    return {"h2att": {"w": jnp.eye(H), "b": jnp.zeros(H)},
            "alpha_net": {"w": jnp.ones((H, 1)), "b": jnp.zeros(1)}}


def test_region_attention_dual_mask_ordering():
    """The softmax must see only att_mask; the returned grounding
    logits carry BOTH masks (AttModel.py:98-106)."""
    B, R, H = 1, 4, 2
    p = _attn_params(H)
    h = jnp.zeros((B, H))
    pool = jnp.eye(4)[None, :, :2].astype(jnp.float32) * 0.0 + \
        jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    p_pool = jnp.asarray(
        [[[0.5, 0.5], [1.0, 1.0], [0.1, 0.1], [2.0, 2.0]]])
    att_mask = jnp.asarray([[False, False, True, False]])
    pnt_mask = jnp.asarray([[False, True, True, False]])

    att_res, grd_logits, _ = region_attention(
        p, h, pool, p_pool, att_mask, pnt_mask, mode="add")
    g = np.array(grd_logits)[0]
    # grd logits masked where EITHER mask is on
    assert g[1] <= MIN_VALUE and g[2] <= MIN_VALUE
    assert g[0] > MIN_VALUE and g[3] > MIN_VALUE

    # attention weights: roi2 excluded (att_mask) but roi1 INCLUDED
    scores = np.tanh(np.array(p_pool)[0]).sum(1)  # alpha = sum(tanh)
    scores[2] = MIN_VALUE
    w = np.exp(scores - scores.max())
    w /= w.sum()
    want = (w[:, None] * np.array(pool)[0]).sum(0)
    assert np.allclose(np.array(att_res)[0], want, atol=1e-5)
    assert w[1] > 1e-3  # pnt-masked ROI still attended for features


def test_grounder_bias_composition():
    """ground_weights = dot(vis_word, region) + cls_bias + att2_logits,
    masked (model.py:472-480)."""
    B, S, R, E = 1, 2, 3, 4
    xt = jnp.ones((B, S, E))
    feats = jnp.arange(B * R * E, dtype=jnp.float32).reshape(B, R, E)
    base = np.einsum("bse,bre->bsr", np.array(xt), np.array(feats))
    bias = jnp.asarray(np.full((B, S, R), 0.25, np.float32))
    mask = jnp.asarray([[False, True, False]])
    out = np.array(grounder(xt, feats, mask, bias))
    assert np.allclose(out[0, :, 0], base[0, :, 0] + 0.25)
    assert np.all(out[0, :, 1] <= MIN_VALUE)


def test_frm_mask_on_prop_construction():
    """A proposal is masked at step t unless SOME active GT box at t
    shares its frame (model.py:436-440), then OR'd with pnt_mask."""
    from helpers import setup, batch_for

    cfg, model, variables, fns = setup()
    B, R, K = 1, cfg.max_proposal, cfg.max_gt_box
    Lq = cfg.seq_length

    batch = batch_for(cfg, B=1, seed=9)
    # craft: box 0 on frame 0, box 1 on frame 1; word at step 0 is
    # box 0's (mask_boxes[...,1]=0 for box 0 only)
    ppls = np.zeros((1, R, 7), np.float32)
    ppls[0, :, :4] = [10, 10, 50, 50]
    ppls[0, :, 4] = np.arange(R) % cfg.num_sampled_frm
    gt = np.zeros((1, K, 6), np.float32)
    gt[0, 0] = [10, 10, 50, 50, 0, 1]
    gt[0, 1] = [10, 10, 50, 50, 1, 2]
    frm_mask = np.ones((1, R, K), bool)
    frm_mask[0, :, 0] = ppls[0, :, 4] != 0
    frm_mask[0, :, 1] = ppls[0, :, 4] != 1
    mask_boxes = np.ones((1, cfg.seq_per_img, K, Lq + 1), bool)
    mask_boxes[0, :, 0, 1] = False   # box 0 active at step 0
    mask_boxes[0, :, 1, 2] = False   # box 1 active at step 1

    batch = dict(batch)
    batch["ppls"] = jnp.asarray(ppls)
    batch["gt_boxes"] = jnp.asarray(gt)
    batch["frm_mask"] = jnp.asarray(frm_mask)
    batch["mask_boxes"] = jnp.asarray(mask_boxes)
    batch["pnt_mask"] = jnp.zeros((1, R + 1), bool)

    out = fns["mle_train"](variables, batch, rng=jax.random.PRNGKey(0))
    # indirect check via roi supervision: recompute the step mask the
    # way forward() does and check frame gating
    bm0 = jnp.asarray(mask_boxes)[:, 0, :, 1:]
    bm0 = jnp.moveaxis(bm0, 2, 0)
    keep = ~(bm0[:, :, None, :] | jnp.asarray(frm_mask)[None])
    no_frame = np.array(jnp.sum(keep, axis=3) <= 0)   # (L, B, R)
    # step 0: only frame-0 proposals unmasked
    frame0 = ppls[0, :, 4] == 0
    assert np.array_equal(~no_frame[0, 0], frame0)
    # step 1: only frame-1 proposals unmasked
    frame1 = ppls[0, :, 4] == 1
    assert np.array_equal(~no_frame[1, 0], frame1)
    # steps with no active box: everything masked
    assert np.all(no_frame[2, 0])


def test_lm_criterion_counts_end_token_position():
    """txt_mask = [1, target[:-1] > 0]: the first pad position after
    the caption (the END prediction) is counted (utils.py:126-127)."""
    B, S, V = 1, 4, 6
    logp = jnp.log(jnp.full((B, S, V), 1.0 / V))
    target = jnp.asarray([[2, 3, 0, 0]])
    att2_w = jnp.zeros((B, S, 3))
    att2_t = jnp.zeros((B, S, 3))
    lm, att2, grd = lm_criterion(logp, att2_w, att2_w, target, att2_t)
    # 3 counted positions (2 words + END), uniform -> log V
    assert np.isclose(float(lm), np.log(V), atol=1e-5)
    # no roi labels -> attention losses fall back to 0/denom-guard
    assert np.isfinite(float(att2))


def test_attention_loss_masked_mean():
    B, S, R = 1, 2, 4
    logits = jnp.asarray([[[2.0, 0.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0, 0.0]]])
    labels = jnp.zeros((B, S, R)).at[0, 0, 0].set(1.0)
    logp = jnp.zeros((B, S, 5))
    target = jnp.asarray([[1, 0]])
    lm, att2, grd = lm_criterion(logp, logits, logits, target, labels)
    want = -jax.nn.log_softmax(jnp.asarray([2.0, 0, 0, 0]))[0]
    assert np.isclose(float(att2), float(want), atol=1e-5)
    assert np.isclose(float(grd), float(want), atol=1e-5)
