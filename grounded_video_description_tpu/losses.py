"""Training criteria.

Behavioral contracts:
  * masked language-model NLL + attention + grounding losses —
    misc/utils.py:117-152 (`LMCriterion`)
  * region-classification BCE — misc/model.py:345-350
  * loss weighting / normalization — main.py:238-255

All means are over *selected* elements (masked mean), matching the
reference's masked_select().mean() exactly — which makes the fixed
20-step scan equivalent to the reference's early-exit loop: positions
past the end of every caption contribute mask=0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask.astype(bool), x, 0.0)) / denom


def lm_criterion_with_counts(
        decoded: jnp.ndarray, att2_weights: jnp.ndarray,
        ground_weights: jnp.ndarray, target: jnp.ndarray,
        att2_target: jnp.ndarray):
    """LM + attention + grounding losses, plus their mask counts.

    The counts let an explicit-SPMD step turn per-shard means into the
    exact global masked mean (sum_d mean_d * count_d / sum_d count_d)
    when shards carry different numbers of selected elements.

    decoded:        (B, S, V) log-probabilities.
    att2_weights:   (B, S, R) masked region-attention logits.
    ground_weights: (B, S, R) masked grounding logits.
    target:         (B, S) int token targets (0 == pad/end).
    att2_target:    (B, S, R) {0,1} ROI supervision labels.
    Returns (lm, att2, grd, txt_count, roi_count).
    """
    decoded = decoded.astype(jnp.float32)
    att2_weights = att2_weights.astype(jnp.float32)
    ground_weights = ground_weights.astype(jnp.float32)
    B, S, V = decoded.shape
    # include the position of the END token: mask = [1, target[:-1] > 0]
    tgt_pos = target > 0
    txt_mask = jnp.concatenate(
        [jnp.ones((B, 1), bool), tgt_pos[:, :-1]], axis=1)

    nll = -jnp.take_along_axis(decoded, target[..., None], axis=2)[..., 0]
    lm_loss = _masked_mean(nll, txt_mask)

    roi_mask = att2_target > 0
    att2_logp = jax.nn.log_softmax(att2_weights, axis=2)
    att2_loss = -_masked_mean(att2_logp, roi_mask)

    grd_logp = jax.nn.log_softmax(ground_weights, axis=2)
    ground_loss = -_masked_mean(grd_logp, roi_mask)

    txt_count = jnp.sum(txt_mask).astype(jnp.float32)
    roi_count = jnp.sum(roi_mask).astype(jnp.float32)
    return lm_loss, att2_loss, ground_loss, txt_count, roi_count


def lm_criterion(decoded: jnp.ndarray, att2_weights: jnp.ndarray,
                 ground_weights: jnp.ndarray, target: jnp.ndarray,
                 att2_target: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LM + attention + grounding losses (see lm_criterion_with_counts)."""
    lm, att2, grd, _, _ = lm_criterion_with_counts(
        decoded, att2_weights, ground_weights, target, att2_target)
    return lm, att2, grd


def cls_criterion(sim_mat_static: jnp.ndarray, sim_target: jnp.ndarray
                  ) -> jnp.ndarray:
    """Region-classification BCE (model.py:345-350).

    sim_mat_static: (B, C+1, R) — class-softmaxed region-class
                    similarity (softmax over the class axis).
    sim_target:     (B, K, R) int — GT class per (box, ROI) where
                    IoU > 0.5, else 0.
    The loss is BCE(prob_of_true_class, 1) over positions with a
    non-zero target, i.e. -mean log p[target].
    """
    cls, _ = cls_criterion_with_counts(sim_mat_static, sim_target)
    return cls


def cls_criterion_with_counts(sim_mat_static: jnp.ndarray,
                              sim_target: jnp.ndarray):
    """cls BCE plus its mask count (see lm_criterion_with_counts)."""
    gathered = jnp.take_along_axis(
        sim_mat_static, sim_target.astype(jnp.int32), axis=1)  # (B, K, R)
    mask = sim_target > 0
    # torch F.binary_cross_entropy clamps the log term at -100 (so a
    # zero probability contributes exactly 100, not inf) — matched here
    # for differential parity with model.py:348.  The zero-probability
    # case needs a where-guard, NOT an epsilon floor: the TPU flushes
    # denormals to zero, so max(p, 1e-45) is a no-op on-chip (1e-45 is
    # itself a denormal), log(0) = -inf, and the minimum-clip's zero
    # upstream cotangent multiplies log's 1/0 = inf into NaN — which
    # the optimizer then writes into every sim-path parameter.  Found
    # by the round-5 integrated rehearsal (tools/rehearsal.py): class
    # softmax over an 87+ logit spread underflows to exact zero at the
    # gathered target, CPU keeps the denormal guard alive, the chip
    # does not (tests/test_losses.py::test_cls_criterion_zero_prob).
    zero = gathered <= 0.0
    safe = jnp.where(zero, 1.0, gathered)
    bce = jnp.where(zero, 100.0, jnp.minimum(-jnp.log(safe), 100.0))
    return _masked_mean(bce, mask), jnp.sum(mask).astype(jnp.float32)


def total_loss(lm, att2, grd, cls, *, w_att2: float, w_grd: float,
               w_cls: float, disable_caption: bool = False) -> jnp.ndarray:
    """Weighted sum (main.py:238-255)."""
    loss = jnp.zeros(())
    if not disable_caption:
        loss = loss + lm
    if w_att2:
        loss = loss + w_att2 * att2
    if w_grd:
        loss = loss + w_grd * grd
    if w_cls:
        loss = loss + w_cls * cls
    return loss
