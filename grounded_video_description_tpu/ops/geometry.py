"""Box geometry and target assignment, pure jnp.

Behavioral contract (semantics, not code) from the reference:
  * `bbox_overlaps_batch`  — misc/bbox_transform.py:176-273
  * `sim_mat_target`       — misc/utils.py:299-305
  * `bbox_target`          — misc/utils.py:307-328

Everything is static-shaped and vectorized over the batch: on TPU the
IoU matrix is one fused elementwise block in XLA (VPU), no loops.

Conventions (identical to the reference):
  * boxes are [x1, y1, x2, y2, ...] with the inclusive +1 pixel
    convention (width = x2 - x1 + 1);
  * masks are boolean with True == masked-out;
  * degenerate GT boxes (1x1) zero their IoU column; degenerate
    proposals set their IoU row to -1 (bbox_transform.py:221-222,
    268-269).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps_batch(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                        frm_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched IoU with optional frame masking.

    Args:
      anchors:  (B, N, >=4) proposal boxes [x1,y1,x2,y2,(frm,...)].
      gt_boxes: (B, K, >=4) ground-truth boxes.
      frm_mask: (B, N, K) bool, True where proposal and GT are on
                different frames (their IoU is forced to 0).

    Returns:
      (B, N, K) float IoU, with the degenerate-box conventions above.
    """
    a = anchors[..., :4].astype(jnp.float32)
    g = gt_boxes[..., :4].astype(jnp.float32)

    gt_w = g[:, :, 2] - g[:, :, 0] + 1.0          # (B, K)
    gt_h = g[:, :, 3] - g[:, :, 1] + 1.0
    gt_area = (gt_w * gt_h)[:, None, :]           # (B, 1, K)

    an_w = a[:, :, 2] - a[:, :, 0] + 1.0          # (B, N)
    an_h = a[:, :, 3] - a[:, :, 1] + 1.0
    an_area = (an_w * an_h)[:, :, None]           # (B, N, 1)

    gt_zero = ((gt_w == 1.0) & (gt_h == 1.0))[:, None, :]     # (B, 1, K)
    an_zero = ((an_w == 1.0) & (an_h == 1.0))[:, :, None]     # (B, N, 1)

    iw = (jnp.minimum(a[:, :, None, 2], g[:, None, :, 2])
          - jnp.maximum(a[:, :, None, 0], g[:, None, :, 0]) + 1.0)
    ih = (jnp.minimum(a[:, :, None, 3], g[:, None, :, 3])
          - jnp.maximum(a[:, :, None, 1], g[:, None, :, 1]) + 1.0)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)

    inter = iw * ih
    ua = an_area + gt_area - inter
    overlaps = inter / ua

    if frm_mask is not None:
        overlaps = overlaps * (~frm_mask).astype(overlaps.dtype)

    overlaps = jnp.where(jnp.broadcast_to(gt_zero, overlaps.shape), 0.0, overlaps)
    overlaps = jnp.where(jnp.broadcast_to(an_zero, overlaps.shape), -1.0, overlaps)
    return overlaps


def bbox_overlaps(rois: jnp.ndarray, gt_box: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Wrapper matching misc/utils.py:293-297 — frame|proposal mask in."""
    return bbox_overlaps_batch(rois[:, :, :5], gt_box[:, :, :5], mask)


def sim_mat_target(overlaps: jnp.ndarray, pad_gt_bboxs: jnp.ndarray) -> jnp.ndarray:
    """Per-(GT box, ROI) class-label targets for the region-cls loss.

    overlaps:     (B, N_rois, K_box) IoU.
    pad_gt_bboxs: (B, K_box) integer class labels (0 = pad/background).
    returns:      (B, K_box, N_rois) int32 — the GT class where
                  IoU > 0.5, else 0.
    """
    hit = (overlaps > 0.5).astype(jnp.int32)                      # (B, N, K)
    labels = hit * pad_gt_bboxs[:, None, :].astype(jnp.int32)     # (B, N, K)
    return jnp.swapaxes(labels, 1, 2)                             # (B, K, N)


def bbox_target(mask: jnp.ndarray, overlaps: jnp.ndarray) -> jnp.ndarray:
    """Binary per-ROI supervision targets for one decode step.

    mask:     (B, K_box) bool — True masks a GT box out at this step
              (box_mask semantics: 0 marks the box whose word is
              emitted at this step).
    overlaps: (B, N_rois, K_box) IoU.
    returns:  (B, N_rois) float32 — 1.0 where the ROI overlaps the
              step's active GT box with IoU > 0.5.

    The reference additionally mutated `input_seq_update` to demote
    visual words with no matching proposal (utils.py:320-327); that
    output was never consumed downstream ("deprecated" in-source), so
    it is intentionally not reproduced.
    """
    masked = jnp.where(mask[:, None, :], 0.0, overlaps)
    max_overlaps = jnp.max(masked, axis=2)
    return (max_overlaps > 0.5).astype(jnp.float32)
