"""Geometry ops vs hand-computed cases and a NumPy oracle implementing
the reference semantics (bbox_transform.py:176-273, utils.py:293-328)."""

import numpy as np
import jax.numpy as jnp

from grounded_video_description_tpu.ops import (
    bbox_overlaps_batch, sim_mat_target, bbox_target,
)


def np_iou_oracle(anchors, gts, frm_mask):
    """Straight NumPy transcription of the documented semantics."""
    B, N, _ = anchors.shape
    K = gts.shape[1]
    out = np.zeros((B, N, K))
    for b in range(B):
        for i in range(N):
            ax1, ay1, ax2, ay2 = anchors[b, i, :4]
            aw, ah = ax2 - ax1 + 1, ay2 - ay1 + 1
            for j in range(K):
                gx1, gy1, gx2, gy2 = gts[b, j, :4]
                gw, gh = gx2 - gx1 + 1, gy2 - gy1 + 1
                iw = max(min(ax2, gx2) - max(ax1, gx1) + 1, 0)
                ih = max(min(ay2, gy2) - max(ay1, gy1) + 1, 0)
                ua = aw * ah + gw * gh - iw * ih
                v = iw * ih / ua
                if frm_mask is not None and frm_mask[b, i, j]:
                    v = 0.0
                if gw == 1 and gh == 1:
                    v = 0.0
                if aw == 1 and ah == 1:
                    v = -1.0
                out[b, i, j] = v
    return out


def test_iou_simple_identity():
    a = jnp.array([[[0, 0, 9, 9, 0]]], jnp.float32)
    g = jnp.array([[[0, 0, 9, 9, 0]]], jnp.float32)
    iou = bbox_overlaps_batch(a, g)
    assert np.allclose(iou, 1.0)


def test_iou_half_overlap():
    a = jnp.array([[[0, 0, 9, 9, 0]]], jnp.float32)
    g = jnp.array([[[0, 0, 4, 9, 0]]], jnp.float32)
    iou = np.array(bbox_overlaps_batch(a, g))[0, 0, 0]
    assert np.isclose(iou, 50.0 / 100.0)


def test_iou_degenerate_conventions():
    # degenerate gt (1x1) -> 0; degenerate anchor -> -1 (even over gt-0)
    a = jnp.array([[[0, 0, 9, 9, 0], [5, 5, 5, 5, 0]]], jnp.float32)
    g = jnp.array([[[0, 0, 9, 9, 0], [3, 3, 3, 3, 0]]], jnp.float32)
    iou = np.array(bbox_overlaps_batch(a, g))
    assert np.isclose(iou[0, 0, 0], 1.0)
    assert iou[0, 0, 1] == 0.0       # gt degenerate
    assert iou[0, 1, 0] == -1.0      # anchor degenerate
    assert iou[0, 1, 1] == -1.0      # anchor convention wins over gt

def test_iou_frame_mask_zeroes():
    a = jnp.array([[[0, 0, 9, 9, 0]]], jnp.float32)
    g = jnp.array([[[0, 0, 9, 9, 1]]], jnp.float32)
    m = jnp.array([[[True]]])
    iou = np.array(bbox_overlaps_batch(a, g, m))
    assert iou[0, 0, 0] == 0.0


def test_iou_against_numpy_oracle():
    rng = np.random.RandomState(0)
    B, N, K = 3, 17, 9
    anchors = np.zeros((B, N, 5), np.float32)
    gts = np.zeros((B, K, 5), np.float32)
    for arr, n in ((anchors, N), (gts, K)):
        x1 = rng.uniform(0, 500, (B, n))
        y1 = rng.uniform(0, 300, (B, n))
        arr[:, :, 0], arr[:, :, 1] = x1, y1
        arr[:, :, 2] = x1 + rng.uniform(0, 200, (B, n))
        arr[:, :, 3] = y1 + rng.uniform(0, 150, (B, n))
    # sprinkle degenerates
    anchors[0, 3, 2:4] = anchors[0, 3, 0:2]
    gts[1, 2, 2:4] = gts[1, 2, 0:2]
    frm = rng.rand(B, N, K) < 0.3

    got = np.array(bbox_overlaps_batch(jnp.asarray(anchors),
                                       jnp.asarray(gts), jnp.asarray(frm)))
    want = np_iou_oracle(anchors, gts, frm)
    assert np.allclose(got, want, atol=1e-5)


def test_sim_mat_target():
    overlaps = jnp.array([[[0.6, 0.2], [0.4, 0.8], [-1.0, 0.9]]])  # (1,3,2)
    labels = jnp.array([[5.0, 7.0]])
    out = np.array(sim_mat_target(overlaps, labels))
    # (B, K, N): box0 matches roi0 only; box1 matches roi1, roi2
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [5, 0, 0]
    assert out[0, 1].tolist() == [0, 7, 7]


def test_bbox_target():
    overlaps = jnp.array([[[0.6, 0.2], [0.4, 0.8], [0.55, 0.9]]])  # (1,3,2)
    # step mask: box 0 active (False = unmasked), box 1 masked
    mask = jnp.array([[False, True]])
    labels = np.array(bbox_target(mask, overlaps))
    # max over unmasked boxes: roi0 0.6>0.5 hit, roi1 0.4 miss, roi2 0.55 hit
    assert labels[0].tolist() == [1.0, 0.0, 1.0]
