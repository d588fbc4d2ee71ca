"""Native C++ batch packer vs NumPy fallback: bit-identical outputs."""

import numpy as np
import pytest

from grounded_video_description_tpu.data import native_pack


def _inputs(seed=0, n=37, feat=16, n_box=5):
    rng = np.random.RandomState(seed)
    proposals = np.zeros((n, 7))
    proposals[:, :4] = rng.uniform(0, 700, (n, 4))
    proposals[:, 4] = rng.randint(0, 4, n)
    proposals[:, 5] = rng.randint(0, 3, n)       # some background (0)
    proposals[:, 6] = rng.uniform(0, 1, n)       # some below thresh
    feats = rng.randn(n, feat).astype(np.float32)
    gt_frms = rng.randint(0, 4, n_box).astype(np.float32)
    return proposals, feats, gt_frms


def test_native_matches_numpy_fallback():
    if not native_pack.native_available():
        pytest.skip("no C++ toolchain")
    proposals, feats, gt_frms = _inputs()
    kw = dict(prop_thresh=0.2, exclude_bgd=True, max_proposal=64,
              max_box=8)
    got = native_pack.pack_segment(proposals, feats, gt_frms, **kw)

    # force the numpy path
    lib, native_pack._lib = native_pack._lib, None
    tried = native_pack._lib_tried
    native_pack._lib_tried = True
    try:
        want = native_pack.pack_segment(proposals, feats, gt_frms, **kw)
    finally:
        native_pack._lib = lib
        native_pack._lib_tried = tried

    for g, w in zip(got, want):
        assert g.dtype == w.dtype
        assert np.array_equal(g, w)


def test_pack_semantics():
    proposals, feats, gt_frms = _inputs(n=10)
    proposals[0, 6] = 0.1     # below thresh -> masked + zeroed
    proposals[1, 6] = 0.9
    proposals[1, 5] = 0.0     # background -> masked when exclude_bgd
    out = native_pack.pack_segment(
        proposals, feats, gt_frms, prop_thresh=0.2, exclude_bgd=True,
        max_proposal=16, max_box=8)
    pad_p, pad_m, pad_f, pad_fm = out
    assert pad_m[0] and pad_m[1]
    assert np.all(pad_p[0] == 0) and np.all(pad_f[1] == 0)
    assert np.all(pad_m[10:])            # padding masked
    # frame mask present even for masked proposals (reference order)
    expect = proposals[0, 4] != gt_frms
    assert np.array_equal(pad_fm[0, :len(gt_frms)], expect)
