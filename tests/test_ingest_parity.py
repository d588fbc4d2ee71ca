"""Ingest differential parity: run the ACTUAL reference DataLoader
(misc/dataloader_anet.py:26-358) on the same on-disk synthetic dataset
our `AnetDataset` reads, and assert the 12-tensor `__getitem__` output
is byte-identical to ours for every segment.

torchvision/torchtext are absent from this image; the reference only
uses `torchvision.datasets.folder.default_loader` (vis path, unused
here) and `torchtext.vocab.GloVe` (ctor-time tables that never reach
`__getitem__`), so both are shimmed with deterministic fakes — the
reference source itself is never modified.

Parity is asserted at seq_per_img=1: the published reference crashes
for seq_per_img>1 both in the loader (`random.randint(0, ncap)` can
index past cap_seq, dataloader_anet.py:287) and in the model
(frm_mask_on_prop mismatch, model.py:436-440); our broadcast layout
covers S>1 and collapses to the reference layout at S=1.
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data.dataset import AnetDataset
from grounded_video_description_tpu.data.synthetic_files import (
    write_synthetic_dataset)

REF = "/root/reference"


# --------------------------------------------------------------------- #
# shims for the two absent torch-ecosystem packages
# --------------------------------------------------------------------- #

def _install_vision_text_shims():
    if "torchvision" in sys.modules and not getattr(
            sys.modules["torchvision"], "_gvd_fake", False):
        return  # a real torchvision exists; nothing to do
    import torch

    tv = types.ModuleType("torchvision")
    tv._gvd_fake = True
    tv_datasets = types.ModuleType("torchvision.datasets")
    tv_folder = types.ModuleType("torchvision.datasets.folder")

    def default_loader(path):  # only reached when vis_attn=True
        from PIL import Image
        with open(path, "rb") as f:
            return Image.open(f).convert("RGB")

    tv_folder.default_loader = default_loader
    tv_datasets.folder = tv_folder
    tv.datasets = tv_datasets
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv.transforms = tv_transforms

    tt = types.ModuleType("torchtext")
    tt._gvd_fake = True
    tt_vocab = types.ModuleType("torchtext.vocab")

    class GloVe:
        """Deterministic stand-in.  The reference probes
        `w in self.glove.stoi` then indexes
        `self.glove.vectors[self.glove.stoi[w]]`
        (dataloader_anet.py:76-77); stoi lazily registers every probed
        word so the ctor never hits its np.random fallback — the tables
        it builds never reach `__getitem__` anyway."""

        def __init__(self, name="6B", dim=300, **kw):
            self.dim = dim
            self._vecs = []
            glove = self

            class _LazyStoi(dict):
                def __contains__(self, w):
                    if not dict.__contains__(self, w):
                        rng = np.random.RandomState(
                            abs(hash(w)) % (2 ** 31))
                        dict.__setitem__(self, w, len(glove._vecs))
                        glove._vecs.append(
                            rng.randn(glove.dim).astype(np.float32))
                    return True

            self.stoi = _LazyStoi()

        @property
        def vectors(self):
            import torch as _t
            return _t.from_numpy(np.stack(self._vecs)) if self._vecs \
                else _t.zeros((0, self.dim))

    tt_vocab.GloVe = GloVe
    tt.vocab = tt_vocab

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = tv_datasets
    sys.modules["torchvision.datasets.folder"] = tv_folder
    sys.modules["torchvision.transforms"] = tv_transforms
    sys.modules["torchtext"] = tt
    sys.modules["torchtext.vocab"] = tt_vocab


def _ref_dataloader_module():
    from tests.refbridge import _patch_torch_legacy
    _patch_torch_legacy()   # byte-mask masked_fill_ (torch-1.1 idiom)
    _install_vision_text_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import misc.dataloader_anet as ref_dl  # noqa: E402
    return ref_dl


def make_ref_loader(cfg, workdir, split="training"):
    """Instantiate the reference DataLoader on our synthetic files.

    The ctor reads `data/vg_object_vocab.txt` relative to cwd
    (dataloader_anet.py:63); a tiny class list is written under
    `workdir` and cwd swapped for the ctor only.  `max_gt_box` is an
    instance attribute hardcoded to 100 (dataloader_anet.py:44) —
    overridden post-ctor to cfg.max_gt_box so both sides pad alike.
    """
    ref_dl = _ref_dataloader_module()
    opt = types.SimpleNamespace(
        batch_size=cfg.batch_size, seq_per_img=cfg.seq_per_img,
        seq_length=cfg.seq_length, att_feat_size=cfg.att_feat_size,
        vis_attn=False, feature_root=cfg.feature_root,
        seg_feature_root=cfg.seg_feature_root,
        num_sampled_frm=cfg.num_sampled_frm,
        num_prop_per_frm=cfg.num_prop_per_frm,
        exclude_bgd_det=cfg.exclude_bgd_det,
        prop_thresh=cfg.prop_thresh, t_attn_size=cfg.t_attn_size,
        test_mode=cfg.test_mode, input_dic=cfg.input_dic,
        input_json=cfg.input_json, grd_reference=cfg.grd_reference,
        proposal_h5=cfg.proposal_h5)
    d = os.path.join(workdir, "data")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "vg_object_vocab.txt"), "w") as f:
        f.write("person\ndog\ncar,automobile\ntree\n")
    old = os.getcwd()
    os.chdir(workdir)
    try:
        dl = ref_dl.DataLoader(opt, split=split,
                               seq_per_img=cfg.seq_per_img)
    finally:
        os.chdir(old)
    dl.max_gt_box = cfg.max_gt_box
    return dl


# --------------------------------------------------------------------- #
# item-level comparison
# --------------------------------------------------------------------- #

def _as_np(x):
    import torch
    if isinstance(x, torch.Tensor):
        return x.numpy()
    return np.asarray(x)


def assert_item_parity(ref_item, ours, *, test_mode=False):
    """ref_item: the reference 12-tuple (dataloader_anet.py:354);
    ours: AnetDataset.__getitem__ dict.  Exact equality throughout —
    both sides cast the same float64 intermediates to float32."""
    (seg_feature, input_seq, gt_seq, num, pad_proposals, pad_gt_bboxs,
     pad_box_mask, seg_id, pad_region_feature, pad_frm_mask,
     sample_idx, pad_pnt_mask) = ref_item

    assert seg_id == ours["seg_id"]
    np.testing.assert_array_equal(
        _as_np(seg_feature).astype(np.float32), ours["seg_feat"])
    np.testing.assert_array_equal(_as_np(input_seq), ours["input_seq"])
    np.testing.assert_array_equal(_as_np(gt_seq), ours["gt_seq"])
    np.testing.assert_array_equal(_as_np(num), ours["num"])
    np.testing.assert_array_equal(_as_np(pad_proposals), ours["ppls"])
    np.testing.assert_array_equal(_as_np(pad_gt_bboxs), ours["gt_boxes"])
    np.testing.assert_array_equal(
        _as_np(pad_box_mask).astype(bool), ours["mask_boxes"])
    np.testing.assert_array_equal(
        _as_np(pad_region_feature), ours["ppls_feat"])
    np.testing.assert_array_equal(
        _as_np(pad_frm_mask).astype(bool), ours["frm_mask"])
    np.testing.assert_array_equal(_as_np(sample_idx), ours["sample_idx"])
    # ours prepends the always-open sentinel column the model would
    # otherwise concat per step (AttModel.py:196 pnt_mask layout)
    assert not ours["pnt_mask"][0]
    np.testing.assert_array_equal(
        _as_np(pad_pnt_mask).astype(bool), ours["pnt_mask"][1:])


def _compare_all(cfg, workdir, split="training"):
    ref = make_ref_loader(cfg, workdir, split=split)
    ds = AnetDataset(cfg, split=split)
    assert ref.split_ix == ds.split_ix
    assert len(ref) == len(ds)
    assert dict(ref.num_seg_per_vid) == dict(ds.num_seg_per_vid)
    for i in range(len(ds)):
        assert_item_parity(ref[i], ds[i], test_mode=cfg.test_mode)
    return ref, ds


# --------------------------------------------------------------------- #
# fixtures
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest_parity")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(str(root), cfg, n_train=3, n_val=2)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    return cfg, str(root)


# --------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------- #

def test_parity_training_defaults(synth):
    cfg, root = synth
    _compare_all(cfg, root, split="training")


def test_parity_validation_split(synth):
    cfg, root = synth
    _compare_all(cfg, root, split="validation")


@pytest.mark.parametrize("prop_thresh", [0.5, 0.9])
def test_parity_prop_thresh(synth, prop_thresh):
    cfg, root = synth
    _compare_all(cfg.replace(prop_thresh=prop_thresh), root)


def test_parity_exclude_bgd_det(synth, tmp_path):
    """exclude_bgd_det masks class-0 proposals (dataloader_anet.py:
    195-196). The stock synthetic set has no class-0 proposals, so
    regenerate with some forced to background."""
    cfg, root = synth
    cfg2 = cfg.replace(exclude_bgd_det=True)
    _compare_all(cfg2, root)
    # variant with real background detections
    import h5py
    root2 = str(tmp_path / "bgd")
    cfg3 = tiny_test_config(exclude_bgd_det=True)
    paths = write_synthetic_dataset(root2, cfg3, n_train=2, n_val=1)
    with h5py.File(paths["proposal_h5"], "r+") as h5:
        lab = h5["dets_labels"][:]
        lab[:, ::3, 5] = 0            # every 3rd proposal -> background
        h5["dets_labels"][...] = lab
    cfg3 = cfg3.replace(**{k: v for k, v in paths.items()
                           if k != "densecap_references"})
    _compare_all(cfg3, root2)


def test_parity_test_mode(synth):
    """test_mode: dummy boxes, frm_idx=-1, no degenerate filtering
    (dataloader_anet.py:223-226, 244)."""
    cfg, root = synth
    _compare_all(cfg.replace(test_mode=True), root)


def test_parity_degenerate_boxes(tmp_path):
    """Zero-area annotations are dropped pre-padding
    (dataloader_anet.py:244-248); both sides must agree on the
    surviving set and the resulting indicator/cap_seq."""
    root = str(tmp_path / "degen")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(root, cfg, n_train=2, n_val=1)
    with open(paths["input_json"]) as f:
        cap = json.load(f)
    mutated = 0
    for vid in cap.values():
        for seg in vid["segments"].values():
            if seg["bbox"]:
                x0, y0 = seg["bbox"][0][:2]
                seg["bbox"][0] = [x0, y0, x0, y0]   # gt_x == gt_y == 1
                mutated += 1
    assert mutated > 0
    with open(paths["input_json"], "w") as f:
        json.dump(cap, f)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    ref, ds = _compare_all(cfg, root)
    # sanity: at least one item actually lost a box to the filter
    n_boxes = [int(ds[i]["num"][2]) for i in range(len(ds))]
    assert min(n_boxes) < max([len(
        cap[v]["segments"][s]["clss"])
        for v in cap for s in cap[v]["segments"]]) + 1


def test_parity_gt_box_overflow(tmp_path):
    """More annotations than max_gt_box exercises the truncation path
    (dataloader_anet.py:325-330)."""
    root = str(tmp_path / "overflow")
    cfg = tiny_test_config(max_gt_box=1)
    paths = write_synthetic_dataset(root, cfg, n_train=2, n_val=1)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    ref, ds = _compare_all(cfg, root)
    assert any(int(ds[i]["num"][2]) == 1 for i in range(len(ds)))


def test_parity_missing_feature_file(tmp_path):
    """A segment whose .npy is absent must drop out of split_ix on
    both sides (dataloader_anet.py:137-144)."""
    root = str(tmp_path / "missing")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(root, cfg, n_train=2, n_val=1)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    victim = sorted(os.listdir(cfg.feature_root))[0]
    os.remove(os.path.join(cfg.feature_root, victim))
    ref, ds = _compare_all(cfg, root)
    assert len(ds) == 3   # 2 vids x 2 segs - 1 missing
