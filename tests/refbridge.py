"""Bridge to the ACTUAL reference implementation at /root/reference.

Used exclusively by the differential-parity tests: it instantiates the
reference `TopDownModel`/`TransformerModel` (misc/AttModel.py:167-176)
at tiny dims on torch CPU, runs its MLE / GRD / sample paths on a
converted copy of our synthetic batch, and exposes the harvested
`state_dict()` so the same weights can be pushed through
`import_torch_checkpoint` into our parameter tree.

The reference is PyTorch-1.1-era code (byte masks, `.cuda()` in the
beam path, `Variable`); `_patch_torch_legacy()` installs thin
compatibility shims so it executes under the installed torch 2.x CPU
build.  The reference source itself is never modified.
"""

from __future__ import annotations

import os
import pickle
import sys
import types
from typing import Dict

import numpy as np

REF = "/root/reference"

_REF_MODULES = {}


def _patch_torch_legacy():
    """Shims for PyTorch-1.1 idioms the reference relies on:

    * byte (uint8) masks into masked_fill(_)/masked_select
      (AttModel.py:99-103, utils.py:139-142, bbox_transform.py:221)
    * `.cuda()` calls on a CPU-only build (CaptionModelBU.py:148,
      model.py:738-740)
    """
    import torch

    if getattr(torch, "_gvd_legacy_patched", False):
        return
    torch._gvd_legacy_patched = True

    _mf_ = torch.Tensor.masked_fill_

    def masked_fill_(self, mask, value):
        return _mf_(self, mask.bool(), value)

    torch.Tensor.masked_fill_ = masked_fill_

    _mf = torch.Tensor.masked_fill

    def masked_fill(self, mask, value):
        return _mf(self, mask.bool(), value)

    torch.Tensor.masked_fill = masked_fill

    _msel = torch.masked_select

    def masked_select(input, mask, **kw):
        return _msel(input, mask.bool(), **kw)

    torch.masked_select = masked_select

    _tmsel = torch.Tensor.masked_select

    def t_masked_select(self, mask, **kw):
        return _tmsel(self, mask.bool(), **kw)

    torch.Tensor.masked_select = t_masked_select

    torch.Tensor.cuda = lambda self, *a, **k: self


def _ref_modules():
    """Imports the reference misc.* modules exactly once, with the
    detectron-weight working directory trick handled by the caller."""
    if _REF_MODULES:
        return _REF_MODULES
    _patch_torch_legacy()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import misc.AttModel as ref_attmodel  # noqa: E402
    import misc.utils as ref_utils  # noqa: E402

    _REF_MODULES["AttModel"] = ref_attmodel
    _REF_MODULES["utils"] = ref_utils
    return _REF_MODULES


def write_fake_detectron_weights(root: str, att_feat_size: int,
                                 n_vg_cls: int, seed: int = 7):
    """Creates data/detectron_weights/*.pkl under `root` with the shapes
    the reference ctor loads unconditionally (model.py:172-178) and for
    transfer modes cls/both (model.py:181-186).  vis encoding width is
    hardwired to 2048 in the reference only because att_feat_size is
    2048 there; at tiny dims the ctor maths require
    cls_score_w.shape[1] == vis_encoding_size == att_feat_size."""
    rng = np.random.RandomState(seed)
    d = os.path.join(root, "data", "detectron_weights")
    os.makedirs(d, exist_ok=True)
    arrs = {
        "fc7_w": rng.randn(att_feat_size, att_feat_size).astype(np.float32) * 0.05,
        "fc7_b": rng.randn(att_feat_size).astype(np.float32) * 0.05,
        "cls_score_w": rng.randn(n_vg_cls, att_feat_size).astype(np.float32) * 0.05,
        "cls_score_b": rng.randn(n_vg_cls).astype(np.float32) * 0.05,
    }
    for name, arr in arrs.items():
        with open(os.path.join(d, name + ".pkl"), "wb") as f:
            pickle.dump(arr, f)
    return arrs


def make_ref_opt(cfg, n_vg_cls: int = 16, seed: int = 11):
    """Builds the argparse-Namespace-alike the reference model ctor
    reads (model.py:30-64 et al.) from our GVDConfig."""
    import torch

    rng = np.random.RandomState(seed)
    opt = types.SimpleNamespace()
    opt.vocab_size = cfg.vocab_size
    opt.detect_size = cfg.detect_size
    opt.input_encoding_size = cfg.input_encoding_size
    opt.rnn_size = cfg.rnn_size
    opt.num_layers = 1
    opt.drop_prob_lm = 0.0
    opt.seq_length = cfg.seq_length
    opt.fc_feat_size = cfg.fc_feat_size
    opt.att_feat_size = cfg.att_feat_size
    opt.att_hid_size = cfg.att_hid_size
    opt.seq_per_img = cfg.seq_per_img
    opt.itod = {i: f"obj{i}" for i in range(1, cfg.detect_size + 1)}
    opt.att_input_mode = cfg.att_input_mode
    opt.transfer_mode = cfg.transfer_mode
    opt.test_mode = False
    opt.enable_BUTD = cfg.enable_BUTD
    opt.w_grd = cfg.w_grd
    opt.w_cls = cfg.w_cls
    opt.num_sampled_frm = cfg.num_sampled_frm
    opt.num_prop_per_frm = cfg.num_prop_per_frm
    opt.att_model = cfg.att_model
    unk = cfg.unk_idx if cfg.unk_idx >= 0 else cfg.vocab_size - 1
    opt.wtoi = {"UNK": str(unk)}
    opt.region_attn_mode = cfg.region_attn_mode
    opt.t_attn_size = cfg.t_attn_size
    opt.obj_interact = cfg.obj_interact
    opt.t_attn_mode = cfg.t_attn_mode
    opt.enable_visdom = False
    # GloVe tables for the cls/both transfer surgery (model.py:181-217)
    opt.glove_clss = torch.from_numpy(
        rng.randn(cfg.detect_size + 1, 300).astype(np.float32))
    opt.glove_vg_cls = torch.from_numpy(
        rng.randn(n_vg_cls, 300).astype(np.float32))
    opt.vg_cls = [f"vg{i}" for i in range(n_vg_cls)]
    return opt


def build_ref_model(cfg, workdir: str, n_vg_cls: int = 16,
                    torch_seed: int = 3):
    """Instantiates the reference model at `cfg` dims in eval mode.

    `workdir` becomes the cwd so the ctor finds
    data/detectron_weights/*.pkl; restored afterwards."""
    import torch

    mods = _ref_modules()
    write_fake_detectron_weights(workdir, cfg.att_feat_size, n_vg_cls)
    opt = make_ref_opt(cfg, n_vg_cls=n_vg_cls)
    torch.manual_seed(torch_seed)
    old_cwd = os.getcwd()
    os.chdir(workdir)
    try:
        model = mods["AttModel"].TopDownModel(opt)
    finally:
        os.chdir(old_cwd)
    model.eval()
    _shim_beam_core_call(model)
    return model, opt


def _shim_beam_core_call(model):
    """The published reference beam path is broken: beam_search calls
    `self.core(...)` with 12 positional args (CaptionModelBU.py:179-181)
    while `TopDownCore.forward` accepts 10 (AttModel.py:134).  The two
    extras (a zeros tensor and `self`) follow `sim_mat_static_update`,
    which the core never reads, so dropping the surplus args restores
    the intended behavior without touching the MLE path (which passes
    exactly 10)."""
    core = getattr(model, "core", None)
    if core is None:
        return
    orig = core.forward
    core.forward = lambda *a, **k: orig(*a[:10])


def to_torch_batch(batch: Dict):
    """Our synthetic_batch dict -> the reference forward()'s positional
    tensor layout (main.py:220-235 buffer dtypes: masks as byte)."""
    import torch

    t = {}
    t["segs_feat"] = torch.from_numpy(
        np.asarray(batch["seg_feat"], np.float32))
    t["input_seq"] = torch.from_numpy(
        np.asarray(batch["input_seq"], np.int64))
    t["gt_seq"] = torch.from_numpy(np.asarray(batch["gt_seq"], np.int64))
    t["num"] = torch.from_numpy(np.asarray(batch["num"], np.float32))
    t["ppls"] = torch.from_numpy(np.asarray(batch["ppls"], np.float32))
    t["gt_boxes"] = torch.from_numpy(
        np.asarray(batch["gt_boxes"], np.float32))
    t["mask_boxes"] = torch.from_numpy(
        np.asarray(batch["mask_boxes"], np.uint8))
    t["ppls_feat"] = torch.from_numpy(
        np.asarray(batch["ppls_feat"], np.float32))
    t["frm_mask"] = torch.from_numpy(np.asarray(batch["frm_mask"], np.uint8))
    t["sample_idx"] = torch.from_numpy(
        np.asarray(batch["sample_idx"], np.int64))
    t["pnt_mask"] = torch.from_numpy(np.asarray(batch["pnt_mask"], np.uint8))
    return t


def run_ref_mle(model, tb) -> Dict[str, float]:
    """Reference MLE forward -> {lm, att2, grd, cls} scalar losses
    (model.py:283-483)."""
    import torch

    with torch.no_grad():
        lm, att2, grd, cls = model(
            tb["segs_feat"], tb["input_seq"], tb["gt_seq"], tb["num"],
            tb["ppls"], tb["gt_boxes"], tb["mask_boxes"], tb["ppls_feat"],
            tb["frm_mask"], tb["sample_idx"], tb["pnt_mask"], "MLE")
    return {"lm_loss": float(lm.mean()), "att2_loss": float(att2.mean()),
            "ground_loss": float(grd.mean()), "cls_loss": float(cls.mean())}


def run_ref_transformer_mle(model, tb) -> Dict[str, float]:
    """Transformer captioner returns (lm, 0, 0, 0, 0, 0)
    (model.py:411-419)."""
    import torch

    with torch.no_grad():
        outs = model(
            tb["segs_feat"], tb["input_seq"], tb["gt_seq"], tb["num"],
            tb["ppls"], tb["gt_boxes"], tb["mask_boxes"], tb["ppls_feat"],
            tb["frm_mask"], tb["sample_idx"], tb["pnt_mask"], "MLE")
    return {"lm_loss": float(outs[0].mean())}


def run_ref_grd(model, tb):
    """Reference GRD forward -> (cls_pred (N,2), att2_ind, grd_ind)
    as numpy (model.py:484-489)."""
    import torch

    with torch.no_grad():
        cls_pred, att2_ind, grd_ind = model(
            tb["segs_feat"], tb["input_seq"], tb["gt_seq"], tb["num"],
            tb["ppls"], tb["gt_boxes"], tb["mask_boxes"], tb["ppls_feat"],
            tb["frm_mask"], tb["sample_idx"], tb["pnt_mask"], "GRD")
    return (np.asarray(cls_pred), np.asarray(att2_ind),
            np.asarray(grd_ind))


def run_ref_sample(model, tb, beam_size: int = 1):
    """Reference greedy/beam decode, via `_sample` directly.

    forward('sample') is broken in the published reference for both
    decode families: it unpacks 4 values (model.py:233) but
    `_sample_beam` returns 3 (model.py:742) and the transformer branch
    returns 3 (model.py:578); only the greedy topdown path survives the
    wrapper.  Returns numpy tuples:
      greedy      -> (seq, seqLogprobs, att2_weights, sim_mat)
      beam        -> (seq, seqLogprobs, att2_ind)
      transformer -> (seq, zeros, zeros)
    """
    import torch

    eval_opt = {"sample_max": 1, "beam_size": beam_size,
                "inference_mode": True}
    with torch.no_grad():
        outs = model._sample(
            tb["segs_feat"], tb["ppls"], tb["num"], tb["ppls_feat"],
            tb["sample_idx"], tb["pnt_mask"], eval_opt)
    return tuple(np.asarray(o) for o in outs)


def export_state_dict(model, path: str) -> str:
    """torch.save the reference model's REAL state_dict — the importer
    tests key names harvested from the live module tree, not hand-built
    ones."""
    import torch

    torch.save(model.state_dict(), path)
    return path
