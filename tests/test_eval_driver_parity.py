"""Eval-driver host-side differential: execute the ACTUAL reference
driver loops (`main.eval`, main.py:314-517, and `main.eval_grounding`,
main.py:89-194) with canned model outputs, run our
`Evaluator.evaluate`/`eval_grounding_gt` on the SAME batches and SAME
canned outputs, and byte-diff the emitted densecap / attn-gen /
attn-gt / grd-gt JSONs plus the cls-accuracy scalar.

The model is faked on both sides with identical tensors, so the only
code under test is the host-side post-processing: lemma→class mapping,
box gathers, JSON assembly, sentence decoding, per-class accuracy
aggregation.  The metric evaluators the reference would call
(ANETcaptions / ANetGrdEval — empty submodules in this checkout) are
replaced by recording stubs; metric values are pinned elsewhere
(tests/test_metric_validation.py).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types
from collections import defaultdict

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data.dataset import AnetDataset, collate
from grounded_video_description_tpu.data.synthetic_files import (
    write_synthetic_dataset)
from grounded_video_description_tpu.engine.evaluator import Evaluator

from tests.test_ingest_parity import _install_vision_text_shims

REF_MAIN = "/root/reference/main.py"
RUN_ID = "difftest"


# --------------------------------------------------------------------- #
# loading the reference driver module
# --------------------------------------------------------------------- #

class _FakeANETcaptions:
    """Stands in for tools/densevid_eval's ANETcaptions (empty
    submodule); the file it would score is byte-diffed instead."""

    def __init__(self, **kw):
        self.kw = kw
        self.scores = {}

    def evaluate(self):
        pass


class _FakeANetGrdEval:
    def __init__(self, **kw):
        self.kw = kw

    def gt_grd_eval(self):
        return 0.0

    def import_sub(self, f):
        self.sub = f

    def grd_eval(self, mode="all"):
        return (0.0,) * 6


_REF_MAIN_MOD = None


def _load_ref_main():
    global _REF_MAIN_MOD
    if _REF_MAIN_MOD is not None:
        return _REF_MAIN_MOD
    from tests.refbridge import _patch_torch_legacy
    _patch_torch_legacy()
    _install_vision_text_shims()
    # main.py's `from evaluate import ...` / `from eval_grd_... import`
    # resolve from the empty tools/ submodules — pre-register stubs
    ev_mod = types.ModuleType("evaluate")
    ev_mod.ANETcaptions = _FakeANETcaptions
    grd_mod = types.ModuleType("eval_grd_anet_entities")
    grd_mod.ANetGrdEval = _FakeANetGrdEval
    sys.modules["evaluate"] = ev_mod
    sys.modules["eval_grd_anet_entities"] = grd_mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_main", REF_MAIN)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_main"] = mod
    spec.loader.exec_module(mod)
    _REF_MAIN_MOD = mod
    return mod


class _RefLoader:
    """Iterable with the py2-style `.next()` iterator main.py expects
    (main.py:334)."""

    def __init__(self, tuple_batches):
        self.batches = tuple_batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        it = iter(self.batches)

        class _It:
            def next(self):
                return next(it)

            def __next__(self):
                return next(it)

            def __iter__(self):
                return self

        return _It()


class _RefFakeModel:
    """Returns the canned per-batch outputs; positional arg 11 is the
    mode string (model.py:233 calling convention)."""

    def __init__(self, sample_outs, grd_outs):
        self.sample_outs = list(sample_outs)
        self.grd_outs = list(grd_outs)

    def eval(self):
        pass

    def __call__(self, *args, **kw):
        import torch
        mode = args[11]
        if mode == "sample":
            seq, att2_w, sim = self.sample_outs.pop(0)
            return (torch.from_numpy(seq), torch.from_numpy(att2_w),
                    torch.from_numpy(sim))
        assert mode == "GRD"
        cls_pred, att2_ind, grd_ind = self.grd_outs.pop(0)
        return (torch.from_numpy(cls_pred), torch.from_numpy(att2_ind),
                torch.from_numpy(grd_ind))


def _to_ref_tuple(batch):
    """Our collated dict batch -> the reference DataLoader's 12-tuple
    (dataloader_anet.py:354), with the main-driver buffer dtypes
    (main.py:564-573)."""
    import torch

    return (
        torch.from_numpy(np.asarray(batch["seg_feat"], np.float32)),
        torch.from_numpy(np.asarray(batch["input_seq"], np.int64)),
        torch.from_numpy(np.asarray(batch["gt_seq"], np.int64)),
        torch.from_numpy(np.asarray(batch["num"], np.float32)),
        torch.from_numpy(np.asarray(batch["ppls"], np.float32)),
        torch.from_numpy(np.asarray(batch["gt_boxes"], np.float32)),
        torch.from_numpy(
            np.asarray(batch["mask_boxes"], np.uint8)),
        list(batch["seg_id"]),
        torch.from_numpy(np.asarray(batch["ppls_feat"], np.float32)),
        torch.from_numpy(np.asarray(batch["frm_mask"], np.uint8)),
        torch.from_numpy(np.asarray(batch["sample_idx"], np.int64)),
        torch.from_numpy(
            np.asarray(batch["pnt_mask"][:, 1:], np.uint8)),
    )


# --------------------------------------------------------------------- #
# canned model outputs
# --------------------------------------------------------------------- #

def _canned_outputs(cfg, vocab, batches, seed=5):
    """Per-batch (seq, att2_weights, sim_mat) and
    (cls_pred, att2_ind, grd_ind) with realistic structure: variable
    sentence lengths (incl. one full-length and one empty row),
    detection words guaranteed present, random float attention."""
    rng = np.random.RandomState(seed)
    L = cfg.seq_length
    n_frm, n_prop = cfg.num_sampled_frm, cfg.num_prop_per_frm
    R = n_frm * n_prop
    K = cfg.max_gt_box
    n_words = len(vocab.itow)
    det_ids = [int(vocab.wtoi[w]) for w in vocab.wtod][:4]

    sample_outs, grd_outs, cls_pair_rows = [], [], []
    for bi, batch in enumerate(batches):
        B = len(batch["seg_id"])
        seq = np.zeros((B, L), np.int64)
        for i in range(B):
            if bi == 0 and i == 0:
                ln = L                      # full row: no trailing space
            elif bi == 0 and i == 1:
                ln = 0                      # empty sentence
            else:
                ln = int(rng.randint(1, L))
            toks = rng.randint(1, n_words + 1, size=ln)
            if ln >= 2:                     # guarantee detection words
                toks[rng.randint(0, ln)] = det_ids[
                    int(rng.randint(0, len(det_ids)))]
            seq[i, :ln] = toks
        att2_w = rng.randn(B, L, R).astype(np.float32)
        sim = rng.randn(B, cfg.detect_size + 1, R).astype(np.float32)
        sample_outs.append((seq, att2_w, sim))

        att2_ind = rng.randint(0, n_prop, size=(B, L, n_frm)).astype(
            np.int64)
        grd_ind = rng.randint(0, n_prop, size=(B, L, n_frm)).astype(
            np.int64)
        sim_target = np.where(
            rng.rand(B, K, R) < 0.15,
            rng.randint(1, cfg.detect_size + 1, size=(B, K, R)),
            0).astype(np.int64)
        pred_cls = rng.randint(0, cfg.detect_size + 1,
                               size=(B, R)).astype(np.int64)
        # (target, predicted) pairs exactly as the reference model emits
        # them (model.py:351-355): one row per positive sim target
        pairs = []
        for b in range(B):
            m = sim_target[b] > 0
            if m.any():
                tgt = sim_target[b][m]
                prd = np.broadcast_to(pred_cls[b][None, :],
                                      sim_target[b].shape)[m]
                pairs.append(np.stack([tgt, prd], 1))
        cls_pred = np.concatenate(pairs, 0) if pairs else \
            np.zeros((0, 2), np.int64)
        grd_outs.append((cls_pred, att2_ind, grd_ind))
        cls_pair_rows.append((sim_target, pred_cls))
    return sample_outs, grd_outs, cls_pair_rows


# --------------------------------------------------------------------- #
# fixture: shared dataset + batches + canned outputs
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaldriver")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(str(root), cfg, n_train=2, n_val=3)
    cfg = cfg.replace(
        **{k: v for k, v in paths.items() if k != "densecap_references"})
    ds = AnetDataset(cfg, split="validation")
    cfg = cfg.replace(
        vocab_size=ds.vocab.vocab_size, language_eval=True,
        eval_obj_grounding=True, beam_size=1, val_split="validation",
        id=RUN_ID,
        # point at a missing file: the submission JSON is still written
        # (the byte-diff target) but the metric stack is skipped here
        densecap_references=[str(root / "absent.json")])
    bs = 2
    batches = [collate([ds[i] for i in range(b, min(b + bs, len(ds)))])
               for b in range(0, len(ds), bs)]
    sample_outs, grd_outs, cls_rows = _canned_outputs(
        cfg, ds.vocab, batches)
    return cfg, ds, batches, sample_outs, grd_outs, cls_rows


def _make_ref_opt(cfg, vocab):
    return types.SimpleNamespace(
        val_split=cfg.val_split, id=cfg.id, beam_size=1,
        language_eval=True, eval_obj_grounding=True,
        eval_obj_grounding_gt=False, vis_attn=False, test_mode=False,
        att_model="topdown", enable_visdom=False,
        grd_reference=cfg.grd_reference, split_file=cfg.split_file,
        densecap_references=cfg.densecap_references,
        densecap_verbose=False, vocab_size=vocab.vocab_size,
        num_sampled_frm=cfg.num_sampled_frm,
        num_prop_per_frm=cfg.num_prop_per_frm,
        wtol=vocab.wtol, wtod=vocab.wtod, itod=vocab.itod,
        itow=vocab.itow)


def _prime_ref_globals(rm, model, batches, vocab):
    import torch

    rm.model = model
    rm.dataloader_val = _RefLoader([_to_ref_tuple(b) for b in batches])
    rm.dataset = types.SimpleNamespace(
        itow=vocab.itow, itod=vocab.itod, ltow=vocab.ltow,
        itoc=vocab.itod, wtod=vocab.wtod)
    rm.segs_feat = torch.FloatTensor(1)
    rm.input_seqs = torch.LongTensor(1)
    rm.gt_seqs = torch.LongTensor(1)
    rm.input_num = torch.LongTensor(1)
    rm.input_ppls = torch.FloatTensor(1)
    rm.mask_ppls = torch.ByteTensor(1)
    rm.gt_bboxs = torch.FloatTensor(1)
    rm.mask_frms = torch.ByteTensor(1)
    rm.ppls_feat = torch.FloatTensor(1)
    rm.iteration = 0
    rm.val_result_history = {}


def _our_evaluator(cfg, vocab, sample_outs, grd_outs):
    fake_model = types.SimpleNamespace(
        sample_greedy=lambda *a, **k: None,
        forward=lambda *a, **k: None)
    ev = Evaluator(cfg, fake_model, vocab)
    souts = [s for s in sample_outs]
    gouts = [g for g in grd_outs]

    def generate(variables, arrays):
        seq, att2_w, sim = souts.pop(0)
        return {"seq": seq, "logprobs": np.zeros_like(att2_w[..., 0]),
                "att2_weights": att2_w, "sim_mat": sim}

    def grd(variables, arrays):
        cls_pred, att2_ind, grd_ind = gouts.pop(0)
        return {"att2_ind": att2_ind, "grd_ind": grd_ind,
                "sim_target": grd.sim_rows.pop(0)[0],
                "pred_cls": grd.pred_rows.pop(0)}

    ev.generate = generate
    ev._grd = grd
    return ev, grd


# --------------------------------------------------------------------- #
# tests
# --------------------------------------------------------------------- #

def test_eval_driver_generated_sentences(setup, tmp_path):
    """main.eval vs Evaluator.evaluate: densecap + attn-gen JSONs must
    be byte-identical (main.py:361-425 vs evaluator.py:99-194)."""
    cfg, ds, batches, sample_outs, grd_outs, _ = setup
    rm = _load_ref_main()

    ref_dir = tmp_path / "ref"
    for d in ("results", "densecap_results"):
        os.makedirs(ref_dir / d, exist_ok=True)
    model = _RefFakeModel(sample_outs, grd_outs)
    _prime_ref_globals(rm, model, batches, ds.vocab)
    opt = _make_ref_opt(cfg, ds.vocab)
    old = os.getcwd()
    os.chdir(ref_dir)
    try:
        rm.eval(0, opt)
    finally:
        os.chdir(old)

    ours_dir = tmp_path / "ours"
    ev, _ = _our_evaluator(cfg, ds.vocab, sample_outs, grd_outs)
    ev.evaluate(None, batches, out_dir=str(ours_dir))

    for rel in (f"densecap_results/densecap-validation-{RUN_ID}.json",
                f"results/attn-gen-sent-results-validation-{RUN_ID}.json"):
        ref_bytes = (ref_dir / rel).read_bytes()
        our_bytes = (ours_dir / rel).read_bytes()
        assert ref_bytes == our_bytes, f"{rel} differs"


def test_eval_driver_gt_grounding(setup, tmp_path):
    """main.eval_grounding vs Evaluator.eval_grounding_gt: attn-gt and
    grd-gt JSONs byte-identical, cls-accuracy scalar equal
    (main.py:127-171 vs evaluator.py:276-336)."""
    cfg, ds, batches, sample_outs, grd_outs, cls_rows = setup
    rm = _load_ref_main()

    ref_dir = tmp_path / "ref"
    os.makedirs(ref_dir / "results", exist_ok=True)
    model = _RefFakeModel(sample_outs, grd_outs)
    _prime_ref_globals(rm, model, batches, ds.vocab)
    opt = _make_ref_opt(cfg, ds.vocab)
    old = os.getcwd()
    os.chdir(ref_dir)
    try:
        _, _, ref_cls_accu = rm.eval_grounding(opt)
    finally:
        os.chdir(old)

    ours_dir = tmp_path / "ours"
    ev, grd = _our_evaluator(cfg, ds.vocab, sample_outs, grd_outs)
    grd.sim_rows = [(s, p) for s, p in cls_rows]
    grd.pred_rows = [p for _, p in cls_rows]
    stats = ev.eval_grounding_gt(None, batches, out_dir=str(ours_dir))

    for rel in (f"results/attn-gt-sent-results-validation-{RUN_ID}.json",
                f"results/grd-gt-sent-results-validation-{RUN_ID}.json"):
        ref_bytes = (ref_dir / rel).read_bytes()
        our_bytes = (ours_dir / rel).read_bytes()
        assert ref_bytes == our_bytes, f"{rel} differs"
    assert abs(stats["cls_accu"] - ref_cls_accu) < 1e-12
