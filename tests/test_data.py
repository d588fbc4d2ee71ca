"""Dataset ingest + prepro + vocab tests over synthetic on-disk files."""

import json
import os

import numpy as np
import pytest

from grounded_video_description_tpu.config import tiny_test_config
from grounded_video_description_tpu.data.dataset import (
    AnetDataset, Loader, collate)
from grounded_video_description_tpu.data.synthetic_files import (
    write_synthetic_dataset)
from grounded_video_description_tpu.data.vocab import (
    GloVe, VocabTables, decode_sequence)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    cfg = tiny_test_config()
    paths = write_synthetic_dataset(str(root), cfg, n_train=3, n_val=2)
    cfg = cfg.replace(**{k: v for k, v in paths.items()
                         if k != "densecap_references"})
    return cfg, paths


def test_dataset_contract(synth):
    cfg, paths = synth
    ds = AnetDataset(cfg, split="training")
    assert len(ds) == 6   # 3 vids x 2 segs
    item = ds[0]
    R, K, L = cfg.max_proposal, cfg.max_gt_box, cfg.seq_length
    assert item["seg_feat"].shape == (cfg.t_attn_size, cfg.fc_feat_size)
    assert item["input_seq"].shape == (cfg.seq_per_img, L + 1, 4)
    assert item["gt_seq"].shape == (10, L)
    assert item["num"].shape == (7,)
    assert item["ppls"].shape == (R, 7)
    assert item["gt_boxes"].shape == (K, 6)
    assert item["mask_boxes"].shape == (cfg.seq_per_img, K, L + 1)
    assert item["ppls_feat"].shape == (R, cfg.att_feat_size)
    assert item["frm_mask"].shape == (R, K)
    assert item["sample_idx"].shape == (2,)
    assert item["pnt_mask"].shape == (R + 1,)
    assert not item["pnt_mask"][0]          # legacy column always open
    # input_seq BOS row zero
    assert np.all(item["input_seq"][:, 0] == 0)
    # visual words carry the +vocab_size offset
    vis = item["input_seq"][0, 1:, 0]
    n_box = int(item["num"][2])
    assert (vis > ds.vocab.vocab_size).sum() == n_box
    # frame mask consistent with proposals/boxes frames
    nb = int(item["num"][2])
    fm = item["frm_mask"][:, :nb]
    same = item["ppls"][:, 4:5] == item["gt_boxes"][None, :nb, 4].reshape(1, -1)
    assert np.array_equal(~fm, same)


def test_loader_batches_and_threading(synth):
    cfg, paths = synth
    ds = AnetDataset(cfg, split="training")
    loader = Loader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["seg_feat"].shape[0] == 2
    assert len(b["seg_id"]) == 2
    # epoch reshuffles
    order1 = [tuple(b["seg_id"]) for b in batches]
    order2 = [tuple(b["seg_id"]) for b in Loader(ds, 2, shuffle=True,
                                                 seed=1)]
    assert order1 == order2  # same seed+epoch0 -> same order


def test_loader_pad_last(synth):
    cfg, paths = synth
    ds = AnetDataset(cfg, split="validation")   # 2 vids x 2 segs = 4
    loader = Loader(ds, batch_size=3, shuffle=False, drop_last=False,
                    pad_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["n_valid"] == 3
    assert batches[1]["n_valid"] == 1
    # padded rows repeat the last valid item; shapes stay static
    assert batches[1]["seg_feat"].shape[0] == 3
    assert np.array_equal(batches[1]["seg_feat"][1],
                          batches[1]["seg_feat"][0])


def test_decode_sequence():
    itow = {"1": "a", "2": "man", "3": "runs"}
    seq = np.array([[1, 2, 3, 0, 2], [2, 3, 0, 0, 0]])
    out = decode_sequence(itow, seq)
    assert out == ["a man runs", "man runs"]


def test_glove_fallback_deterministic(tmp_path):
    g = GloVe(None, dim=8)
    v1, v2 = g.vec("zebra"), g.vec("zebra")
    assert np.allclose(v1, v2)
    assert not np.allclose(g.vec("zebra"), g.vec("horse"))
    # phrase averaging
    p = g.phrase_vec("traffic light")
    assert np.allclose(p, (g.vec("traffic") + g.vec("light")) / 2)


def test_prepro_builds_loadable_dic(synth, tmp_path):
    import subprocess
    import sys

    cfg, paths = synth
    out_dic = str(tmp_path / "dic.json")
    out_cap = str(tmp_path / "cap.json")
    rc = subprocess.run(
        [sys.executable, "prepro/prepro_dic_anet.py",
         "--input_caps", paths["input_json"],
         "--split_file", paths["split_file"],
         "--output_dic", out_dic, "--output_cap", out_cap,
         "--word_count_threshold", "0"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert rc.returncode == 0, rc.stderr
    vt = VocabTables.from_file(out_dic)
    assert vt.vocab_size > 10
    assert "UNK" in vt.wtoi
    assert vt.detect_size > 0
    with open(out_cap) as f:
        caps = json.load(f)
    assert len(caps) == 5


def test_lemmatizer_rules():
    from prepro.prepro_dic_anet import lemmatize
    assert lemmatize("dogs") == "dog"
    assert lemmatize("running") == "run"
    assert lemmatize("children") == "child"
    assert lemmatize("ladies") == "lady"
    assert lemmatize("glasses") == "glass"
    assert lemmatize("men") == "man"
