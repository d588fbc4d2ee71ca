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


def test_loader_parallel_matches_serial(synth):
    """The thread-pool path must yield the exact batches, in the exact
    order, that the serial path yields."""
    cfg, paths = synth
    ds = AnetDataset(cfg, split="training")
    serial = list(Loader(ds, 2, shuffle=True, seed=3, num_threads=1))
    par = list(Loader(ds, 2, shuffle=True, seed=3, num_threads=4))
    assert len(serial) == len(par)
    for a, b in zip(serial, par):
        assert a["seg_id"] == b["seg_id"]
        for k in a:
            if k in ("seg_id", "n_valid"):
                continue
            np.testing.assert_array_equal(a[k], b[k])


def test_loader_one_copy_matches_collate(synth):
    """The one-copy path (workers assembling directly into batch rows
    via get_into) must produce byte-identical batches to collating
    individual __getitem__ items."""
    cfg, paths = synth
    ds = AnetDataset(cfg, split="training")
    loader = Loader(ds, 2, shuffle=True, seed=7, num_threads=4)
    sels = loader._selections()
    loader.epoch = 0  # _selections advanced it; rewind for __iter__
    for batch, (sel, nv) in zip(loader, sels):
        ref = collate([ds[int(i)] for i in sel])
        assert batch["seg_id"] == ref["seg_id"]
        for k in ref:
            if k == "seg_id":
                continue
            np.testing.assert_array_equal(batch[k], ref[k])


def test_loader_parallel_overlaps_io():
    """With IO-bound items (simulated latency), N fetch threads must
    deliver close to N-fold throughput — the round-1 loader ran a
    single worker and would starve the chip at batch 240
    (reference uses a 20-worker DataLoader, main.py:556-562)."""
    import time

    class SlowDataset:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            time.sleep(0.02)        # simulated .npy read latency
            return {k: np.full((2,), i, np.float32) for k in
                    ("seg_feat", "input_seq", "gt_seq", "num", "ppls",
                     "gt_boxes", "mask_boxes", "ppls_feat", "frm_mask",
                     "sample_idx", "pnt_mask")} | {"seg_id": str(i)}

    ds = SlowDataset()
    t0 = time.time()
    n1 = len(list(Loader(ds, 4, shuffle=False, num_threads=1)))
    serial_t = time.time() - t0
    t0 = time.time()
    n8 = len(list(Loader(ds, 4, shuffle=False, num_threads=8)))
    par_t = time.time() - t0
    assert n1 == n8 == 6
    assert par_t < serial_t * 0.5, (serial_t, par_t)


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
    seq = np.array([[1, 2, 3, 0, 2], [2, 3, 0, 0, 0], [3, 2, 1, 2, 3]])
    out = decode_sequence(itow, seq)
    # trailing space on early-terminated rows matches the reference's
    # separator-before-stop-check quirk (misc/utils.py:97-101)
    assert out == ["a man runs ", "man runs ", "runs man a man runs"]


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


def test_prepro_lemma_json_escape_hatch(synth, tmp_path):
    """--lemma_json (prepro_dic_anet.py:94-124) must round-trip an
    externally computed CoreNLP wtol table VERBATIM into the output
    dic — including entries that contradict the rule lemmatizer (the
    reference computes lemmas with POS context the rules lack,
    reference prepro/prepro_dic_anet.py:122-126)."""
    import subprocess
    import sys

    cfg, paths = synth
    # harvest the vocab the prepro will build, then fabricate a
    # CoreNLP-style table over it with deliberate rule disagreements
    out_dic = str(tmp_path / "dic.json")
    out_cap = str(tmp_path / "cap.json")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.run(
        [sys.executable, "prepro/prepro_dic_anet.py",
         "--input_caps", paths["input_json"],
         "--split_file", paths["split_file"],
         "--output_dic", out_dic, "--output_cap", out_cap,
         "--word_count_threshold", "0"],
        capture_output=True, text=True, cwd=root)
    assert rc.returncode == 0, rc.stderr
    with open(out_dic) as f:
        vocab_words = list(json.load(f)["ix_to_word"].values())

    corenlp_wtol = {w: (w if i % 3 else w + "_corenlp")
                    for i, w in enumerate(vocab_words) if w != "UNK"}
    lemma_file = str(tmp_path / "wtol.json")
    with open(lemma_file, "w") as f:
        json.dump(corenlp_wtol, f)

    out_dic2 = str(tmp_path / "dic2.json")
    rc = subprocess.run(
        [sys.executable, "prepro/prepro_dic_anet.py",
         "--input_caps", paths["input_json"],
         "--split_file", paths["split_file"],
         "--output_dic", out_dic2, "--output_cap",
         str(tmp_path / "cap2.json"),
         "--word_count_threshold", "0",
         "--lemma_json", lemma_file],
        capture_output=True, text=True, cwd=root)
    assert rc.returncode == 0, rc.stderr
    with open(out_dic2) as f:
        dic = json.load(f)
    assert dic["wtol"] == corenlp_wtol
    # and the table loads through the vocab layer used by eval
    vt = VocabTables.from_file(out_dic2)
    assert vt.wtol == corenlp_wtol


# CoreNLP 3.9 lemma outputs for common ANet-caption words (noun/verb
# POS as they appear in captions), harvested by convention — the gold
# set the rule lemmatizer is measured against.
_CORENLP_GOLD = {
    "dogs": "dog", "men": "man", "women": "woman", "children": "child",
    "people": "person", "glasses": "glass", "ladies": "lady",
    "knives": "knife", "leaves": "leaf", "shelves": "shelf",
    "buses": "bus", "boxes": "box", "dishes": "dish",
    "watches": "watch", "plays": "play", "played": "play",
    "playing": "play", "walks": "walk", "walked": "walk",
    "walking": "walk", "jumps": "jump", "jumped": "jump",
    "jumping": "jump", "runs": "run", "running": "run", "ran": "run",
    "throws": "throw", "throwing": "throw", "threw": "throw",
    "catches": "catch", "holds": "hold", "holding": "hold",
    "held": "hold", "stands": "stand", "standing": "stand",
    "is": "be", "are": "be", "was": "be", "were": "be", "has": "have",
    "gets": "get", "getting": "get", "goes": "go", "going": "go",
    "went": "go", "talks": "talk", "talking": "talk", "smiles":
    "smile", "cars": "car", "tables": "table", "balls": "ball",
}


def test_rule_lemmatizer_disagreement_quantified():
    """Quantifies the rule lemmatizer's drift from CoreNLP on common
    caption vocabulary: >= 90% exact agreement, so the --lemma_json
    escape hatch is a correctness refinement, not a necessity."""
    from prepro.prepro_dic_anet import lemmatize

    wrong = {w: (lemmatize(w), gold)
             for w, gold in _CORENLP_GOLD.items() if lemmatize(w) != gold}
    agreement = 1 - len(wrong) / len(_CORENLP_GOLD)
    assert agreement >= 0.9, (agreement, wrong)
