"""Language + grounding metric tests against hand-computed values."""

import json

import numpy as np
import pytest

from grounded_video_description_tpu.evalmetrics import (
    compute_bleu, compute_cider, compute_meteor, DensecapEvaluator,
    GroundingEvaluator)
from grounded_video_description_tpu.evalmetrics.densecap import segment_tiou
from grounded_video_description_tpu.evalmetrics.grounding import box_iou


def test_bleu_perfect_match():
    gts = {"0": ["a man is running fast"]}
    res = {"0": ["a man is running fast"]}
    bleu = compute_bleu(gts, res)
    assert all(np.isclose(b, 1.0) for b in bleu)


def test_bleu_partial():
    gts = {"0": ["the cat sat on the mat"]}
    res = {"0": ["the cat on the mat"]}  # 5 words, all unigrams present
    bleu = compute_bleu(gts, res)
    # p1 = 5/5 but brevity penalty = exp(1 - 6/5)
    assert bleu[0] < 1.0
    assert bleu[0] == pytest.approx(np.exp(1 - 6 / 5), abs=1e-6)


def test_cider_identity_beats_mismatch():
    gts = {"0": ["a dog plays in the park"],
           "1": ["a man rides a horse"]}
    res_good = {"0": ["a dog plays in the park"],
                "1": ["a man rides a horse"]}
    res_bad = {"0": ["a man rides a horse"],
               "1": ["a dog plays in the park"]}
    assert compute_cider(gts, res_good) > compute_cider(gts, res_bad)
    assert compute_cider(gts, res_good) > 5.0   # near 10 for exact match


def test_meteor_ordering():
    gts = {"0": ["the quick brown fox jumps"]}
    perfect = compute_meteor(gts, {"0": ["the quick brown fox jumps"]})
    partial = compute_meteor(gts, {"0": ["the brown fox"]})
    junk = compute_meteor(gts, {"0": ["hello world zzz"]})
    assert perfect > partial > junk
    assert junk == 0.0


def test_segment_tiou():
    assert segment_tiou([0, 10], [0, 10]) == 1.0
    assert segment_tiou([0, 10], [5, 15]) == pytest.approx(5 / 15)
    assert segment_tiou([0, 1], [5, 6]) == 0.0


def test_box_iou():
    assert box_iou([0, 0, 9, 9], [0, 0, 9, 9]) == 1.0
    assert box_iou([0, 0, 9, 9], [0, 0, 4, 9]) == pytest.approx(0.5)


@pytest.fixture
def densecap_files(tmp_path):
    gt = {
        "v_abc": {"duration": 20.0,
                  "timestamps": [[0.0, 10.0], [10.0, 20.0]],
                  "sentences": ["a man is cooking", "he eats the food"]},
    }
    pred = {"results": {
        "v_abc": [
            {"sentence": "a man is cooking", "timestamp": [0.0, 9.0]},
            {"sentence": "he eats the food", "timestamp": [11.0, 20.0]},
        ]}}
    gt_f = tmp_path / "gt.json"
    pred_f = tmp_path / "pred.json"
    gt_f.write_text(json.dumps(gt))
    pred_f.write_text(json.dumps(pred))
    return str(gt_f), str(pred_f)


def test_densecap_evaluator_perfect(densecap_files):
    gt_f, pred_f = densecap_files
    ev = DensecapEvaluator([gt_f], pred_f, tious=[0.3, 0.5])
    scores = ev.evaluate()
    assert np.mean(scores["CIDEr"]) > 5.0
    assert np.mean(scores["Bleu_1"]) > 0.99
    assert len(scores["CIDEr"]) == 2


@pytest.fixture
def grounding_files(tmp_path):
    ref = {"annotations": {
        "v_abc": {"duration": 20.0, "segments": {
            "0": {"tokens": ["a", "man", "with", "a", "dog"],
                  "process_clss": ["man", "dog"],
                  "frame_ind": [2, 3],
                  "process_bnd_box": [[10, 10, 100, 200],
                                      [200, 50, 300, 150]],
                  "process_idx": [1, 4]},
        }}}}
    split = {"validation": ["v_abc"]}
    # submission: man box correct on frame 2, dog box wrong
    boxes_man = [[0, 0, 1, 1]] * 10
    boxes_man[2] = [12, 12, 98, 198]
    boxes_dog = [[0, 0, 1, 1]] * 10
    sub = {"results": {"v_abc": {"0": {
        "clss": ["man", "dog"], "idx_in_sent": [1, 4],
        "bbox_for_all_frames": [boxes_man, boxes_dog]}}},
        "eval_mode": "GT"}
    ref_f = tmp_path / "ref.json"
    split_f = tmp_path / "split.json"
    sub_f = tmp_path / "sub.json"
    ref_f.write_text(json.dumps(ref))
    split_f.write_text(json.dumps(split))
    sub_f.write_text(json.dumps(sub))
    return str(ref_f), str(sub_f), str(split_f)


def test_gt_grd_eval(grounding_files):
    ref_f, sub_f, split_f = grounding_files
    ev = GroundingEvaluator(ref_f, sub_f, split_f, ["validation"])
    # man hit (IoU high), dog miss -> mean over 2 classes = 0.5
    assert ev.gt_grd_eval() == pytest.approx(0.5)


def test_gen_grd_eval_modes(grounding_files):
    ref_f, sub_f, split_f = grounding_files
    ev = GroundingEvaluator(ref_f, sub_f, split_f, ["validation"])
    p, r, f1, ps, rs, fs = ev.grd_eval(mode="all")
    # both classes predicted; man localized, dog not:
    # per-class precision = (1 + 0)/2 = 0.5; recall same
    assert p == pytest.approx(0.5)
    assert r == pytest.approx(0.5)
    p2, r2, f2, *_ = ev.grd_eval(mode="loc")
    assert p2 == pytest.approx(0.5)


def test_gen_grd_eval_gt_empty_segment_counts_false_positives(
        grounding_files, tmp_path):
    """Pins derivation note #5 (grounding.py docstring): predictions
    in a segment with zero GT annotations are false positives in
    'all' mode (per-class precision denominator + a 0 per-sentence
    precision entry), and are ignored in 'loc' mode."""
    ref_f, sub_f, split_f = grounding_files
    sub = json.loads(open(sub_f).read())
    # segment "1" exists in the submission but not in the reference:
    # one hallucinated "man" prediction
    sub["results"]["v_abc"]["1"] = {
        "clss": ["man"], "idx_in_sent": [0],
        "bbox_for_all_frames": [[[0, 0, 1, 1]] * 10]}
    sub2_f = tmp_path / "sub_gt_empty.json"
    sub2_f.write_text(json.dumps(sub))

    base = GroundingEvaluator(ref_f, sub_f, split_f, ["validation"])
    ev = GroundingEvaluator(ref_f, str(sub2_f), split_f, ["validation"])

    # 'all': man precision drops 1/1 -> 1/2, dog stays 0 -> per-class
    # precision (0.5 + 0)/2 = 0.25; recall untouched (GT unchanged)
    p, r, f1, ps, rs, fs = ev.grd_eval(mode="all")
    assert p == pytest.approx(0.25)
    assert r == pytest.approx(base.grd_eval(mode="all")[1])
    # per-sentence: original segment (p=0.5) + GT-empty segment (p=0)
    assert ps == pytest.approx(0.25)
    # recall/F1 get no entry for the GT-empty segment
    assert rs == pytest.approx(base.grd_eval(mode="all")[4])

    # 'loc' is unaffected: only GT classes are scored
    assert ev.grd_eval(mode="loc") == base.grd_eval(mode="loc")
