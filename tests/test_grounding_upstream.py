"""Skip-guarded differential test against the UPSTREAM grounding
evaluator (tools/anet_entities/scripts/eval_grd_anet_entities.py).

The anet_entities submodule is empty in this checkout, so the
semantics in evalmetrics/grounding.py are derived from the driver
call sites (/root/reference/main.py:174-184, 454-461) and the paper,
with each self-derived choice marked in its module docstring.  These
tests close the loop wherever the upstream script IS available (a
checkout with submodules initialized, or $ANET_ENTITIES_SCRIPTS): the
same synthetic reference/submission/split files are scored by both
evaluators and the outputs compared.  Auto-skips here.

Fixture cases target exactly the self-derived choices:
  * per-class averaging over classes with GT (gt_grd_eval),
  * the classes-union P/R/F1 denominator incl. a hallucinated class
    ('all' mode),
  * 'loc' mode skipping GT classes the captioner never predicted,
  * list-valued process_clss/process_idx aliases per box.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest


def _find_upstream():
    cands = [
        os.environ.get("ANET_ENTITIES_SCRIPTS"),
        "/root/reference/tools/anet_entities/scripts",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "anet_entities",
            "scripts"),
    ]
    for d in cands:
        if d and os.path.isfile(
                os.path.join(d, "eval_grd_anet_entities.py")):
            return d
    return None


UPSTREAM_DIR = _find_upstream()

pytestmark = pytest.mark.skipif(
    UPSTREAM_DIR is None,
    reason="upstream eval_grd_anet_entities.py not present (empty "
           "submodule); set $ANET_ENTITIES_SCRIPTS to enable")


def _load_upstream():
    path = os.path.join(UPSTREAM_DIR, "eval_grd_anet_entities.py")
    spec = importlib.util.spec_from_file_location(
        "eval_grd_anet_entities", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["eval_grd_anet_entities"] = mod
    spec.loader.exec_module(mod)
    return mod.ANetGrdEval


@pytest.fixture
def files(tmp_path):
    """Two videos / three segments covering the derived edge cases."""
    ref = {"annotations": {
        "v_a": {"duration": 20.0, "segments": {
            "0": {"tokens": "a man with a dog and a ball".split(),
                  "process_clss": ["man", "dog", "ball"],
                  "frame_ind": [2, 3, 7],
                  "process_bnd_box": [[10, 10, 100, 200],
                                      [200, 50, 300, 150],
                                      [5, 5, 50, 50]],
                  "process_idx": [1, 4, 7]},
            "1": {"tokens": "the dog runs".split(),
                  # list-valued aliases: one box annotated with two
                  # classes / word positions
                  "process_clss": [["dog", "man"]],
                  "frame_ind": [5],
                  "process_bnd_box": [[20, 20, 120, 220]],
                  "process_idx": [[1, 0]]},
        }},
        "v_b": {"duration": 15.0, "segments": {
            "0": {"tokens": "a car on the road".split(),
                  "process_clss": ["car"],
                  "frame_ind": [0],
                  "process_bnd_box": [[0, 0, 300, 300]],
                  "process_idx": [1]},
        }},
    }}
    split = {"validation": ["v_a", "v_b"]}

    def frames(hit_frame=None, box=None):
        out = [[0, 0, 1, 1]] * 10
        if hit_frame is not None:
            out = list(out)
            out[hit_frame] = box
        return out

    # v_a/0: man localized, dog predicted but mislocalized, ball not
    # predicted (recall miss), plus a hallucinated 'cat' (precision
    # denominator in 'all', skipped in GT eval).
    # v_a/1: dog localized on the alias box.
    # v_b/0: no submission entry at all (entirely missed segment).
    sub = {"results": {
        "v_a": {
            "0": {"clss": ["man", "dog", "cat"],
                  "idx_in_sent": [1, 4, 2],
                  "bbox_for_all_frames": [
                      frames(2, [12, 12, 98, 198]),
                      frames(3, [0, 0, 10, 10]),
                      frames(5, [50, 50, 60, 60])]},
            "1": {"clss": ["dog"], "idx_in_sent": [1],
                  "bbox_for_all_frames": [
                      frames(5, [22, 18, 118, 222])]},
        },
    }, "eval_mode": "GT", "external_data": {"used": True, "details": ""}}

    ref_f = tmp_path / "ref.json"
    split_f = tmp_path / "split.json"
    sub_f = tmp_path / "sub.json"
    ref_f.write_text(json.dumps(ref))
    split_f.write_text(json.dumps(split))
    sub_f.write_text(json.dumps(sub))
    return str(ref_f), str(sub_f), str(split_f)


def _both(files):
    from grounded_video_description_tpu.evalmetrics import (
        GroundingEvaluator)

    ref_f, sub_f, split_f = files
    ours = GroundingEvaluator(ref_f, sub_f, split_f, ["validation"],
                              iou_thresh=0.5)
    Up = _load_upstream()
    theirs = Up(reference_file=ref_f, submission_file=sub_f,
                split_file=split_f, val_split=["validation"],
                iou_thresh=0.5)
    return ours, theirs


def test_gt_grd_eval_matches_upstream(files):
    ours, theirs = _both(files)
    assert ours.gt_grd_eval() == pytest.approx(
        theirs.gt_grd_eval(), abs=1e-6)


def test_grd_eval_all_matches_upstream(files):
    ours, theirs = _both(files)
    for a, b in zip(ours.grd_eval(mode="all"),
                    theirs.grd_eval(mode="all")):
        assert a == pytest.approx(b, abs=1e-6)


def test_grd_eval_loc_matches_upstream(files):
    ours, theirs = _both(files)
    for a, b in zip(ours.grd_eval(mode="loc"),
                    theirs.grd_eval(mode="loc")):
        assert a == pytest.approx(b, abs=1e-6)
