"""Skip-guarded fidelity tests against the reference Java metric
stack (Meteor-1.5 and SPICE jars, README.md:56 via the coco-caption
submodule).

This image ships no JRE, so these tests auto-skip here; in any
Java-equipped environment (jar paths via $METEOR_JAR / $SPICE_JAR or
the data/ layout) they run automatically and validate:

  * our METEOR scorer family against the Meteor-1.5 jar on a small
    fixture (bounded drift — nltk METEOR and Meteor-1.5 are different
    implementation families, documented in BASELINE.md),
  * the SPICE subprocess wrapper end-to-end against the real jar
    (identical captions score high, disjoint captions low).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

HAVE_JAVA = shutil.which("java") is not None


def _meteor_jar():
    for c in (os.environ.get("METEOR_JAR"),
              os.path.join("data", "meteor", "meteor-1.5.jar")):
        if c and os.path.isfile(c):
            return c
    return None


FIXTURE = [
    # (references, hypothesis)
    (["a man is playing a guitar on stage"],
     "a man plays a guitar on the stage"),
    (["two dogs run across the park", "dogs running in a park"],
     "two dogs are running through a park"),
    (["a woman pours water into a glass"],
     "someone pours juice into a cup"),
    (["the cat sleeps on the sofa"],
     "a completely unrelated sentence about cars"),
]


@pytest.mark.skipif(not HAVE_JAVA, reason="no java runtime in image")
@pytest.mark.skipif(_meteor_jar() is None,
                    reason="meteor-1.5.jar not found "
                           "($METEOR_JAR or data/meteor/)")
def test_meteor_vs_jar_bounded_drift():
    """Drive the Meteor-1.5 jar over its stdio protocol (the
    coco-caption meteor.py wire format: SCORE/EVAL lines) and bound
    our scorer's drift against it on the fixture pairs."""
    from grounded_video_description_tpu.evalmetrics.meteor import (
        compute_meteor)

    jar = _meteor_jar()
    proc = subprocess.Popen(
        ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
         "-norm"],
        cwd=os.path.dirname(os.path.abspath(jar)),
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True)

    jar_scores = []
    try:
        eval_lines = []
        for refs, hyp in FIXTURE:
            stats = []
            # the jar scores one (ref, hyp) pair per SCORE line; the
            # coco-caption wrapper joins multiple refs with '|||'
            score_line = "SCORE ||| " + " ||| ".join(refs + [hyp])
            proc.stdin.write(score_line + "\n")
            proc.stdin.flush()
            stats = proc.stdout.readline().strip()
            eval_lines.append("EVAL ||| " + stats)
        for line in eval_lines:
            proc.stdin.write(line + "\n")
            proc.stdin.flush()
            jar_scores.append(float(proc.stdout.readline().strip()))
    finally:
        proc.stdin.close()
        proc.wait(timeout=60)

    for (refs, hyp), jar_s in zip(FIXTURE, jar_scores):
        ours = compute_meteor({"0": refs}, {"0": [hyp]})
        # different families (Meteor-1.5: paraphrase tables, tuned
        # weights; nltk: exact+stem+wordnet) — bound, don't equate
        assert abs(ours - jar_s) < 0.2, (refs, hyp, ours, jar_s)
    # ordering sanity: the clearly-unrelated pair must score lowest
    # under both scorers
    ours_all = [compute_meteor({"0": r}, {"0": [h]}) for r, h in FIXTURE]
    assert jar_scores.index(min(jar_scores)) == 3
    assert ours_all.index(min(ours_all)) == 3


@pytest.mark.skipif(not HAVE_JAVA, reason="no java runtime in image")
def test_spice_wrapper_with_real_jar():
    """End-to-end SPICE subprocess run (evalmetrics/spice.py) against
    the real jar when discoverable."""
    from grounded_video_description_tpu.evalmetrics.spice import (
        find_spice_jar, make_spice_fn)

    if find_spice_jar() is None:
        pytest.skip("spice-1.0.jar not found ($SPICE_JAR or data/spice/)")
    fn = make_spice_fn()
    assert fn is not None
    gts = {"0": ["a man is playing a guitar"],
           "1": ["a dog runs in the park"]}
    same = fn(gts, {"0": ["a man is playing a guitar"],
                    "1": ["a dog runs in the park"]})
    diff = fn(gts, {"0": ["completely unrelated text"],
                    "1": ["nothing in common here"]})
    assert 0.0 <= diff < same <= 1.0


def test_spice_fn_absent_without_java():
    """Without a JRE the factory must return None — the evaluator then
    reports SPICE 0.0 like coco-caption without the jar."""
    from grounded_video_description_tpu.evalmetrics.spice import (
        make_spice_fn)

    if HAVE_JAVA:
        pytest.skip("java present; covered by the jar tests")
    assert make_spice_fn() is None
