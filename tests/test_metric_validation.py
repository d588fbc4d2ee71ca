"""Metric-stack validation against independent implementations.

Round-1 shipped BLEU/CIDEr/METEOR with no external cross-check (the
reference shells into coco-caption, main.py:420-443, and CIDEr selects
the best checkpoint, main.py:703-707).  These tests pin:

  * our corpus BLEU against nltk's corpus_bleu (same algorithm family:
    clipped modified precision, closest-ref-length brevity penalty) on
    a 50-sentence corpus with strictly positive n-gram counts (where
    no smoothing path is taken and the algorithms must agree exactly);
  * our CIDEr-D against hand-derivable closed-form cases (identity
    candidate -> 10.0, disjoint candidate -> 0.0, tf-idf asymmetry);
  * our pure-Python METEOR fallback against nltk's METEOR (canonical
    exact+stem+WordNet alignment) with a documented drift bound;
  * the PTB tokenizer against coco-caption PTBTokenizer behavior
    (contraction splitting + punctuation removal + lowercase);
  * the SPICE jar wrapper's discovery and scoring plumbing with a
    mocked java invocation (no Java in this image).
"""

import json
import math
import os
import random

import numpy as np
import pytest

from grounded_video_description_tpu.evalmetrics.bleu import compute_bleu
from grounded_video_description_tpu.evalmetrics.cider import compute_cider
from grounded_video_description_tpu.evalmetrics.meteor import (
    compute_meteor, compute_meteor_fallback)
from grounded_video_description_tpu.evalmetrics.tokenizer import (
    ptb_tokenize)


WORDS = ("a the man woman dog ball park runs walks throws catches red "
         "big small quickly slowly street grass two one jumps").split()


def corpus(n=50, seed=4, n_refs=2):
    """Synthetic corpus: candidates share most tokens with their refs
    so every 4-gram precision is positive (no smoothing ambiguity)."""
    rng = random.Random(seed)
    gts, res = {}, {}
    for i in range(n):
        L = rng.randint(6, 12)
        base = [rng.choice(WORDS) for _ in range(L)]
        refs = []
        for _ in range(n_refs):
            r = list(base)
            if rng.random() < 0.5:
                r[rng.randrange(L)] = rng.choice(WORDS)
            refs.append(" ".join(r))
        cand = list(base)
        if rng.random() < 0.5:
            cand[rng.randrange(L)] = rng.choice(WORDS)
        # guarantee shared 4-grams: keep a verbatim run of >= 5 tokens
        gts[str(i)] = refs + [" ".join(base)]
        res[str(i)] = [" ".join(cand)]
    return gts, res


def test_bleu_matches_nltk_exactly():
    from nltk.translate.bleu_score import corpus_bleu

    gts, res = corpus()
    ours = compute_bleu(gts, res)
    ids = list(res.keys())
    refs_tok = [[r.split() for r in gts[i]] for i in ids]
    cands_tok = [res[i][0].split() for i in ids]
    for n in range(1, 5):
        w = tuple([1.0 / n] * n)
        ref = corpus_bleu(refs_tok, cands_tok, weights=w)
        assert math.isclose(ours[n - 1], ref, rel_tol=1e-9, abs_tol=1e-12), \
            (n, ours[n - 1], ref)


def test_cider_identity_scores_ten():
    """A candidate identical to its only reference scores exactly 10
    (cosine 1 at every n, zero length penalty, x10 scaling) whenever
    idf weights are non-degenerate."""
    gts = {"0": ["a man throws a ball"], "1": ["the dog runs fast"]}
    res = {"0": ["a man throws a ball"], "1": ["the dog runs fast"]}
    assert math.isclose(compute_cider(gts, res), 10.0, rel_tol=1e-9)


def test_cider_disjoint_scores_zero():
    gts = {"0": ["a man throws a ball"], "1": ["the dog runs fast"]}
    res = {"0": ["purple elephants sing loudly"],
           "1": ["green ideas sleep furiously"]}
    assert compute_cider(gts, res) == 0.0


def test_cider_hand_computed_unigram_case():
    """Closed-form check of the tf-idf cosine for a 1-gram-only overlap.

    Corpus: two items; all words appear in exactly one reference
    document, so idf = log(2) for every n-gram.  Candidate 0 shares
    exactly the unigram 'man' with its reference (both length 2 -> no
    length penalty).  Then

      sim_1 = (w_man * w_man) / (|cand|_1 * |ref|_1)  with all
      unigram weights equal (tf=1, same idf) -> 1/2 x 1/sqrt(2)... =
      computed below symbolically; n>=2 grams contribute 0.
    """
    gts = {"0": ["man walks"], "1": ["dog runs"]}
    res = {"0": ["man jumps"], "1": ["dog runs"]}
    idf = math.log(2.0)
    # Every word/bigram appears in exactly one of the 2 ref docs ->
    # idf = log 2 ('jumps' never appears: df clamped to 1 -> same idf).
    # item 0: unigram overlap {man}: min(idf,idf)*idf / (sqrt(2)idf)^2
    sim1 = idf * idf / (math.sqrt(2) * idf * math.sqrt(2) * idf)  # 1/2
    # bigrams disjoint -> 0; the 2-token sentences have NO 3/4-grams,
    # which contribute 0 (coco cider_scorer convention: empty vectors
    # and zero norms -> term skipped)
    item0 = 10.0 * (sim1 + 0 + 0 + 0) / 4.0                       # 1.25
    # item 1: identical pair -> sim_1 = sim_2 = 1, sim_3 = sim_4 = 0
    item1 = 10.0 * (1.0 + 1.0 + 0 + 0) / 4.0                      # 5.0
    expected = (item0 + item1) / 2.0                              # 3.125
    assert math.isclose(compute_cider(gts, res), expected, rel_tol=1e-9)


def test_meteor_uses_nltk_and_fallback_drift_bounded():
    """compute_meteor routes through nltk's canonical METEOR machinery
    (exact + Porter stem; WordNet synonyms when the corpus is
    installed, an empty shim otherwise), and the zero-dependency
    fallback tracks it within a documented bound."""
    from nltk.translate.meteor_score import meteor_score

    from grounded_video_description_tpu.evalmetrics.meteor import (
        _nltk_meteor)

    found = _nltk_meteor()
    assert found is not None            # nltk is baked into this image
    scorer, kwargs = found

    gts, res = corpus(n=30, seed=9)
    ours = compute_meteor(gts, res)
    ids = list(res.keys())
    direct = np.mean([
        scorer([r.split() for r in gts[i]], res[i][0].split(), **kwargs)
        for i in ids])
    assert math.isclose(ours, float(direct), rel_tol=1e-9)

    # the no-dependency fallback approximates the canonical scorer
    # (suffix stemmer vs Porter, greedy vs optimal chunk alignment);
    # drift bound on in-vocabulary captions
    fb = compute_meteor_fallback(gts, res)
    assert abs(fb - ours) < 0.08, (fb, ours)


def test_ptb_tokenizer_matches_coco_behavior():
    # contraction splitting + punctuation removal + lowercase,
    # exactly what coco-caption's PTBTokenizer emits for these inputs
    cases = {
        "A man doesn't run, he walks.":
            ["a", "man", "does", "n't", "run", "he", "walks"],
        "It's the dog's ball!":
            ["it", "'s", "the", "dog", "'s", "ball"],
        "Wait... what?": ["wait", "what"],
        "They're playing (outside) today":
            ["they", "'re", "playing", "outside", "today"],
        "I'll go; you'd stay":
            ["i", "'ll", "go", "you", "'d", "stay"],
        "scores 3.5 points": ["scores", "3.5", "points"],
    }
    for sent, want in cases.items():
        assert ptb_tokenize(sent) == want, (sent, ptb_tokenize(sent))


def test_spice_wrapper_discovery_and_scoring(tmp_path, monkeypatch):
    from grounded_video_description_tpu.evalmetrics import spice as sp

    # no jar anywhere -> None
    monkeypatch.delenv("SPICE_JAR", raising=False)
    assert sp.make_spice_fn(data_path=str(tmp_path)) is None

    # jar present + fake java: the wrapper must write the coco-style
    # input records, invoke the jar, and average the All/f scores
    jar = tmp_path / "spice" / "spice-1.0.jar"
    jar.parent.mkdir(parents=True)
    jar.write_bytes(b"fake")

    calls = {}

    def fake_run(cmd, check, timeout):
        calls["cmd"] = cmd
        in_file = cmd[cmd.index("-jar") + 3]
        out_file = cmd[cmd.index("-out") + 1]
        with open(in_file) as f:
            records = json.load(f)
        results = [{"image_id": r["image_id"],
                    "scores": {"All": {"f": 0.25}}} for r in records]
        with open(out_file, "w") as f:
            json.dump(results, f)

    monkeypatch.setattr(sp.subprocess, "run", fake_run)
    monkeypatch.setattr(sp.shutil, "which", lambda j: "/usr/bin/java")
    fn = sp.make_spice_fn(data_path=str(tmp_path))
    assert fn is not None
    score = fn({"0": ["a man"], "1": ["a dog"]},
               {"0": ["a man"], "1": ["a cat"]})
    assert math.isclose(score, 0.25)
    assert "-subset" in calls["cmd"]
