"""METEOR (Banerjee & Lavie) — pure-Python approximation.

The reference scores METEOR through the coco-caption Java jar
(README.md:56); this environment has no Java dependency, so we
implement the original METEOR formulation with an exact + suffix-stem
matcher (no WordNet synonymy): unigram alignment maximizing matches and
minimizing chunks, Fmean = 10PR/(R+9P), fragmentation penalty
0.5 * (chunks/matches)^3.  Scores track Java METEOR closely on
in-vocabulary captions; treat as an approximation when comparing
against externally published numbers.
"""

from __future__ import annotations

from typing import Dict, List

from grounded_video_description_tpu.evalmetrics.tokenizer import tokenize


def _stem(w: str) -> str:
    for suf in ("ing", "ed", "es", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: len(w) - len(suf)]
    return w


def _align(cand: List[str], ref: List[str]):
    """Greedy left-to-right alignment, exact matches first then stems.
    Returns (n_matches, n_chunks)."""
    used_ref = [False] * len(ref)
    align = [-1] * len(cand)
    for stage in (0, 1):
        for i, w in enumerate(cand):
            if align[i] >= 0:
                continue
            for j, r in enumerate(ref):
                if used_ref[j]:
                    continue
                ok = (w == r) if stage == 0 else (_stem(w) == _stem(r))
                if ok:
                    align[i] = j
                    used_ref[j] = True
                    break
    matches = sum(1 for a in align if a >= 0)
    # count chunks: maximal runs of contiguous (i, j) pairs
    chunks = 0
    prev_j = None
    for a in align:
        if a < 0:
            prev_j = None
            continue
        if prev_j is None or a != prev_j + 1:
            chunks += 1
        prev_j = a
    return matches, chunks


def _score_pair(cand: List[str], ref: List[str]) -> float:
    m, chunks = _align(cand, ref)
    if m == 0:
        return 0.0
    p = m / len(cand)
    r = m / len(ref)
    fmean = 10.0 * p * r / (r + 9.0 * p)
    penalty = 0.5 * (chunks / m) ** 3
    return fmean * (1.0 - penalty)


def compute_meteor(gts: Dict[str, List[str]],
                   res: Dict[str, List[str]]) -> float:
    total = 0.0
    for i in res:
        cand = tokenize(res[i][0])
        if not cand:
            continue
        total += max(_score_pair(cand, tokenize(r)) for r in gts[i])
    return total / max(len(res), 1)
