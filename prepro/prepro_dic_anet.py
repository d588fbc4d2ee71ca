"""Vocabulary preprocessing (prepro_dic_anet.py equivalent).

Capability contract from prepro/prepro_dic_anet.py:27-151: build the
word vocabulary from the training+val captions with a count threshold
(rare words -> UNK), a word->lemma table, the word->detection-class
map, and emit `dic_anet.json` + `cap_anet.json` in the exact format
`misc/dataloader_anet.py:49-60` consumes.

The reference shells into Stanford CoreNLP (Java) for lemmas
(prepro_dic_anet.py:21-25, 122-126); this implementation uses a
self-contained rule lemmatizer (irregular table + suffix rules) so the
pipeline has no Java dependency.  Pass --lemma_json to substitute an
externally computed lemma table when exact CoreNLP parity is needed.
"""

from __future__ import annotations

import argparse
import json
from collections import Counter

_IRREGULAR = {
    "men": "man", "women": "woman", "children": "child", "people":
    "person", "feet": "foot", "teeth": "tooth", "mice": "mouse",
    "geese": "goose", "is": "be", "are": "be", "was": "be", "were":
    "be", "been": "be", "being": "be", "has": "have", "had": "have",
    "having": "have", "does": "do", "did": "do", "doing": "do",
    "goes": "go", "went": "go", "gone": "go", "going": "go", "made":
    "make", "making": "make", "took": "take", "taken": "take",
    "taking": "take", "got": "get", "getting": "get", "ran": "run",
    "running": "run", "sat": "sit", "sitting": "sit", "stood":
    "stand", "standing": "stand", "held": "hold", "holding": "hold",
    "threw": "throw", "thrown": "throw", "throwing": "throw", "knives":
    "knife", "leaves": "leaf", "shelves": "shelf", "wives": "wife",
}

_DOUBLE_CONSONANT = set("bdgklmnprt")


def lemmatize(word: str) -> str:
    w = word.lower()
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("sses") or w.endswith("shes") or w.endswith("ches") \
            or w.endswith("xes") or w.endswith("zes"):
        return w[:-2]
    if w.endswith("s") and not w.endswith("ss") and len(w) > 3:
        return w[:-1]
    if w.endswith("ing") and len(w) > 5:
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] \
                and stem[-1] in _DOUBLE_CONSONANT:
            stem = stem[:-1]
        elif stem[-1] not in "aeiou" and stem[-2:-1] in ("v", "s", "t",
                                                         "c", "k", "m"):
            pass
        return stem
    if w.endswith("ed") and len(w) > 4:
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2] \
                and stem[-1] in _DOUBLE_CONSONANT:
            stem = stem[:-1]
        return stem
    return w


def build_vocab(captions, count_thr: int = 3):
    """captions: iterable of token lists.  Returns (vocab list with UNK
    last, counts) — rare words map to UNK (prepro_dic_anet.py:27-89)."""
    counts = Counter()
    for toks in captions:
        counts.update(t.lower() for t in toks)
    vocab = [w for w, n in counts.items() if n > count_thr]
    bad_count = sum(n for w, n in counts.items() if n <= count_thr)
    total = sum(counts.values())
    print(f"vocab size {len(vocab)} (+UNK); "
          f"UNK rate {bad_count / max(total, 1):.2%}")
    vocab.append("UNK")
    return vocab, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_caps", required=True,
                    help="caption json: {vid: {segments: {idx: "
                         "{caption: [...], clss, idx, bbox, frm_idx}}}}")
    ap.add_argument("--output_dic", default="data/anet/dic_anet.json")
    ap.add_argument("--output_cap", default="data/anet/cap_anet.json")
    ap.add_argument("--split_file", required=True,
                    help="{'training': [vids], 'validation': [...], ...}")
    ap.add_argument("--word_count_threshold", type=int, default=3)
    ap.add_argument("--lemma_json", default=None,
                    help="optional external word->lemma table")
    args = ap.parse_args()

    with open(args.input_caps) as f:
        caps = json.load(f)
    with open(args.split_file) as f:
        split_ids = json.load(f)
    vid_split = {}
    for split, vids in split_ids.items():
        for v in vids:
            vid_split[v] = split

    all_tokens = []
    det_words = set()
    videos = []
    for vid, entry in caps.items():
        for seg_idx, seg in entry["segments"].items():
            toks = [t.lower() for t in seg["caption"]]
            all_tokens.append(toks)
            for cls_list in seg.get("clss", []):
                det_words.update(c.lower() for c in cls_list)
            videos.append({"id": f"{vid}_segment_{int(seg_idx):02d}",
                           "split": vid_split.get(vid, "training")})

    vocab, _ = build_vocab(all_tokens, args.word_count_threshold)
    vocab_set = set(vocab)

    if args.lemma_json:
        with open(args.lemma_json) as f:
            wtol = json.load(f)
    else:
        wtol = {w: lemmatize(w) for w in vocab if w != "UNK"}

    # detection classes must be in-vocab words (ordered, stable)
    det_vocab = sorted(w for w in det_words if w in vocab_set)
    wtod = {w: i for i, w in enumerate(det_vocab)}  # 0-based in the dic;
    # the dataloader shifts to 1-based (dataloader_anet.py:53)

    itow = {str(i + 1): w for i, w in enumerate(vocab)}

    # rewrite captions with UNK substitution
    out_caps = {}
    for vid, entry in caps.items():
        segs = {}
        for seg_idx, seg in entry["segments"].items():
            toks = [t.lower() if t.lower() in vocab_set else "UNK"
                    for t in seg["caption"]]
            segs[str(int(seg_idx))] = {**seg, "caption": toks}
        out_caps[vid] = {"segments": segs}

    with open(args.output_dic, "w") as f:
        json.dump({"ix_to_word": itow, "wtod": wtod, "wtol": wtol,
                   "videos": videos}, f)
    with open(args.output_cap, "w") as f:
        json.dump(out_caps, f)
    print(f"wrote {args.output_dic} ({len(vocab)} words, "
          f"{len(det_vocab)} detection classes) and {args.output_cap}")


if __name__ == "__main__":
    main()
