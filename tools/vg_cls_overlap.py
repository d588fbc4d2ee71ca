"""Detector-class / corpus vocabulary overlap analysis
(tools/vg_cls_overlap.py equivalent).

Measures how much of a caption corpus' noun vocabulary a detector's
class list covers — the analysis used to pick Visual Genome as the
transfer source (reference tools/vg_cls_overlap.py:25-210).  Works on
lemma-normalized words; reports exact-class coverage and
token-frequency-weighted coverage.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter

sys.path.insert(0, ".")

from prepro.prepro_dic_anet import lemmatize  # noqa: E402


def load_class_list(path: str):
    with open(path) as f:
        classes = []
        for line in f:
            # VG class entries may hold comma-separated aliases
            classes.extend(a.strip().lower()
                           for a in line.strip().split(","))
    return [c for c in classes if c]


def overlap_report(class_files, caps_file):
    with open(caps_file) as f:
        caps = json.load(f)

    word_counts = Counter()
    det_counts = Counter()
    for vid, entry in caps.items():
        for seg in entry["segments"].values():
            for tok in seg["caption"]:
                word_counts[lemmatize(tok)] += 1
            for cls_list in seg.get("clss", []):
                for c in cls_list:
                    det_counts[lemmatize(c)] += 1

    target = det_counts if det_counts else word_counts
    total_types = len(target)
    total_tokens = sum(target.values())

    report = {}
    for path in class_files:
        classes = set()
        for c in load_class_list(path):
            classes.add(lemmatize(c))
            classes.update(lemmatize(w) for w in c.split(" "))
        covered_types = sum(1 for w in target if w in classes)
        covered_tokens = sum(n for w, n in target.items() if w in classes)
        report[path] = {
            "classes": len(classes),
            "type_coverage": covered_types / max(total_types, 1),
            "token_coverage": covered_tokens / max(total_tokens, 1),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_files", nargs="+", required=True,
                    help="detector class lists (one class per line, "
                         "comma-separated aliases allowed)")
    ap.add_argument("--caps", required=True,
                    help="caption json (cap_anet format)")
    args = ap.parse_args()
    report = overlap_report(args.class_files, args.caps)
    for path, r in report.items():
        print(f"{path}: {r['classes']} classes, "
              f"type coverage {r['type_coverage']:.1%}, "
              f"token coverage {r['token_coverage']:.1%}")


if __name__ == "__main__":
    main()
