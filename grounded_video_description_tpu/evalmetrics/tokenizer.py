"""Sentence tokenization for metric computation.

A self-contained stand-in for the coco-caption PTBTokenizer (which
shells out to Stanford CoreNLP, README.md:56): lowercase, strip
punctuation, split on whitespace.  The captions this framework emits
are already space-separated vocab words, so this matches the
reference's effective tokenization for self-generated output.
"""

import re

_PUNCT = re.compile(r"[^\w\s']")
_WS = re.compile(r"\s+")


def tokenize(sentence: str):
    s = _PUNCT.sub(" ", sentence.lower())
    return _WS.sub(" ", s).strip().split()


def ngrams(tokens, n):
    return [tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]
