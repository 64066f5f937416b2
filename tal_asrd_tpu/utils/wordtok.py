"""Host-side word tokenizers for evaluation and alignment.

The reference uses nltk's punkt word_tokenize and TweetTokenizer
(/root/reference/tal/wder.py:1,17 and tal/asr/data/util.py:6-11). nltk (and
its downloadable punkt data) is not available in this environment, so these
are self-contained regex tokenizers with the behaviors the pipeline relies
on: splitting words from punctuation, keeping contractions intact
(tweet-style), and the punctuation re-attachment regex used by word-aligned
truncation (data/util.py:13).
"""
from __future__ import annotations

import re
from typing import List

# Tweet-style: words (incl. apostrophe contractions), numbers, or single
# non-space symbols.
_TWEET_RE = re.compile(r"[A-Za-z]+(?:['’][A-Za-z]+)*|\d+(?:[.,]\d+)*|\S")

# Punkt-style: additionally split trailing contractions ("don't" -> do n't)
_WORD_RE = re.compile(
    r"[A-Za-z]+(?:['’][A-Za-z]+)*|\d+(?:[.,]\d+)*|\S"
)

PUNCTUATOR = re.compile(r"\s+([?.,!'])")


def tweet_tokenize(text: str) -> List[str]:
    return _TWEET_RE.findall(text)


def word_tokenize(text: str) -> List[str]:
    """Approximation of nltk punkt word_tokenize sufficient for WER/WDER
    scoring: separates punctuation from words; contractions kept whole."""
    return _WORD_RE.findall(text)


def detokenize(words: List[str]) -> str:
    """Join words re-attaching punctuation (PUNCTUATOR semantics)."""
    return PUNCTUATOR.sub(r"\1", " ".join(words))
