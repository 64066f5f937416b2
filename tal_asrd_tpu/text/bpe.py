"""Native BPE tokenizer (SentencePiece-compatible behavior, no C++ deps
required — an optional C++ fast path lives in native/fastbpe.cpp).

The reference depends on the sentencepiece C++ library with a 10k BPE model
trained as `--bos_id=0 --eos_id=1 --pad_id=2 --unk_id=3 --character_coverage=1.0
--model_type=bpe` (/root/reference/tal/asr/tokenizers/sentencepiece.py:6-15).
This module provides the same capability natively:

  * SentencePiece-style pretokenization: whitespace runs collapse, each word
    gets the U+2581 LOWER-ONE-EIGHTH-BLOCK boundary marker;
  * greedy rank-based BPE merging;
  * a JSON model format (pieces + merges) trainable from a text corpus with
    BpeTrainer (the analog of SentencePieceTrainer.Train);
  * id layout identical to the reference: 0=<s>(BOS, doubling as EOT),
    1=</s>(EOS), 2=<pad>, 3=<unk>, then learned pieces.
"""
from __future__ import annotations

import json
import os
from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from tal_asrd_tpu.text.tokenizer import Tokenizer

WORD_BOUNDARY = "▁"  # same marker sentencepiece uses
SPECIALS = ["<s>", "</s>", "<pad>", "<unk>"]


def _pretokenize(text: str) -> List[str]:
    """Whitespace-split; each word carries the boundary marker prefix."""
    return [WORD_BOUNDARY + w for w in text.split()]


class BpeModel:
    """Immutable trained model: pieces + merge ranks."""

    def __init__(self, pieces: List[str], merges: List[Tuple[str, str]]):
        self.pieces = list(pieces)
        self.merges = [tuple(m) for m in merges]
        self.piece_to_id: Dict[str, int] = {
            p: i for i, p in enumerate(SPECIALS + self.pieces)
        }
        self.rank: Dict[Tuple[str, str], int] = {
            m: i for i, m in enumerate(self.merges)
        }

    def __len__(self) -> int:
        return len(SPECIALS) + len(self.pieces)

    # -- persistence ----------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {"format": "tal_asrd_tpu.bpe.v1", "pieces": self.pieces,
                 "merges": [list(m) for m in self.merges]},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "BpeModel":
        with open(path) as f:
            d = json.load(f)
        assert d.get("format") == "tal_asrd_tpu.bpe.v1", d.get("format")
        return cls(d["pieces"], [tuple(m) for m in d["merges"]])

    # -- encoding -------------------------------------------------------
    def encode_word(self, word: str) -> List[str]:
        """Greedy lowest-rank pair merging of one marked word."""
        symbols = list(word)
        if not symbols:
            return []
        while len(symbols) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(symbols) - 1):
                r = self.rank.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols


class BpeTokenizer(Tokenizer):
    """Tokenizer over a trained BpeModel (the reference's Tokenizer analog)."""

    def __init__(self, model_path: Optional[str] = None, model: Optional[BpeModel] = None):
        assert (model_path is None) != (model is None)
        self.model_path = model_path
        self.model = model if model is not None else BpeModel.load(model_path)

    def __len__(self) -> int:
        return len(self.model)

    def __getstate__(self):
        """Pickle-safety across dataloader worker forks (the reference drops
        its C++ handle, sentencepiece.py:35-45); our model is pure data but we
        keep the same contract for path-based instances."""
        state = self.__dict__.copy()
        if self.model_path is not None:
            state["model"] = None
        return state

    def __setstate__(self, state):
        self.__dict__ = state
        if self.model is None:
            self.model = BpeModel.load(self.model_path)

    def _encode(self, sentence: str) -> List[int]:
        unk = self.unk_token_id
        out: List[int] = []
        for word in _pretokenize(sentence):
            for piece in self.model.encode_word(word):
                pid = self.model.piece_to_id.get(piece)
                if pid is None:
                    # character coverage fallback: per-char lookup, else <unk>
                    for ch in piece:
                        out.append(self.model.piece_to_id.get(ch, unk))
                else:
                    out.append(pid)
        return out

    def decode_pieces(self, ids: Sequence[int]) -> str:
        table = SPECIALS + self.model.pieces
        text = "".join(
            table[i] if 0 <= i < len(table) else "" for i in ids
            if i >= len(SPECIALS)
        )
        return text.replace(WORD_BOUNDARY, " ").lstrip(" ")


class BpeTrainer:
    """Learn a BPE model from text (SentencePieceTrainer.Train analog)."""

    def __init__(self, vocab_size: int = 10000, character_coverage: float = 1.0):
        self.vocab_size = vocab_size
        self.character_coverage = character_coverage

    def train(self, lines: Iterable[str]) -> BpeModel:
        word_freq: Counter = Counter()
        for line in lines:
            for w in _pretokenize(line):
                word_freq[w] += 1

        # Character alphabet (coverage: keep the most frequent chars)
        char_freq: Counter = Counter()
        for w, f in word_freq.items():
            for ch in w:
                char_freq[ch] += f
        chars = [c for c, _ in char_freq.most_common()]
        if self.character_coverage < 1.0:
            keep = max(1, int(len(chars) * self.character_coverage))
            chars = chars[:keep]
        alphabet = set(chars)

        words = {
            w: (tuple(ch if ch in alphabet else None for ch in w), f)
            for w, f in word_freq.items()
        }
        # Drop uncovered chars entirely from the merge corpus
        corpus: Dict[Tuple[str, ...], int] = Counter()
        for sym, f in words.values():
            sym = tuple(s for s in sym if s is not None)
            if sym:
                corpus[sym] += f

        pieces: List[str] = list(chars)
        merges: List[Tuple[str, str]] = []
        budget = self.vocab_size - len(SPECIALS) - len(pieces)

        corpus = dict(corpus)
        for _ in range(max(budget, 0)):
            pair_freq: Counter = Counter()
            for sym, f in corpus.items():
                for i in range(len(sym) - 1):
                    pair_freq[(sym[i], sym[i + 1])] += f
            if not pair_freq:
                break
            (a, b), f = pair_freq.most_common(1)[0]
            if f < 2:
                break
            merges.append((a, b))
            pieces.append(a + b)
            new_corpus: Dict[Tuple[str, ...], int] = {}
            for sym, cf in corpus.items():
                out = []
                i = 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                t = tuple(out)
                new_corpus[t] = new_corpus.get(t, 0) + cf
            corpus = new_corpus

        return BpeModel(pieces, merges)

    def train_file(self, path: str, model_path: str) -> BpeModel:
        with open(path) as f:
            model = self.train(f)
        model.save(model_path)
        return model
