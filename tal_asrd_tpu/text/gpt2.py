"""GPT-2 (HuggingFace) tokenizer backend.

Parity target: /root/reference/tal/asr/tokenizers/transformers.py:11-77 — a
GPT2 tokenizer variant used for LM-pretrained decoders, with bos = eot = 49129
(an id appended beyond the 50257 GPT-2 vocab in spirit; the reference reuses
a high id for both). This environment has no network egress, so the tokenizer
must be constructed from a local pretrained path.
"""
from __future__ import annotations

from typing import List, Sequence

from tal_asrd_tpu.text.tokenizer import Tokenizer


class Gpt2Tokenizer(Tokenizer):
    eot_token_id = 49129
    bos_token_id = 49129

    def __init__(self, pretrained_path: str):
        from transformers import GPT2TokenizerFast  # local files only

        self.tk = GPT2TokenizerFast.from_pretrained(
            pretrained_path, local_files_only=True
        )
        self.pad_token_id = self.tk.pad_token_id or 2
        self.eos_token_id = self.tk.eos_token_id or 1

    def __len__(self) -> int:
        return len(self.tk)

    def _encode(self, sentence: str) -> List[int]:
        return self.tk.encode(sentence, add_special_tokens=False)

    def decode_pieces(self, ids: Sequence[int]) -> str:
        return self.tk.decode(list(ids))
