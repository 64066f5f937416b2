"""SentencePiece .model importer tests: protobuf wire parsing against a
hand-built writer, and semantic round-trip — exporting a natively-trained BPE
model into sentencepiece's proto layout and importing it back must preserve
tokenization exactly."""
import struct

import numpy as np
import pytest

from tal_asrd_tpu.text.bpe import SPECIALS, BpeModel, BpeTokenizer, BpeTrainer
from tal_asrd_tpu.text.spm_import import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    load_sentencepiece_model,
    parse_model_proto,
)
from tests.synthetic_corpus import SENTENCES


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _sp_entry(piece: str, score: float, ptype: int) -> bytes:
    body = b""
    pb = piece.encode("utf-8")
    body += _varint((1 << 3) | 2) + _varint(len(pb)) + pb
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)
    body += _varint((3 << 3) | 0) + _varint(ptype)
    return _varint((1 << 3) | 2) + _varint(len(body)) + body


def write_fake_spm(path: str, pieces_scores_types):
    data = b"".join(_sp_entry(p, s, t) for p, s, t in pieces_scores_types)
    # append an unknown field (trainer_spec, field 2) to exercise skipping
    data += _varint((2 << 3) | 2) + _varint(3) + b"xyz"
    with open(path, "wb") as f:
        f.write(data)


def test_wire_parsing(tmp_path):
    p = str(tmp_path / "m.model")
    write_fake_spm(p, [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
                       ("a", -1.0, NORMAL)])
    with open(p, "rb") as f:
        entries = parse_model_proto(f.read())
    assert entries == [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
                       ("a", -1.0, NORMAL)]


def test_spm_import_preserves_tokenization(tmp_path):
    # Train a native model, export in spm layout (merge order as scores)
    native = BpeTrainer(vocab_size=160).train(SENTENCES * 20)
    merge_rank = {a + b: r for r, (a, b) in enumerate(native.merges)}
    entries = [
        ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN),
    ]
    for p in native.pieces:
        # chars get low scores; merged pieces scored by inverse merge rank
        score = -1000.0 - len(entries) if p not in merge_rank else -float(
            merge_rank[p]
        )
        entries.append((p, score, NORMAL))
    path = str(tmp_path / "fake.model")
    write_fake_spm(path, entries)

    imported = load_sentencepiece_model(path)
    assert imported.pieces == native.pieces  # ids preserved

    tok_a = BpeTokenizer(model=native)
    tok_b = BpeTokenizer(model=imported)
    for text in SENTENCES:
        assert tok_a.encode(text) == tok_b.encode(text), text
        ids = tok_b.encode(text, bos_token=False, eos_token=False)
        assert tok_b.decode(ids) == text
