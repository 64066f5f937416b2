"""Tokenizer tests: BPE train/encode/decode round-trips, special-token layout
(bos=0/eos=1/pad=2/unk=3, eot sharing the BOS slot — sentencepiece.py:27-30
parity), speaker-token rendering, decode_speakers segmentation semantics
(tokenizers/__init__.py:103-138), and pickle-safety across worker forks.
"""
import pickle

import numpy as np
import pytest

from tal_asrd_tpu.text import BpeModel, BpeTokenizer, BpeTrainer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks at the quick fox",
    "a lazy brown dog sleeps",
    "quick quick quick the the the",
    "foxes and dogs and foxes",
] * 20


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    model = BpeTrainer(vocab_size=200).train(CORPUS)
    path = tmp_path_factory.mktemp("tok") / "bpe.model"
    model.save(str(path))
    return BpeTokenizer(model_path=str(path))


def test_special_token_layout(tok):
    assert tok.bos_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.pad_token_id == 2
    assert tok.unk_token_id == 3
    assert tok.eot_token_id == 0  # reference quirk: EOT == BOS slot


def test_encode_decode_roundtrip(tok):
    for text in ["the quick brown fox", "a lazy dog sleeps", "dogs and foxes"]:
        ids = tok.encode(text, bos_token=False, eos_token=False)
        assert all(4 <= i < len(tok) for i in ids)
        assert tok.decode(ids) == text


def test_encode_adds_bos_eos(tok):
    ids = tok.encode("the dog")
    assert ids[0] == tok.bos_token_id
    assert ids[-1] == tok.eos_token_id


def test_unknown_characters_map_to_unk(tok):
    ids = tok.encode("ΩΩΩ", bos_token=False, eos_token=False)
    # The word-boundary marker is itself a known piece; every unknown char
    # falls back to <unk>.
    unk = [i for i in ids if i == tok.unk_token_id]
    assert len(unk) == 3
    assert all(i == tok.unk_token_id or i >= 4 for i in ids)


def test_speaker_and_eot_rendering(tok):
    n = len(tok)
    ids = tok.encode("the dog", bos_token=False, eos_token=False)
    out = tok.decode(ids + [n + 5, tok.eot_token_id])
    assert out == "the dog<S5><EOT>"


def test_decode_speakers_segmentation(tok):
    n = len(tok)
    eos = tok.eos_token_id
    u1 = tok.encode("the dog", bos_token=False, eos_token=False)
    u2 = tok.encode("quick fox", bos_token=False, eos_token=False)
    # <EOS> u1 <spk 2> <EOS> u2 <spk 0> <EOS>  (aligned-dataset format)
    stream = [eos] + u1 + [n + 2, eos] + u2 + [n + 0, eos]
    utts, splits = tok.decode_speakers(stream)
    assert utts == [("the dog", 2), ("quick fox", 0)]
    assert len(splits) == 2
    # split indices point at the EOS closing each utterance
    assert stream[splits[0]] == eos and stream[splits[1]] == eos


def test_decode_speakers_trailing_buffer(tok):
    u1 = tok.encode("the dog", bos_token=False, eos_token=False)
    utts, splits = tok.decode_speakers(u1, add_last=True)
    assert utts == [("the dog", None)]
    utts2, _ = tok.decode_speakers(u1, add_last=False)
    assert utts2 == []


def test_pickle_safety(tok):
    tok2 = pickle.loads(pickle.dumps(tok))
    text = "the quick brown fox"
    assert tok2.encode(text) == tok.encode(text)


def test_model_persistence_roundtrip(tmp_path):
    model = BpeTrainer(vocab_size=120).train(CORPUS)
    p = str(tmp_path / "m.model")
    model.save(p)
    m2 = BpeModel.load(p)
    assert m2.pieces == model.pieces
    assert m2.merges == model.merges


def test_native_encoder_matches_python(tok):
    """C++ merge engine vs the pure-Python greedy merger."""
    model = tok.model
    if model._native() is None:
        pytest.skip("native fastbpe unavailable")
    for text in CORPUS[:5] + ["unknownish wordage Ω mid"]:
        for word in ["▁" + w for w in text.split()]:
            py_ids = []
            for piece in model.encode_word(word):
                pid = model.piece_to_id.get(piece)
                if pid is None:
                    py_ids.extend(model.piece_to_id.get(c, 3) for c in piece)
                else:
                    py_ids.append(pid)
            assert model.encode_word_ids(word, 3) == py_ids, word


def test_merges_actually_compress(tok):
    # BPE must merge frequent words into few pieces
    ids = tok.encode("the", bos_token=False, eos_token=False)
    assert len(ids) <= 2  # '▁the' should be (nearly) a single piece


def test_native_trainer_matches_python():
    """native/bpetrain.cpp must produce the EXACT merge sequence of the
    Python trainer (incl. Counter insertion-order tie-breaking)."""
    import os

    from tal_asrd_tpu.text.bpe import BpeTrainer, _load_train_native

    if _load_train_native() is None:
        pytest.skip("native trainer unavailable (no g++)")
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "aa ab aa ab ba",  # tie-heavy
    ] * 7
    n = BpeTrainer(vocab_size=80).train(lines)
    os.environ["TAL_ASRD_NO_NATIVE"] = "1"
    try:
        p = BpeTrainer(vocab_size=80).train(lines)
    finally:
        del os.environ["TAL_ASRD_NO_NATIVE"]
    assert n.pieces == p.pieces
    assert n.merges == p.merges


def test_gpt2_tokenizer_local_fixture(tmp_path):
    """Gpt2Tokenizer (tal/asr/tokenizers/transformers.py:11-77 parity) loads
    from a LOCAL path (no egress) and round-trips; built here from a minimal
    GPT-2-format vocab.json + merges.txt."""
    transformers = pytest.importorskip("transformers")
    import json

    # Minimal GPT-2 byte-level BPE: base bytes + a few merges.
    # GPT-2 maps bytes to unicode; printable ascii letters map to themselves.
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    nxt = len(vocab)
    merges = []
    for pair in [("t", "h"), ("th", "e"), ("h", "e"), ("Ġ", "t"),
                 ("Ġt", "he")]:
        merges.append(f"{pair[0]} {pair[1]}")
        vocab["".join(pair)] = nxt
        nxt += 1
    vocab["<|endoftext|>"] = nxt
    d = tmp_path / "gpt2"
    d.mkdir()
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "model_max_length": 1024, "tokenizer_class": "GPT2Tokenizer",
        "unk_token": "<|endoftext|>", "bos_token": "<|endoftext|>",
        "eos_token": "<|endoftext|>",
    }))

    from tal_asrd_tpu.text.gpt2 import Gpt2Tokenizer

    tok = Gpt2Tokenizer(str(d))
    ids = tok._encode("the theme")
    assert ids, "empty encoding"
    # 'the' at word start merges via Ġt + he -> Ġthe only when mid-sentence;
    # leading 'the' becomes th+e via the (t,h),(th,e) merges
    assert tok.decode_pieces(ids) == "the theme"
    # eot/bos ids preserved from the reference (49129)
    assert tok.eot_token_id == 49129 and tok.bos_token_id == 49129
    # decode_speakers treats ids >= len(tokenizer) as speaker tokens
    utts, _ = tok.decode_speakers(
        ids + [len(tok) + 3, tok.eos_token_id] + ids
    )
    assert len(utts) >= 1
