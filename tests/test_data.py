"""Data pipeline tests on a synthetic TAL-format corpus: audio IO round
trips, index building + validity rules, aligned/segment dataset formatting,
bucketed collation (static shapes), sharded sampling, and the loader.
"""
import os
import pickle

import numpy as np
import pytest

from tal_asrd_tpu.data import (
    AlignedDataset,
    BucketedCollater,
    DataLoader,
    RandomSegmentDataset,
    SDUtteranceDataset,
    SegmentDataset,
    ShardedSampler,
    build_index,
    get_audio_info,
    load_audio_segment,
    resample,
    write_wav,
)
from tests.synthetic_corpus import build_corpus, build_tokenizer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    transcripts = build_corpus(root, n_episodes=2, episode_seconds=40.0)
    tok = build_tokenizer(root)
    return root, transcripts, tok


# ---------------------------------------------------------------------------
# Audio IO
# ---------------------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    info = get_audio_info(p)
    assert info.sample_rate == 16000 and info.num_frames == 16000
    y = load_audio_segment(p, 0.0, None, 16000)
    np.testing.assert_allclose(x, y, atol=1e-4)


def test_segment_seek_load(tmp_path):
    x = np.arange(32000, dtype=np.float32) / 64000.0
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 16000)
    seg = load_audio_segment(p, 0.5, 1.0, 16000)
    assert seg.shape[0] == 8000
    np.testing.assert_allclose(seg, x[8000:16000], atol=1e-4)


def test_resample_halves_length():
    x = np.random.RandomState(0).randn(32000).astype(np.float32)
    y = resample(x, 32000, 16000)
    assert abs(len(y) - 16000) <= 1


# ---------------------------------------------------------------------------
# Index + datasets
# ---------------------------------------------------------------------------

def test_build_index_windows(corpus):
    root, transcripts, _ = corpus
    idx1 = build_index(root, num_utterances=1, use_cache=False)
    total_utts = sum(len(u) for u in transcripts.values())
    assert len(idx1) == total_utts
    idx2 = build_index(root, num_utterances=2, use_cache=False)
    assert len(idx2) == total_utts - len(transcripts)  # n-1 windows per episode
    full = build_index(root, num_utterances=None, use_cache=False)
    assert len(full) == len(transcripts)


def test_index_cache_hit(corpus):
    root, _, _ = corpus
    a = build_index(root, num_utterances=1)
    assert os.path.exists(os.path.join(root, "cache_tpu_aligned_1u.pkl"))
    b = build_index(root, num_utterances=1)
    assert len(a) == len(b)


def test_aligned_dataset_item(corpus):
    root, _, tok = corpus
    ds = AlignedDataset(
        root, tok,
        speaker_map_loc=os.path.join(root, "speaker_map.json"),
        num_utterances=1, min_segment_duration=1.0,
        tokenizer_speakers=True, return_spk_ids=True,
    )
    assert len(ds) > 0
    wav, text, spk, i = ds[0]
    assert wav.dtype == np.float32 and wav.ndim == 1 and wav.size > 0
    # Format: <EOS> tokens <spk> <EOS>
    assert text[0] == tok.eos_token_id and text[-1] == tok.eos_token_id
    assert text[-2] >= len(tok)  # speaker token
    assert len(spk) == len(text)
    # Round-trip through decode_speakers
    utts, _ = tok.decode_speakers(list(text))
    assert len(utts) == 1
    assert utts[0][1] is not None


def test_aligned_dataset_multi_utterance_windows(corpus):
    """Pins the r4 bridge-phase supervision (cli.train --num-utterances N).

    The long-window collapse diagnosis (per-token CE, 2026-08-18) showed
    aligned num_utterances=1 training teaches <EOS> as TERMINAL: every
    post-EOS continuation in a segment window is then a near-impossible
    event. The bridge phase trains on exact-aligned multi-utterance windows,
    so the one property that matters is: targets must contain real token
    content AFTER intermediate <EOS> separators (reference contract
    /root/reference/tal/asr/data/util.py:72-123 — leading <EOS> only at
    episode start, one <EOS> terminating each utterance)."""
    root, _, tok = corpus
    ds = AlignedDataset(
        root, tok,
        speaker_map_loc=os.path.join(root, "speaker_map.json"),
        num_utterances=3, min_segment_duration=1.0,
        tokenizer_speakers=True, return_spk_ids=True,
    )
    assert len(ds) > 0
    wav, text, spk, _ = ds[0]  # window 0 starts at the episode start
    text = list(text)
    eos_pos = [j for j, t in enumerate(text) if t == tok.eos_token_id]
    # Episode-start window: leading <EOS> + one per utterance = 4 total.
    assert len(eos_pos) == 4 and text[0] == tok.eos_token_id
    assert text[-1] == tok.eos_token_id
    # The bridge skill: non-terminal <EOS> must be FOLLOWED by content.
    for p in eos_pos[:-1]:
        assert text[p + 1] != tok.eos_token_id
    # Every utterance round-trips, each with a speaker attribution.
    utts, _ = tok.decode_speakers(text)
    assert len(utts) == 3
    assert all(u[1] is not None for u in utts)
    # The speaker-id track follows the utterance boundaries: it must carry
    # every distinct speaker of the window, in order.
    spk_tokens = [text[p - 1] for p in eos_pos[1:]]  # <spk> precedes each EOS
    assert all(s >= len(tok) for s in spk_tokens)
    assert len(spk) == len(text)
    # Audio spans the whole multi-utterance window (>= 2 utterances of the
    # min duration — i.e. longer than any single utterance item could be).
    stub, utterances = ds.index[0]
    span = utterances[-1]["utterance_end"] - utterances[0]["utterance_start"]
    assert abs(wav.shape[0] / 16000.0 - span) < 0.05

    # Reference parity (/root/reference/tal/asr/data/aligned.py:202-209): the
    # WINDOW is passed as the full utterance list, so EVERY aligned window is
    # <EOS>-primed — including mid-episode ones. This matches decode priming
    # (each fresh decode starts from <EOS>); only SegmentDataset windows,
    # which model mid-stream continuation, omit it (segment.py:232-239 passes
    # the episode list, so is_first is almost never true).
    mid = ds[1]
    mtext = list(mid[1])
    assert mtext[0] == tok.eos_token_id
    assert sum(1 for t in mtext if t == tok.eos_token_id) == 4


def test_segment_dataset_item(corpus):
    root, _, tok = corpus
    import random
    ds = SegmentDataset(
        root, tok,
        speaker_map_loc=os.path.join(root, "speaker_map.json"),
        segment_size=20.0, min_segment_size=8.0, segment_shift=10.0,
        tokenizer_speakers=True, return_spk_ids=True,
        rng=random.Random(0),
    )
    assert len(ds) > 0
    wav, text, spk, _ = ds[1]
    assert wav.size > 0 and len(text) > 0 and len(text) <= 128
    assert len(spk) == len(text)


def test_segment_dataset_word_aligned(tmp_path):
    root = str(tmp_path)
    build_corpus(root, n_episodes=1, episode_seconds=40.0, with_alignments=True)
    tok = build_tokenizer(root)
    import random
    ds = SegmentDataset(
        root, tok, segment_size=20.0, min_segment_size=8.0,
        aligned_truncation=True, rng=random.Random(1),
    )
    wav, text, spk, _ = ds[0]
    assert len(text) > 0


def test_sd_utterance_dataset(corpus):
    root, _, tok = corpus
    ds = SDUtteranceDataset(
        root, speaker_map_loc=os.path.join(root, "speaker_map.json"),
        min_segment_duration=1.0,
    )
    wav, sid, _ = ds[0]
    assert wav.size > 0
    assert 0 <= int(sid) <= 3


def test_random_segment_dataset(corpus):
    root, _, _ = corpus
    ds = RandomSegmentDataset(root, segment_seconds=5.0, quarantine_log=None)
    wav = ds[0]
    assert wav.shape[0] == 5 * 16000


# ---------------------------------------------------------------------------
# Collation + loading
# ---------------------------------------------------------------------------

def test_bucketed_collater_static_shapes(corpus):
    root, _, tok = corpus
    ds = AlignedDataset(
        root, tok, num_utterances=1, min_segment_duration=1.0,
        return_spk_ids=True,
    )
    coll = BucketedCollater(tok.pad_token_id, audio_bucket_seconds=(5, 10),
                            text_buckets=(16, 32, 64))
    batch = coll([ds[i] for i in range(4)])
    assert batch["audio"].shape[1] in (5 * 16000, 10 * 16000)
    assert batch["text"].shape[1] in (16, 32, 64)
    assert batch["text_mask"].dtype == bool
    assert (batch["audio_lens"] <= batch["audio"].shape[1]).all()
    # padded text positions carry pad_id and mask 0
    for i in range(4):
        ln = batch["text_mask"][i].sum()
        assert (batch["text"][i, ln:] == tok.pad_token_id).all()


def test_sharded_sampler_partition():
    n = 103
    all_idx = []
    for shard in range(4):
        s = ShardedSampler(n, shard_id=shard, num_shards=4, shuffle=True, seed=1)
        s.set_epoch(3)
        all_idx.append(list(s))
    lens = {len(x) for x in all_idx}
    assert len(lens) == 1  # equal shards
    flat = [i for part in all_idx for i in part]
    assert set(flat) == set(range(n))  # covers everything (with padding dups)


def test_dataloader_batches(corpus):
    root, _, tok = corpus
    ds = AlignedDataset(root, tok, num_utterances=1, min_segment_duration=1.0,
                        return_spk_ids=True)
    coll = BucketedCollater(tok.pad_token_id, audio_bucket_seconds=(5, 10),
                            text_buckets=(16, 32, 64))
    dl = DataLoader(ds, batch_size=4, collate_fn=coll,
                    sampler=ShardedSampler(len(ds), shuffle=True, seed=0),
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    for b in batches:
        assert b["audio"].shape[0] == 4


def test_collater_int16_roundtrip_lossless():
    """audio_int16=True + the model's on-device /32768 rescale is bit-exact
    for wav-sourced audio (16-bit PCM -> float/32768 -> int16 -> float)."""
    import numpy as np
    from tal_asrd_tpu.data.collate import BucketedCollater

    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32768, 16000).astype(np.int16)
    w = pcm.astype(np.float32) / 32768.0  # what load_audio_segment yields
    item = (w, np.array([1, 2, 3], np.int32), np.array([0, 0, 0], np.int32), 0)
    c16 = BucketedCollater(0, audio_bucket_seconds=(1,), text_buckets=(8,),
                           audio_int16=True)
    b = c16([item])
    assert b["audio"].dtype == np.int16
    np.testing.assert_array_equal(b["audio"][0, :16000], pcm)
    # on-device rescale reproduces the float input exactly
    np.testing.assert_array_equal(
        b["audio"][0, :16000].astype(np.float32) / 32768.0, w)


def test_sd_collater_shapes_and_int16():
    """SDCollater must be constructible with defaults (a missing
    audio_int16 attr crashed every cli.train_sd run) and honor int16."""
    import numpy as np
    from tal_asrd_tpu.data.collate import SDCollater

    items = [(np.ones(8000, np.float32) * 0.5, 3, 0),
             (np.ones(4000, np.float32) * 0.25, 1, 1)]
    out = SDCollater()(items)
    assert out["audio"].shape == (2, 80000) and out["audio"].dtype == np.float32
    assert list(out["speaker"]) == [3, 1] and list(out["audio_lens"]) == [8000, 4000]
    out16 = SDCollater(audio_int16=True)(items)
    assert out16["audio"].dtype == np.int16
    assert out16["audio"][0, 0] == np.int16(np.rint(0.5 * 32768.0).clip(-32768, 32767))
