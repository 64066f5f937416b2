"""VAD + transcriber tests: energy VAD separates loud speech-like bursts from
silence; the collector state machine keeps contiguous regions with the
reference's retro-inclusion; frame scoring matches hand-built confusions;
splicing reproduces the difflib longest-match stitch; the windowed
transcriber runs end-to-end on a tiny model.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tal_asrd_tpu.vad import (
    VadConfig,
    binarize,
    collector_mask,
    evaluate_vad,
    get_speech_frames,
    rasterize,
    speech_bounds,
    speech_decisions,
)
from tal_asrd_tpu.decode.transcribe import (
    TranscribeConfig,
    Transcriber,
    splice_strings,
)


def synth_audio(sr=16000, speech_spans=((1.0, 3.0), (5.0, 7.0)), total=9.0,
                seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(int(total * sr)).astype(np.float32) * 0.001  # noise floor
    for s, e in speech_spans:
        seg = slice(int(s * sr), int(e * sr))
        n = x[seg].shape[0]
        t = np.arange(n) / sr
        burst = (np.sin(2 * np.pi * 220 * t) + rng.randn(n) * 0.5) * 0.3
        x[seg] += burst.astype(np.float32)
    return x


def test_speech_decisions_find_bursts():
    x = synth_audio()
    cfg = VadConfig()
    dec = np.asarray(speech_decisions(jnp.asarray(x), cfg))
    frame_s = cfg.frame_duration_ms / 1000
    # Frames inside [1,3] and [5,7] mostly speech; outside mostly not
    inside = dec[int(1.2 / frame_s) : int(2.8 / frame_s)]
    outside = dec[int(3.5 / frame_s) : int(4.8 / frame_s)]
    assert inside.mean() > 0.9
    assert outside.mean() < 0.1


def test_collector_bounds_cover_spans():
    x = synth_audio()
    bounds = speech_bounds(x, VadConfig())
    # Two speech regions detected near the true spans
    assert len(bounds) >= 1
    covered = rasterize(bounds, 9.0)
    gold = rasterize([(1.0, 3.0), (5.0, 7.0)], 9.0)
    overlap = (covered & gold).sum() / gold.sum()
    assert overlap > 0.85


def test_get_speech_frames_compresses():
    x = synth_audio()
    speech = get_speech_frames(x)
    assert 0 < len(speech) < len(x)
    # roughly 4s speech of 9s total (plus padding ring buffers)
    assert len(speech) / len(x) < 0.75


def test_evaluate_vad_perfect_and_partial():
    gold = [(1.0, 3.0)]
    s = evaluate_vad(gold, gold, 5.0)
    assert s.precision == 1.0 and s.recall == 1.0 and s.f1 == 1.0
    s2 = evaluate_vad([(1.0, 2.0)], gold, 5.0)
    assert s2.precision == 1.0 and abs(s2.recall - 0.5) < 1e-6


def test_binarize_hysteresis():
    scores = np.array([0.1, 0.9, 0.9, 0.4, 0.9, 0.1, 0.1])
    # onset .52 / offset .3: stays active through the 0.4 dip
    regions = binarize(scores, frame_s=1.0, onset=0.52, offset=0.3)
    assert regions == [(1.0, 5.0)]
    # offset .52: the dip deactivates
    regions2 = binarize(scores, frame_s=1.0, onset=0.52, offset=0.52)
    assert len(regions2) == 2


def test_splice_strings_overlap():
    a = "the quick brown fox jumps over the lazy dog"
    b = "over the lazy dog and runs away fast"
    out = splice_strings([a, b], word_overlap=6)
    assert out.count("lazy dog") == 1
    assert out.startswith("the quick brown fox")
    assert out.endswith("runs away fast")


def test_splice_strings_no_match_keeps_both():
    out = splice_strings(["completely different words", "zzz qqq xxx"], 3)
    assert "completely different words" in out
    assert "zzz qqq xxx" in out


def test_vad_pipeline_resume(tmp_path):
    """Batch VAD over a directory writes bounds + speech wavs and skips
    completed files on re-run (webrtcvad.py:153-157 resume semantics)."""
    import pickle

    from tal_asrd_tpu.data.audio_io import write_wav
    from tal_asrd_tpu.vad.pipeline import run_vad_directory

    data = tmp_path / "wavs"
    data.mkdir()
    write_wav(str(data / "ep0.wav"), synth_audio(total=5.0,
                                                 speech_spans=((1.0, 3.0),)))
    out = tmp_path / "vad"
    res = run_vad_directory(str(data), str(out), workers=1)
    assert len(res) == 1
    bounds_path = out / "ep0.bounds.pkl"
    assert bounds_path.exists()
    assert (out / "ep0.speech.wav").exists()
    with open(bounds_path, "rb") as f:
        bounds = pickle.load(f)
    assert bounds, "no speech found"
    # resume: delete nothing, mtime unchanged after re-run
    mtime = bounds_path.stat().st_mtime_ns
    run_vad_directory(str(data), str(out), workers=1)
    assert bounds_path.stat().st_mtime_ns == mtime


@pytest.mark.slow  # 35s integration; VAD/splice components covered fast above.
def test_transcriber_end_to_end():
    import jax
    from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
    from tal_asrd_tpu.models import ASRModel
    from tests.synthetic_corpus import build_tokenizer
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tok = build_tokenizer(td, vocab_size=120)
    cfg = ModelConfig(
        model_type="1x", num_speakers=3, n_mels=8, vocab_size=len(tok),
        n_head=2, max_positions=64, dropout=0.0, embed_size=8,
        tds_depths=(1, 1, 1), tds_kernel=5,
    )
    fe = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
    model = ASRModel(cfg, fe)
    audio0 = jnp.zeros((1, 16000), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, audio0,
        jnp.zeros((1, 4), jnp.int32), jnp.array([16000]),
    )
    tc = TranscribeConfig(window_seconds=2.0, overlap=0.25, batch_size=4,
                          beam_size=2, max_new_tokens=8, use_eot=False,
                          splice=False)
    tr = Transcriber(model, variables, tok, tc)
    x = synth_audio(total=6.0)
    texts = tr.transcribe_array(x)
    assert isinstance(texts, list) and len(texts) >= 3
    # splice mode returns a single string
    tc2 = TranscribeConfig(window_seconds=2.0, overlap=0.25, batch_size=4,
                           beam_size=2, max_new_tokens=8, use_eot=False,
                           splice=True)
    tr2 = Transcriber(model, variables, tok, tc2)
    out = tr2.transcribe_array(x)
    assert isinstance(out, str)


# ---------------------------------------------------------------------------
# Native GMM VAD (native/webrtc_vad.cpp)
# ---------------------------------------------------------------------------
def _gmm_available():
    from tal_asrd_tpu.vad.webrtc_gmm import available
    return available()


@pytest.mark.skipif(not _gmm_available(), reason="no g++ / native build failed")
def test_gmm_vad_discriminates_speech_from_silence():
    from tal_asrd_tpu.vad.webrtc_gmm import decisions

    sr = 16000
    rng = np.random.RandomState(0)
    t = np.arange(sr * 2) / sr
    # speech-like: glottal-ish harmonic stack with formant envelope + F0
    # glide + syllabic amplitude modulation (wideband, as real speech is)
    f0 = 140 + 30 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    speech = np.zeros_like(t)
    for k in range(1, 22):
        formant = (np.exp(-((k * 140 - 500) / 400) ** 2)
                   + 0.7 * np.exp(-((k * 140 - 1500) / 500) ** 2)
                   + 0.4 * np.exp(-((k * 140 - 2600) / 600) ** 2))
        speech += (formant / (1 + 0.1 * k)) * np.sin(k * phase)
    speech *= (0.55 + 0.45 * np.sin(2 * np.pi * 4 * t) ** 2) * 0.25
    silence = rng.randn(sr * 2).astype(np.float32) * 1e-4

    audio = np.concatenate([silence, speech.astype(np.float32), silence])
    for mode in range(4):
        dec = decisions(audio, sr, 30, mode=mode)
        n = len(dec) // 3
        frac_speech = dec[n: 2 * n].mean()
        frac_silence = np.concatenate([dec[: n], dec[2 * n:]]).mean()
        assert frac_speech > 0.8, (mode, frac_speech)
        assert frac_silence < 0.5, (mode, frac_silence)
        assert frac_speech > frac_silence


@pytest.mark.skipif(not _gmm_available(), reason="no g++ / native build failed")
def test_gmm_vad_aggressiveness_monotonic():
    """Higher modes must be (weakly) more conservative: fewer speech frames
    on marginal audio."""
    from tal_asrd_tpu.vad.webrtc_gmm import decisions

    sr = 16000
    rng = np.random.RandomState(1)
    t = np.arange(sr * 3) / sr
    marginal = (0.02 * np.sin(2 * np.pi * 300 * t)
                + rng.randn(len(t)) * 0.01).astype(np.float32)
    fracs = [decisions(marginal, sr, 30, mode=m).mean() for m in range(4)]
    assert all(fracs[i] >= fracs[i + 1] - 1e-9 for i in range(3)), fracs


@pytest.mark.skipif(not _gmm_available(), reason="no g++ / native build failed")
def test_gmm_vad_frame_length_validation():
    from tal_asrd_tpu.vad.webrtc_gmm import WebRtcGmmVad

    vad = WebRtcGmmVad(mode=1)
    ok = np.zeros(480, np.int16).tobytes()   # 30 ms @ 16 kHz
    assert vad.is_speech(ok, 16000) in (True, False)
    bad = np.zeros(123, np.int16).tobytes()
    with pytest.raises(AssertionError):
        vad.is_speech(bad, 16000)


@pytest.mark.skipif(not _gmm_available(), reason="no g++ / native build failed")
def test_gmm_detector_through_pipeline():
    """VadConfig(detector='gmm') routes the whole collector pipeline through
    the native GMM decision."""
    from tal_asrd_tpu.vad.core import VadConfig, speech_bounds

    sr = 16000
    t = np.arange(sr) / sr
    # Non-stationary harmonic stack (a stationary tone is correctly absorbed
    # into the adaptive noise model — webrtc behavior)
    f0 = 140 + 30 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    speech = sum(np.sin(k * phase) / (1 + 0.2 * k) for k in range(1, 22))
    speech = speech * (0.55 + 0.45 * np.sin(2 * np.pi * 4 * t) ** 2) * 0.25
    audio = np.concatenate([
        np.zeros(sr, np.float32), speech.astype(np.float32),
        np.zeros(sr, np.float32),
    ])
    bounds = speech_bounds(audio, VadConfig(detector="gmm", vad_level=1))
    assert bounds, "expected at least one speech segment"
    s, e = bounds[0]  # seconds
    # segment overlaps the true speech second [1.0, 2.0); collector padding
    # and hangover make boundaries fuzzy by ~0.3-0.8 s
    assert s < 2.0 and e > 1.0, (s, e)
