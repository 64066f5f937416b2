"""vad/windows.py: VAD-gated decode windows for the long-form eval leg.

The decode contract these protect: one window ~= one utterance (windows that
fuse two utterances lose the second — the beam stops at its first EOS), and
padding must never create that fusion.
"""
import numpy as np
import pytest

from tal_asrd_tpu.vad.core import VadConfig
from tal_asrd_tpu.vad.windows import vad_decode_windows

SR = 16000


def _tone_speech(dur_s, f=440.0, amp=0.3):
    t = np.arange(int(dur_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _episode(utt_durs, gap_s):
    # generous lead-in/out silence: the energy detector's noise floor is the
    # 20th percentile of frame log-energy, so the fixture must contain
    # enough true silence for the floor to be silence, as real episodes do
    lead = np.zeros(int(3.0 * SR), np.float32)
    parts = [lead]
    for i, d in enumerate(utt_durs):
        parts.append(_tone_speech(d, f=300.0 + 100 * i))
        parts.append(np.zeros(int(gap_s * SR), np.float32))
    parts.append(lead)
    return np.concatenate(parts)


def test_one_window_per_utterance():
    utts = [2.0, 1.5, 3.0, 2.5]
    x = _episode(utts, gap_s=0.5)
    ws = vad_decode_windows(x, SR)
    assert len(ws) == len(utts), ws
    # windows ordered, non-overlapping
    for (s0, e0), (s1, e1) in zip(ws, ws[1:]):
        assert s0 < e0 <= s1 < e1


def test_padding_never_fuses_windows():
    # pad_s larger than the whole gap: padding alone must not merge (the
    # merge test runs on RAW bounds; pads clip at the gap midpoint)
    x = _episode([1.0, 1.0, 1.0], gap_s=0.5)
    ws = vad_decode_windows(x, SR, pad_s=2.0)  # pad >> gap
    assert len(ws) == 3
    for (s0, e0), (s1, e1) in zip(ws, ws[1:]):
        assert e0 <= s1  # clipped at the gap midpoint, no overlap


def test_overlong_region_splits_at_quietest_frame():
    # one continuous 9 s region with a soft dip in the middle
    lead = np.zeros(int(3.0 * SR), np.float32)
    a = _tone_speech(4.4)
    dip = (0.01 * np.sin(2 * np.pi * 440 * np.arange(int(0.2 * SR)) / SR)
           ).astype(np.float32)
    b = _tone_speech(4.4)
    x = np.concatenate([lead, a, dip, b, lead])
    ws = vad_decode_windows(x, SR, max_window_s=6.0)
    assert len(ws) >= 2
    # the split lands inside the dip (middle-half argmin energy)
    cut = ws[0][1]
    assert abs(cut - (len(lead) + len(a) + 0.1 * SR)) < 0.5 * SR


def test_min_window_filters_clicks():
    x = np.concatenate([
        _tone_speech(0.05), np.zeros(SR, np.float32), _tone_speech(2.0)
    ])
    ws = vad_decode_windows(x, SR, min_window_s=0.5)
    assert len(ws) == 1
    s, e = ws[0]
    assert (e - s) / SR > 1.0
