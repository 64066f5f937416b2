"""Regenerate the committed golden parity fixtures.

Run in an environment with the real reference libraries installed; each
section is skipped (with a note) when its library is absent, so partial
regeneration is fine. The committed fixtures let the parity tests run
ALWAYS, not only where torch/sentencepiece/edit_distance happen to exist.

  python tests/fixtures/generate_fixtures.py

Provenance of the current files:
  stft_golden.npz / logmel_golden.npz / gru_golden.npz — torch 2.13.0+cpu
  editdist_opcodes.json — NOT YET GENERATED (pypi `edit_distance` unavailable
      in the build environment; native/editdist.cpp documents its tie-break
      as diag > delete > insert pending this fixture)
  spm_golden.json — NOT YET GENERATED (sentencepiece unavailable; the raw
      .model importer is instead tested against a hand-built protobuf in
      tests/test_spm_import.py)
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def gen_torch():
    try:
        import torch
    except ImportError:
        print("torch absent — skipping stft/logmel/gru fixtures")
        return
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 16000).astype(np.float32) * 0.1
    window = torch.hann_window(400, periodic=True)
    ref = torch.stft(torch.from_numpy(audio), n_fft=400, hop_length=160,
                     win_length=400, window=window, center=True,
                     pad_mode="reflect", normalized=False, onesided=True,
                     return_complex=True)
    ref_power = (ref.real**2 + ref.imag**2).numpy().transpose(0, 2, 1)
    np.savez_compressed(os.path.join(HERE, "stft_golden.npz"),
                        audio=audio, ref_power=ref_power,
                        meta=np.array([400, 160, 400]))

    # torchaudio MelSpectrogram-equivalent composition (HTK mel, power 2).
    n_freqs, n_mels, f_min, f_max, sr = 201, 80, 0.0, 8000.0, 16000
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    m_pts = torch.linspace(
        2595.0 * np.log10(1 + f_min / 700.0),
        2595.0 * np.log10(1 + f_max / 700.0), n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -1.0 * slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    logmel = torch.log(torch.from_numpy(ref_power) @ fb + 1e-6).numpy()
    np.savez_compressed(os.path.join(HERE, "logmel_golden.npz"),
                        audio=audio, logmel=logmel)

    d_in, d_h, depth, t, b = 6, 8, 2, 5, 3
    x = rng.randn(b, t, d_in).astype(np.float32)
    torch.manual_seed(0)
    tg = torch.nn.GRU(d_in, d_h, depth, batch_first=True)
    with torch.no_grad():
        out_t, h_t = tg(torch.from_numpy(x))
    save = {"x": x, "out": out_t.numpy(), "h": h_t.numpy()}
    for k in range(depth):
        for name in (f"weight_ih_l{k}", f"weight_hh_l{k}",
                     f"bias_ih_l{k}", f"bias_hh_l{k}"):
            save[name] = getattr(tg, name).detach().numpy()
    np.savez_compressed(os.path.join(HERE, "gru_golden.npz"), **save)
    print(f"wrote torch fixtures (torch {torch.__version__})")


def gen_editdist():
    """Opcode streams from the pypi `edit_distance` package for tie-break
    cases (the reference consumes them at tal/wder.py:198)."""
    try:
        import edit_distance
    except ImportError:
        print("edit_distance absent — skipping opcode fixture")
        return
    cases = [
        (["a", "b", "c"], ["a", "x", "c"]),
        (["a", "b"], ["b", "a"]),                      # tie-heavy
        (["x"], ["x", "x"]),
        (["a", "a", "a"], ["a", "a"]),
        (["w1", "w2", "w3", "w4"], ["w1", "w3", "w4", "w5"]),
        ([], ["a"]),
        (["a"], []),
        (["s", "u", "b"], ["s", "u", "b", "s"]),
        (["the", "cat", "sat"], ["the", "cat", "cat", "sat"]),
    ]
    out = []
    for ref, hyp in cases:
        sm = edit_distance.SequenceMatcher(a=ref, b=hyp)
        out.append({"a": ref, "b": hyp,
                    "opcodes": [list(op) for op in sm.get_opcodes()],
                    "distance": sm.distance()})
    with open(os.path.join(HERE, "editdist_opcodes.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote editdist_opcodes.json")


def gen_spm():
    """Tokenizations from real sentencepiece over its own trained model."""
    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece absent — skipping spm fixture")
        return
    import io
    text = ["the quick brown fox", "hello world"] * 50
    model = io.BytesIO()
    spm.SentencePieceTrainer.train(
        sentence_iterator=iter(text), model_writer=model, vocab_size=60,
        model_type="bpe",
    )
    sp = spm.SentencePieceProcessor(model_proto=model.getvalue())
    samples = ["the quick brown fox", "hello", "foxy", "unseen words here"]
    with open(os.path.join(HERE, "spm_golden.json"), "w") as f:
        json.dump({"model_b64": __import__("base64").b64encode(
                       model.getvalue()).decode(),
                   "samples": {s: sp.encode(s) for s in samples}}, f)
    print("wrote spm_golden.json")


if __name__ == "__main__":
    gen_torch()
    gen_editdist()
    gen_spm()
