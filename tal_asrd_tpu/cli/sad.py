"""Neural SAD CLI: train PyanNet on transcript bounds, score, binarize, eval.

Reference chain (/root/reference/tal/vad/__init__.py): transcripts -> RTTM/UEM
export -> pyannote SAD (pretrained sad_ami, optional fine-tune) -> per-episode
speech scores -> Binarize(onset/offset 0.52, min on/off 0.1 s) -> bounds
pickle (pretrained-sad.pickle) -> frame-level eval (tal/vad/eval.py).

Here the model is the native flax PyanNet (vad/pyannet.py) trained from
scratch on the corpus' own utterance bounds; everything downstream (RTTM
export, hysteresis binarization, bounds pickle, frame P/R/F1) matches the
reference's shapes. Runs on whatever backend jax picks (CPU-sized model).

  python -m tal_asrd_tpu.cli.sad --train-data accuracy/train \
      --test-data accuracy/test --out-dir accuracy/sad \
      --steps 300 --json-out accuracy/sad_metrics.json
"""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    p = argparse.ArgumentParser("neural SAD")
    p.add_argument("--train-data", type=str, required=True)
    p.add_argument("--test-data", type=str, required=True)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--window-secs", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--onset", type=float, default=0.52)
    p.add_argument("--offset", type=float, default=0.52)
    p.add_argument("--min-duration", type=float, default=0.1,
                   help="min on/off region seconds (reference: 0.1)")
    p.add_argument("--load", type=str, default=None,
                   help="skip training, score with these params")
    p.add_argument("--json-out", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from tal_asrd_tpu.data.audio_io import get_duration, load_audio_segment
    from tal_asrd_tpu.data.transcript import load_transcripts
    from tal_asrd_tpu.vad.eval import evaluate_vad, utterance_gold_bounds
    from tal_asrd_tpu.vad.pyannet import (
        FRAME_HOP, SAMPLE_RATE, PyanNet, frame_labels, score_episode)
    from tal_asrd_tpu.vad.sad import binarize, export_corpus

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    win = FRAME_HOP * max(1, round(args.window_secs * SAMPLE_RATE / FRAME_HOP))

    # --- corpus: per-episode (wav array, gold bounds) -----------------------
    def load_split(data_dir):
        transcripts = load_transcripts(data_dir)
        out = {}
        for stub, utts in transcripts.items():
            path = os.path.join(data_dir, f"{stub}.wav")
            if not os.path.exists(path):
                continue
            dur = get_duration(path)
            wav = load_audio_segment(path, 0.0, dur, SAMPLE_RATE)
            out[stub] = (np.asarray(wav, np.float32),
                         utterance_gold_bounds(utts), dur)
        return out

    train = load_split(args.train_data)
    test = load_split(args.test_data)
    print(f"train episodes: {len(train)}  test episodes: {len(test)}")

    # RTTM/UEM export (the reference's database-prep leg, vad/__init__.py:50-124)
    export_corpus(
        {s: [{"utterance_start": a, "utterance_end": b, "speaker": i}
             for i, (a, b) in enumerate(bounds)]
         for s, (w, bounds, d) in train.items()},
        {s: d for s, (w, bounds, d) in train.items()},
        args.out_dir)

    model = PyanNet()

    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, win), jnp.float32))["params"]
    if args.load:
        params = serialization.from_bytes(
            params, open(args.load, "rb").read())
    else:
        tx = optax.adam(args.lr)
        opt_state = tx.init(params)

        def sample_batch():
            stubs = list(train)
            xs, ys = [], []
            for _ in range(args.batch_size):
                wav, bounds, dur = train[stubs[rng.integers(len(stubs))]]
                start = int(rng.integers(0, max(1, len(wav) - win)))
                xs.append(wav[start:start + win])
                ys.append(frame_labels(bounds, win,
                                       offset_s=start / SAMPLE_RATE))
            return jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                logits = model.apply({"params": p}, x)
                return optax.sigmoid_binary_cross_entropy(logits, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for i in range(args.steps):
            x, y = sample_batch()
            params, opt_state, loss = step(params, opt_state, x, y)
            if i % 25 == 0 or i == args.steps - 1:
                print(f"step {i}: bce {float(loss):.4f}")
        with open(os.path.join(args.out_dir, "pyannet.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))

    # --- score + binarize test episodes (sad.pickle equivalent) ------------
    frame_s = FRAME_HOP / SAMPLE_RATE
    pred_bounds = {}
    scores_list = []
    for stub, (wav, bounds, dur) in sorted(test.items()):
        scores = score_episode(params, wav, window_s=args.window_secs)
        pred = binarize(scores, frame_s, onset=args.onset, offset=args.offset,
                        min_duration_on=args.min_duration,
                        min_duration_off=args.min_duration)
        pred_bounds[stub] = pred
        s = evaluate_vad(pred, bounds, dur)
        scores_list.append(s)
        print(f"{stub}: P {s.precision:.3f} R {s.recall:.3f} F1 {s.f1:.3f} "
              f"({len(pred)} regions)")
    with open(os.path.join(args.out_dir, "sad_bounds.pkl"), "wb") as f:
        pickle.dump(pred_bounds, f)

    if args.json_out and scores_list:
        import json
        mean = lambda k: sum(getattr(s, k) for s in scores_list) / len(scores_list)
        metrics = {"sad_precision_pct": round(100 * mean("precision"), 2),
                   "sad_recall_pct": round(100 * mean("recall"), 2),
                   "sad_f1_pct": round(100 * mean("f1"), 2)}
        with open(args.json_out, "w") as f:
            json.dump(metrics, f)
        print(f"SAD metrics -> {args.json_out}: {metrics}")


if __name__ == "__main__":
    main()
