"""Cross-attention centroid diagnostic for the multi-utterance bridge.

For each target token of a teacher-forced 4-utterance aligned window, compute
the mean-over-layers/heads cross-attention centroid (expected memory frame)
and compare with the token's TRUE audio frame (derivable on the synth cipher:
0.18 s/char + 0.04 s word gaps + utterance offsets). Reports, per utterance
index, the mean |centroid - truth| in frames and the attention entropy.

If utterance-1 tokens track truth (small error) while utterance-2+ centroids
are diffuse or stuck inside utterance 1, continuation is attention-blocked:
the memory carries no positional code (parity with the reference,
tal/asr/models.py:195-247) and content n-gram matching does not reach past
the first utterance on a tone cipher.

    TAL_JAX_PLATFORMS=cpu python scripts/diag_attn.py CKPT
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tal_asrd_tpu.core.checkpoint import load_pytree
from tal_asrd_tpu.core.config import ModelConfig, SpecAugmentConfig, TrainConfig
from tal_asrd_tpu.data.aligned import AlignedDataset
from tal_asrd_tpu.data.collate import BucketedCollater
from tal_asrd_tpu.text import BpeTokenizer
from tal_asrd_tpu.train.system import ASRSystem

FRAME_S = 0.08  # encoder frame hop (stride 8 over 10 ms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--acc-dir", default="accuracy")
    ap.add_argument("--num-utt", type=int, default=4)
    ap.add_argument("--max-secs", type=float, default=28.5)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--enc-posenc", action="store_true", default=False)
    args = ap.parse_args()

    d = args.acc_dir
    tok = BpeTokenizer(model_path=f"{d}/bpe.model")
    mcfg = ModelConfig(model_type="1x", num_speakers=args.speakers,
                       vocab_size=len(tok), enc_posenc=args.enc_posenc)
    sys_ = ASRSystem(mcfg, TrainConfig(), specaug_cfg=SpecAugmentConfig(
        num_freq_masks=0, num_time_masks=0))
    params = load_pytree(args.ckpt)
    coll = BucketedCollater(tok.pad_token_id)

    ds = AlignedDataset(f"{d}/valid", tok, num_utterances=args.num_utt,
                        max_segment_duration=args.max_secs,
                        speaker_map_loc=f"{d}/valid/speaker_map.json",
                        tokenizer_speakers=True, return_spk_ids=True)

    @jax.jit
    def run(params, batch):
        y = batch["text"]
        y = jnp.minimum(y, mcfg.vocab_size + mcfg.num_speakers - 1)
        y_prev = y[:, :-1]
        enc = sys_.model.apply({"params": params}, batch["audio"],
                               batch["audio_lens"], train=False,
                               method=sys_.model.encode)
        logits, attn = sys_.model.apply(
            {"params": params}, y_prev, enc, True, False,
            method=sys_.model.decode)
        # attn: [layers, B, L, S] (already head-meaned by the decoder return)
        a = jnp.mean(attn.astype(jnp.float32), axis=0)       # [B, L, S]
        frames = jnp.arange(a.shape[-1], dtype=jnp.float32)
        centroid = jnp.sum(a * frames, axis=-1)              # [B, L]
        ent = -jnp.sum(a * jnp.log(a + 1e-9), axis=-1)       # [B, L]
        return centroid, ent, y[:, 1:]

    # True per-token frame positions from the window's utterance records.
    # AlignedDataset windows = consecutive utterances; re-derive via ds index.
    items = [ds[i] for i in range(min(args.batch_size, len(ds)))]
    b = {k: jnp.asarray(v) for k, v in coll(items).items()}
    centroid, ent, y_t = jax.device_get(run(params, b))

    eos = tok.eos_token_id
    err_sum = np.zeros(args.num_utt + 2); err_cnt = np.zeros(args.num_utt + 2)
    ent_sum = np.zeros(args.num_utt + 2)
    cent_mean = np.zeros(args.num_utt + 2)
    for bi, it in enumerate(items):
        # window utterance records for truth timing
        recs = ds.index[bi][1]  # (stub, [utterance dicts]) for this window
        toks = y_t[bi]
        prev_eos = np.cumsum(toks == eos) - (toks == eos)
        # truth: char-rate linear map within the window; window starts at the
        # first utterance's start time
        if recs:
            w0 = float(recs[0]["utterance_start"])
            # build char timeline: for each utterance, its start/end
            spans = [(float(r["utterance_start"]) - w0,
                      float(r["utterance_end"]) - w0) for r in recs]
        else:
            spans = None
        mask = toks != tok.pad_token_id
        for ti in range(len(toks)):
            if not mask[ti]:
                continue
            u = int(min(prev_eos[ti], args.num_utt + 1))
            if spans is not None and u < len(spans):
                s, e = spans[u]
                # utterance-level truth: centroid should land inside [s, e]
                c = centroid[bi, ti] * FRAME_S
                err = max(0.0, s - c, c - e)  # seconds outside the span
                err_sum[u] += err / FRAME_S   # frames outside the utterance
                err_cnt[u] += 1
                ent_sum[u] += ent[bi, ti]
                cent_mean[u] += centroid[bi, ti]

    out = {"ckpt": args.ckpt,
           "frames_outside_true_utt": [round(s / c, 1) if c else None
                                       for s, c in zip(err_sum, err_cnt)],
           "attn_entropy": [round(s / c, 2) if c else None
                            for s, c in zip(ent_sum, err_cnt)],
           "mean_centroid_frame": [round(s / c, 1) if c else None
                                   for s, c in zip(cent_mean, err_cnt)],
           "tokens": err_cnt.astype(int).tolist(),
           "uniform_entropy": round(float(np.log(centroid.shape[-1] if False else 357)), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
