"""Split validation: teacher-forced loss of a checkpoint on (a) single
aligned utterances and (b) shiftaug segment windows, separately.

The trainer's val_loss is a single mean over both (cli/train.py wires a
deterministic SegmentDataset into valid when --shiftaug); this probe breaks
it apart to show whether long-window learning is progressing vs cannibalizing
the short task (the round-3 curriculum failure mode: aligned 0.85 -> 2.4
while segments sat at unigram entropy).

    TAL_JAX_PLATFORMS=cpu python scripts/val_split.py CKPT [--max-secs 14]
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.checkpoint import load_pytree
from tal_asrd_tpu.core.config import ModelConfig, SpecAugmentConfig, TrainConfig
from tal_asrd_tpu.data.aligned import AlignedDataset
from tal_asrd_tpu.data.collate import BucketedCollater
from tal_asrd_tpu.data.segment import SegmentDataset
from tal_asrd_tpu.text import BpeTokenizer
from tal_asrd_tpu.train.system import ASRSystem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--acc-dir", default="accuracy")
    ap.add_argument("--max-secs", type=float, default=14.0)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--enc-posenc", action="store_true", default=False)
    args = ap.parse_args()

    d = args.acc_dir
    tok = BpeTokenizer(model_path=f"{d}/bpe.model")
    # Honor the debug-tiny architecture so this probe can score checkpoints
    # written by TAL_TINY_ARCH training runs (cli/args.py applies the same
    # overrides; shapes mismatch loudly if the env differs between legs).
    tiny = {}
    if os.environ.get("TAL_TINY_ARCH"):
        tiny = dict(tds_depths=(1, 1, 1), width_mult=0.1,
                    d_decoder_override=64)
    mcfg = ModelConfig(model_type="1x", num_speakers=args.speakers,
                       vocab_size=len(tok), enc_posenc=args.enc_posenc, **tiny)
    sys_ = ASRSystem(mcfg, TrainConfig(), specaug_cfg=SpecAugmentConfig(
        num_freq_masks=0, num_time_masks=0))
    params = load_pytree(args.ckpt)
    coll = BucketedCollater(tok.pad_token_id)
    ev = jax.jit(lambda p, b: sys_.loss_fn(p, b, None, False)[1])

    al = AlignedDataset(f"{d}/valid", tok, num_utterances=1,
                       max_segment_duration=args.max_secs,
                       speaker_map_loc=f"{d}/valid/speaker_map.json",
                       tokenizer_speakers=True, return_spk_ids=True)
    sg = SegmentDataset(f"{d}/valid", tok, segment_size=args.max_secs,
                        speaker_map_loc=f"{d}/valid/speaker_map.json",
                        tokenizer_speakers=True, return_spk_ids=True,
                        det_seed=1234)
    out = {"ckpt": args.ckpt, "max_secs": args.max_secs}
    for name, ds in (("aligned", al), ("segment", sg)):
        losses = []
        for s in range(0, min(args.batches * args.batch_size, len(ds)),
                       args.batch_size):
            items = [ds[i] for i in range(s, min(s + args.batch_size, len(ds)))]
            b = {k: jnp.asarray(v) for k, v in coll(items).items()}
            losses.append(float(ev(params, b)["loss"]))
        out[f"val_{name}"] = round(sum(losses) / len(losses), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
