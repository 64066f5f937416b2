"""Benchmark: joint ASR+diarization decode throughput on one chip.

Measures the production inference path — window-batched KV-cached decoding of
long-form audio with the flagship '2x' joint model (speaker tokens in the
vocabulary): log-mel frontend + TDS encoder over a batch of 28.5 s windows,
then fixed-length greedy/beam decode (the realistic token budget for the
window length; EOS disabled so every window pays the full decode cost).

Metric: audio-hours decoded per wall-clock hour per chip
(`audio_hours_per_hour`). vs_baseline is the multiple of the 50x-real-time
north-star target (BASELINE.json; the reference never measured throughput —
its per-step host-synced full-prefix re-decode, system.py:109-219, is the
implicit baseline this design removes).

Env overrides: BENCH_BATCH (windows per batch), BENCH_STEPS (decode tokens per
window), BENCH_BEAM, BENCH_ITERS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import ModelConfig
from tal_asrd_tpu.decode import BeamSearchSpec, beam_search
from tal_asrd_tpu.models import ASRModel


def main():
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    max_new = int(os.environ.get("BENCH_STEPS", "96"))
    beam = int(os.environ.get("BENCH_BEAM", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    window_secs = 28.56  # 357 encoder frames ~ 28.5 s (system.py:658 chunk)
    sr = 16000
    t = int(window_secs * sr)

    cfg = ModelConfig(model_type="2x", num_speakers=64, vocab_size=10000)
    model = ASRModel(cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (batch, t), jnp.float32) * 0.1
    audio_lens = jnp.full((batch,), t, jnp.int32)
    y0 = jnp.zeros((batch, 4), jnp.int32)
    variables = model.init({"params": rng}, audio, y0, audio_lens)

    spec = BeamSearchSpec(
        beam_size=beam,
        max_new_tokens=max_new,
        eos_id=-1,  # never fires: every window pays the full token budget
        vocab_size=cfg.num_tokens,
        text_vocab_size=cfg.vocab_size,
        force_output=True,
    )

    @jax.jit
    def decode(variables, audio, audio_lens):
        enc = model.apply(variables, audio, audio_lens, False,
                          method=ASRModel.encode)
        return beam_search(model, variables, enc, jnp.ones((batch, 1), jnp.int32),
                           spec)

    # Warmup/compile. Timing uses an explicit host fetch of the result —
    # block_until_ready does not reliably fence through the axon tunnel.
    out = decode(variables, audio, audio_lens)
    np.asarray(out["tokens"])

    # Serving-style pipelined measurement: dispatch `iters` batches
    # back-to-back and fence once at the end, amortizing the tunnel's fixed
    # per-call round-trip (~40 ms) the way a real serving loop keeps batches
    # in flight.
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(variables, audio, audio_lens)
    np.asarray(out["tokens"])
    per_batch = (time.perf_counter() - t0) / iters

    audio_seconds = batch * window_secs
    realtime_x = audio_seconds / per_batch
    audio_hours_per_hour = realtime_x  # hours of audio per wall hour

    print(json.dumps({
        "metric": "joint_decode_audio_hours_per_hour_per_chip",
        "value": round(audio_hours_per_hour, 2),
        "unit": "audio-hours/hour",
        "vs_baseline": round(audio_hours_per_hour / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
