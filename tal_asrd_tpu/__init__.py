"""tal_asrd_tpu — a TPU-native framework for joint ASR + speaker diarization of
long conversations.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
research codebase (calclavia/tal-asrd, mounted at /root/reference): training and
evaluating joint speech-recognition + multi-speaker-diarization seq2seq models on
hour-long multi-speaker audio, scored by WER and WDER.

Design stance (TPU-first, not a port):
  * All device compute is functional JAX under jit/pjit with explicit meshes.
  * Decode loops are lax.while_loop/scan with static shapes, on-device state and
    KV caches (the reference re-decodes the full prefix per step and syncs to
    host every iteration; cf. /root/reference/tal/asr/system.py:109-219).
  * The audio frontend (STFT -> mel -> log) is a single fused XLA computation
    whose mel projection rides the MXU; SpecAugment is a vectorized masking op
    (the reference loops in Python; cf. /root/reference/tal/asr/models.py:531-566).
  * Host-side exactness-critical code (edit-distance opcodes, Hungarian
    assignment, BPE) is native C++ with Python fallbacks.

Layout:
  core/      config, PRNG discipline, checkpointing (incl. surgical partial loads)
  ops/       XLA/Pallas kernels: log-mel, SpecAugment, resampler, VAD, n-gram mask
  models/    TDS encoder, ReZero decoder, ASR/SD models, decoder LM, UIS-RNN
  text/      tokenizer abstraction, native BPE, speaker-token handling
  data/      transcript indexing, aligned/segment datasets, bucketed collation
  train/     optimizers (LAMB et al.), schedules, train systems and loops
  decode/    KV-cached beam search, unaligned sliding-window decode, transcriber
  eval/      WER/WDER suite, clustering grid search, converters
  parallel/  device mesh + sharding rules (DP/TP), collective layout
  diarization/, vad/, align/  baseline subsystems
"""

import os as _os

if _os.environ.get("TAL_JAX_PLATFORMS"):
    # This environment preimports jax at interpreter startup (an axon
    # sitecustomize registers the tunneled TPU backend and force-sets
    # jax_platforms='axon,cpu' AND exports JAX_PLATFORMS=axon), so
    # JAX_PLATFORMS=cpu as an env var is silently ignored — a CPU-intended
    # CLI grabs the real TPU and contends with whatever is training on it.
    # Honoring JAX_PLATFORMS in-process here is also wrong: the ambient
    # JAX_PLATFORMS=axon would then clobber an explicit in-process pin such
    # as the test conftest's jax.config.update('jax_platforms','cpu').
    # A dedicated override var cannot collide with the ambient setting.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["TAL_JAX_PLATFORMS"])
    except RuntimeError:
        pass  # backend already instantiated; nothing safe to do

from tal_asrd_tpu.core.utils import (
    count_parameters,
    debug_log,
    set_seed,
    SuppressPrint,
)

__version__ = "0.1.0"

__all__ = [
    "count_parameters",
    "debug_log",
    "set_seed",
    "SuppressPrint",
    "__version__",
]
