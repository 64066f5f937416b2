from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search, make_generate_fn
from tal_asrd_tpu.decode.unaligned import UnalignedSpec, unaligned_decode
from tal_asrd_tpu.decode.transcribe import (
    TranscribeConfig,
    Transcriber,
    splice_strings,
)
from tal_asrd_tpu.decode.reference_mode import greedy_noncausal

__all__ = [
    "BeamSearchSpec",
    "beam_search",
    "make_generate_fn",
    "UnalignedSpec",
    "unaligned_decode",
    "TranscribeConfig",
    "Transcriber",
    "splice_strings",
    "greedy_noncausal",
]
