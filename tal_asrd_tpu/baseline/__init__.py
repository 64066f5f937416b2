from tal_asrd_tpu.baseline.sd_system import SDSystem
from tal_asrd_tpu.baseline.reconcile import (
    dump_episode_features,
    frame_gold_speakers,
    merge_asr_sd,
    utterance_frame_span,
)

__all__ = [
    "SDSystem",
    "dump_episode_features",
    "frame_gold_speakers",
    "merge_asr_sd",
    "utterance_frame_span",
]
