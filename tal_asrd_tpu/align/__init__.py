from tal_asrd_tpu.align.dtw import dtw_cost_matrix, dtw_path, monotonic_segmentation
from tal_asrd_tpu.align.mfcc import mfcc, dct_matrix
from tal_asrd_tpu.align.forced import (
    align_episode,
    align_utterance,
    full_force_align,
    token_word_groups,
)

__all__ = [
    "dtw_cost_matrix",
    "dtw_path",
    "monotonic_segmentation",
    "mfcc",
    "dct_matrix",
    "align_episode",
    "align_utterance",
    "full_force_align",
    "token_word_groups",
]
