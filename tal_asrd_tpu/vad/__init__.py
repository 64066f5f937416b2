from tal_asrd_tpu.vad.core import (
    VadConfig,
    collector_mask,
    get_speech_frames,
    speech_bounds,
    speech_decisions,
    speech_probabilities,
    vad_collector,
)
from tal_asrd_tpu.vad.eval import VadScores, evaluate_vad, rasterize
from tal_asrd_tpu.vad.pipeline import run_vad_directory, run_vad_file
from tal_asrd_tpu.vad.pyannet import PyanNet, SincConv, score_episode
from tal_asrd_tpu.vad.sad import binarize, export_corpus, to_rttm, to_uem

__all__ = [
    "VadConfig",
    "collector_mask",
    "get_speech_frames",
    "speech_bounds",
    "speech_decisions",
    "speech_probabilities",
    "vad_collector",
    "VadScores",
    "evaluate_vad",
    "rasterize",
    "run_vad_directory",
    "run_vad_file",
    "PyanNet",
    "SincConv",
    "score_episode",
    "binarize",
    "export_corpus",
    "to_rttm",
    "to_uem",
]
