from tal_asrd_tpu.eval.editdist import eval_distance, opcodes
from tal_asrd_tpu.eval.wder import (
    calculate_wder,
    calculate_wer,
    compute_sequence_match,
    convert_to_wder_format,
    corpus_wder,
    wder_segment,
)
from tal_asrd_tpu.eval.clustering import (
    cluster_embeddings,
    cosine_distance,
    cosine_distance_matrix,
    cosine_similarity,
    inverse_dot_product,
    make_cluster_fn,
    neg_dot_product,
)

__all__ = [
    "eval_distance",
    "opcodes",
    "calculate_wder",
    "calculate_wer",
    "compute_sequence_match",
    "convert_to_wder_format",
    "corpus_wder",
    "wder_segment",
    "cluster_embeddings",
    "cosine_distance",
    "cosine_distance_matrix",
    "cosine_similarity",
    "inverse_dot_product",
    "make_cluster_fn",
    "neg_dot_product",
]
