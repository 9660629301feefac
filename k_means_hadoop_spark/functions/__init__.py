from k_means_hadoop_spark.functions.vector import (
    cosine_similarity,
    dot,
    euclidean,
    l2_norm,
    squared_distance,
)
from k_means_hadoop_spark.functions.hashing import stable_hash64, word_ngrams

__all__ = [
    "euclidean",
    "squared_distance",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "stable_hash64",
    "word_ngrams",
]
