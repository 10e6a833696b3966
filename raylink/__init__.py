"""raylink — a Ray-Data-native probabilistic record-linkage engine.

A from-scratch reimplementation of the query/data-processing capabilities of
joeornstein/fuzzylink (R, CRAN; see /root/reference) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow batches, actor pools for
stateful stages (embedding), explicit blocking-key shuffles with salting/tiling
for hot keys, driver-coordinated active-learning loops over a bounded label
budget, and distributed transitive clustering.

This is NOT a port: the reference is a single-process R package whose pipeline
semantics (see SURVEY.md) are re-expressed here as streaming Ray Data graphs.
"""

from raylink.config import LinkConfig
from raylink.pipeline import fuzzylink, LinkResult
from raylink.embed import HashedNgramEmbedder, get_embeddings, get_similarity_matrix
from raylink.oracle import CallableOracle, DeterministicOracle, check_match
from raylink.http_client import HttpBatchOracle, HttpEmbedder, HttpOracle
from raylink.keys import install_api_key, load_env
from raylink.features import (
    jaro_winkler_sim,
    osa_distance,
    qgram_cosine_distance,
    qgram_jaccard_distance,
    qgram_count_distance,
    lcs_distance,
    soundex,
    soundex_distance,
    dot,
)

__all__ = [
    "LinkConfig",
    "fuzzylink",
    "LinkResult",
    "HashedNgramEmbedder",
    "get_embeddings",
    "get_similarity_matrix",
    "DeterministicOracle",
    "CallableOracle",
    "HttpBatchOracle",
    "HttpEmbedder",
    "HttpOracle",
    "install_api_key",
    "load_env",
    "check_match",
    "jaro_winkler_sim",
    "osa_distance",
    "qgram_cosine_distance",
    "qgram_jaccard_distance",
    "qgram_count_distance",
    "lcs_distance",
    "soundex",
    "soundex_distance",
    "dot",
]

__version__ = "0.1.0"
