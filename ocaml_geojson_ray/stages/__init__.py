"""Per-batch Ray Data transforms (stateless tasks + actor-pool classes)."""

from .ann import BruteForceTopK, brute_force_topk, ivf_topk
from .dedup import (
    MinHasher,
    PairVerifier,
    exact_dedup,
    embedding_neardup_pairs,
    jaccard_ngrams,
    minhash_lsh_candidates,
    simhash_dedup,
)
from .extract import extract_text_batch, verify_extraction_batch
from .mine import GeoJsonMiner, find_candidates
from .parse_stage import parse_candidates_batch
from .rewrite import MapGeometry, MapProps, fold_geometry, fold_props
from .sketches import BloomFilter, HyperLogLog, hll_distinct
from .textstats import LangId, QualityScore, TextStats, TokenCounter
from .tiles_stage import assign_tiles_batch, densest_tiles, tile_stats, tiles_to_features
from .windows import session_windows, sliding, tumbling

__all__ = [
    "BruteForceTopK", "brute_force_topk", "ivf_topk",
    "MinHasher", "PairVerifier", "exact_dedup", "embedding_neardup_pairs",
    "jaccard_ngrams", "minhash_lsh_candidates", "simhash_dedup",
    "extract_text_batch", "verify_extraction_batch",
    "GeoJsonMiner", "find_candidates", "parse_candidates_batch",
    "MapGeometry", "MapProps", "fold_geometry", "fold_props",
    "BloomFilter", "HyperLogLog", "hll_distinct",
    "LangId", "QualityScore", "TextStats", "TokenCounter",
    "assign_tiles_batch", "densest_tiles", "tile_stats", "tiles_to_features",
    "session_windows", "sliding", "tumbling",
]
