"""Shared constants for the text/dedup/similarity query family.

All hashing is the cross-engine md5-prefix scheme (see
gene_etl_spark.functions.md5_long): Spark and DuckDB compute identical
values, so every operator here is value-hash comparable.

MinHash arithmetic is kept inside 64-bit-safe ranges (DuckDB errors on
BIGINT overflow; Spark wraps silently — neither behavior may be hit):
token hash is reduced mod TOKEN_P (~2^20) before the affine maps.
"""

import random

TOKEN_P = 1_000_003  # prime: token-hash reduction modulus
MINHASH_P = 999_983  # prime: affine map modulus
NUM_HASHES = 12
BAND_SIZE = 3  # -> 4 bands

_rng = random.Random(20260816)
MINHASH_A = [_rng.randrange(1, MINHASH_P) for _ in range(NUM_HASHES)]
MINHASH_B = [_rng.randrange(0, MINHASH_P) for _ in range(NUM_HASHES)]

JACCARD_THRESHOLD = 0.3
SIMHASH_BITS = 16
SIMHASH_MAX_HAMMING = 3
TOPK_PAIRS = 50
ANN_K = 20
IVF_K = 10

# deliberately disjoint marker-word sets (the language-ID heuristic —
# n-gram/stopword scoring with a deterministic argmax priority)
LANG_MARKERS = {
    "en": ["the", "a", "row", "fast"],
    "de": ["table", "hash", "window"],
    "es": ["data", "query", "slow"],
    "fr": ["join", "group", "sort"],
    "zh": ["spark", "batch", "merge"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

BPE_ISH_PATTERN = "[a-z0-9]+|[^a-z0-9 ]"
