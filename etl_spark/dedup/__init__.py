from etl_spark.dedup.exact import exact_dedup, exact_dup_groups
from etl_spark.dedup.minhash import (
    lsh_band_keys,
    lsh_candidate_pairs,
    minhash_signature,
)
from etl_spark.dedup.jaccard import ngram_jaccard_pairs, shingle_jaccard
from etl_spark.dedup.simhash import simhash64, simhash_md5
from etl_spark.dedup.embed import cosine_sim, embedding_neardup_pairs

__all__ = [
    "cosine_sim",
    "embedding_neardup_pairs",
    "exact_dedup",
    "exact_dup_groups",
    "lsh_band_keys",
    "lsh_candidate_pairs",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "shingle_jaccard",
    "simhash64",
    "simhash_md5",
]
