from etl_migrate_api_spark.functions.text import (
    extract_phones,
    norm_str,
    split_csv,
    join_csv,
    token_count,
    lang_id,
    quality_score,
    fingerprint,
    char_shingles,
    word_ngrams,
)
from etl_migrate_api_spark.functions.arrays import (
    ordered_distinct,
    slots_from_array,
    array_to_slots_struct,
)
from etl_migrate_api_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "extract_phones",
    "norm_str",
    "split_csv",
    "join_csv",
    "token_count",
    "lang_id",
    "quality_score",
    "fingerprint",
    "char_shingles",
    "word_ngrams",
    "ordered_distinct",
    "slots_from_array",
    "array_to_slots_struct",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
