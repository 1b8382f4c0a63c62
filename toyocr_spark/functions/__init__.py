from toyocr_spark.functions.textfns import (
    lang_id_scores,
    occurrences,
    quality_features,
    token_count,
)

__all__ = ["occurrences", "token_count", "quality_features", "lang_id_scores"]
