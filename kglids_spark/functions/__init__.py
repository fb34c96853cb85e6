from kglids_spark.functions.scalar import (  # noqa: F401
    generate_label,
    column_pair_id,
    cosine_similarity,
    dot_product,
    l2_norm,
)
