from flouds_vectordb_spark.functions.vector import (  # noqa: F401
    cosine_score,
    dot_score,
    l2_score,
    metric_score,
    normalize,
)
from flouds_vectordb_spark.functions.text import (  # noqa: F401
    tokenize,
    text_filter_predicate,
)
from flouds_vectordb_spark.functions.hashing import hash64, shingles  # noqa: F401
