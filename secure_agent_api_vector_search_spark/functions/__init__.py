from secure_agent_api_vector_search_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    l2_distance,
    cosine_similarity,
    cosine_distance,
    normalize,
)
from secure_agent_api_vector_search_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    normalized_text,
    bag_fingerprint,
    char_shingles,
    STOPWORDS,
)
