from secure_agent_api_vector_search_spark.sources.layout import (  # noqa: F401
    compact_parquet,
    compact_partitions,
    write_zordered,
    zone_map,
)
from secure_agent_api_vector_search_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_documents,
    load_embeddings,
    register_views,
)
