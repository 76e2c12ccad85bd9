from rust_graph_db_spark.streaming.ingest import (  # noqa: F401
    stream_curate, stream_edge_upserts, stream_exact_dedup,
    stream_neardup_dedup, stream_vertex_upserts, windowed_event_counts,
)
