from rust_graph_db_spark.functions.scalar import compile_scalar_call  # noqa: F401
