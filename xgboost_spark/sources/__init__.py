from xgboost_spark.sources.tables import load_table, load_tables, assemble_features  # noqa: F401
