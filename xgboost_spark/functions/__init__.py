from xgboost_spark.functions.objectives import get_objective, Objective  # noqa: F401

# NOTE: xgboost_spark.functions.metrics imports pyspark; import it
# explicitly where needed so the pure-NumPy local path stays Spark-free.
