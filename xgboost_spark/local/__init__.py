from xgboost_spark.local.booster import LocalBooster  # noqa: F401
