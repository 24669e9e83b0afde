from xgboost_spark.plans.booster import SparkBooster, train  # noqa: F401
from xgboost_spark.plans.model import GBDTModel  # noqa: F401
