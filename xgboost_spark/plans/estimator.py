"""pyspark.ml Estimator/Transformer API.

Mirrors the reference's own Spark surface
(`python-package/xgboost/spark/estimator.py:80,249,437` —
SparkXGBRegressor / SparkXGBClassifier / SparkXGBRanker), param-for-param
where sensible, but the training underneath is the Spark-native boosting
driver (plans/booster.py) instead of barrier-mode native workers.

Usage::

    est = SparkGBDTClassifier(label_col="label", features_col="embedding",
                              num_boost_round=20, max_depth=4)
    model = est.fit(train_df)
    scored = model.transform(test_df)        # adds prediction columns
    model.write().save("/tmp/m.json"); SparkGBDTClassifierModel.load(...)
"""

from __future__ import annotations

from pyspark.ml.base import Estimator, Model
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgboost_spark.config import TrainParams
from xgboost_spark.plans.booster import SparkBooster
from xgboost_spark.plans.model import GBDTModel


class _GBDTEstimator(Estimator):
    _default_objective = "reg:squarederror"

    def __init__(self, label_col: str = "label", features_col: str | list[str] = "features",
                 weight_col: str | None = None, base_margin_col: str | None = None,
                 qid_col: str | None = None, validation_indicator_col: str | None = None,
                 **params):
        super().__init__()
        self.label_col = label_col
        self.features_col = features_col
        self.weight_col = weight_col
        self.base_margin_col = base_margin_col
        self.qid_col = qid_col
        self.validation_indicator_col = validation_indicator_col
        params.setdefault("objective", self._default_objective)
        self.params = TrainParams.from_dict(params)

    def _feature_kw(self, df: DataFrame) -> dict:
        if isinstance(self.features_col, str):
            dtype = dict(df.dtypes).get(self.features_col, "")
            if dtype.startswith("array"):
                return {"array_col": self.features_col}
            return {"feature_cols": [self.features_col]}
        return {"feature_cols": list(self.features_col)}

    def _fit(self, dataset: DataFrame):
        evals = None
        train_df = dataset
        if self.validation_indicator_col:
            train_df = dataset.filter(~F.col(self.validation_indicator_col))
            evals = [(dataset.filter(F.col(self.validation_indicator_col)), "validation")]
        booster = SparkBooster(self.params)
        core_model = booster.fit(
            train_df, label_col=self.label_col, weight_col=self.weight_col,
            base_margin_col=self.base_margin_col, qid_col=self.qid_col,
            evals=evals, **self._feature_kw(train_df),
        )
        return self._model_cls(core_model, self._feature_kw(train_df))

    @property
    def _model_cls(self):
        return _GBDTModel


class _GBDTModel(Model):
    def __init__(self, core_model: GBDTModel, feature_kw: dict):
        super().__init__()
        self.core = core_model
        self._feature_kw = feature_kw

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return self.core.transform(dataset, **self._feature_kw)

    def transform(self, dataset: DataFrame, **kw) -> DataFrame:
        if kw:
            return self.core.transform(dataset, **self._feature_kw, **kw)
        return self._transform(dataset)

    # ml-writer-style persistence (reference `_SparkXGBModel`
    # MLReadable/MLWritable, spark/core.py:569)
    def save(self, path: str):
        import json
        doc = json.loads(self.core.to_json())
        doc["xgboost_spark"]["feature_kw"] = self._feature_kw
        with open(path, "w") as f:
            json.dump(doc, f)

    @classmethod
    def load(cls, path: str) -> "_GBDTModel":
        import json
        with open(path) as f:
            doc = json.load(f)
        fkw = doc.get("xgboost_spark", {}).get("feature_kw", {})
        core_model = GBDTModel.from_json(json.dumps(doc))
        return cls(core_model, fkw)

    def get_feature_importances(self, importance_type: str = "weight"):
        return self.core.feature_importance(importance_type)

    @property
    def best_iteration(self):
        return self.core.best_iteration


class SparkGBDTRegressor(_GBDTEstimator):
    """Analog of SparkXGBRegressor (`spark/estimator.py:80`)."""
    _default_objective = "reg:squarederror"


class SparkGBDTClassifier(_GBDTEstimator):
    """Analog of SparkXGBClassifier (`spark/estimator.py:249`).
    Binary by default; pass objective='multi:softprob', num_class=K for
    multiclass.  transform() adds `prediction` (probability / prob array);
    `predict_label` adds the hard class.
    """
    _default_objective = "binary:logistic"

    def _fit(self, dataset: DataFrame):
        if self.params.objective.startswith("multi:") and self.params.num_class <= 1:
            k = dataset.agg(F.max(self.label_col)).first()[0]
            self.params.num_class = int(k) + 1
        return super()._fit(dataset)

    @property
    def _model_cls(self):
        return SparkGBDTClassifierModel


class SparkGBDTClassifierModel(_GBDTModel):
    def transform_with_label(self, dataset: DataFrame, threshold: float = 0.5) -> DataFrame:
        scored = self.transform(dataset)
        if self.core.params.n_groups > 1:
            # argmax over probability array
            return scored.withColumn(
                "predicted_label",
                F.expr("array_position(prediction, array_max(prediction)) - 1").cast("int"),
            )
        return scored.withColumn("predicted_label", (F.col("prediction") > threshold).cast("int"))


class SparkGBDTRegressorModel(_GBDTModel):
    pass


class SparkGBDTRanker(_GBDTEstimator):
    """Analog of SparkXGBRanker (`spark/estimator.py:437`); requires qid_col."""
    _default_objective = "rank:ndcg"

    def _fit(self, dataset: DataFrame):
        if not self.qid_col:
            raise ValueError("SparkGBDTRanker requires qid_col")
        return super()._fit(dataset)
