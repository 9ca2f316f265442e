"""ML inference: decision tree over encoded features (Spark ML pipeline).

Reference (``src/linkml_store/inference/implementations/
sklearn_inference_engine.py:22-314``): DecisionTreeClassifier (default) over
OneHot/label-encoded features, skipping very-high-cardinality columns;
cross-validated confidence. And ``utils/stats_utils.py:5-53``
(``predictive_power``: per-column decision-tree CV accuracy).

Spark-first: the encoder + tree is a ``pyspark.ml`` Pipeline —
StringIndexer per categorical column (the label-encoding the reference
uses), VectorAssembler, DecisionTreeClassifier; training and scoring are
distributed, model broadcast to executors for batch prediction. Works
unchanged on a 1000-executor cluster; the reference collects everything to
a single pandas frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkml_store_spark.inference.base import Inference, InferenceEngine

#: reference skips columns with >20% distinct values
#: (sklearn_inference_engine.py high-cardinality guard)
MAX_CARDINALITY_FRACTION = 0.2


@dataclass
class SparkMLInferenceEngine(InferenceEngine):
    max_depth: int = 5
    _model: Any = field(default=None, repr=False)
    _target: Optional[str] = None
    _features: Optional[List[str]] = None

    def _eligible_features(self, df: DataFrame, target: str) -> List[str]:
        cols = self.feature_attributes or [c for c in df.columns if c != target]
        n = max(df.count(), 1)
        keep = []
        distinct = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in cols]
        ).first()
        for c in cols:
            dt = df.schema[c].dataType
            if not isinstance(dt, (T.StringType, T.NumericType, T.BooleanType)):
                continue
            if isinstance(dt, T.StringType) and distinct[c] / n > MAX_CARDINALITY_FRACTION:
                continue  # high-cardinality skip (reference behavior)
            keep.append(c)
        return keep

    def initialize_model(self, df: Optional[DataFrame] = None, target: Optional[str] = None) -> None:
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import DecisionTreeClassifier
        from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler

        train = df if df is not None else self.training_df
        target = target or (self.target_attributes or [None])[0]
        if train is None or target is None:
            raise ValueError("need a training DataFrame and a target attribute")
        self._target = target
        feats = self._eligible_features(train, target)
        if not feats:
            raise ValueError("no usable feature columns")
        self._features = feats

        stages = []
        assembled = []
        for c in feats:
            if isinstance(train.schema[c].dataType, T.StringType):
                stages.append(
                    StringIndexer(
                        inputCol=c, outputCol=f"{c}__ix", handleInvalid="keep"
                    )
                )
                assembled.append(f"{c}__ix")
            else:
                assembled.append(c)
        label_indexer = StringIndexer(
            inputCol=target, outputCol="__label", handleInvalid="skip"
        )
        stages += [
            label_indexer,
            VectorAssembler(inputCols=assembled, outputCol="__features", handleInvalid="keep"),
            DecisionTreeClassifier(
                featuresCol="__features",
                labelCol="__label",
                maxDepth=self.max_depth,
                seed=self.random_seed,
            ),
        ]
        pipe = Pipeline(stages=stages)
        train = train.filter(F.col(target).isNotNull()).withColumn(
            target, F.col(target).cast("string")
        )
        self._model = pipe.fit(train)
        # decode predicted label index back to the original string
        self._label_values = next(
            s for s in self._model.stages if hasattr(s, "labels") and s.getOutputCol() == "__label"
        ).labels
        self._decoder = IndexToString(
            inputCol="prediction",
            outputCol=f"{target}_pred",
            labels=self._label_values,
        )

    def predict_df(self, df: DataFrame) -> DataFrame:
        if self._model is None:
            raise ValueError("model not initialized — call initialize_model first")
        target = self._target
        scored = self._model.transform(
            df.withColumn(
                target,
                F.coalesce(
                    F.col(target).cast("string"), F.lit(self._label_values[0])
                ),
            )
            if target in df.columns
            else df.withColumn(target, F.lit(self._label_values[0]))
        )
        out = self._decoder.transform(scored)
        drop = [c for c in out.columns if c.startswith("__") or c.endswith("__ix")]
        drop += ["rawPrediction", "probability", "prediction"]
        return out.drop(*drop)

    def derive(self, object: Dict[str, Any]) -> Optional[Inference]:
        spark = SparkSession.getActiveSession()
        df = spark.createDataFrame([object])
        row = self.predict_df(df).first()
        return Inference(
            predicted_object={self._target: row[f"{self._target}_pred"]},
        )

    def save_model(self, path: str) -> None:
        """Persist pipeline + engine metadata (reference save_model /
        export_model contract, inference_engine.py:181-199). The Spark ML
        writer is itself distributed (model params as parquet)."""
        import json
        import os

        if self._model is None:
            raise ValueError("no trained model to save")
        self._model.write().overwrite().save(os.path.join(path, "pipeline"))
        meta = {
            "target": self._target,
            "features": self._features,
            "labels": list(self._label_values),
            "max_depth": self.max_depth,
            "random_seed": self.random_seed,
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "engine.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load_model(cls, path: str) -> "SparkMLInferenceEngine":
        import json
        import os

        from pyspark.ml import PipelineModel
        from pyspark.ml.feature import IndexToString

        with open(os.path.join(path, "engine.json")) as f:
            meta = json.load(f)
        eng = cls(
            max_depth=meta["max_depth"],
            random_seed=meta["random_seed"],
            feature_attributes=meta["features"],
        )
        eng._model = PipelineModel.load(os.path.join(path, "pipeline"))
        eng._target = meta["target"]
        eng._features = meta["features"]
        eng._label_values = meta["labels"]
        eng._decoder = IndexToString(
            inputCol="prediction",
            outputCol=f"{meta['target']}_pred",
            labels=meta["labels"],
        )
        return eng


def predictive_power(
    df: DataFrame,
    target_col: str,
    feature_cols: Optional[List[str]] = None,
    cv: int = 5,
    seed: int = 42,
) -> float:
    """Decision-tree k-fold CV accuracy predicting ``target_col``
    (reference ``utils/stats_utils.py:5-36``). Folds via deterministic
    randomSplit; each fold trains/scoring distributed."""
    n_unique = df.select(target_col).distinct().count()
    cv = min(cv, n_unique)
    engine = SparkMLInferenceEngine(
        feature_attributes=feature_cols, random_seed=seed
    )
    if cv < 2:
        engine.initialize_model(df, target_col)
        from linkml_store_spark.inference.base import evaluate_predictor

        return evaluate_predictor(engine, df, target_col)
    folds = df.randomSplit([1.0] * cv, seed=seed)
    from linkml_store_spark.inference.base import evaluate_predictor

    scores = []
    for i in range(cv):
        test = folds[i]
        train = None
        for j, f in enumerate(folds):
            if j != i:
                train = f if train is None else train.unionByName(f)
        if test.count() == 0 or train is None or train.count() == 0:
            continue
        eng = SparkMLInferenceEngine(feature_attributes=feature_cols, random_seed=seed)
        try:
            eng.initialize_model(train, target_col)
        except ValueError:
            continue
        scores.append(evaluate_predictor(eng, test, target_col))
    return float(sum(scores) / len(scores)) if scores else float("nan")


def analyze_predictive_power(
    df: DataFrame, columns: Optional[List[str]] = None, cv: int = 5
) -> DataFrame:
    """Per-column predictive power table (reference stats_utils.py:39-53)."""
    columns = columns or df.columns
    rows = []
    for target in columns:
        feats = [c for c in columns if c != target]
        try:
            power = predictive_power(df, target, feats, cv)
        except Exception:
            power = None
        rows.append(
            {"column": target, "predictive_power": power, "features": ", ".join(feats)}
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        schema="column string, predictive_power double, features string",
    )
