"""Inference engine base: train/test split, derive contract, evaluation.

Reference: ``src/linkml_store/inference/inference_engine.py:108-209`` (the
ABC + ``load_and_split_data``) and ``inference/evaluation.py:90-150``
(``evaluate_predictor`` accuracy over a test slice).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Inference:
    """A predicted (partial) object plus confidence
    (reference ``inference/inference_config.py``)."""

    predicted_object: Dict[str, Any]
    confidence: Optional[float] = None
    explanation: Optional[str] = None


@dataclass
class InferenceEngine:
    """Derive inferences from input objects and a collection
    (reference ``inference_engine.py:108-209``)."""

    feature_attributes: Optional[List[str]] = None
    target_attributes: Optional[List[str]] = None
    random_seed: int = 42
    training_df: Optional[DataFrame] = field(default=None, repr=False)
    testing_df: Optional[DataFrame] = field(default=None, repr=False)

    def load_and_split_data(
        self,
        df: DataFrame,
        split: Tuple[float, float] = (0.7, 0.3),
        randomize: bool = True,
    ) -> None:
        """Random train/test split with seed (reference
        ``inference_engine.py:122-149``) — ``df.randomSplit`` keeps the split
        distributed; no driver materialization."""
        if split[0] >= 1.0:
            self.training_df, self.testing_df = df, None
            return
        if randomize:
            self.training_df, self.testing_df = df.randomSplit(
                [split[0], split[1]], seed=self.random_seed
            )
        else:
            # deterministic prefix split via monotonically increasing ids
            n = df.count()
            cut = int(n * split[0])
            ordered = df.withColumn("__rid", F.monotonically_increasing_id())
            self.training_df = ordered.filter(F.col("__rid") < cut).drop("__rid")
            self.testing_df = ordered.filter(F.col("__rid") >= cut).drop("__rid")

    def initialize_model(self, **kwargs) -> None:
        raise NotImplementedError

    def derive(self, object: Dict[str, Any]) -> Optional[Inference]:
        raise NotImplementedError

    def predict_df(self, df: DataFrame) -> DataFrame:
        """Batch prediction: input rows + predicted target column(s)."""
        raise NotImplementedError


def evaluate_predictor(
    engine: InferenceEngine,
    test_df: DataFrame,
    target_attribute: str,
    prediction_col: Optional[str] = None,
) -> float:
    """Accuracy of batch predictions against truth (reference
    ``inference/evaluation.py:90-150``) — one distributed aggregate, no
    per-object driver loop."""
    pred_col = prediction_col or f"{target_attribute}_pred"
    preds = engine.predict_df(test_df.drop(pred_col) if pred_col in test_df.columns else test_df)
    agg = preds.agg(
        F.avg(
            (F.col(pred_col) == F.col(target_attribute)).cast("double")
        ).alias("accuracy")
    ).first()
    return float(agg["accuracy"]) if agg["accuracy"] is not None else 0.0
