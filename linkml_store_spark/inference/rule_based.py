"""Rule-based inference: derive slot values from conditions + expressions.

Reference (``src/linkml_store/inference/implementations/
rule_based_inference_engine.py:22-169``): rules have preconditions (slot
conditions / expressions over the object) and postconditions that set slot
values (constants or evaluated expressions).

Spark-first: a rule set compiles to one chained ``CASE WHEN`` column per
target slot — preconditions become the engine's where-compiler predicates,
postcondition expressions become ``F.expr`` SQL. Batch inference over any
size collection is a single narrow projection (no shuffle, codegen'd);
``derive`` runs the same rules on a 1-row local plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkml_store_spark.inference.base import Inference, InferenceEngine
from linkml_store_spark.where import compile_where


@dataclass
class Rule:
    """IF ``preconditions`` (where-dict) THEN set ``postconditions``.

    ``postconditions`` maps slot -> constant; values wrapped as
    ``{"expr": "..."}`` are evaluated as SQL expressions over the row
    (the analog of linkml's ``equals_expression``).
    """

    preconditions: Dict[str, Any]
    postconditions: Dict[str, Any]


@dataclass
class RuleBasedInferenceEngine(InferenceEngine):
    rules: List[Rule] = field(default_factory=list)

    def add_rule(self, preconditions: Dict[str, Any], postconditions: Dict[str, Any]):
        self.rules.append(Rule(preconditions, postconditions))
        return self

    def initialize_model(self, **kwargs) -> None:  # rules are the model
        return None

    def _value_expr(self, v: Any):
        if isinstance(v, dict) and "expr" in v:
            return F.expr(v["expr"])
        return F.lit(v)

    def predict_df(self, df: DataFrame) -> DataFrame:
        """Apply every rule; later rules win on overlap (reference apply_rule
        mutates in order). Targets get ``{slot}_pred`` columns."""
        targets: Dict[str, Any] = {}
        for rule in self.rules:
            cond = compile_where(rule.preconditions, df)
            for slot, value in rule.postconditions.items():
                prev = targets.get(slot)
                expr = self._value_expr(value)
                applied = expr if cond is None else F.when(cond, expr)
                if prev is not None:
                    applied = (
                        applied.otherwise(prev)
                        if cond is not None
                        else applied
                    )
                targets[slot] = applied
        out = df
        for slot, col in targets.items():
            out = out.withColumn(f"{slot}_pred", col)
        return out

    def derive(self, object: Dict[str, Any]) -> Optional[Inference]:
        """Single-object path: evaluate the same compiled rules on a 1-row
        DataFrame (keeps rule semantics in one place)."""
        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        df = spark.createDataFrame([object])
        row = self.predict_df(df).first().asDict(recursive=True)
        predicted = {
            k[: -len("_pred")]: v for k, v in row.items() if k.endswith("_pred")
        }
        if all(v is None for v in predicted.values()):
            return None
        return Inference(predicted_object=predicted, confidence=1.0)
