"""Inference engines: predict missing fields of objects from a collection.

Reference surface (``src/linkml_store/inference/``): pluggable engines behind
a registry — rule-based (expression evaluation), sklearn (decision tree over
encoded features), LLM/RAG (retrieval + few-shot generation). Re-expressed
Spark-first: training and batch prediction are DataFrame plans; per-object
``derive`` drives the same compiled model.
"""

from linkml_store_spark.inference.base import (
    Inference,
    InferenceEngine,
    evaluate_predictor,
)
from linkml_store_spark.inference.rule_based import RuleBasedInferenceEngine
from linkml_store_spark.inference.sparkml import SparkMLInferenceEngine
from linkml_store_spark.inference.rag import RAGInferenceEngine
from linkml_store_spark.inference.llm import LLMInferenceEngine

_REGISTRY = {
    "rule_based": RuleBasedInferenceEngine,
    "sklearn": SparkMLInferenceEngine,  # reference name; Spark ML implementation
    "sparkml": SparkMLInferenceEngine,
    "rag": RAGInferenceEngine,
    "llm": LLMInferenceEngine,
}


def get_inference_engine(predictor_type: str, **kwargs) -> InferenceEngine:
    """Registry lookup (reference ``inference_engine_registry.py``)."""
    if predictor_type not in _REGISTRY:
        raise ValueError(
            f"unknown predictor type {predictor_type!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[predictor_type](**kwargs)


__all__ = [
    "Inference",
    "InferenceEngine",
    "RuleBasedInferenceEngine",
    "SparkMLInferenceEngine",
    "RAGInferenceEngine",
    "LLMInferenceEngine",
    "get_inference_engine",
    "evaluate_predictor",
]
