"""Direct LLM inference: zero/few-shot prediction without retrieval.

Reference (``src/linkml_store/inference/implementations/
llm_inference_engine.py``): prompt an LLM with the feature values (plus
optionally a fixed set of examples) and parse the structured answer — the
RAG engine minus the retrieval stage. The LLM callable is pluggable; the
default deterministic stub answers from the provided examples (nearest by
shared feature values) so the pipeline tests offline.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from linkml_store_spark.inference.base import Inference, InferenceEngine
from linkml_store_spark.inference.rag import MAX_ITERATIONS, stub_llm


@dataclass
class LLMInferenceEngine(InferenceEngine):
    num_examples: int = 5
    llm_fn: Callable[[str], str] = field(default=stub_llm, repr=False)
    _examples: List[Dict[str, Any]] = field(default_factory=list, repr=False)

    def initialize_model(self, examples: Optional[List[Dict[str, Any]]] = None, df=None, **kwargs) -> None:
        """Fixed few-shot examples: an explicit list, or the first N rows of
        a DataFrame (no retrieval — that's the RAG engine's job)."""
        if examples is not None:
            self._examples = examples[: self.num_examples]
        elif df is not None:
            self._examples = [
                r.asDict(recursive=True) for r in df.limit(self.num_examples).collect()
            ]

    def _build_prompt(self, obj: Dict[str, Any]) -> str:
        targets = self.target_attributes or []
        feats = self.feature_attributes or [
            k for k in obj.keys() if k not in targets
        ]
        parts = ["Given the INPUT, produce the OUTPUT fields as JSON."]
        for i, ex in enumerate(self._examples, start=1):
            parts.append(
                f"## EXAMPLE {i} INPUT\n{json.dumps({k: ex.get(k) for k in feats}, default=str)}"
            )
            parts.append(
                f"## EXAMPLE {i} OUTPUT\n{json.dumps({k: ex.get(k) for k in targets}, default=str)}"
            )
        parts.append(f"## QUERY INPUT\n{json.dumps({k: obj.get(k) for k in feats}, default=str)}")
        parts.append("## QUERY OUTPUT\n")
        return "\n".join(parts)

    def derive(self, object: Dict[str, Any]) -> Optional[Inference]:
        prompt = self._build_prompt(object)
        last_err = None
        for _ in range(MAX_ITERATIONS):
            raw = self.llm_fn(prompt)
            try:
                return Inference(
                    predicted_object=json.loads(raw),
                    explanation=f"direct LLM ({len(self._examples)}-shot)",
                )
            except json.JSONDecodeError as e:
                last_err = e
                prompt += f"\n(Not valid JSON: {e}. Reply with ONLY JSON.)\n"
        raise ValueError(f"LLM answer unparseable after {MAX_ITERATIONS} attempts: {last_err}")
