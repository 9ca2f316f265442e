"""RAG inference: retrieve similar examples, few-shot prompt an LLM.

Reference (``src/linkml_store/inference/implementations/
rag_inference_engine.py:44-276``): embed the query object, MMR-retrieve k
examples from the training collection's index, build a few-shot YAML prompt,
call the LLM, parse/repair the YAML answer (≤5 attempts).

Spark-first: retrieval is the engine's distributed vector search
(index/search.py) — the only driver-side pieces are the prompt assembly and
the LLM call itself, exactly as in the reference. The LLM is a pluggable
callable; the default is a deterministic STUB (no network access in this
environment — marked clearly) that answers with the nearest example's
target values, i.e. 1-NN behavior, so the full pipeline is testable.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from linkml_store_spark.inference.base import Inference, InferenceEngine

MAX_ITERATIONS = 5  # reference parse/repair loop bound


def stub_llm(prompt: str) -> str:
    """Deterministic stand-in for an LLM completion API: returns the target
    block of the FIRST (most similar) example verbatim. Replace with a real
    ``llm`` callable in production."""
    marker = "## EXAMPLE 1 OUTPUT\n"
    if marker in prompt:
        block = prompt.split(marker, 1)[1].split("\n## ", 1)[0].strip()
        return block
    raise NotImplementedError("stub_llm requires at least one retrieved example")


@dataclass
class RAGInferenceEngine(InferenceEngine):
    num_examples: int = 20  # reference k=20
    mmr_relevance_factor: float = 0.8
    llm_fn: Callable[[str], str] = field(default=stub_llm, repr=False)
    _collection: Any = field(default=None, repr=False)

    def initialize_model(self, collection=None, **kwargs) -> None:
        """Bind the training collection and ensure it has a vector index."""
        self._collection = collection
        if collection is not None and not collection._indexers:
            collection.attach_indexer("simple")

    def _build_prompt(
        self, query_obj: Dict[str, Any], examples: List[Dict[str, Any]]
    ) -> str:
        targets = self.target_attributes or []
        feats = self.feature_attributes or [
            k for k in query_obj.keys() if k not in targets
        ]
        parts = [
            "Given the INPUT, produce the OUTPUT fields as JSON. Examples:\n"
        ]
        for i, ex in enumerate(examples, start=1):
            ex_in = {k: ex.get(k) for k in feats}
            ex_out = {k: ex.get(k) for k in targets}
            parts.append(f"## EXAMPLE {i} INPUT\n{json.dumps(ex_in, default=str)}")
            parts.append(f"## EXAMPLE {i} OUTPUT\n{json.dumps(ex_out, default=str)}")
        q_in = {k: query_obj.get(k) for k in feats}
        parts.append(f"## QUERY INPUT\n{json.dumps(q_in, default=str)}")
        parts.append("## QUERY OUTPUT\n")
        return "\n".join(parts)

    def derive(self, object: Dict[str, Any]) -> Optional[Inference]:
        if self._collection is None:
            raise ValueError("call initialize_model(collection=...) first")
        feats = self.feature_attributes or [
            k for k in object.keys() if k not in (self.target_attributes or [])
        ]
        query_text = " ".join(str(object.get(k)) for k in feats if object.get(k) is not None)
        res = self._collection.search(
            query_text,
            limit=self.num_examples,
            mmr_relevance_factor=self.mmr_relevance_factor,
        )
        examples = res.rows
        prompt = self._build_prompt(object, examples)
        last_err = None
        for _ in range(MAX_ITERATIONS):  # parse/repair loop (reference ≤5)
            raw = self.llm_fn(prompt)
            try:
                predicted = json.loads(raw)
                return Inference(
                    predicted_object=predicted,
                    explanation=f"RAG over {len(examples)} retrieved examples",
                )
            except json.JSONDecodeError as e:
                last_err = e
                prompt += f"\n(Previous answer was not valid JSON: {e}. Reply with ONLY JSON.)\n"
        raise ValueError(f"LLM answer unparseable after {MAX_ITERATIONS} attempts: {last_err}")
