"""Model-backed NER (E1) — the spaCy path, gated exactly like the reference.

The reference tries spaCy and falls back to the deterministic mock extractor
when it's absent (arkham-shard-parse/extractors/ner.py:46-92, fallback
:63-65); confidence post-processing per ner_worker.py:185-211 (base 0.8,
+0.1 capitalized, +0.05 multiword, cap 1.0) and the label→standard-type map
ner_worker.py:17-33.

Spark pattern (the reference's lazy per-worker singleton,
ner_worker.py:72-111): the model loads ONCE per executor python worker
inside the mapInPandas closure and is reused across Arrow batches. With no
spaCy in this sandbox the operator transparently produces the mock path —
same schema, same downstream pipeline — so installing the model is a
config change, not a code change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import MENTION_STRUCT

# spaCy label → standard lowercase type (ner_worker.py:17-33)
SPACY_TYPE_MAP = {
    "PERSON": "person", "ORG": "organization", "GPE": "location",
    "LOC": "location", "DATE": "date", "TIME": "time", "MONEY": "money",
    "PERCENT": "percent", "FAC": "facility", "PRODUCT": "product",
    "EVENT": "event", "WORK_OF_ART": "work", "LAW": "law",
    "LANGUAGE": "language", "NORP": "group",
}


def model_confidence(text: str) -> float:
    """ner_worker.py:185-211 heuristic: 0.8 +0.1 capitalized +0.05 multiword."""
    conf = 0.8
    if text and text[0].isupper():
        conf += 0.1
    if len(text.split()) > 1:
        conf += 0.05
    return min(conf, 1.0)


def extract_mentions_model(
    docs: DataFrame,
    model_name: str = "en_core_web_sm",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Mentions via spaCy when importable, mock-NER otherwise (ner.py:63-65)."""
    from ..shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)
    schema = StructType(
        [StructField("url", StringType(), False)] + list(MENTION_STRUCT.fields)
    )
    names = [f.name for f in schema.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # lazy per-python-worker singleton (ner_worker.py:72-111)
        nlp = None
        try:
            import spacy  # type: ignore

            nlp = spacy.load(model_name)
        except Exception:
            nlp = None
        from ..reference_impl.ner import mock_ner

        for pdf in batches:
            rows: list[dict] = []
            for url, text in zip(pdf["url"].tolist(), pdf[text_col].tolist()):
                if not text:
                    continue
                if nlp is not None:
                    for ent in nlp(text).ents:
                        rows.append(
                            {
                                "url": url,
                                "text": ent.text,
                                "entity_type": SPACY_TYPE_MAP.get(ent.label_, "other"),
                                "start_char": ent.start_char,
                                "end_char": ent.end_char,
                                "confidence": model_confidence(ent.text),
                            }
                        )
                else:
                    for m in mock_ner(text):
                        rows.append({"url": url, **m})
            yield pd.DataFrame(rows, columns=names)

    return docs.select("url", text_col).mapInPandas(_run, schema)
