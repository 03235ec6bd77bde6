"""Model-gated OCR operator (S13) — the PaddleOCR path on Spark.

Reference lineage: arkham-shard-ocr/arkham_shard_ocr/workers/paddle_worker.py
— class-level lazy engine singleton keyed by language (:66-122), per-image
pipeline decode → numpy → engine.ocr → line dicts {box, text, confidence}
joined into full_text (:173-293), ImportError with install hint when
paddleocr is absent (:88-93).

Spark restatement: the engine loads once per executor python worker inside
the mapInPandas closure (the ner_model.py / embed_model.py singleton
pattern). This sandbox has neither paddleocr nor PIL, so the operator is
gated three ways:

- mode="auto" (default): real engine when importable, else a DETERMINISTIC
  mock result (sha256-derived text, engine column says "mock") — keeps the
  downstream plumbing (schema, joins, quality filters) testable;
- mode="strict": raise the reference's ImportError when the engine is
  missing — for deployments where silent mocking would be wrong;
- mode="mock": always mock (deterministic tests on any machine).

S14 (Qwen-VL OCR, qwen_worker.py) is a network-LLM call outside the hot
path per SURVEY §2; its payload contract is the same (url, image bytes) →
(text, confidence), so it would slot into this operator as another engine.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

OCR_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("full_text", StringType(), True),
        StructField("n_lines", IntegerType(), True),
        StructField("avg_confidence", DoubleType(), True),
        StructField("engine", StringType(), False),
        StructField("error", StringType(), True),
    ]
)

_INSTALL_HINT = (
    "paddleocr not installed. Install with: pip install paddleocr paddlepaddle"
)


def _load_engine(lang: str):
    """Lazy PaddleOCR engine (paddle_worker.py:66-122) or None."""
    try:
        from paddleocr import PaddleOCR  # type: ignore

        return PaddleOCR(use_angle_cls=True, lang=lang)
    except ImportError:
        return None


def _mock_result(payload: bytes) -> dict:
    """Deterministic stand-in: one 'line' derived from the payload hash, so
    identical bytes OCR identically on every worker and every run."""
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "full_text": f"[ocr-mock {digest[:16]}]",
        "n_lines": 1,
        "avg_confidence": 0.5,
        "engine": "mock",
        "error": None,
    }


def _paddle_result(engine, payload: bytes) -> dict:
    """Real path (paddle_worker.py:173-293): decode, run, join lines."""
    import io

    import numpy as np
    from PIL import Image  # type: ignore

    img = np.array(Image.open(io.BytesIO(payload)))
    result = engine.ocr(img)
    texts: list[str] = []
    confs: list[float] = []
    if result and result[0]:
        res = result[0]
        if hasattr(res, "keys") and "rec_texts" in res:
            texts = list(res["rec_texts"])
            confs = [float(s) for s in res["rec_scores"]]
        elif isinstance(res, list):
            for line in res:
                if len(line) >= 2:
                    tc = line[1]
                    if isinstance(tc, tuple) and len(tc) == 2:
                        texts.append(tc[0])
                        confs.append(float(tc[1]))
                    else:
                        texts.append(str(tc))
                        confs.append(0.0)
    return {
        "full_text": "\n".join(texts),
        "n_lines": len(texts),
        "avg_confidence": (sum(confs) / len(confs)) if confs else 0.0,
        "engine": "paddle",
        "error": None,
    }


def ocr_images(
    pages: DataFrame,
    payload_col: str = "payload",
    lang: str = "en",
    mode: str = "auto",
) -> DataFrame:
    """OCR rows for binary image payloads; one result row per input row.
    Decode/engine failures quarantine into the error column (the pipeline's
    poison-row contract), never fail the task."""
    if mode not in ("auto", "strict", "mock"):
        raise ValueError(f"unknown mode {mode!r}")
    from ..shipping import ensure_shipped

    ensure_shipped(pages.sparkSession)
    names = [f.name for f in OCR_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        engine = None
        if mode != "mock":
            engine = _load_engine(lang)  # once per python worker
            if engine is None and mode == "strict":
                raise ImportError(_INSTALL_HINT)
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"].tolist(), pdf[payload_col].tolist()):
                if payload is None:
                    rows.append(
                        {"url": url, "full_text": None, "n_lines": None,
                         "avg_confidence": None, "engine": "none",
                         "error": "ValueError: empty payload"}
                    )
                    continue
                raw = bytes(payload)
                try:
                    rec = (
                        _paddle_result(engine, raw)
                        if engine is not None
                        else _mock_result(raw)
                    )
                except Exception as exc:
                    rec = {"full_text": None, "n_lines": None,
                           "avg_confidence": None,
                           "engine": "paddle" if engine is not None else "mock",
                           "error": f"{type(exc).__name__}: {exc}"}
                rows.append({"url": url, **rec})
            yield pd.DataFrame(rows, columns=names)

    return pages.select("url", payload_col).mapInPandas(_run, OCR_SCHEMA)
