"""VLM OCR operator (S14) — the Qwen-VL path on Spark.

Reference lineage: arkham-shard-ocr/arkham_shard_ocr/workers/qwen_worker.py
— OpenAI-compatible vision chat call (:259-303 request body: system OCR
prompt, user prompt + data-URL image part, temperature 0.1, max_tokens
4096), payload fields endpoint/model/prompt/temperature (:123-128),
response text = choices[0].message.content (:316-320), ConnectionError
with the "make sure LM Studio/Ollama/vLLM is running" hint (:294-297).

A network LLM is outside the hot path (SURVEY §2) and this sandbox has no
network, so the operator is a CONTRACT SHELL with the ocr_model.py gate
pattern:

- the request/response codecs are real, pure, and unit-tested
  (build_vlm_request / parse_vlm_response mirror the reference's wire
  format field-for-field);
- transport is INJECTABLE: pass any Callable[[request_dict], response_dict]
  (a real HTTP POST in production, a recorded/fake one in tests);
- mode="auto": use the transport when given, else a deterministic mock
  (sha256-derived text, model column says "mock");
- mode="strict": raise ConnectionError when no transport is configured —
  the reference's behavior when the VLM endpoint is unreachable;
- mode="mock": always mock.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# verbatim from qwen_worker.py:36-48 — the contract the endpoint sees
OCR_SYSTEM_PROMPT = """You are a robotic OCR engine. Your ONLY job is to transcribe text from the image exactly as it appears.

Rules:
- Transcribe ALL text exactly as shown
- Maintain the original layout structure
- Do NOT correct typos or spelling errors
- Do NOT summarize or paraphrase
- Do NOT add commentary or interpretation
- If a word is illegible, write [illegible]
- If a section is unclear, write [unclear]
- Output in plain text format"""

DEFAULT_OCR_PROMPT = (
    "Transcribe all text in this image exactly as it appears. Maintain the layout."
)
DEFAULT_MODEL = "qwen2.5-vl-7b-instruct"

_NO_ENDPOINT_HINT = (
    "Failed to connect to VLM endpoint. "
    "Make sure LM Studio/Ollama/vLLM is running."
)

VLM_OCR_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("full_text", StringType(), True),
        StructField("model", StringType(), True),
        StructField("engine", StringType(), False),
        StructField("error", StringType(), True),
    ]
)


def build_vlm_request(
    payload: bytes,
    mime_type: str = "image/png",
    model: str = DEFAULT_MODEL,
    prompt: str = DEFAULT_OCR_PROMPT,
    temperature: float = 0.1,
    max_tokens: int = 4096,
) -> dict:
    """The OpenAI-compatible chat body qwen_worker.py:259-283 posts:
    system OCR prompt + user text/image_url parts with a base64 data URL."""
    image_b64 = base64.b64encode(payload).decode("utf-8")
    return {
        "model": model,
        "messages": [
            {"role": "system", "content": OCR_SYSTEM_PROMPT},
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": prompt},
                    {
                        "type": "image_url",
                        "image_url": {
                            "url": f"data:{mime_type};base64,{image_b64}"
                        },
                    },
                ],
            },
        ],
        "temperature": temperature,
        "max_tokens": max_tokens,
    }


def parse_vlm_response(result: dict) -> str:
    """choices[0].message.content, empty on malformed (qwen_worker.py:316-320)."""
    if "choices" in result and len(result["choices"]) > 0:
        return result["choices"][0].get("message", {}).get("content", "") or ""
    return ""


def _mock_response(request: dict) -> dict:
    """Deterministic stand-in endpoint: derives the 'transcription' from
    the request's image bytes, shaped exactly like an OpenAI response."""
    data_url = request["messages"][1]["content"][1]["image_url"]["url"]
    image_b64 = data_url.split(",", 1)[1]
    digest = hashlib.sha256(base64.b64decode(image_b64)).hexdigest()
    return {
        "choices": [{"message": {"content": f"[vlm-mock {digest[:16]}]"}}],
        "model": "mock",
    }


def loopback_transport(request: dict) -> dict:
    """Offline contract-test transport: answers like an OpenAI endpoint
    with a transcript derived from the REQUEST (so a test that sees the
    expected transcript has proven the full request build → transport →
    response parse path on executors). Module-level → picklable."""
    n_parts = len(request["messages"][1]["content"])
    return {
        "choices": [
            {"message": {"content": (
                f"TRANSCRIPT parts={n_parts} temp={request['temperature']}"
            )}}
        ],
        "model": request["model"],
    }


def vlm_ocr_images(
    pages: DataFrame,
    payload_col: str = "payload",
    model: str = DEFAULT_MODEL,
    prompt: str = DEFAULT_OCR_PROMPT,
    temperature: float = 0.1,
    max_tokens: int = 4096,
    mode: str = "auto",
    transport: Callable[[dict], dict] | None = None,
) -> DataFrame:
    """VLM OCR rows for binary image payloads; one result row per input.

    `transport` is the injected endpoint call (request dict → response
    dict). It must be PICKLABLE (a module-level function or functools
    partial) since it ships to executors. Per-row failures quarantine into
    the error column; a missing transport in strict mode raises the
    reference's ConnectionError once per worker."""
    if mode not in ("auto", "strict", "mock"):
        raise ValueError(f"unknown mode {mode!r}")
    from ..shipping import ensure_shipped

    ensure_shipped(pages.sparkSession)
    names = [f.name for f in VLM_OCR_SCHEMA.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        call = transport
        if mode == "mock":
            call = None
        elif call is None and mode == "strict":
            raise ConnectionError(_NO_ENDPOINT_HINT)
        engine = "vlm" if call is not None else "mock"
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"].tolist(), pdf[payload_col].tolist()):
                if payload is None:
                    rows.append(
                        {"url": url, "full_text": None, "model": None,
                         "engine": "none", "error": "ValueError: empty payload"}
                    )
                    continue
                try:
                    req = build_vlm_request(
                        bytes(payload), model=model, prompt=prompt,
                        temperature=temperature, max_tokens=max_tokens,
                    )
                    resp = call(req) if call is not None else _mock_response(req)
                    rows.append(
                        {"url": url,
                         "full_text": parse_vlm_response(resp),
                         "model": resp.get("model", model),
                         "engine": engine, "error": None}
                    )
                except Exception as exc:
                    rows.append(
                        {"url": url, "full_text": None, "model": model,
                         "engine": engine,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(rows, columns=names)

    return pages.select("url", payload_col).mapInPandas(_run, VLM_OCR_SCHEMA)


# ---------------------------------------------------------------------------
# table extraction codec (qwen_worker.py:314-396) — the second VLM call's
# request shape and its deterministic response parse (markdown-fence
# cleanup + JSON decode + list check), network POST excluded as above
# ---------------------------------------------------------------------------

# verbatim from qwen_worker.py:328-341
TABLE_PROMPT = """Analyze this image for tables. For each table found, extract:
1. Column headers
2. Row data

Return as JSON array:
[
  {
    "headers": ["Col1", "Col2", ...],
    "rows": [["val1", "val2", ...], ...]
  }
]

If no tables found, return: []
Only output the JSON, nothing else."""

TABLE_SYSTEM_PROMPT = (
    "You are a table extraction engine. Extract tables from images as JSON."
)


def build_table_request(
    payload: bytes,
    mime_type: str = "image/png",
    model: str = DEFAULT_MODEL,
    max_tokens: int = 4096,
) -> dict:
    """The table-pass chat body (qwen_worker.py:343-367): table system
    prompt + TABLE_PROMPT + the same data-URL image part, temperature
    pinned to 0.1."""
    image_b64 = base64.b64encode(payload).decode("utf-8")
    return {
        "model": model,
        "messages": [
            {"role": "system", "content": TABLE_SYSTEM_PROMPT},
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": TABLE_PROMPT},
                    {
                        "type": "image_url",
                        "image_url": {
                            "url": f"data:{mime_type};base64,{image_b64}"
                        },
                    },
                ],
            },
        ],
        "temperature": 0.1,
        "max_tokens": max_tokens,
    }


def parse_vlm_tables(result: dict) -> list:
    """qwen_worker.py:372-396 response handling, reproduced exactly:
    take choices[0].message.content, strip markdown code fences
    (```json / ``` at end), json-decode, and return the value only when
    it is a list — anything else (bad JSON, a dict, empty content, a
    malformed envelope) yields [], matching the reference's broad
    try/except fallback."""
    import json as _json
    import re as _re

    try:
        content = ""
        if "choices" in result and len(result["choices"]) > 0:
            content = (
                result["choices"][0].get("message", {}).get("content", "")
                or ""
            )
        content = _re.sub(r"```json?\s*", "", content)
        content = _re.sub(r"```\s*$", "", content)
        content = content.strip()
        if content:
            tables = _json.loads(content)
            if isinstance(tables, list):
                return tables
    except Exception:
        pass
    return []


def mime_for_path(path: str) -> str:
    """Extension sniff (qwen_worker.py:221-230): png/jpg/jpeg/gif/webp,
    defaulting to image/png."""
    p = path.lower()
    if p.endswith(".png"):
        return "image/png"
    if p.endswith((".jpg", ".jpeg")):
        return "image/jpeg"
    if p.endswith(".gif"):
        return "image/gif"
    if p.endswith(".webp"):
        return "image/webp"
    return "image/png"
