"""VLM OCR table-extraction codec tests (qwen_worker.py:314-396):
request shape, fence-stripping JSON parse, mime sniff, and a
differential run of the ACTUAL reference _extract_tables with a stubbed
transport."""

from __future__ import annotations

import os

import pytest




class TestTableCodec:
    """qwen_worker.py:314-396 table pass: request shape + the
    fence-stripping JSON parse, matched branch-for-branch."""

    def test_table_request_shape(self):
        from arkhammirror_spark.operators.vlm_ocr import (
            TABLE_PROMPT,
            TABLE_SYSTEM_PROMPT,
            build_table_request,
        )

        req = build_table_request(b"img-bytes", mime_type="image/jpeg")
        assert req["temperature"] == 0.1
        assert req["messages"][0]["content"] == TABLE_SYSTEM_PROMPT
        parts = req["messages"][1]["content"]
        assert parts[0] == {"type": "text", "text": TABLE_PROMPT}
        assert parts[1]["image_url"]["url"].startswith(
            "data:image/jpeg;base64,"
        )

    def _resp(self, content):
        return {"choices": [{"message": {"content": content}}]}

    def test_parse_plain_json(self):
        from arkhammirror_spark.operators.vlm_ocr import parse_vlm_tables

        tables = [{"headers": ["A", "B"], "rows": [["1", "2"]]}]
        import json

        assert parse_vlm_tables(self._resp(json.dumps(tables))) == tables
        assert parse_vlm_tables(self._resp("[]")) == []

    def test_parse_strips_markdown_fences(self):
        from arkhammirror_spark.operators.vlm_ocr import parse_vlm_tables

        fenced = '```json\n[{"headers": ["H"], "rows": []}]\n```'
        assert parse_vlm_tables(self._resp(fenced)) == [
            {"headers": ["H"], "rows": []}
        ]
        # bare ``` fences too
        assert parse_vlm_tables(self._resp('```\n[]\n```')) == []

    def test_parse_rejects_non_list_and_garbage(self):
        from arkhammirror_spark.operators.vlm_ocr import parse_vlm_tables

        assert parse_vlm_tables(self._resp('{"headers": []}')) == []
        assert parse_vlm_tables(self._resp("not json at all")) == []
        assert parse_vlm_tables(self._resp("")) == []
        assert parse_vlm_tables({}) == []
        assert parse_vlm_tables({"choices": []}) == []

    def test_mime_sniff(self):
        from arkhammirror_spark.operators.vlm_ocr import mime_for_path

        assert mime_for_path("a/B.PNG") == "image/png"
        assert mime_for_path("x.JpEg") == "image/jpeg"
        assert mime_for_path("x.jpg") == "image/jpeg"
        assert mime_for_path("x.gif") == "image/gif"
        assert mime_for_path("x.webp") == "image/webp"
        assert mime_for_path("x.tiff") == "image/png"


class TestTableCodecDifferential:
    """Run the ACTUAL reference _extract_tables (qwen_worker.py loaded by
    path, httpx + BaseWorker stubbed, client faked to return a canned
    response) and assert parse_vlm_tables decodes identically — including
    the fence-regex quirk (the 'json?' pattern never strips a BARE
    opening fence, so that content fails json.loads and yields [])."""

    @pytest.fixture(scope="class")
    def qwen_ref(self):
        import importlib.util
        import sys
        import types

        path = ("/root/reference/packages/arkham-shard-ocr/"
                "arkham_shard_ocr/workers/qwen_worker.py")
        if not os.path.isfile(path):
            pytest.skip("reference tree not available")
        httpx_stub = types.ModuleType("httpx")

        class _Err(Exception):
            pass

        httpx_stub.AsyncClient = object
        httpx_stub.ConnectError = _Err
        httpx_stub.HTTPStatusError = _Err
        base_mod = types.ModuleType("arkham_frame.workers.base")
        base_mod.BaseWorker = type("BaseWorker", (), {})
        pkg = types.ModuleType("arkham_frame")
        pkg.__path__ = []
        wpkg = types.ModuleType("arkham_frame.workers")
        wpkg.__path__ = []
        saved = {n: sys.modules.get(n) for n in (
            "httpx", "arkham_frame", "arkham_frame.workers",
            "arkham_frame.workers.base")}
        sys.modules["httpx"] = httpx_stub
        sys.modules["arkham_frame"] = pkg
        sys.modules["arkham_frame.workers"] = wpkg
        sys.modules["arkham_frame.workers.base"] = base_mod
        try:
            spec = importlib.util.spec_from_file_location("_ref_qwen", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            yield mod
        finally:
            for n, m in saved.items():
                if m is None:
                    sys.modules.pop(n, None)
                else:
                    sys.modules[n] = m
            sys.modules.pop("_ref_qwen", None)

    @pytest.mark.parametrize("content", [
        '[{"headers": ["A"], "rows": [["1"]]}]',
        '```json\n[{"headers": ["H"], "rows": []}]\n```',
        '```\n[]\n```',           # bare fence: fails decode on BOTH sides
        '{"headers": []}',        # non-list
        'not json',
        '',
        '[]',
    ])
    def test_table_parse_matches_reference(self, qwen_ref, content):
        import asyncio

        from arkhammirror_spark.operators.vlm_ocr import parse_vlm_tables

        response_json = {"choices": [{"message": {"content": content}}]}

        class _Resp:
            def raise_for_status(self):
                pass

            def json(self):
                return response_json

        class _Client:
            async def post(self, url, json=None):
                return _Resp()

        w = qwen_ref.QwenWorker.__new__(qwen_ref.QwenWorker)

        async def fake_get_client():
            return _Client()

        w._get_client = fake_get_client
        ref = asyncio.run(w._extract_tables(
            job_id="j", image_b64="aW1n", mime_type="image/png",
            endpoint="http://x/v1", model="m", max_tokens=16,
        ))
        assert parse_vlm_tables(response_json) == ref
