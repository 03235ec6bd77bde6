"""Differential: operators/extract.py::file_type_info vs the ACTUAL
FileTypeClassifier (ingest/classifiers/file_type.py) on real temp files
(python-magic absent in this container, so both sides take the
extension-fallback lanes — the gated-magic parity the reference itself
falls back to)."""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from pathlib import Path

import pytest

REF_PKG = "/root/reference/packages/arkham-shard-ingest/arkham_shard_ingest"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG), reason="reference tree not available"
)

_NAMES = [
    "report.pdf", "memo.DOCX", "data.xlsx", "notes.txt", "page.HTML",
    "feed.json", "scan.png", "photo.JPEG", "pic.tiff", "song.mp3",
    "voice.wav", "bundle.zip", "backup.tar", "packed.7z", "mail.eml",
    "old.msg", "sheet.csv", "plain.md", "clip.flac", "archive.gz",
    "noext", ".hidden", "trailing.", "double.tar.gz", "weird.xyz",
    "UPPER.PDF",
]


@pytest.fixture(scope="module")
def ref():
    pkg = sys.modules.setdefault(
        "arkham_shard_ingest", types.ModuleType("arkham_shard_ingest")
    )
    pkg.__path__ = [REF_PKG]
    if "arkham_shard_ingest.models" not in sys.modules:
        mspec = importlib.util.spec_from_file_location(
            "arkham_shard_ingest.models", f"{REF_PKG}/models.py"
        )
        models = importlib.util.module_from_spec(mspec)
        sys.modules["arkham_shard_ingest.models"] = models
        mspec.loader.exec_module(models)
        pkg.models = models
    name = "arkham_shard_ingest.classifiers.file_type_ref"
    if name not in sys.modules:
        if "arkham_shard_ingest.classifiers" not in sys.modules:
            cpkg = types.ModuleType("arkham_shard_ingest.classifiers")
            cpkg.__path__ = [f"{REF_PKG}/classifiers"]
            sys.modules["arkham_shard_ingest.classifiers"] = cpkg
        spec = importlib.util.spec_from_file_location(
            name, f"{REF_PKG}/classifiers/file_type.py"
        )
        ft = importlib.util.module_from_spec(spec)
        sys.modules[name] = ft
        spec.loader.exec_module(ft)
    return sys.modules["arkham_shard_ingest.models"], sys.modules[name]


def test_file_type_matches_reference(ref, spark, tmp_path):
    from arkhammirror_spark.operators.extract import file_type_info

    models, ft = ref
    clf = ft.FileTypeClassifier()
    # pin the extension-fallback lanes on both sides (the hidden-content
    # suite registers a `magic` stub in sys.modules, which the gated
    # import would otherwise pick up mid-run)
    clf._magic = None
    exp = {}
    for n in _NAMES:
        p = tmp_path / n
        p.write_bytes(b"x")
        fi = clf.classify(Path(p))
        exp[n] = (
            fi.extension, fi.category.value, fi.mime_type,
            "|".join(clf.get_route(fi)),
        )
    df = spark.createDataFrame([(n,) for n in _NAMES],
                               "file_name string")
    got = {
        r["file_name"]: (
            r["extension"], r["category"], r["mime_type"],
            r["file_route"],
        )
        for r in file_type_info(df).collect()
    }
    assert got == exp
    # the fixture actually exercises every category + the quirks
    cats = {v[1] for v in exp.values()}
    assert cats == {"document", "image", "audio", "archive", "unknown"}
    assert exp["data.xlsx"][1] == "document"  # spreadsheet -> document
    assert exp["noext"][3] == "cpu-light"
