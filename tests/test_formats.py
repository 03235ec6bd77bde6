"""Format extraction tests: CSV/TSV, DOCX, XLSX (stdlib OOXML path) and the
content sniffer."""

from arkhammirror_spark.operators.extract import extract_one, sniff_kind
from arkhammirror_spark.reference_impl.ooxml import (
    extract_docx,
    extract_xlsx,
    make_docx,
    make_xlsx,
)
from arkhammirror_spark.reference_impl.tabular import extract_csv


class TestCsv:
    def test_pairs_rendering(self):
        text, pages = extract_csv(b"name,org\r\nJohn,Acme\r\nJane,Globex\r\n")
        assert text == (
            "--- Columns ---\nname | org\n\n--- Data ---\n"
            "name: John | org: Acme\nname: Jane | org: Globex"
        )
        assert pages == 2

    def test_ragged_row_falls_back_to_raw_join(self):
        text, _ = extract_csv(b"a,b\r\n1,2,3\r\n")
        assert text.endswith("1 | 2 | 3")

    def test_sniffer_detects_semicolon(self):
        text, _ = extract_csv(b"a;b\r\nx;y\r\n")
        assert "a | b" in text and "a: x | b: y" in text

    def test_tsv(self):
        text, _ = extract_csv(b"a\tb\r\nx\ty\r\n", is_tsv=True)
        assert "a: x | b: y" in text


class TestOoxml:
    def test_docx_paragraphs_and_tables(self):
        raw = make_docx(["Para one", "  ", "Para two"], [[["h1", "h2"], ["v1", "v2"]]])
        text, pages = extract_docx(raw)
        assert text == "Para one\nPara two\n\n--- Tables ---\n\nh1 | h2\nv1 | v2"
        assert pages == 2  # body paragraph count, table text excluded

    def test_xlsx_sheets(self):
        raw = make_xlsx(
            {"S1": [["a", 1], ["b", 2.5]], "S2": [["only", "strings"]]}
        )
        text, pages = extract_xlsx(raw)
        assert "--- Sheet: S1 ---" in text and "--- Sheet: S2 ---" in text
        assert "a | 1" in text and "b | 2.5" in text
        assert pages == 2

    def test_sniffer_distinguishes_zip_kinds(self):
        assert sniff_kind(make_docx(["x"]), None) == "docx"
        assert sniff_kind(make_xlsx({"s": [["x"]]}), None) == "xlsx"
        assert sniff_kind(b"PK\x03\x04garbage", None) == "text"

    def test_extract_one_dispatch(self):
        rec = extract_one(make_docx(["John Smith works at Acme Corp."]), None, None)
        assert rec["error"] is None
        assert "John Smith works at Acme Corp." in rec["extracted_text"]
        rec = extract_one(b"name,org\nJohn,Acme\n", None, "csv")
        assert rec["error"] is None
        assert "name: John | org: Acme" in rec["extracted_text"]


class TestArchives:
    def _zip(self, members):
        import io, zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for name, data in members:
                zf.writestr(name, data)
        return buf.getvalue()

    def test_members_and_guards(self):
        from arkhammirror_spark.reference_impl.archive import (
            extract_archive_members,
            sniff_archive,
        )

        raw = self._zip([("a.txt", b"hello"), ("dir/b.txt", b"world")])
        assert sniff_archive(raw) == "zip"
        got = extract_archive_members(raw)
        assert [(n, d) for n, d in got] == [("a.txt", b"hello"), ("dir/b.txt", b"world")]

        import pytest as _pt

        with _pt.raises(ValueError, match="traversal"):
            extract_archive_members(self._zip([("../evil.txt", b"x")]))

        # zip bomb: deflate of zeros tops out ~1026:1, just over the 1000 gate
        bomb = self._zip([("z.bin", b"\x00" * 20_000_000)])
        with _pt.raises(ValueError, match="ratio"):
            extract_archive_members(bomb)

    def test_tar_and_gz(self):
        import gzip, io, tarfile

        from arkhammirror_spark.reference_impl.archive import extract_archive_members

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            data = b"tar content"
            info = tarfile.TarInfo("t.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        assert extract_archive_members(buf.getvalue()) == [("t.txt", b"tar content")]

        gz = gzip.compress(b"gz content here")
        assert extract_archive_members(gz) == [("member", b"gz content here")]

    def test_bz2_xz_single_member_and_tar_resniff(self):
        import bz2, io, lzma, tarfile

        from arkhammirror_spark.reference_impl.archive import (
            extract_archive_members,
            sniff_archive,
        )

        assert sniff_archive(bz2.compress(b"x")) == "bz2"
        assert sniff_archive(lzma.compress(b"x")) == "xz"
        assert extract_archive_members(bz2.compress(b"bz2 body")) == [
            ("member", b"bz2 body")
        ]
        assert extract_archive_members(lzma.compress(b"xz body")) == [
            ("member", b"xz body")
        ]
        # tar.bz2 / tar.xz re-sniff into the tar branch
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            data = b"nested tar member"
            info = tarfile.TarInfo("n.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        tar_raw = buf.getvalue()
        for wrapped in (bz2.compress(tar_raw), lzma.compress(tar_raw)):
            assert extract_archive_members(wrapped) == [("n.txt", data)]

    def test_bz2_bomb_capped(self):
        import bz2

        import pytest as _pt

        # bz2 on zeros compresses ~100000:1 — way over the 1000x gate
        bomb = bz2.compress(b"\x00" * 50_000_000)
        from arkhammirror_spark.reference_impl.archive import extract_archive_members

        with _pt.raises(ValueError, match="ratio|cap"):
            extract_archive_members(bomb)

    def test_7z_rar_gated_with_install_hint(self):
        """py7zr/rarfile are absent in this sandbox: the branches must raise
        the reference's ImportError install hints (archive_worker.py:430,466),
        not a generic unsupported-format error — sniffing works regardless."""
        import pytest as _pt

        from arkhammirror_spark.reference_impl.archive import (
            extract_archive_members,
            sniff_archive,
        )

        seven = b"7z\xbc\xaf\x27\x1c" + b"\x00" * 64
        rar = b"Rar!\x1a\x07\x00" + b"\x00" * 64
        assert sniff_archive(seven) == "7z"
        assert sniff_archive(rar) == "rar"
        try:
            import py7zr  # noqa: F401

            have_7z = True
        except ImportError:
            have_7z = False
        if not have_7z:
            with _pt.raises(ImportError, match="pip install py7zr"):
                extract_archive_members(seven)
        try:
            import rarfile  # noqa: F401

            have_rar = True
        except ImportError:
            have_rar = False
        if not have_rar:
            with _pt.raises(ImportError, match="pip install rarfile"):
                extract_archive_members(rar)

    def test_spark_explode_then_extract(self, spark):
        from arkhammirror_spark.operators.archives import explode_archives
        from arkhammirror_spark.operators.extract import extract_docs
        from pyspark.sql import functions as F
        import datetime as dt

        raw = self._zip([("doc.txt", b"John Smith works at Acme Corp."),
                         ("bad/../x", b"nope")])
        # second archive is traversal-poisoned
        bad = self._zip([("../../etc", b"x")])
        pages = spark.createDataFrame(
            [("https://h/a.zip", raw), ("https://h/b.zip", bad)],
            "url: string, html: binary",
        )
        members = explode_archives(pages)
        rows = {r["url"]: r for r in members.collect()}
        assert rows["https://h/b.zip"]["error"] is not None  # quarantined whole
        assert rows["https://h/a.zip"]["error"] is not None  # traversal member poisons it too

        ok = self._zip([("doc.txt", b"John Smith works at Acme Corp.")])
        pages2 = spark.createDataFrame([("https://h/c.zip", ok)], "url: string, html: binary")
        m2 = explode_archives(pages2).where("error is null")
        docs = extract_docs(
            m2.select(
                F.col("url"),
                F.lit(dt.datetime(2026, 1, 1)).alias("warc_ts"),
                F.col("payload").alias("html"),
                F.lit(None).cast("string").alias("text"),
            )
        ).collect()
        assert docs[0]["url"] == "https://h/c.zip!doc.txt"
        assert "John Smith works at Acme Corp." in docs[0]["extracted_text"]


class TestArchiveGuards:
    def test_gz_bomb_aborts_without_full_allocation(self):
        """A gz bomb must raise after at most ~ratio*len(raw) bytes of bounded
        chunked reads — never allocate the full uncompressed stream first."""
        import gzip

        import pytest as _pt

        from arkhammirror_spark.reference_impl import archive as arc

        bomb = gzip.compress(b"\x00" * 50_000_000)  # ~1030:1 over the gate
        with _pt.raises(ValueError):
            arc.extract_archive_members(bomb)

    def test_gz_cap_is_min_of_limits(self, monkeypatch):
        """When ratio*len(raw) exceeds MAX_UNCOMPRESSED_SIZE the absolute cap
        must bound the read (the old guard read ratio*len+1 regardless)."""
        import gzip

        import pytest as _pt

        from arkhammirror_spark.reference_impl import archive as arc

        monkeypatch.setattr(arc, "MAX_UNCOMPRESSED_SIZE", 1000)
        payload = gzip.compress(b"a" * 5000)  # ratio fine, size over the cap
        with _pt.raises(ValueError, match="large"):
            arc.extract_archive_members(payload)

    def test_tgz_members_routed_through_tar(self):
        """.tar.gz payloads must re-sniff after gunzip and explode tar members
        rather than emitting one blob of raw tar bytes."""
        import gzip
        import io
        import tarfile

        from arkhammirror_spark.reference_impl.archive import extract_archive_members

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, data in [("a.txt", b"alpha"), ("b.txt", b"beta")]:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        tgz = gzip.compress(buf.getvalue())
        assert extract_archive_members(tgz) == [("a.txt", b"alpha"), ("b.txt", b"beta")]
