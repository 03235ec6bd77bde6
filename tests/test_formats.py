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
