"""DOCX / XLSX text extraction with the standard library (zipfile + ElementTree).

The reference uses python-docx / openpyxl (extract_worker.py:293-379 and
:381-466); neither exists in this sandbox, so the same text-assembly
contracts are reimplemented over the raw OOXML:

- DOCX: body-level paragraphs (w:p directly under w:body — matching
  python-docx's doc.paragraphs, which excludes paragraphs inside tables),
  stripped, non-empty; then tables (w:tbl → w:tr → w:tc, cell text stripped,
  rows with any non-empty cell rendered as " | "-joined), appended after a
  "\\n--- Tables ---\\n" marker; all joined with "\\n". pages = paragraph
  count (extract_worker.py:369).
- XLSX: per sheet "--- Sheet: {name} ---" then each row's non-None cells
  as strings joined with " | "; sheets joined with "\\n\\n". pages = sheet
  count (extract_worker.py:441-459). Shared strings and inline values
  supported; numbers render via str() like openpyxl's values.

Writers (`make_docx`, `make_xlsx`) emit minimal valid OOXML packages for the
deterministic fixture generator.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET


def _zip_writestr(zf: zipfile.ZipFile, name: str, data: str | bytes) -> None:
    """Deterministic zip entry: zipfile stamps wall-clock time into entry
    headers by default, making byte-identical content hash differently
    across runs — poison for checksum dedup. Fix the timestamp to the
    DOS epoch."""
    info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    info.compress_type = zipfile.ZIP_DEFLATED
    info.external_attr = 0o600 << 16
    zf.writestr(info, data)

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _w(tag: str) -> str:
    return f"{{{W_NS}}}{tag}"


def _s(tag: str) -> str:
    return f"{{{S_NS}}}{tag}"


# ----------------------------- DOCX -----------------------------------------


def _para_text(p) -> str:
    return "".join(t.text or "" for t in p.iter(_w("t")))


def extract_docx(raw: bytes) -> tuple[str, int]:
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        body = ET.fromstring(zf.read("word/document.xml")).find(_w("body"))
    if body is None:
        raise ValueError("DOCX has no document body")

    paragraphs: list[str] = []
    tables: list[str] = []
    for child in body:
        if child.tag == _w("p"):
            text = _para_text(child).strip()
            if text:
                paragraphs.append(text)
        elif child.tag == _w("tbl"):
            for tr in child.iter(_w("tr")):
                cells = []
                for tc in tr.findall(_w("tc")):
                    cells.append(
                        "\n".join(
                            _para_text(p) for p in tc.findall(_w("p"))
                        ).strip()
                    )
                if any(cells):
                    tables.append(" | ".join(cells))

    all_text = list(paragraphs)
    if tables:
        all_text.append("\n--- Tables ---\n")
        all_text.extend(tables)
    return "\n".join(all_text), len(paragraphs)


def make_docx(paragraphs: list[str], tables: list[list[list[str]]] | None = None) -> bytes:
    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    body = "".join(f"<w:p><w:r><w:t>{esc(p)}</w:t></w:r></w:p>" for p in paragraphs)
    for table in tables or []:
        rows = "".join(
            "<w:tr>"
            + "".join(
                f"<w:tc><w:p><w:r><w:t>{esc(c)}</w:t></w:r></w:p></w:tc>" for c in row
            )
            + "</w:tr>"
            for row in table
        )
        body += f"<w:tbl>{rows}</w:tbl>"
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        _zip_writestr(
            zf,
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>',
        )
        _zip_writestr(
            zf,
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>',
        )
        _zip_writestr(zf, "word/document.xml", doc)
    return buf.getvalue()


# ----------------------------- XLSX -----------------------------------------


def extract_xlsx(raw: bytes) -> tuple[str, int]:
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        names = [
            sh.get("name") or f"Sheet{i+1}"
            for i, sh in enumerate(wb.iter(_s("sheet")))
        ]
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(_s("si")):
                shared.append("".join(t.text or "" for t in si.iter(_s("t"))))

        sheets_text: list[str] = []
        for i, name in enumerate(names):
            part = f"xl/worksheets/sheet{i+1}.xml"
            lines = [f"--- Sheet: {name} ---"]
            if part in zf.namelist():
                ws = ET.fromstring(zf.read(part))
                for row in ws.iter(_s("row")):
                    cells: list[str] = []
                    for c in row.findall(_s("c")):
                        v = c.find(_s("v"))
                        if v is None or v.text is None:
                            continue
                        if c.get("t") == "s":
                            cells.append(str(shared[int(v.text)]))
                        else:
                            txt = v.text
                            # openpyxl renders numerics via python str()
                            if re.fullmatch(r"-?\d+", txt):
                                cells.append(str(int(txt)))
                            else:
                                try:
                                    cells.append(str(float(txt)))
                                except ValueError:
                                    cells.append(txt)
                    if cells:
                        lines.append(" | ".join(cells))
            sheets_text.append("\n".join(lines))
    return "\n\n".join(sheets_text), len(names)


def make_xlsx(sheets: dict[str, list[list[object]]]) -> bytes:
    def esc(s: str) -> str:
        return str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    strings: list[str] = []

    def sref(s: str) -> int:
        strings.append(s)
        return len(strings) - 1

    sheet_xmls = []
    for rows in sheets.values():
        row_parts = []
        for r, row in enumerate(rows, start=1):
            cell_parts = []
            for k, val in enumerate(row):
                col = chr(ord("A") + k)
                if isinstance(val, (int, float)) and not isinstance(val, bool):
                    cell_parts.append(f'<c r="{col}{r}"><v>{val}</v></c>')
                else:
                    cell_parts.append(
                        f'<c r="{col}{r}" t="s"><v>{sref(str(val))}</v></c>'
                    )
            row_parts.append(f'<row r="{r}">{"".join(cell_parts)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0"?>'
            f'<worksheet xmlns="{S_NS}"><sheetData>{"".join(row_parts)}</sheetData></worksheet>'
        )

    sst = (
        '<?xml version="1.0"?>'
        f'<sst xmlns="{S_NS}" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{esc(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    wb_sheets = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(sheets)
    )
    wb = (
        '<?xml version="1.0"?>'
        f'<workbook xmlns="{S_NS}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i+1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(sheets))
        )
        + f'<Relationship Id="rId{len(sheets)+1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        + "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        _zip_writestr(
            zf,
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>',
        )
        _zip_writestr(
            zf,
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        _zip_writestr(zf, "xl/workbook.xml", wb)
        _zip_writestr(zf, "xl/_rels/workbook.xml.rels", rels)
        _zip_writestr(zf, "xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            _zip_writestr(zf, f"xl/worksheets/sheet{i+1}.xml", xml)
    return buf.getvalue()
