"""Minimal PDF writer + reader for the sandbox (no pypdf available here).

The reference extracts PDFs with pypdf per page and joins page texts with
"\\n\\n" (extract_worker.py:215-291, join at :278); encrypted → error. This
module provides:

- ``make_pdf(pages)``  — a tiny, valid, uncompressed single-font PDF writer
  used by the deterministic fixture generator (one ``Tj`` text op per line).
- ``extract_pdf_text(raw)`` — the extraction seam: uses pypdf when importable
  (matching the reference exactly); otherwise falls back to a minimal parser
  that understands exactly the subset ``make_pdf`` emits (uncompressed content
  streams with ``(...) Tj`` operators). Page texts are joined with "\\n\\n"
  per the reference contract. Raises ValueError on malformed input (the
  pipeline maps that to the error/quarantine column, mirroring
  extract_worker.py:202-213).
"""

from __future__ import annotations

import re

try:  # pragma: no cover - exercised only where pypdf exists
    import pypdf  # type: ignore

    _HAVE_PYPDF = True
except Exception:  # pragma: no cover
    _HAVE_PYPDF = False


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[list[str]]) -> bytes:
    """Build a minimal valid PDF; ``pages`` is a list of line-lists."""
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_obj = 3 + 2 * n_pages
    for i in range(n_pages):
        content_obj = 3 + n_pages + i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_obj} 0 R /Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
            ).encode()
        )
    for lines in pages:
        ops = ["BT /F1 12 Tf 72 720 Td 14 TL"]
        for k, line in enumerate(lines):
            if k > 0:
                ops.append("T*")
            ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1", errors="replace")
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj")
_UNESC = {r"\\": "\\", r"\(": "(", r"\)": ")"}


def _unescape(s: str) -> str:
    return re.sub(r"\\([\\()])", lambda m: m.group(1), s)


def extract_pdf_text(raw: bytes) -> tuple[str, int]:
    """Return ("\\n\\n"-joined page texts, n_pages); ValueError if malformed."""
    if _HAVE_PYPDF:  # pragma: no cover - reference-exact path
        import io

        reader = pypdf.PdfReader(io.BytesIO(raw))
        if reader.is_encrypted:
            raise ValueError("PDF is encrypted")
        page_texts = [p.extract_text() or "" for p in reader.pages]
        return "\n\n".join(page_texts), len(page_texts)

    if not raw.startswith(b"%PDF-"):
        raise ValueError("Not a PDF: bad header")
    if b"%%EOF" not in raw:
        raise ValueError("Truncated PDF: missing EOF marker")

    page_texts: list[str] = []
    for m in _STREAM_RE.finditer(raw):
        body = m.group(1)
        lines: list[str] = []
        for tj in _TJ_RE.finditer(body):
            tok = tj.group(0)
            inner = tok[tok.index(b"(") + 1 : tok.rindex(b")")]
            lines.append(_unescape(inner.decode("latin-1")))
        page_texts.append("\n".join(lines))
    if not page_texts:
        raise ValueError("No extractable content streams")
    return "\n\n".join(page_texts), len(page_texts)
