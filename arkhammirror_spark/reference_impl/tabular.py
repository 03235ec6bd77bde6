"""CSV/TSV text extraction.

Semantics ≡ arkham-shard-ingest/workers/extract_worker.py:510-600
(`_extract_csv`): encoding cascade utf-8→utf-16→latin-1→cp1252, csv.Sniffer
delimiter detection over the first 4096 chars (delimiters ",;\\t|", fallback
","), then render "--- Columns ---" header line, blank, "--- Data ---", and
each data row as "Header: value" pairs joined with " | " (raw cell join when
the row width differs from the header). pages = data-row count.
"""

from __future__ import annotations

import csv
import io

_ENCODINGS = ("utf-8", "utf-16", "latin-1", "cp1252")


def extract_csv(raw: bytes, is_tsv: bool = False) -> tuple[str, int]:
    text = None
    for enc in _ENCODINGS:
        try:
            text = raw.decode(enc)
            break
        except UnicodeDecodeError:
            continue
    if text is None:
        raise ValueError("Could not decode CSV file with any supported encoding")

    delimiter = "\t" if is_tsv else ","
    if not is_tsv:
        sample = text[:4096]
        try:
            dialect = csv.Sniffer().sniff(sample, delimiters=",;\t|")
            delimiter = dialect.delimiter
        except csv.Error:
            delimiter = ","

    rows = list(csv.reader(io.StringIO(text, newline=""), delimiter=delimiter))
    if not rows:
        return "", 0

    headers = rows[0]
    data_rows = rows[1:] if len(rows) > 1 else []

    parts: list[str] = []
    if headers:
        parts.append("--- Columns ---")
        parts.append(" | ".join(str(h) for h in headers))
        parts.append("")
        parts.append("--- Data ---")
    for row in data_rows:
        if headers and len(row) == len(headers):
            parts.append(" | ".join(f"{headers[i]}: {row[i]}" for i in range(len(row))))
        else:
            parts.append(" | ".join(str(c) for c in row))
    return "\n".join(parts), len(data_rows)
