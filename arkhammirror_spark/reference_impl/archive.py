"""Archive member extraction (S11) — zip/tar/tgz/gz, guarded.

Reference lineage: arkham-shard-ingest/workers/archive_worker.py —
zip-bomb guard (compression ratio > 1000, > 10000 files, > 10 GB
uncompressed; :50-52, `_check_zip_bomb` :258-304) and path-traversal guard
(".." components rejected, :236-256). The reference extracts members to a
filesystem silo; here members become rows (name, payload) feeding the same
binary-column pipeline — no filesystem, so traversal names are simply
rejected rather than resolved.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

MAX_FILES = 10_000
MAX_UNCOMPRESSED_SIZE = 10 * 1024 * 1024 * 1024
MAX_COMPRESSION_RATIO = 1000


def _guard(name: str) -> None:
    parts = name.replace("\\", "/").split("/")
    if ".." in parts:
        raise ValueError(f"Path traversal detected in archive member: {name}")


def _bomb_check(compressed: int, uncompressed: int, n_files: int) -> None:
    if n_files > MAX_FILES:
        raise ValueError(f"Archive has too many files: {n_files}")
    if uncompressed > MAX_UNCOMPRESSED_SIZE:
        raise ValueError(f"Archive too large uncompressed: {uncompressed}")
    if compressed > 0 and uncompressed / compressed > MAX_COMPRESSION_RATIO:
        raise ValueError(
            f"Suspicious compression ratio: {uncompressed / compressed:.0f}"
        )


def sniff_archive(raw: bytes) -> str | None:
    """Magic-byte routing (archive_worker.py:190-207 order)."""
    if raw[:4] == b"PK\x03\x04":
        return "zip"
    if raw[:2] == b"\x1f\x8b":
        return "gz"
    if raw[:3] == b"BZh":
        return "bz2"
    if raw[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if raw[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if raw[:6] == b"Rar!\x1a\x07":
        return "rar"
    if len(raw) > 262 and raw[257:262] == b"ustar":
        return "tar"
    return None


def _bounded_stream_read(stream, raw_len: int, what: str) -> bytes:
    """Chunked single-member decompress shared by the gz/bz2/xz branches:
    abort the moment EITHER limit (absolute size or compression ratio) is
    exceeded — reading cap+1 up front would itself allocate up to 1000× the
    input before the check ran, making the bomb guard the OOM vector."""
    cap = min(MAX_UNCOMPRESSED_SIZE, MAX_COMPRESSION_RATIO * raw_len)
    chunks: list[bytes] = []
    total = 0
    while True:
        chunk = stream.read(min(1 << 20, cap + 1 - total))
        if not chunk:
            break
        chunks.append(chunk)
        total += len(chunk)
        if total > cap:
            _bomb_check(raw_len, total, 1)  # raises the precise reason
            raise ValueError(f"{what} stream exceeded decompression cap")
    data = b"".join(chunks)
    _bomb_check(raw_len, len(data), 1)
    return data


def extract_archive_members(raw: bytes, fmt: str | None = None) -> list[tuple[str, bytes]]:
    """(member_name, payload) pairs; raises ValueError on bombs/traversal."""
    fmt = fmt or sniff_archive(raw)
    if fmt == "zip":
        with zipfile.ZipFile(io.BytesIO(raw)) as zf:
            infos = [i for i in zf.infolist() if not i.is_dir()]
            _bomb_check(len(raw), sum(i.file_size for i in infos), len(infos))
            out = []
            for i in infos:
                _guard(i.filename)
                out.append((i.filename, zf.read(i)))
            return out
    if fmt in ("tar", "tgz"):
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            members = [m for m in tf.getmembers() if m.isfile()]
            _bomb_check(len(raw), sum(m.size for m in members), len(members))
            out = []
            for m in members:
                _guard(m.name)
                fh = tf.extractfile(m)
                out.append((m.name, fh.read() if fh else b""))
            return out
    if fmt in ("gz", "bz2", "xz"):
        if fmt == "gz":
            stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
        elif fmt == "bz2":
            import bz2 as _bz2

            stream = _bz2.BZ2File(io.BytesIO(raw))
        else:
            import lzma

            stream = lzma.LZMAFile(io.BytesIO(raw))
        with stream:
            data = _bounded_stream_read(stream, len(raw), fmt)
        # .tar.gz/.tar.bz2/.tar.xz: the codec wraps a tar stream — re-sniff
        # the payload and route through the tar branch (the reference
        # archive_worker re-sniffs extracted members the same way)
        if sniff_archive(data) == "tar":
            return extract_archive_members(data, "tar")
        return [("member", data)]
    if fmt == "7z":
        # gated on py7zr like the reference (archive_worker.py:430-432):
        # ImportError with the install hint when absent
        try:
            import py7zr  # type: ignore
        except ImportError:
            raise ImportError("py7zr not installed. Install with: pip install py7zr")
        with py7zr.SevenZipFile(io.BytesIO(raw), mode="r") as zf:
            infos = [i for i in zf.list() if not i.is_directory]
            _bomb_check(
                len(raw), sum(i.uncompressed for i in infos), len(infos)
            )
            out = []
            for name, bio in (zf.read() or {}).items():
                _guard(name)
                out.append((name, bio.read()))
            return out
    if fmt == "rar":
        # gated on rarfile (archive_worker.py:466-468)
        try:
            import rarfile  # type: ignore
        except ImportError:
            raise ImportError(
                "rarfile not installed. Install with: pip install rarfile"
            )
        with rarfile.RarFile(io.BytesIO(raw)) as rf:
            infos = [i for i in rf.infolist() if not i.is_dir()]
            _bomb_check(len(raw), sum(i.file_size for i in infos), len(infos))
            out = []
            for i in infos:
                _guard(i.filename)
                out.append((i.filename, rf.read(i)))
            return out
    raise ValueError(f"Unsupported or unrecognized archive format: {fmt}")
