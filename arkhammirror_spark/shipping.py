"""Ship the package to executor Python workers.

Pandas-UDF closures reference this package; executor python workers don't
inherit the driver's ``sys.path``, so any session whose working directory is
not the repo root would fail with ModuleNotFoundError inside the UDF. The
production run mode is ``spark-submit --py-files arkhammirror_spark.zip``
(BASELINE.json north rule); ``ensure_shipped`` provides the same guarantee
programmatically: zip the installed package once per content-hash and
``addPyFile`` it to the active SparkContext (idempotent per session).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_arkhammirror_pyfiles_shipped"


def build_package_zip(dest_dir: str | None = None) -> str:
    """Zip this package (source files only) and return the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    pkg_name = os.path.basename(pkg_dir)

    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                entries.append(os.path.join(root, fn))
    h = hashlib.sha256()
    for path in sorted(entries):
        h.update(path.encode())
        with open(path, "rb") as fh:
            h.update(fh.read())
    digest = h.hexdigest()[:16]

    dest_dir = dest_dir or tempfile.gettempdir()
    zip_path = os.path.join(dest_dir, f"{pkg_name}-{digest}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for path in sorted(entries):
                zf.write(path, os.path.relpath(path, parent))
        os.replace(tmp, zip_path)
    return zip_path


def ensure_shipped(spark) -> None:
    """Idempotently add the package zip to the session's Python path."""
    sc = spark.sparkContext
    shipped = getattr(sc, _SHIPPED_ATTR, None)
    if shipped:
        return
    zip_path = build_package_zip()
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, zip_path)
