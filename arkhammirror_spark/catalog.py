"""Storage seam: Iceberg when the runtime is on the classpath, else
parquet-with-manifest snapshots with the same commit/resume semantics.

The 10^12-row deployment writes ``df.writeTo("catalog.db.table").append()``
into Iceberg (snapshot isolation, partition evolution, audit branch). This
sandbox has no Iceberg runtime JAR, so the fallback implements the minimal
contract the pipeline needs on plain parquet:

- a *snapshot* is ``<root>/<table>/snapshot=<id>/`` written atomically
  (parquet + `_MANIFEST.json` committed last; a snapshot without a manifest
  is invisible),
- ``committed_snapshots`` lists manifests in commit order,
- ``read_table`` unions all committed snapshots (append semantics).

Resume-from-checkpoint = anti-join against the union of committed snapshots'
keys, identical in both backends.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


@dataclass
class ParquetSnapshotCatalog:
    root: str

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snap_dir(self, table: str, snapshot_id: str) -> str:
        return os.path.join(self._table_dir(table), f"snapshot={snapshot_id}")

    def write_snapshot(
        self, df: DataFrame, table: str, snapshot_id: str, extra_meta: dict | None = None
    ) -> dict:
        path = self._snap_dir(table, snapshot_id)
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        n_rows = spark.read.parquet(path).count()
        manifest = {
            "table": table,
            "snapshot_id": snapshot_id,
            "rows": n_rows,
            "committed_at_epoch": time.time(),
            "schema": df.schema.jsonValue(),
            **(extra_meta or {}),
        }
        tmp = os.path.join(path, "_MANIFEST.json.tmp")
        final = os.path.join(path, "_MANIFEST.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, final)  # atomic commit point
        return manifest

    def committed_snapshots(self, table: str) -> list[dict]:
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in sorted(os.listdir(tdir)):
            mf = os.path.join(tdir, name, "_MANIFEST.json")
            if name.startswith("snapshot=") and os.path.isfile(mf):
                with open(mf) as fh:
                    out.append(json.load(fh))
        out.sort(key=lambda m: m["committed_at_epoch"])
        return out

    def read_snapshot(
        self, spark: SparkSession, table: str, snapshot_id: str
    ) -> DataFrame:
        """Read one committed snapshot (this run's contribution only)."""
        return spark.read.parquet(self._snap_dir(table, snapshot_id))

    def read_table(self, spark: SparkSession, table: str) -> DataFrame | None:
        snaps = self.committed_snapshots(table)
        if not snaps:
            return None
        paths = [self._snap_dir(table, m["snapshot_id"]) for m in snaps]
        return spark.read.parquet(*paths)
