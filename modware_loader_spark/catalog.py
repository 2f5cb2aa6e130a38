"""Chado catalog persistence: one parquet directory per table (the
production shape of the in-memory loader state), with a JDBC mirror for a
real Chado database.

The reference's persistent state is rows in Pg/SQLite/Oracle via
DBIx::Class (``lib/Modware/Role/Command/WithBCS.pm:118-121``); its
transactionality (single txn around a whole load,
``gff3tochado.pm:251,272-277``) maps to idempotent merge design (M6
EXCEPT semantics) + atomic directory overwrite per table here. The JDBC
path uses the same DataFrames with ``spark.read/write.jdbc`` — dialect
differences live entirely in the JDBC writer (the reference needed three
SQL dialects; we need none).

Scale: each table directory is partitionable (e.g. feature by
organism_id, featureloc by srcfeature_id) — pass ``partition_by`` to get
partition pruning on the read side.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ChadoCatalog:
    def __init__(self, spark: SparkSession, root: str,
                 partition_by: dict[str, list[str]] | None = None):
        self.spark = spark
        self.root = root
        self.partition_by = partition_by or {}

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def save(self, tables: dict[str, DataFrame]) -> None:
        """Write each table with a write-aside + atomic swap.

        A restored DataFrame is a lazy scan over this catalog's own parquet
        directory; a direct ``mode("overwrite")`` on that directory deletes
        the source files before the scan runs (FAILED_READ_FILE + data loss).
        Writing to a ``.__tmp__`` sibling first fully materializes the new
        data from the old files, then a directory rename swaps it in — the
        old generation is only removed after the new one is in place.
        """
        for name, df in tables.items():
            target = self._path(name)
            tmp = target + ".__tmp__"
            old = target + ".__old__"
            for leftover in (tmp, old):
                if os.path.isdir(leftover):
                    shutil.rmtree(leftover)
            writer = df.write.mode("overwrite")
            if name in self.partition_by:
                writer = writer.partitionBy(*self.partition_by[name])
            writer.parquet(tmp)
            if os.path.isdir(target):
                os.rename(target, old)
            os.rename(tmp, target)
            if os.path.isdir(old):
                shutil.rmtree(old)

    # -- metastore-backed bucketed persistence ---------------------------
    # Repeated loads re-join the big fact tables on the same keys every
    # time (feature ⋈ featureloc on feature_id, cvterm ⋈ dbxref on
    # dbxref_id). Bucketing both sides on the join key removes that
    # shuffle for every future merge: the scan is already hash-partitioned
    # on disk. This needs a metastore table (saveAsTable), so it is an
    # OPT-IN second persistence mode next to the plain parquet dirs — the
    # natural cluster shape for 100 TB facts where the shuffle is the
    # bottleneck, overkill for dims.
    def _table_name(self, table: str) -> str:
        base = os.path.basename(os.path.normpath(self.root))
        safe = "".join(c if c.isalnum() else "_" for c in base)
        return f"{safe}__{table}"

    def save_bucketed(
        self, tables: dict[str, DataFrame], bucket_by: dict[str, tuple[list[str], int]]
    ) -> None:
        """``bucket_by``: table → (bucket columns, bucket count). Tables
        not listed write unbucketed. Bucket count: size so each bucket's
        biggest partition fits in executor memory at the target SF."""
        for name, df in tables.items():
            tname = self._table_name(name)
            # an in-memory metastore forgets tables across sessions but the
            # managed LOCATION on disk survives → LOCATION_ALREADY_EXISTS on
            # the next save. Drop the table AND clear a stale location.
            self.spark.sql(f"DROP TABLE IF EXISTS {tname}")
            wh = self.spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            stale = os.path.join(wh, tname.lower())
            if os.path.isdir(stale):
                shutil.rmtree(stale)
            writer = df.write.mode("overwrite").format("parquet")
            spec = bucket_by.get(name)
            if spec:
                cols, n = spec
                writer = writer.bucketBy(n, *cols).sortBy(*cols)
            writer.saveAsTable(tname)

    def load_bucketed(self, names: list[str]) -> dict[str, DataFrame]:
        out = {}
        for name in names:
            tname = self._table_name(name)
            if self.spark.catalog.tableExists(tname):
                out[name] = self.spark.table(tname)
        return out

    def load(self, names: list[str]) -> dict[str, DataFrame]:
        out = {}
        for name in names:
            path = self._path(name)
            if os.path.isdir(path):
                out[name] = self.spark.read.parquet(path)
        return out

    # -- JDBC mirror (round-trip-tested in-JVM via embedded Derby,
    #    tests/test_jdbc.py; Postgres/Oracle differ only by driver jar
    #    + url, which Spark's JDBC dialects handle) -----------------------
    def save_jdbc(self, tables: dict[str, DataFrame], url: str,
                  properties: dict | None = None, batchsize: int = 4000) -> None:
        """Write each table over JDBC. ``batchsize`` default mirrors the
        reference's staging chunk (``Temp/WithPostgresql.pm:10-11``)."""
        props = dict(properties or {})
        props.setdefault("batchsize", str(batchsize))
        for name, df in tables.items():
            df.write.mode("append").jdbc(url, name, properties=props)

    def load_jdbc(self, names: list[str], url: str,
                  properties: dict | None = None) -> dict[str, DataFrame]:
        return {
            name: self.spark.read.jdbc(url, name, properties=dict(properties or {}))
            for name in names
        }


def save_loader_state(loader, catalog: ChadoCatalog) -> None:
    """Persist a loader's tables + dims + scalar state (the auto-id
    counter is the analog of the reference's DB sequence position —
    without it a fresh process would mint colliding auto uniquenames)."""
    import json

    tables = dict(loader.tables)
    for name, df in getattr(loader, "dims", {}).items():
        tables[f"dim_{name}"] = df
    catalog.save(tables)
    meta = {
        "auto_counter": getattr(loader, "_auto_counter", 0),
        "metadata": getattr(loader, "metadata", {}),
    }
    os.makedirs(catalog.root, exist_ok=True)
    with open(os.path.join(catalog.root, "_meta.json"), "w") as fh:
        json.dump(meta, fh)


def restore_loader_state(loader, catalog: ChadoCatalog) -> None:
    import json

    table_names = list(loader.tables)
    restored = catalog.load(table_names)
    loader.tables.update(restored)
    dims = getattr(loader, "dims", None)
    if dims is not None:
        for name in list(dims):
            got = catalog.load([f"dim_{name}"])
            if got:
                dims[name] = got[f"dim_{name}"]
    meta_path = os.path.join(catalog.root, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if hasattr(loader, "_auto_counter"):
            loader._auto_counter = meta.get("auto_counter", 0)
        if hasattr(loader, "metadata"):
            loader.metadata.update(meta.get("metadata", {}))
