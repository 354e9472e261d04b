"""Snapshot-committed multi-table warehouse.

The reference's resume story is "the DB ledgers survive a restart"
(ref: ocr_translate/ocr_tsl/full.py:28-74 lazy path); at batch scale the
analog is snapshot isolation: a killed run must leave either a complete,
visible commit or nothing (north_rule: resume idempotently from the last
committed snapshot).

On a real cluster this is Iceberg (``writeTo(...).append()`` /
``MERGE INTO`` — atomic snapshot commits, used automatically when the
runtime has the Iceberg catalog configured).  This container has no Iceberg
jars, so the same contract is implemented directly over parquet:

* data files are written under ``<root>/<table>/commit-<uuid>/`` (invisible
  to readers until referenced);
* a snapshot manifest ``<root>/_snapshots/<n>.json`` lists, for every
  table, ALL data directories visible at snapshot ``n`` (full listing, not
  a delta — manifests are tiny);
* the manifest is published with an atomic ``os.rename``; a crash at any
  earlier point leaves only orphan data directories that no reader sees.

All tables in one ``commit()`` become visible atomically together — the
extraction pipeline relies on this to keep ``extracted`` and the ``runs``
memoization ledger consistent (a crash can never publish results without
their ledger rows, which is what makes re-runs idempotent).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath + configured."""
    try:
        return bool(
            spark.conf.get("spark.sql.catalog.spark_catalog", None)
            and "iceberg" in spark.conf.get("spark.sql.catalog.spark_catalog")
        )
    except Exception:  # pragma: no cover
        return False


def open_warehouse(spark: SparkSession, root: str):
    """Warehouse factory: the real Iceberg catalog when the runtime has one
    configured (cluster deployments), the parquet+manifest emulation with
    the same contract otherwise (this container ships no Iceberg jars).
    Callers (pipeline.run_extraction) are branch-agnostic."""
    if iceberg_available(spark):
        return IcebergWarehouse(spark, root)
    return Warehouse(root)


class IcebergWarehouse:
    """Iceberg-catalog-backed warehouse with the same interface and the
    same SNAPSHOT CONTRACT as :class:`Warehouse` (stage / read_staged /
    commit / write / read with sequential logical snapshot ids).

    Iceberg's own snapshot ids are random per-table longs and there are no
    cross-table transactions, so the multi-table contract is carried by a
    tiny ``_snapshot_log`` Iceberg table — the catalog analog of the
    parquet emulation's manifest files:

    * ``stage`` writes to an uncommitted staging table
      ``<ns>.<table>__stage_<uuid>`` (in the catalog, but no reader
      resolves it);
    * ``commit`` appends every staged table into its final table
      (an atomic Iceberg snapshot each), records each table's resulting
      Iceberg snapshot id, then publishes ONE log append
      ``(snapshot_id, table, iceberg_snapshot_id)`` covering all tables —
      the log append is the single atomic publish point;
    * ``read`` resolves through the log: it time-travels each table with
      ``VERSION AS OF`` the Iceberg snapshot the log recorded for the
      requested (or latest) logical snapshot, so data appended by a
      crashed (never-logged) commit is invisible and logical snapshot ids
      are sequential ints on both branches.  One divergence from the
      parquet emulation, stated honestly: after a crash mid-commit, the
      table's NEXT successful commit records an Iceberg snapshot that
      also contains the orphaned append, so the re-extracted rows appear
      twice from that logical snapshot on — byte-identical duplicates
      (same url, version, options) that ``read_extracted(latest_only)``
      collapses; the ledger itself never references the orphan run.
      Warehouses written before the log existed are read at their current
      table state (legacy fallback, no time travel).

    Exercised only when an Iceberg catalog is configured (tests skip
    otherwise); the emulation covers the contract in this container.
    """

    LOG_TABLE = "_snapshot_log"

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        # accept a path-like root and sanitize it into a namespace name
        ns = namespace.strip("/").replace("/", "_").replace("-", "_") or "warehouse"
        self.namespace = ns
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")

    def _full(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    # -- write ---------------------------------------------------------

    def stage(self, df: DataFrame, table: str) -> str:
        handle = self._full(f"{table}__stage_{uuid.uuid4().hex[:12]}")
        df.writeTo(handle).create()
        return handle

    def read_staged(self, spark: SparkSession, handle: str) -> DataFrame:
        return spark.table(handle)

    def discard_staged(self, handle: str) -> None:
        """Drop a staged-but-never-committed handle.  Callers that bail out
        after staging (e.g. a fully-memoized run) MUST call this, or every
        replayed streaming micro-batch leaks a permanent ``__stage_*``
        table in the catalog."""
        self.spark.sql(f"DROP TABLE IF EXISTS {handle}")

    def _iceberg_snapshot(self, full: str) -> int:
        """Current snapshot of the main branch via the ``refs`` metadata
        table — deterministic, unlike ordering ``snapshots`` by the
        millisecond-granularity ``committed_at`` (which can tie)."""
        row = (
            self.spark.sql(f"SELECT name, snapshot_id FROM {full}.refs")
            .where("name = 'main'")
            .first()
        )
        return int(row["snapshot_id"]) if row else 0

    def commit(self, staged: dict[str, list[str]]) -> int:
        new_id = self.current_snapshot_id() + 1
        log_rows = []
        for table, handles in sorted(staged.items()):
            full = self._full(table)
            for handle in handles:
                df = self.spark.table(handle)
                if self.spark.catalog.tableExists(full):
                    df.writeTo(full).append()
                else:
                    df.writeTo(full).create()
                self.spark.sql(f"DROP TABLE IF EXISTS {handle}")
            log_rows.append((new_id, table, self._iceberg_snapshot(full)))
        log_df = self.spark.createDataFrame(
            log_rows, "snapshot_id long, table_name string, iceberg_snapshot_id long"
        )
        log_full = self._full(self.LOG_TABLE)
        if self.spark.catalog.tableExists(log_full):
            log_df.writeTo(log_full).append()  # the atomic publish point
        else:
            log_df.writeTo(log_full).create()
        return new_id

    def write(self, df: DataFrame, table: str) -> int:
        return self.commit({table: [self.stage(df, table)]})

    # -- read ------------------------------------------------------------

    def _log(self) -> "DataFrame | None":
        log_full = self._full(self.LOG_TABLE)
        if not self.spark.catalog.tableExists(log_full):
            return None
        return self.spark.table(log_full)

    def current_snapshot_id(self) -> int:
        log = self._log()
        if log is None:
            return 0
        row = log.selectExpr("max(snapshot_id) AS m").first()
        return int(row["m"]) if row and row["m"] is not None else 0

    def read(
        self,
        spark: SparkSession,
        table: str,
        schema=None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        full = self._full(table)
        log = self._log()
        exists = spark.catalog.tableExists(full)
        if log is None:
            # legacy warehouse written before the snapshot log existed:
            # read the current table state (no time travel available)
            if exists:
                return spark.table(full)
        else:
            snap = self.current_snapshot_id() if snapshot_id is None else snapshot_id
            row = (
                log.filter(
                    (F.col("table_name") == table)
                    & (F.col("snapshot_id") <= snap)
                )
                .orderBy(F.desc("snapshot_id"))
                .first()
            )
            if row is not None and exists:
                return (
                    spark.read
                    .option("snapshot-id", int(row["iceberg_snapshot_id"]))
                    .table(full)
                )
            # a table with data but no log row = a crashed, never-published
            # commit: stays invisible (the parquet emulation's orphan-dir
            # behavior)
        if schema is None:
            raise ValueError(f"table {table!r} is empty and no schema given")
        return spark.createDataFrame([], schema=schema)


class Warehouse:
    """Multi-table snapshot store rooted at a local/posix path."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)

    # -- snapshot log ----------------------------------------------------

    def _snapshot_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    def snapshots(self) -> list[int]:
        out = []
        for name in os.listdir(self._snapshot_dir()):
            if name.endswith(".json"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def current_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1] if snaps else 0

    def _manifest(self, snapshot_id: int) -> dict:
        if snapshot_id == 0:
            return {"id": 0, "tables": {}}
        path = os.path.join(self._snapshot_dir(), f"{snapshot_id}.json")
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)

    # -- write -----------------------------------------------------------

    def stage(self, df: DataFrame, table: str) -> str:
        """Write ``df`` as parquet into an uncommitted data directory."""
        commit_dir = os.path.join(self.root, table, f"commit-{uuid.uuid4().hex[:12]}")
        df.write.mode("errorifexists").parquet(commit_dir)
        return commit_dir

    def read_staged(self, spark: SparkSession, handle: str) -> DataFrame:
        """Read back a staged-but-uncommitted handle (columnar, cheap)."""
        return spark.read.parquet(handle)

    def discard_staged(self, handle: str) -> None:
        """Delete a staged-but-never-committed data directory (no manifest
        references it, so this is pure orphan cleanup — see
        IcebergWarehouse.discard_staged for why callers must bother)."""
        import shutil

        shutil.rmtree(handle, ignore_errors=True)

    def commit(self, staged: dict[str, list[str]]) -> int:
        """Atomically publish staged directories for one or more tables.

        Returns the new snapshot id.  ``staged`` maps table name -> list of
        directories previously returned by :meth:`stage`.
        """
        parent = self.current_snapshot_id()
        manifest = self._manifest(parent)
        tables = {k: list(v) for k, v in manifest["tables"].items()}
        for table, dirs in staged.items():
            rel = [os.path.relpath(d, self.root) for d in dirs]
            tables.setdefault(table, []).extend(rel)
        new_id = parent + 1
        payload = {"id": new_id, "parent": parent, "tables": tables}
        tmp = os.path.join(self._snapshot_dir(), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(payload, fh)
        final = os.path.join(self._snapshot_dir(), f"{new_id}.json")
        os.rename(tmp, final)  # atomic publish
        return new_id

    def write(self, df: DataFrame, table: str) -> int:
        """stage + commit one table (convenience)."""
        return self.commit({table: [self.stage(df, table)]})

    # -- read ------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        table: str,
        schema=None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Read the committed state of ``table`` (optionally time-traveled).

        Returns an empty DataFrame with ``schema`` when the table has no
        committed data yet.
        """
        snap = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        dirs = self._manifest(snap)["tables"].get(table, [])
        if not dirs:
            if schema is None:
                raise ValueError(f"table {table!r} is empty and no schema given")
            return spark.createDataFrame([], schema=schema)
        paths = [os.path.join(self.root, d) for d in dirs]
        return spark.read.parquet(*paths)
