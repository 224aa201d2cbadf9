"""Stage-checkpointed table warehouse.

The north rule requires every pipeline stage (signatures, candidate edges,
label iterations, clusters, metrics) to land in a table so a 10^12-row run
is resumable mid-pipeline. With an Iceberg runtime jar on the classpath the
warehouse uses Iceberg tables (snapshots give atomic commits, MERGE/DELETE
give W3/W8 semantics); this sandbox has no Iceberg jar (verified, SURVEY.md
§7.1), so the fallback is a parquet directory per table plus a JSON stage
manifest — the same table names and resume semantics, minus snapshot
time-travel.

Write path notes for scale: every writer takes `partition_by` so huge
tables (band buckets, edges) can be partitioned for pruned reads; stage
completion is recorded only after the write finishes, so a killed run
re-executes the interrupted stage instead of trusting partial output
(parquet writes are directory-atomic enough via _SUCCESS markers; Iceberg
makes this fully atomic).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


# DDL/DML templates used when an Iceberg runtime jar is on the classpath
# (none in this sandbox — SURVEY.md §7.1). Table layout decisions for 10^12
# rows: signatures partitioned by bucket(id) so the verify join can prune;
# edges partitioned by bucket(src); snapshot retention covers resume windows.
ICEBERG_TABLE_DDL = {
    "signatures": (
        "CREATE TABLE IF NOT EXISTS {catalog}.{db}.signatures "
        "(id STRING, sig ARRAY<INT>) USING iceberg "
        "PARTITIONED BY (bucket(512, id)) "
        "TBLPROPERTIES ('write.distribution-mode'='hash', "
        "'history.expire.max-snapshot-age-ms'='604800000')"
    ),
    "candidate_edges": (
        "CREATE TABLE IF NOT EXISTS {catalog}.{db}.candidate_edges "
        "(src STRING, dst STRING) USING iceberg "
        "PARTITIONED BY (bucket(512, src))"
    ),
    "cluster_labels": (
        "CREATE TABLE IF NOT EXISTS {catalog}.{db}.cluster_labels "
        "(id STRING, component STRING) USING iceberg "
        "PARTITIONED BY (bucket(512, id))"
    ),
}

# W3 removal and W8 idempotent upsert as Iceberg DML (merge-on-read delete
# files make these metadata-cheap at scale)
ICEBERG_DELETE = "DELETE FROM {table} WHERE id IN (SELECT id FROM {ids_view})"
ICEBERG_UPSERT = (
    "MERGE INTO {table} t USING {updates_view} u ON t.id = u.id "
    "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
)


def render_iceberg_ddl(catalog: str, db: str) -> dict[str, str]:
    """Render the stage-table DDL for a catalog/database. Parquet-fallback
    parity contract: the Warehouse exposes the SAME table names, writer
    methods, and stage-resume semantics either way — Iceberg adds snapshot
    atomicity and time travel, the parquet fallback substitutes _SUCCESS
    markers + the JSON stage manifest; pipelines never branch on which
    backend is active."""
    return {
        name: ddl.format(catalog=catalog, db=db)
        for name, ddl in ICEBERG_TABLE_DDL.items()
    }


def render_iceberg_delete(table: str, ids_view: str) -> str:
    """W3 bulk removal as Iceberg DML."""
    return ICEBERG_DELETE.format(table=table, ids_view=ids_view)


def render_iceberg_upsert(table: str, updates_view: str) -> str:
    """W8 idempotent upsert as Iceberg MERGE."""
    return ICEBERG_UPSERT.format(table=table, updates_view=updates_view)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Warehouse:
    def __init__(self, spark: SparkSession, path: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)
        self.iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )
        self._manifest_path = os.path.join(self.path, "_stage_manifest.json")

    # ---------------------------------------------------------------- tables
    def table_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_path(name))

    def append(self, df: DataFrame, name: str) -> None:
        self.write(df, name, mode="append")

    def overwrite_partitions(self, df: DataFrame, name: str,
                             partition_by: list[str]) -> None:
        """Dynamic partition overwrite: replaces exactly the partitions
        present in df, leaving others intact — the idempotent-append
        primitive for replayable writers (a foreachBatch retry rewrites its
        own batch_id partition instead of double-appending). Iceberg's
        INSERT OVERWRITE has the same semantics when a runtime jar exists."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self.table_path(name))
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        if not os.path.isdir(p):
            return False
        entries = os.listdir(p)
        return (
            "_SUCCESS" in entries
            or any(f.endswith(".parquet") for f in entries)
            # partitioned layout (key=value dirs; dynamic partition
            # overwrite does not leave a root _SUCCESS marker)
            or any("=" in f and os.path.isdir(os.path.join(p, f)) for f in entries)
        )

    def drop(self, name: str) -> None:
        shutil.rmtree(self.table_path(name), ignore_errors=True)

    def compact(
        self,
        name: str,
        partition_by: list[str] | None = None,
        target_files: int = 1,
    ) -> int:
        """Rewrite a table to a bounded file count, preserving rows and
        the partition layout. A maintained index table accretes one
        directory of shuffle-partition-many small files per micro-batch;
        after thousands of triggers every index probe pays thousands of
        file opens (guide §6 small-files problem). With partition_by, rows
        are hash-clustered by the partition columns first so each
        partition value lands in exactly one write task -> one file per
        partition; without, the whole table coalesces to target_files.

        Parquet-fallback atomicity: the rewrite lands in a temp dir first
        and is swapped in with rename; the rm+rename window is the
        documented non-atomic residue (Iceberg's rewrite_data_files does
        this atomically — same operation, snapshot-committed). Returns the
        file count after compaction."""
        df = self.read(name)
        tmp = self.table_path(name) + "._compact_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        if partition_by:
            (
                df.repartition(*[df[c] for c in partition_by])
                .write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(tmp)
            )
        else:
            df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        dst = self.table_path(name)
        shutil.rmtree(dst)
        os.replace(tmp, dst)
        return sum(
            1
            for _, _, files in os.walk(dst)
            for f in files
            if f.endswith(".parquet")
        )

    def file_count(self, name: str) -> int:
        """Data-file count of a table (compaction health metric)."""
        return sum(
            1
            for _, _, files in os.walk(self.table_path(name))
            for f in files
            if f.endswith(".parquet")
        )

    def partition_values(self, name: str, key: str) -> set[str]:
        """Distinct values of a top-level partition column, read from the
        directory layout (key=value subdirs) — an O(#partitions) listing,
        no Spark job. Used for cheap index-coverage checks (a maintained
        index table must cover every batch of its base table before a
        query may trust it)."""
        p = self.table_path(name)
        if not os.path.isdir(p):
            return set()
        prefix = key + "="
        return {
            f[len(prefix):]
            for f in os.listdir(p)
            if f.startswith(prefix) and os.path.isdir(os.path.join(p, f))
        }

    # -------------------------------------------------------------- manifest
    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"stages": {}}

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def stage_done(self, stage: str) -> bool:
        return self._load_manifest()["stages"].get(stage, {}).get("status") == "done"

    def mark_stage(self, stage: str, **info) -> None:
        m = self._load_manifest()
        m["stages"][stage] = {"status": "done", "ts": time.time(), **info}
        self._save_manifest(m)

    def reset_stage(self, stage: str) -> None:
        m = self._load_manifest()
        m["stages"].pop(stage, None)
        self._save_manifest(m)

    def run_stage(
        self,
        stage: str,
        table: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Execute a stage with resume: if the manifest marks it done and the
        table exists, read it back instead of recomputing. Returns the stage
        output DataFrame (always read from storage, so downstream stages cut
        lineage — the checkpoint IS the plan barrier)."""
        if not force and self.stage_done(stage) and self.exists(table):
            return self.read(table)
        t0 = time.time()
        df = build()
        self.write(df, table, partition_by=partition_by)
        out = self.read(table)
        rows = out.count()
        wall = time.time() - t0
        self.mark_stage(
            stage,
            table=table,
            rows=rows,
            wall_sec=round(wall, 3),
            rows_per_sec=round(rows / wall, 1) if wall > 0 else None,
        )
        return out

    def manifest(self) -> dict:
        return self._load_manifest()
