"""Snapshot-table CDC as a FIRST-CLASS Spark streaming source.

``sources.snapshots`` gives the table format batch CDC
(:func:`~acoustic_feature_extractor_spark.sources.snapshots.read_changes`);
this module lifts it into Structured Streaming through PySpark 4's Python
DataSource API, so downstream incremental maintenance is just

    register_cdc_source(spark)
    changes = (spark.readStream.format("snapshot_changes")
               .option("path", table_path).load())

— the Iceberg/Delta ``readChangeFeed`` shape, re-expressed over this
repo's snapshot log. Offsets ARE snapshot ids (exactly-once by
construction: the log is the source of truth, a restarted query resumes
from the checkpointed snapshot id); each micro-batch walks the log
entries in ``(start, end]``, diffs every snapshot's directory list
against its parent, and plans ONE input partition per changed data
directory — executors read only touched dirs (the batch CDC's
IO-∝-touched-data property carries over verbatim), via pyarrow straight
to Arrow RecordBatches (no per-row Python).

Emitted rows: the table's columns plus ``_change_type``
(``insert``/``delete``) and ``_snapshot_id`` (the commit that caused the
change). Like Iceberg's changelog scan of a copy-on-write table, a
rewritten directory emits its surviving rows as delete+insert pairs;
:func:`net_changes` (batch, stateless) cancels them inside a
``foreachBatch`` when only net effects matter. Contrast with
``jobs/incremental_features.py`` (driver-loop polling): here the
watermark/trigger/checkpoint machinery is Spark's own.

Reference: the reference is a one-shot per-file extractor with no
incremental story; this is the beyond-reference streaming twin of its
"re-run the extractor over new files" workflow (SURVEY §2.9).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _simple_to_ddl(simple: str) -> str:
    """``struct<a:int,b:array<float>>`` → ``a int, b array<float>`` —
    depth-aware so nested ``:``/``,`` stay inside their type. Avoids
    ``StructType.fromDDL`` (needs an active JVM session; ``schema()``
    must work wherever the planner instantiates the source)."""
    assert simple.startswith("struct<") and simple.endswith(">"), simple
    body = simple[len("struct<") : -1]
    fields, depth, cur = [], 0, []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        fields.append("".join(cur))
    out = []
    for f in fields:
        name, typ = f.split(":", 1)
        out.append(f"{name} {typ}")
    return ", ".join(out)


def _arrow_type(spark_simple: str):
    """Spark simpleString → pyarrow type, for null-filling columns that
    predate an additive schema evolution. Covers the repo's column
    vocabulary; exotic types raise rather than mis-map."""
    import pyarrow as pa

    m = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if spark_simple in m:
        return m[spark_simple]
    if spark_simple.startswith("array<") and spark_simple.endswith(">"):
        return pa.list_(_arrow_type(spark_simple[6:-1]))
    raise ValueError(f"unsupported evolved-column type: {spark_simple}")


@dataclass
class _DirChange(InputPartition):
    table_path: str
    rel_dir: str
    change_type: str  # insert | delete
    snapshot_id: int


class _SnapshotChangesReader(DataSourceStreamReader):
    def __init__(self, schema_fields: list[tuple[str, str]], options: dict):
        self._fields = schema_fields  # [(name, spark_simple_type)]
        self._path = options["path"]
        start = str(options.get("from_snapshot", "earliest")).lower()
        self._start_after = start  # resolved lazily in initialOffset

    def _log(self):
        from acoustic_feature_extractor_spark.sources.snapshots import _load_log

        return _load_log(self._path)

    def initialOffset(self) -> dict:
        if self._start_after == "earliest":
            return {"snapshot_id": 0}  # before the first commit: full history
        if self._start_after == "latest":
            snaps = self._log()
            return {"snapshot_id": snaps[-1].snapshot_id if snaps else 0}
        return {"snapshot_id": int(self._start_after)}

    def latestOffset(self) -> dict:
        snaps = self._log()
        return {"snapshot_id": snaps[-1].snapshot_id if snaps else 0}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        snaps = {s.snapshot_id: s for s in self._log()}
        parts: list[_DirChange] = []
        prev_dirs: set | None = None
        if lo and lo in snaps:
            prev_dirs = set(snaps[lo].dirs)
        # walk per-snapshot so each change is attributed to ITS commit;
        # compact_log may have folded intermediates — entries absent from
        # the log collapse into the next surviving snapshot's diff
        for sid in range(lo + 1, hi + 1):
            s = snaps.get(sid)
            if s is None:
                continue
            cur = set(s.dirs)
            base = prev_dirs if prev_dirs is not None else set()
            for d in sorted(cur - base):
                parts.append(_DirChange(self._path, d, "insert", sid))
            for d in sorted(base - cur):
                parts.append(_DirChange(self._path, d, "delete", sid))
            prev_dirs = cur
        if not parts:
            # Spark requires >= 1 partition per batch; a no-op marker
            # (empty dir) keeps zero-change batches cheap and valid
            parts.append(_DirChange(self._path, "", "insert", hi))
        return parts

    def read(self, partition: _DirChange):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.rel_dir:
            return iter(())
        tbl = pq.read_table(os.path.join(partition.table_path, partition.rel_dir))
        n = tbl.num_rows
        cols, names = [], []
        for name, typ in self._fields:
            if name in tbl.column_names:
                cols.append(tbl.column(name))
            else:  # column newer than this file (additive evolution)
                cols.append(pa.nulls(n, type=_arrow_type(typ)))
            names.append(name)
        cols.append(pa.array([partition.change_type] * n, type=pa.string()))
        names.append("_change_type")
        cols.append(pa.array([partition.snapshot_id] * n, type=pa.int64()))
        names.append("_snapshot_id")
        out = pa.table(cols, names=names)
        return iter(out.to_batches(max_chunksize=65536))

    def commit(self, end: dict) -> None:
        pass


class SnapshotChangesDataSource(DataSource):
    """``spark.readStream.format("snapshot_changes")`` over a snapshot
    table. Options: ``path`` (table dir, required); ``from_snapshot`` —
    ``earliest`` (default: replay full history as inserts), ``latest``
    (only commits after stream start), or a snapshot id to start AFTER."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self) -> str:
        from acoustic_feature_extractor_spark.sources.snapshots import _load_log

        snaps = _load_log(self.options["path"])
        if not snaps:
            raise ValueError(f"no snapshot log at {self.options['path']}")
        return (
            _simple_to_ddl(snaps[-1].schema)
            + ", _change_type string, _snapshot_id bigint"
        )

    def streamReader(self, schema):
        fields = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if f.name not in ("_change_type", "_snapshot_id")
        ]
        return _SnapshotChangesReader(fields, dict(self.options))


def register_cdc_source(spark: SparkSession) -> None:
    spark.dataSource.register(SnapshotChangesDataSource)


def net_changes(changes: DataFrame) -> DataFrame:
    """Cancel delete+insert pairs of identical rows (a rewrite's
    survivors) — the stateless batch net of a CDC micro-batch, same
    multiset semantics as ``read_changes``. Stateless on purpose: net
    WITHIN whatever scope you call it on (a micro-batch in
    ``foreachBatch``, or a full-history frame)."""
    payload = [c for c in changes.columns if c not in ("_change_type", "_snapshot_id")]
    ins = changes.where(F.col("_change_type") == "insert").select(payload)
    dels = changes.where(F.col("_change_type") == "delete").select(payload)
    return ins.exceptAll(dels).withColumn(
        "_change_type", F.lit("insert")
    ).unionByName(
        dels.exceptAll(ins).withColumn("_change_type", F.lit("delete"))
    )
