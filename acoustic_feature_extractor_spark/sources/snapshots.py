"""Snapshot-log table format over parquet: versioned commits, time travel,
rollback, expiry.

The north_rule asks for runs "resumable from Iceberg-snapshot checkpoints".
No Iceberg runtime ships in this sandbox (and the engine must not depend on
one being installed), so this module implements the load-bearing subset of
the snapshot model directly over parquet, the same way Iceberg's spec does
it — an append-only metadata log where each snapshot lists the data
directories that make up the table at that version:

- a COMMIT writes its data files under ``data/snap-<id>/`` first, then
  publishes by replacing ``metadata/snapshots.json`` via write-temp +
  ``os.replace`` (atomic on POSIX — readers see the old or the new log,
  never a torn one). A crashed commit leaves an orphan data dir and NO log
  entry: invisible to readers, reclaimed by :func:`expire`.
- ``append`` snapshots reference the parent's directory list plus their
  own; ``overwrite`` starts a fresh list. Data files are NEVER rewritten
  or moved by metadata operations.
- a READ resolves a snapshot id (default: current) to its directory list
  and loads exactly those parquet dirs — time travel is just reading an
  older entry.
- ROLLBACK appends a new snapshot that re-points at an old snapshot's
  file set (metadata-only, like Iceberg's rollback — history is preserved,
  nothing is deleted).
- EXPIRE drops old log entries and deletes data dirs no surviving
  snapshot references.
- MERGE (:func:`merge_upsert`) is copy-on-write at dir granularity:
  only dirs containing a matched key are rewritten, everything else is
  carried by reference.
- COMPACT (:func:`compact`) rewrites the current dir set into one
  right-sized dir, metadata-published like any commit; history intact.

Each snapshot records row count (via ``Observation`` on the write itself —
no re-read), schema DDL, wall-clock, parent id, and a caller lineage dict —
the per-partition lineage + metrics contract jobs build on.

**Writer concurrency contract**: one writer per table at a time. Every
log mutation (commit / merge / compact / rollback / expire) takes an
``O_CREAT|O_EXCL`` lock file for its whole duration — a second writer
fails fast with :class:`ConcurrentWriterError` instead of silently
discarding the first writer's snapshot (the read-modify-write race) or
clobbering its same-numbered ``snap-<id>`` data dir. The lock is
same-host scope (this module is a local-FS log, like the tests and jobs
that use it); a crashed writer's stale lock is reclaimed when its pid is
gone or the lock is older than an hour. Readers never lock — the
``os.replace`` publish keeps reads torn-free.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

_LOG = "metadata/snapshots.json"
_LOCK = "metadata/commit.lock"


class ConcurrentWriterError(RuntimeError):
    """A second writer attempted a log mutation while one was in flight."""


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


@contextmanager
def _writer_lock(table_path: str, stale_after: float = 3600.0):
    """Single-writer enforcement: O_EXCL lock held for the whole mutation
    (sid choice → data write → log publish), so concurrent writers can
    neither lose a snapshot to the read-modify-write race nor overwrite
    each other's same-sid data dir. Stale locks (dead pid, or older than
    ``stale_after``) are reclaimed once."""
    path = os.path.join(table_path, _LOCK)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd = None
    for attempt in (0, 1):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            holder: dict = {}
            try:
                with open(path) as f:
                    holder = json.load(f)
            except (OSError, ValueError):
                holder = {}
            alive = _pid_alive(int(holder.get("pid", -1)))
            stale = time.time() - float(holder.get("ts", 0.0)) > stale_after
            if attempt == 0 and (not alive or stale):
                try:
                    os.unlink(path)  # reclaim and retry once
                except FileNotFoundError:
                    pass
                continue
            raise ConcurrentWriterError(
                f"another writer holds {path} "
                f"(pid={holder.get('pid')}, since ts={holder.get('ts')}); "
                "snapshot tables are single-writer — serialize the jobs"
            ) from None
    try:
        os.write(fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str  # append | overwrite | rollback
    dirs: list[str]
    rows: int
    schema: str
    wall_ts: float
    lineage: dict = field(default_factory=dict)
    # per-FILE column min/max for the dirs THIS snapshot wrote (Iceberg's
    # manifest column stats): {file_rel: {col: [min, max, nulls, rows]}}.
    # Harvested from parquet FOOTERS at commit time (no data scan) so a
    # pruned read never opens footers — at 100 TB the stats live in the
    # log, not in a million S3 footer round-trips per query.
    stats: dict = field(default_factory=dict)
    # {dir_rel: schema_ddl} — which (possibly evolved) schema wrote each
    # dir. Populated by :func:`compact_log`/:func:`expire` when they fold
    # away the historical entries that otherwise carry this information
    # implicitly; consulted by ``_spans_writer_schemas`` so mergeSchema
    # detection survives log compaction. Empty on ordinary commits (the
    # full entry chain is the source of truth while it exists).
    writer_schemas: dict = field(default_factory=dict)


def _enc_stat(v):
    """JSON-encodable, ORDER-PRESERVING encoding of a parquet stat value.
    Naive timestamps map through a fixed UTC offset (monotonic — a local
    DST-aware conversion would not be); bytes/unencodable → None (column
    dropped, file kept conservatively)."""
    import datetime as _dt

    if isinstance(v, bool) or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return {"ts": v.timestamp()}
    if isinstance(v, _dt.date):
        return {"ts": _dt.datetime(v.year, v.month, v.day, tzinfo=_dt.timezone.utc).timestamp()}
    return None


def _stat_key(v):
    """Comparable form of an ENCODED stat value (dict = timestamp)."""
    return v["ts"] if isinstance(v, dict) else v


def _collect_file_stats(table_path: str, rel_dir: str) -> dict:
    """Per-file [min, max, null_count, num_rows] for every top-level
    primitive column of every parquet file in ``rel_dir`` — read from the
    footers only (pyarrow metadata; zero data pages touched). A column
    missing min/max in ANY row group of a file is dropped for that file
    (pruning then keeps the file: conservative in the safe direction)."""
    import pyarrow.parquet as pq

    out: dict = {}
    d = os.path.join(table_path, rel_dir)
    for name in sorted(os.listdir(d)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(d, name)).metadata
        rows = md.num_rows
        # per column: [min, max, nulls, every_rg_covered] — a row group
        # COVERS the column iff it has min/max or is provably all-null in
        # it; one uncovered row group disqualifies the file's column
        acc: dict = {}
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                path = c.path_in_schema
                if "." in path:  # nested leaves (arrays/structs): skip
                    continue
                st = c.statistics
                a = acc.setdefault(path, [None, None, 0, True])
                nulls = (
                    st.null_count
                    if (st is not None and st.null_count is not None)
                    else None
                )
                if nulls is None:
                    a[2] = -(10**18)  # unknown nulls: poison the all-null test
                elif a[2] >= 0:
                    a[2] += nulls
                if st is not None and st.has_min_max:
                    mn, mx = _enc_stat(st.min), _enc_stat(st.max)
                    if mn is None or mx is None:  # unencodable type
                        a[3] = False
                        continue
                    if a[0] is None or _stat_key(mn) < _stat_key(a[0]):
                        a[0] = mn
                    if a[1] is None or _stat_key(mx) > _stat_key(a[1]):
                        a[1] = mx
                elif nulls is None or nulls != rg.num_rows:
                    a[3] = False  # values exist (or might), bounds unknown
        cols: dict = {}
        if rows == 0:
            # EMPTY file (possible after merges/repartitions): record every
            # top-level primitive column as 0-row so pruning can skip the
            # file outright and table_profile keeps full coverage — an
            # absent entry would read as "stats unknown" instead
            sch = pq.ParquetFile(os.path.join(d, name)).schema_arrow
            for f in sch:
                if not (
                    str(f.type).startswith("list")
                    or str(f.type).startswith("struct")
                    or str(f.type).startswith("map")
                ):
                    cols[f.name] = [None, None, 0, 0]
        for path, (mn, mx, nulls, covered) in acc.items():
            if not covered:
                continue
            if 0 <= nulls == rows:
                # all-null column: no min/max exists, but the file is
                # provably dead to any range predicate
                cols[path] = [None, None, rows, rows]
            elif mn is not None:
                cols[path] = [mn, mx, max(nulls, 0), rows]
        # ALWAYS record an entry — even an empty cols dict. The planner
        # rebuilds each dir's file list from these keys (zero LIST calls);
        # a file omitted because no column yielded coverable stats (all
        # bytes/nested columns, writer without min/max) would be silently
        # EXCLUDED from every pruned read instead of conservatively kept.
        out[f"{rel_dir}/{name}"] = cols
    return out


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG)


def _load_log(table_path: str) -> list[Snapshot]:
    p = _log_path(table_path)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [Snapshot(**e) for e in json.load(f)]


def _publish_log(table_path: str, snaps: list[Snapshot]) -> None:
    p = _log_path(table_path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump([vars(s) for s in snaps], f, indent=1)
    os.replace(tmp, p)  # atomic publish: readers never see a torn log


def current_snapshot_id(table_path: str) -> int | None:
    snaps = _load_log(table_path)
    return snaps[-1].snapshot_id if snaps else None


def history(table_path: str) -> list[Snapshot]:
    return _load_log(table_path)


def _is_additive_evolution(old_simple: str, new_schema) -> bool:
    """True iff ``new_schema`` only ADDS columns to the simpleString
    ``old_simple`` (every old column present with an identical type) —
    the Iceberg add-column rule: safe because old files read the new
    columns as NULL, and no existing value reinterprets its type."""
    import re

    m = re.match(r"struct<(.*)>$", old_simple)
    if not m:
        return False
    old_cols = {}
    depth, start, body = 0, 0, m.group(1)
    parts = []
    for i, ch in enumerate(body):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    if body[start:]:
        parts.append(body[start:])
    for p in parts:
        name, _, typ = p.partition(":")
        old_cols[name] = typ
    new_cols = {f.name: f.dataType.simpleString() for f in new_schema.fields}
    return all(new_cols.get(n) == t for n, t in old_cols.items())


def commit(
    df: DataFrame,
    table_path: str,
    operation: str = "append",
    lineage: dict | None = None,
    evolve: bool = False,
) -> Snapshot:
    """Write ``df`` as a new snapshot and publish it. Returns the entry.

    Data lands under ``data/snap-<id>/`` BEFORE the log is replaced, so a
    failure at any point leaves the table readable at its previous
    snapshot.

    ``evolve=True`` permits ADDITIVE schema evolution on append (new
    columns; every existing column must keep its exact type — the
    Iceberg add-column rule): historical files simply read the new
    columns as NULL (:func:`read` detects the mixed log and turns on
    mergeSchema), no rewrite of any old byte. Renames/drops/type changes
    stay rejected — they reinterpret existing data and need an explicit
    overwrite.
    """
    if operation not in ("append", "overwrite"):
        raise ValueError(f"operation must be append|overwrite, got {operation}")
    with _writer_lock(table_path):
        snaps = _load_log(table_path)
        parent = snaps[-1] if snaps else None
        if (
            operation == "append"
            and parent is not None
            and parent.schema != df.schema.simpleString()
        ):
            if not (evolve and _is_additive_evolution(parent.schema, df.schema)):
                raise ValueError(
                    f"append schema mismatch: table has {parent.schema}, "
                    f"commit has {df.schema.simpleString()} — pass evolve=True "
                    "for additive column adds, or overwrite to restate"
                )
        sid = (parent.snapshot_id + 1) if parent else 1
        rel = f"data/snap-{sid}"
        obs = Observation(f"snap_rows_{sid}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").parquet(
            os.path.join(table_path, rel)
        )
        dirs = ([*parent.dirs, rel] if (operation == "append" and parent) else [rel])
        snap = Snapshot(
            snapshot_id=sid,
            parent_id=parent.snapshot_id if parent else None,
            operation=operation,
            dirs=dirs,
            rows=int(obs.get["rows"]),
            schema=df.schema.simpleString(),
            wall_ts=round(time.time(), 3),
            lineage=lineage or {},
            stats=_collect_file_stats(table_path, rel),
        )
        _publish_log(table_path, snaps + [snap])
    return snap


def read(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the table at ``snapshot_id`` (default: current). Time travel is
    resolving an older log entry to its directory list."""
    snaps = _load_log(table_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    if snapshot_id is None:
        snap = snaps[-1]
    else:
        by_id = {s.snapshot_id: s for s in snaps}
        if snapshot_id not in by_id:
            raise KeyError(
                f"snapshot {snapshot_id} not in log (have {sorted(by_id)}) — expired?"
            )
        snap = by_id[snapshot_id]
    reader = spark.read
    # additive schema evolution: when the snapshot's dirs were written by
    # snapshots with DIFFERENT schemas (evolve=True appends), merge the
    # file schemas so historical files surface the newer columns as NULL.
    # The option costs extra footer reads, so it stays off for the common
    # homogeneous log.
    if _spans_writer_schemas(snaps, snap.dirs, snap.schema):
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(table_path, d) for d in snap.dirs])


def _spans_writer_schemas(snaps, dirs, fallback_schema) -> bool:
    """True when ``dirs`` were written under more than one (additively
    evolved) schema — the condition under which a multi-dir parquet read
    must mergeSchema, or an arbitrary file's schema wins and newer
    columns silently vanish."""
    writer_schema = {}
    for s in snaps:
        # compaction folds dropped entries' dir→schema mapping into the
        # survivors' writer_schemas; explicit beats positional inference
        for d, sch in (s.writer_schemas or {}).items():
            writer_schema.setdefault(d, sch)
        for d in s.dirs:
            writer_schema.setdefault(d, s.schema)
    return len({writer_schema.get(d, fallback_schema) for d in dirs}) > 1


# planner index cache: {table_path: ((log_mtime_ns, log_size), index)}.
# The index is derived read-only metadata (stats fold, per-dir file lists,
# per-dir per-column envelopes); the key changes whenever the log is
# republished (os.replace bumps mtime), so a stale hit is impossible.
# Bounds repeated planning at O(dirs + kept files) instead of re-parsing
# and re-folding the whole log per query — the manifest-list cache every
# table format keeps on the driver.
_PLAN_CACHE: dict[str, tuple[tuple[int, int], dict]] = {}


def _planner_index(table_path: str) -> dict:
    """Load-once planning metadata for the CURRENT log version:

    - ``snaps``: the parsed log (private copies — never handed out),
    - ``stats``: {file_rel: {col: [min,max,nulls,rows]}} folded newest-wins,
    - ``by_dir``: {dir_rel: sorted file_rels} from the stats keys,
    - ``env``: {dir_rel: {col: (mn, mx, live_rows, covered)}} — the dir's
      column envelope (min of file mins / max of file maxes over files
      with matchable rows; ``covered`` False when any file lacks the
      column's stats, which disables dir-level skipping for it).
    """
    p = _log_path(table_path)
    try:
        st = os.stat(p)
    except FileNotFoundError:
        raise FileNotFoundError(f"no snapshots at {table_path}") from None
    key = (st.st_mtime_ns, st.st_size)
    hit = _PLAN_CACHE.get(table_path)
    if hit is not None and hit[0] == key:
        return hit[1]
    snaps = _load_log(table_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    stats: dict = {}
    for s in snaps:
        stats.update(s.stats or {})
    by_dir: dict[str, list[str]] = {}
    for rel in stats:
        by_dir.setdefault(rel.rsplit("/", 1)[0], []).append(rel)
    env: dict[str, dict] = {}
    for d, rels in by_dir.items():
        rels.sort()
        cols = set()
        for rel in rels:
            cols.update(stats[rel])
        denv = env[d] = {}
        for c in cols:
            mn = mx = None
            live_rows = 0
            covered = True
            for rel in rels:
                cs = stats[rel].get(c)
                if cs is None:
                    covered = False
                    break
                fmn, fmx, nulls, rows = cs
                if rows == 0 or (nulls >= 0 and nulls == rows):
                    continue  # contributes no matchable rows
                live_rows += rows
                if fmn is not None and (mn is None or _stat_key(fmn) < _stat_key(mn)):
                    mn = fmn
                if fmx is not None and (mx is None or _stat_key(fmx) > _stat_key(mx)):
                    mx = fmx
            denv[c] = (mn, mx, live_rows, covered)
    idx = {"snaps": snaps, "stats": stats, "by_dir": by_dir, "env": env}
    _PLAN_CACHE[table_path] = (key, idx)
    return idx


def plan_scan(
    table_path: str,
    col: str,
    lo=None,
    hi=None,
    snapshot_id: int | None = None,
) -> tuple[list[str], int]:
    """File-level min/max pruning plan for ``lo <= col <= hi`` (either
    bound optional): the kept file list (relative paths) and the total
    file count at that snapshot. Driver-side metadata only — no job, no
    footer reads (stats come from the log; each data dir is written by
    exactly one snapshot, whose entry carries its files' stats).

    Conservative by construction: a file is skipped only when its recorded
    [min, max] provably cannot intersect the range, or when the column is
    all-null in it (a range predicate never matches NULL). Files or
    columns without stats are kept. The residual filter must still be
    applied to kept files (:func:`read_where` does)."""
    return plan_scan_multi(table_path, {col: (lo, hi)}, snapshot_id=snapshot_id)


def plan_scan_multi(
    table_path: str,
    preds: dict,
    snapshot_id: int | None = None,
) -> tuple[list[str], int]:
    """Conjunctive multi-column pruning plan: ``preds`` maps column name →
    ``(lo, hi)`` (either bound may be None, not both). A file is skipped
    when ANY predicate provably cannot match it — with a multi-dimensional
    clustering (:func:`~acoustic_feature_extractor_spark.sources.layout.zorder_layout`)
    every predicate contributes skipping, which no single-column range
    layout can offer. Same conservatism as :func:`plan_scan`: unknown
    stats keep the file.

    Planning is PURE LOG METADATA, two levels deep — Iceberg's
    manifest-list → manifest hierarchy in miniature:

    1. **dir level**: each dir's column envelope (min of file mins / max
       of file maxes, folded lazily from the log) is tested first; a dir
       whose envelope cannot intersect the predicate is skipped with its
       files COUNTED FROM THE LOG — the filesystem is never touched;
    2. **file level**: surviving dirs test per-file stats, again from the
       log.

    ``os.listdir`` runs only for a dir the log has no file entries for
    (pre-stats snapshots) — on object storage that is the difference
    between zero LIST calls per query and one per directory."""
    if not preds:
        raise ValueError("plan_scan_multi needs at least one predicate")
    for c, (lo, hi) in preds.items():
        if lo is None and hi is None:
            raise ValueError(f"predicate on {c!r} needs at least one bound")
    idx = _planner_index(table_path)
    snaps = idx["snaps"]
    if snapshot_id is None:
        target = snaps[-1]
    else:
        by_id = {s.snapshot_id: s for s in snaps}
        if snapshot_id not in by_id:
            raise KeyError(f"snapshot {snapshot_id} not in log")
        target = by_id[snapshot_id]
    stats = idx["stats"]
    keys = {
        c: (
            _stat_key(_enc_stat(lo)) if lo is not None else None,
            _stat_key(_enc_stat(hi)) if hi is not None else None,
        )
        for c, (lo, hi) in preds.items()
    }
    by_dir = idx["by_dir"]

    kept: list[str] = []
    total = 0
    for d in target.dirs:
        rels = by_dir.get(d, [])
        if not rels:
            # pre-stats dir: the one case that still needs a LIST call
            abs_d = os.path.join(table_path, d)
            rels = [
                f"{d}/{n}"
                for n in sorted(os.listdir(abs_d))
                if n.endswith(".parquet")
            ]
            for rel in rels:
                total += 1
                kept.append(rel)  # no stats: conservative keep
            continue
        total += len(rels)
        # dir-level envelope test (precomputed in the planner index): skip
        # the whole dir when any predicate misses its column envelope
        denv = idx["env"][d]
        dir_skip = False
        for c, (klo, khi) in keys.items():
            e = denv.get(c)
            if e is None or not e[3]:
                continue  # column unknown/uncovered in this dir: no skip
            env_mn, env_mx, live_rows, _ = e
            if live_rows == 0:
                dir_skip = True
                break
            if khi is not None and env_mn is not None and _stat_key(env_mn) > khi:
                dir_skip = True
                break
            if klo is not None and env_mx is not None and _stat_key(env_mx) < klo:
                dir_skip = True
                break
        if dir_skip:
            continue
        for rel in rels:
            fstats = stats.get(rel, {})
            skip = False
            for c, (klo, khi) in keys.items():
                cs = fstats.get(c)
                if cs is None:
                    continue  # unknown column: this predicate can't prune
                mn, mx, nulls, rows = cs
                if rows == 0 or (nulls >= 0 and nulls == rows):
                    skip = True  # empty or all-null: range can't match
                    break
                if khi is not None and _stat_key(mn) > khi:
                    skip = True
                    break
                if klo is not None and _stat_key(mx) < klo:
                    skip = True
                    break
            if not skip:
                kept.append(rel)
    return kept, total


def read_where(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo=None,
    hi=None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Range-predicate read with file-level data skipping: open ONLY the
    files :func:`plan_scan` keeps, then apply the residual filter (pruning
    is file-granular; kept files still carry out-of-range rows). With a
    range-clustered layout (``df.repartitionByRange(n, col)`` before
    commit) a narrow range reads a constant number of files regardless of
    table size — the Iceberg metadata-pruning property this format exists
    to reproduce. Empty keep-set returns an empty frame with the table
    schema."""
    return read_where_multi(
        spark, table_path, {col: (lo, hi)}, snapshot_id=snapshot_id
    )


def read_where_multi(
    spark: SparkSession,
    table_path: str,
    preds: dict,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Conjunctive-range read with multi-column file skipping: open only
    the :func:`plan_scan_multi` keep-set, then apply every residual
    filter. Pair with :func:`~acoustic_feature_extractor_spark.sources.layout.zorder_layout`
    so that EVERY predicate column prunes, not just the one the files were
    range-partitioned on."""
    kept, _ = plan_scan_multi(table_path, preds, snapshot_id=snapshot_id)
    if not kept:
        df = read(spark, table_path, snapshot_id).limit(0)
    else:
        # same evolve=True contract as read(): if the kept files span
        # dirs written under different (additive) schemas, merge them —
        # otherwise one file's schema wins arbitrarily and newer columns
        # are silently absent from the pruned read.
        snaps = _load_log(table_path)
        tgt = snaps[-1]
        if snapshot_id is not None:
            tgt = {s.snapshot_id: s for s in snaps}[snapshot_id]
        kept_dirs = sorted({f.rsplit("/", 1)[0] for f in kept})
        reader = spark.read
        if _spans_writer_schemas(snaps, kept_dirs, tgt.schema):
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[os.path.join(table_path, f) for f in kept])
    for col, (lo, hi) in preds.items():
        c = F.col(col)
        if lo is not None:
            df = df.where(c >= F.lit(lo))
        if hi is not None:
            df = df.where(c <= F.lit(hi))
    return df


def table_profile(table_path: str, snapshot_id: int | None = None) -> dict:
    """Table-level column profile — ``{col: [min, max, n_nulls, n_rows]}``
    — aggregated ENTIRELY from the snapshot log's per-file stats: zero
    data scan, zero footer reads, O(files) driver work. The
    warehouse-monitoring primitive (schema-drift checks, freshness/nullity
    alarms, CBO inputs) priced at metadata.

    A column appears only when EVERY live file carries its stats (a
    partial aggregate would silently lie); all-null files contribute
    nulls/rows but no bounds. Timestamp bounds come back as the log's
    order-preserving encoding (`{"ts": epoch_seconds}` dicts).

    File enumeration comes from the log via the cached planner index —
    ``os.listdir`` runs only for a pre-stats dir the log has no entries
    for, the same zero-LIST contract as :func:`plan_scan_multi`."""
    idx = _planner_index(table_path)
    snaps = idx["snaps"]
    if snapshot_id is None:
        target = snaps[-1]
    else:
        by_id = {s.snapshot_id: s for s in snaps}
        if snapshot_id not in by_id:
            raise KeyError(f"snapshot {snapshot_id} not in log")
        target = by_id[snapshot_id]
    stats = idx["stats"]
    by_dir = idx["by_dir"]
    acc: dict = {}
    n_files = 0
    for d in target.dirs:
        rels = by_dir.get(d)
        if rels is None:
            # pre-stats dir: files exist but the log never recorded them
            abs_d = os.path.join(table_path, d)
            if any(n.endswith(".parquet") for n in os.listdir(abs_d)):
                return {}  # files without stats: no trustworthy profile
            continue
        for rel in rels:
            n_files += 1
            fstats = stats[rel]
            for c, (mn, mx, nulls, rows) in fstats.items():
                a = acc.setdefault(c, [None, None, 0, 0, 0])
                a[2] += max(int(nulls), 0)
                a[3] += int(rows)
                a[4] += 1  # files covering this column
                if mn is not None and (
                    a[0] is None or _stat_key(mn) < _stat_key(a[0])
                ):
                    a[0] = mn
                if mx is not None and (
                    a[1] is None or _stat_key(mx) > _stat_key(a[1])
                ):
                    a[1] = mx
    return {
        c: [mn, mx, nulls, rows]
        for c, (mn, mx, nulls, rows, cover) in acc.items()
        if cover == n_files
    }


def rollback(table_path: str, snapshot_id: int) -> Snapshot:
    """Metadata-only rollback: append a new snapshot re-pointing at an old
    file set. History (and the rolled-back data dirs) stay intact."""
    with _writer_lock(table_path):
        snaps = _load_log(table_path)
        by_id = {s.snapshot_id: s for s in snaps}
        if snapshot_id not in by_id:
            raise KeyError(f"snapshot {snapshot_id} not in log")
        src, head = by_id[snapshot_id], snaps[-1]
        snap = Snapshot(
            snapshot_id=head.snapshot_id + 1,
            parent_id=head.snapshot_id,
            operation="rollback",
            dirs=list(src.dirs),
            rows=src.rows,
            schema=src.schema,
            wall_ts=round(time.time(), 3),
            lineage={"rolled_back_to": snapshot_id},
        )
        _publish_log(table_path, snaps + [snap])
    return snap


def _fold_dropped_metadata(snaps: list[Snapshot], kept: list[Snapshot]) -> None:
    """When log entries are dropped (:func:`expire` / :func:`compact_log`),
    the survivors must inherit (a) the per-file stats and (b) the
    dir→writer-schema mapping for every still-referenced dir — the dropped
    entries are what carried them, and losing either silently degrades
    pruned reads to listdir + keep-everything and blinds the mergeSchema
    detection to evolved dirs. Everything folds onto the OLDEST survivor
    (newest-wins order is preserved: later survivors' own stats re-apply
    identical values)."""
    live = {d for s in kept for d in s.dirs}
    folded_stats: dict = {}
    folded_ws: dict = {}
    for s in snaps:
        for d, sch in (s.writer_schemas or {}).items():
            if d in live:
                folded_ws.setdefault(d, sch)
        for d in s.dirs:
            if d in live:
                folded_ws.setdefault(d, s.schema)
        for rel, st_ in (s.stats or {}).items():
            if rel.rsplit("/", 1)[0] in live:
                folded_stats[rel] = st_
    kept[0].stats = folded_stats
    kept[0].writer_schemas = folded_ws


def compact_log(table_path: str, keep_last: int = 1) -> int:
    """METADATA-ONLY log compaction — Iceberg's snapshot expiry applied to
    the manifest list without touching a data byte: keep the last
    ``keep_last`` entries and fold the dropped entries' per-file stats and
    writer-schema mappings for still-referenced dirs into the oldest
    survivor. Bounds the log size (hence every ``_load_log`` parse and the
    planner-index build) at O(live files + keep_last) no matter how many
    commits the table has seen — without it a long-lived table's planning
    cost grows with its HISTORY, not its size. Time travel narrows to the
    kept window; data dirs are NOT deleted (:func:`expire` does that).
    Returns the number of entries dropped."""
    with _writer_lock(table_path):
        snaps = _load_log(table_path)
        if not snaps:
            return 0
        kept = snaps[-max(keep_last, 1):]
        dropped = len(snaps) - len(kept)
        if dropped == 0:
            return 0  # nothing to fold — skip the republish
        _fold_dropped_metadata(snaps, kept)
        _publish_log(table_path, kept)
    return dropped


def expire(table_path: str, keep_last: int = 1) -> list[str]:
    """Drop all but the last ``keep_last`` snapshots from the log and
    delete data dirs no surviving snapshot references (including orphan
    dirs from crashed commits). Surviving entries inherit the dropped
    entries' stats/writer-schema metadata for dirs still alive
    (:func:`_fold_dropped_metadata`). Returns the deleted dirs."""
    with _writer_lock(table_path):
        snaps = _load_log(table_path)
        if not snaps:
            return []
        kept = snaps[-max(keep_last, 1):]
        live = {d for s in kept for d in s.dirs}
        _fold_dropped_metadata(snaps, kept)
        _publish_log(table_path, kept)
        deleted = []
        data_root = os.path.join(table_path, "data")
        for name in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            rel = f"data/{name}"
            if rel not in live:
                shutil.rmtree(os.path.join(table_path, rel), ignore_errors=True)
                deleted.append(rel)
    return deleted


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str,
    key: str | list[str],
    lineage: dict | None = None,
    assert_unique_keys: bool = True,
) -> Snapshot:
    """Copy-on-write MERGE: upsert ``updates`` by key, rewriting ONLY the
    data dirs that contain a matched key (Iceberg's copy-on-write MERGE
    at directory granularity — the snapshot log tracks dirs, not files).

    Plan: one semi-join finds the hit dirs (tiny collect — dir names, not
    rows); survivors of those dirs anti-join the update keys and land in
    one new dir together with the updates; every untouched dir is carried
    by reference. A table where updates touch 1% of the dirs rewrites 1%
    of the bytes. Publishes atomically like every other commit; time
    travel to the pre-merge snapshot still works.
    """
    key_cols = [key] if isinstance(key, str) else list(key)
    with _writer_lock(table_path):
        return _merge_upsert_locked(
            spark, updates, table_path, key_cols, lineage, assert_unique_keys
        )


def _merge_upsert_locked(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str,
    key_cols: list[str],
    lineage: dict | None,
    assert_unique_keys: bool,
) -> Snapshot:
    snaps = _load_log(table_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    head = snaps[-1]
    if head.schema != updates.schema.simpleString():
        raise ValueError(
            f"merge schema mismatch: table has {head.schema}, "
            f"updates have {updates.schema.simpleString()}"
        )
    # the updates plan is consumed several times (key checks, hit-dir
    # probe, final write) — pin it so an expensive upstream (e.g. the
    # incremental feature recompute) executes once
    updates = updates.persist()
    try:
        ukeys = updates.select(*key_cols).dropDuplicates(key_cols)
        # NULL keys never match an equi-join: the old row would survive AND
        # the update would insert — a silent duplicate. Always refuse.
        null_pred = key_cols and F.lit(False)
        for k in key_cols:
            null_pred = null_pred | F.col(k).isNull()
        if assert_unique_keys:
            # FUSED validation: the NULL-key and duplicate-key checks share
            # one groupBy job (group keys surface the key columns, so the
            # null predicate evaluates on the grouped output) instead of
            # two sequential jobs per merge — merges are the inner loop of
            # every incremental-maintenance path.
            row = (
                updates.groupBy(*key_cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.max(
                        F.when(null_pred, F.lit(1)).otherwise(F.lit(0))
                    ).alias("_has_null"),
                    F.max("_c").alias("_max_c"),
                )
                .collect()[0]
            )
            if row["_has_null"]:
                raise ValueError(
                    "updates carry NULL key values — upsert cannot match them"
                )
            if (row["_max_c"] or 0) > 1:
                raise ValueError("updates carry duplicate keys — upsert is ambiguous")
        elif updates.where(null_pred).limit(1).count():
            # no uniqueness assertion: keep the short-circuiting null probe
            raise ValueError("updates carry NULL key values — upsert cannot match them")

        sid = head.snapshot_id + 1
        rel = f"data/snap-{sid}"
        # probe: which dirs hold a matched key. Column-pruned scan (keys
        # only); the dir is the file's immediate parent (anchored to the
        # filename so a table path containing "data/snap-…" never matches).
        probe = spark.read.parquet(
            *[os.path.join(table_path, d) for d in head.dirs]
        ).select(
            *key_cols,
            F.regexp_extract(
                F.input_file_name(), r"(data/snap-[^/]+)/[^/]+$", 1
            ).alias("_dir"),
        )
        hit = sorted(
            r["_dir"]
            for r in probe.join(ukeys, key_cols, "left_semi")
            .select("_dir")
            .distinct()
            .collect()
        )
        untouched = [d for d in head.dirs if d not in set(hit)]
        # rewrite leg reads ONLY the hit dirs — merge IO is O(touched), the
        # probe above reads key columns only
        if hit:
            survivors = spark.read.parquet(
                *[os.path.join(table_path, d) for d in hit]
            ).join(ukeys, key_cols, "left_anti")
            new_data = survivors.unionByName(updates)
        else:
            new_data = updates
        obs = Observation(f"snap_rows_{sid}")
        new_data.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(os.path.join(table_path, rel))
    finally:
        updates.unpersist()
    snap = Snapshot(
        snapshot_id=sid,
        parent_id=head.snapshot_id,
        operation="merge",
        dirs=[*untouched, rel],
        # rows = rows THIS snapshot wrote (commit()'s convention; total
        # table size is a read-side question, not snapshot metadata)
        rows=int(obs.get["rows"]),
        schema=head.schema,
        wall_ts=round(time.time(), 3),
        lineage={**(lineage or {}), "rewritten_dirs": hit},
        stats=_collect_file_stats(table_path, rel),
    )
    _publish_log(table_path, snaps + [snap])
    return snap


def compact(
    spark: SparkSession,
    table_path: str,
    partitions: int | None = None,
    lineage: dict | None = None,
) -> Snapshot:
    """Small-file compaction: rewrite the CURRENT snapshot's dirs into one
    dir and publish a ``compact`` snapshot (row-for-row identical —
    verified by observation — so readers see no data change, just fewer,
    right-sized files). Old dirs stay until :func:`expire`, so time travel
    across the compaction keeps working.

    Default sizing needs no shuffle: the merged-scan partitioning already
    targets ``spark.sql.files.maxPartitionBytes`` per split, so writing it
    straight back emits files of about that size. Pass ``partitions`` to
    force a specific output file count (adds one exchange).
    """
    with _writer_lock(table_path):
        return _compact_locked(spark, table_path, partitions, lineage)


def _compact_locked(
    spark: SparkSession,
    table_path: str,
    partitions: int | None,
    lineage: dict | None,
) -> Snapshot:
    snaps = _load_log(table_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    head = snaps[-1]
    if len(head.dirs) <= 1 and partitions is None:
        # one dir and no explicit file-count request: nothing to merge.
        # With partitions= the single dir may still hold many small files
        # (a wide write), so the rewrite proceeds.
        return head
    sid = head.snapshot_id + 1
    rel = f"data/snap-{sid}"
    abs_dirs = [os.path.join(table_path, d) for d in head.dirs]
    df = spark.read.parquet(*abs_dirs)
    if partitions is not None:
        df = df.repartition(partitions)
    obs = Observation(f"snap_rows_{sid}")
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode("overwrite").parquet(
        os.path.join(table_path, rel)
    )
    rows = int(obs.get["rows"])
    # footer-metadata count of the old dir set — cheap independent check
    before = spark.read.parquet(*abs_dirs).count()
    if rows != before:
        raise RuntimeError(
            f"compaction row drift: table has {before}, rewrite has {rows}"
        )
    snap = Snapshot(
        snapshot_id=sid,
        parent_id=head.snapshot_id,
        operation="compact",
        dirs=[rel],
        rows=rows,
        schema=head.schema,
        wall_ts=round(time.time(), 3),
        lineage={**(lineage or {}), "compacted_dirs": list(head.dirs)},
        stats=_collect_file_stats(table_path, rel),
    )
    _publish_log(table_path, snaps + [snap])
    return snap


def commit_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    table_path: str,
    lineage: dict | None = None,
) -> Snapshot | None:
    """Idempotent micro-batch commit for ``foreachBatch``: if the table's
    log already holds this (checkpoint-scoped) epoch, the replay is a
    no-op — Structured Streaming guarantees a replayed epoch carries the
    SAME data, so skipping it turns at-least-once batch delivery into
    exactly-once snapshots (the standard transactional-sink contract of
    ``foreachBatch``).
    """
    for s in _load_log(table_path):
        if s.lineage.get("epoch") == epoch_id:
            return None
    return commit(
        batch_df, table_path, lineage={**(lineage or {}), "epoch": epoch_id}
    )


def snapshot_sink(
    df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    query_name: str = "snapshot_sink",
    available_now: bool = True,
):
    """Stream into a snapshot table with exactly-once semantics: each
    micro-batch becomes one append snapshot (idempotent on epoch replay),
    so downstream batch readers time-travel over a consistent, versioned
    view of the stream — and a crashed stream resumes from its checkpoint
    with no duplicate or missing snapshot. Returns the started query.

    NOTE: epoch ids are scoped to ``checkpoint_dir`` — a fresh checkpoint
    restarts epoch numbering, so reuse the table only with its checkpoint.
    """

    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        commit_epoch(batch_df, epoch_id, table_path, lineage={"query": query_name})

    writer = (
        df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_changes(
    spark: SparkSession,
    table_path: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Incremental (CDC) scan: the NET row-level changes between two
    snapshots, tagged ``_change_type`` ∈ {insert, delete} — Iceberg's
    changelog-scan shape for a copy-on-write table. An updated row appears
    as its old version (delete) plus its new version (insert).

    Plan: diff the two snapshots' DIRECTORY lists first — dirs carried by
    reference between the versions are provably unchanged and are never
    read (the incremental-backfill property: IO scales with touched data,
    not table size). Rows of removed dirs and added dirs then net out via
    multiset difference (``exceptAll`` both ways), so a compaction or
    rollback-and-forward that only reshuffles bytes yields ZERO changes,
    and merge_upsert's rewritten survivors cancel against themselves.

    The shuffle carries only touched-dir rows; at 100 TB with 1%-touched
    merges this reads ~1% of the table. Empty result keeps the table
    schema plus ``_change_type``.
    """
    snaps = _load_log(table_path)
    by_id = {s.snapshot_id: s for s in snaps}
    if from_snapshot not in by_id:
        raise KeyError(f"snapshot {from_snapshot} not in log (have {sorted(by_id)})")
    to_id = to_snapshot if to_snapshot is not None else snaps[-1].snapshot_id
    if to_id not in by_id:
        raise KeyError(f"snapshot {to_id} not in log (have {sorted(by_id)})")
    dirs_from, dirs_to = set(by_id[from_snapshot].dirs), set(by_id[to_id].dirs)
    removed = sorted(dirs_from - dirs_to)
    added = sorted(dirs_to - dirs_from)

    def _rows(rels: list[str]) -> DataFrame | None:
        if not rels:
            return None
        return spark.read.parquet(*[os.path.join(table_path, d) for d in rels])

    old, new = _rows(removed), _rows(added)
    # schema anchor for the all-carried / empty-diff cases (reads no rows)
    anchor = read(spark, table_path, to_id).limit(0)
    ins = new.exceptAll(old) if (new is not None and old is not None) else new
    dels = old.exceptAll(new) if (new is not None and old is not None) else old
    parts = []
    if ins is not None:
        parts.append(ins.withColumn("_change_type", F.lit("insert")))
    if dels is not None:
        parts.append(dels.withColumn("_change_type", F.lit("delete")))
    if not parts:
        return anchor.withColumn("_change_type", F.lit(""))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
