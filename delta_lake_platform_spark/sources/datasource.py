"""Spark 4 Python DataSource for ManagedTable: ``spark.read.format(
"managed_table")`` and ``spark.readStream.format("managed_table")``.

This is the idiomatic Spark integration layer Delta ships as a JVM
connector, re-expressed through the (public) Python DataSource API
added in Spark 4 (SPARK-44076): the table becomes a first-class
``format(...)`` — usable from any Spark session with zero library
imports at the call site, composable with the whole reader/stream API.

- **Batch**: one input partition per data file (so parallelism tracks
  the file layout exactly); deletion-vector positions are grouped per
  file on the driver and each executor drops its own file's dead rows
  from the Arrow table before yielding RecordBatches — merge-on-read
  pushed into the scan itself.
- **Streaming**: an append-only log tail (Delta streaming-source
  semantics): offsets are commit versions; each micro-batch serves
  exactly the files added by APPEND/COPY INTO commits in (start, end].
  A non-append commit poisons the tail and raises, unless
  ``ignoreChanges`` is set — the same contract Delta enforces, because
  silently replaying rewritten rows would double-count.

Hive-partitioned tables are served by materializing each file's
``k=v`` path values as typed constant columns against the log schema
(which records partition columns like any other). Scope note
(documented, not silent): LEGACY partitioned tables without a schema
in the log are refused — a bare file footer cannot recover the
partition columns; use ``ManagedTable.read()`` for those. The SINK
still refuses partitioned tables (executors would need the partition
layout at write time).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .managed_table import ManagedTable


class _FilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        deleted_rows: tuple[int, ...] = (),
        partition_values: dict | None = None,
    ):
        self.file_path = file_path
        self.deleted_rows = deleted_rows
        # Hive partition columns are not stored inside the files; the
        # raw `k=v` path values ride the partition object and become
        # typed constant columns at read time.
        self.partition_values = partition_values or {}


def _partition_values_of(table: ManagedTable, fpath: str) -> dict:
    """Raw hive partition values from a file's `k=v` path segments
    (None for the default partition); typed at read time against the
    log schema. Restricted to the DECLARED partition columns: internal
    dirs also use `k=v` naming (``data/v=0``, ``data/v=0.w-abc``), and
    treating those as partition values would overwrite a real column
    named ``v`` — or crash the cast."""
    from urllib.parse import unquote

    spec = set(table.partition_spec())
    vals: dict = {}
    rel = os.path.relpath(fpath, table.path)
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            if k not in spec:
                continue
            vals[k] = (
                None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            )
    return vals


def _apply_deletion_vector(table, deleted_rows):
    """Drop DV-marked row positions with a vectorized boolean mask.

    A per-row ``i not in dead`` comprehension costs O(rows) interpreted
    Python per file read — a 1M-row file with one deleted row would pay
    ~1M iterations; the numpy mask is a single vectorized scatter +
    Arrow-side filter regardless of file size.
    """
    import numpy as np
    import pyarrow as pa

    mask = np.ones(table.num_rows, dtype=bool)
    idx = np.fromiter(deleted_rows, dtype=np.int64)
    mask[idx[idx < table.num_rows]] = False
    return table.filter(pa.array(mask))


def _read_file_batches(part: _FilePartition, schema_info=None) -> Iterator:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(part.file_path)
    if part.deleted_rows:
        table = _apply_deletion_vector(table, part.deleted_rows)
    if schema_info is not None:
        arrow_schema, logical_names = schema_info
        if table.schema != arrow_schema:
            # Metadata-only schema evolution leaves older files
            # physically narrow (or missing added columns), and hive
            # partition columns are never stored in the files at all;
            # align each file to the log's authoritative PHYSICAL
            # schema: cast present columns, materialize partition
            # values as typed constants, NULL-fill the rest.
            n = table.num_rows
            cols = []
            for field in arrow_schema:
                if field.name in table.column_names:
                    cols.append(table.column(field.name).cast(field.type))
                elif field.name in part.partition_values:
                    sval = part.partition_values[field.name]
                    if sval is None:
                        cols.append(pa.nulls(n, type=field.type))
                    else:
                        cols.append(
                            pa.array([sval] * n, type=pa.string()).cast(
                                field.type
                            )
                        )
                else:
                    cols.append(pa.nulls(n, type=field.type))
            table = pa.Table.from_arrays(cols, schema=arrow_schema)
        if list(table.column_names) != logical_names:
            table = table.rename_columns(logical_names)  # physical -> logical
    yield from table.to_batches()


def _log_arrow_schema(table: ManagedTable, version: int):
    """(physical arrow schema, logical names) from the log's recorded
    snapshot schema — files are aligned to the PHYSICAL schema (column
    mapping keeps physical names stable across renames) and the result
    is renamed to logical. None for legacy histories — files are then
    schema-homogeneous by construction and need no alignment."""
    state = table._state(version)
    logical = table._schema_of(state)
    if logical is None:
        return None
    physical = ManagedTable._physical_schema(
        logical, state.get("columnMapping")
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(physical), [f.name for f in logical.fields]


def _table_from_options(options) -> ManagedTable:
    path = options.get("path")
    if not path:
        raise ValueError("managed_table source requires a 'path' option")
    # The executor-side readers never touch the SparkSession, so a
    # driver-only handle (spark=None) is fine for log/file resolution.
    return ManagedTable(None, path)


def _snapshot_partitions(table: ManagedTable, version: int) -> list[_FilePartition]:
    dv_dir = table._state(version)["dv"]
    dv: dict[str, list[int]] = {}
    if dv_dir is not None:
        import pyarrow.parquet as pq
        from urllib.parse import urlparse

        dv_tbl = pq.read_table(dv_dir).to_pydict()
        for f, pos in zip(dv_tbl["__dv_file"], dv_tbl["__dv_pos"]):
            # Spark records positions under "file:///abs/..." URIs;
            # the local file lister produces plain paths.
            key = urlparse(f).path if ":" in f.split("/", 1)[0] else f
            dv.setdefault(key, []).append(pos)
    parts = []
    hive = bool(table.partition_spec())
    for f in table._all_data_files(version):
        parts.append(
            _FilePartition(
                f,
                tuple(dv.get(f, ())),
                _partition_values_of(table, f) if hive else None,
            )
        )
    return parts


class _SnapshotReader(DataSourceReader):
    def __init__(self, options):
        self.table = _table_from_options(options)
        v = options.get("version")
        ts = options.get("timestampasof")
        if v is not None and ts is not None:
            raise ValueError(
                "managed_table: specify version OR timestampAsOf, not both"
            )
        if ts is not None:
            # Delta's timestampAsOf: the latest commit at or before the
            # ISO timestamp (commit timestamps are monotone by the
            # in-commit-timestamps rule, so this is well-defined).
            from .managed_table import iso_to_epoch_utc

            cutoff = iso_to_epoch_utc(ts)
            at_or_before = [
                h["version"]
                for h in self.table.history()
                if h["timestamp"] <= cutoff
            ]
            if not at_or_before:
                raise ValueError(
                    f"timestampAsOf {ts!r} precedes the table's first commit"
                )
            v = max(at_or_before)
        self.version = int(v) if v is not None else self.table.latest_version()
        self.arrow_schema = _log_arrow_schema(self.table, self.version)

    def partitions(self):
        return _snapshot_partitions(self.table, self.version)

    def read(self, partition: _FilePartition):
        return _read_file_batches(partition, self.arrow_schema)


class _CDCPartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        change_type: str | None,
        version: int,
        ts: float,
        partition_values: dict | None = None,
        deleted_rows: tuple[int, ...] = (),
        rename: dict | None = None,
    ):
        self.file_path = file_path
        # 'insert' / 'delete': a data file served whole as that change
        # type (add actions of appends; remove/add actions of full
        # rewrites). None: a recorded cdc file that already carries its
        # own _change_type column.
        self.change_type = change_type
        self.version = version
        self.ts = ts
        self.partition_values = partition_values or {}
        # DV positions of the SOURCE snapshot: rows already dead before
        # the commit must not be re-reported.
        self.deleted_rows = deleted_rows
        # cdc files carry the LOGICAL names as of their commit; when a
        # RENAME sits between the commit and the read's end version,
        # this maps old-logical -> end-logical (via stable physical
        # names). None/{} when no drift.
        self.rename = rename or {}


class _CDCReaderCore:
    """Shared partition-planning / file-reading core of the CDF batch
    and stream readers (Delta's ``readChangeFeed`` option).

    Scale contract: every partition is ONE parquet file — a recorded
    cdc file (O(changed rows), written by DML under
    ``enableChangeDataFeed``) or an append's add file. No executor
    ever re-scans rewritten data files, and the driver never runs a
    diff job: commits without recorded change data RAISE, exactly
    Delta's "change data was not recorded" contract (the richer
    driver-side fallback lives in ``table_changes_per_commit``)."""

    def __init__(self, table: ManagedTable, pinned_version: int):
        self.table = table
        self._pinned = pinned_version
        state = table._state(pinned_version)
        logical = table._schema_of(state)
        if logical is None:
            raise ValueError(
                "readChangeFeed needs a schema-in-log table (legacy "
                "histories: use ManagedTable.table_changes_per_commit)"
            )
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import to_arrow_schema

        self.logical_names = [f.name for f in logical.fields]
        full = T.StructType(
            list(logical.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
                T.StructField("_commit_timestamp", T.TimestampType()),
            ]
        )
        self.spark_schema = full
        self.arrow_schema = to_arrow_schema(full)
        # Add-action files carry PHYSICAL column names (column mapping
        # keeps them stable across renames); cdc files carry LOGICAL.
        self.physical_names = [
            f.name
            for f in ManagedTable._physical_schema(
                logical, state.get("columnMapping")
            ).fields
        ]

    def version_partitions(self, v: int) -> list[_CDCPartition]:
        entry = self.table._entry(v)
        if entry is None:
            raise RuntimeError(
                f"readChangeFeed: version {v} has no log entry (expired)"
            )
        ts = float(entry.get("timestamp", 0.0))
        op = entry.get("operation", "")
        if entry.get("cdcPath"):
            d = self.table._abs(entry["cdcPath"])
            if not os.path.isdir(d):
                raise RuntimeError(
                    f"readChangeFeed: change data of version {v} was "
                    "vacuumed"
                )
            import glob as _glob

            v_schema = self.table._schema_of(self.table._state(v))
            ren = self.table._logical_rename_map(
                v_schema.fieldNames() if v_schema is not None else [],
                v,
                self._pinned,
            )
            return [
                _CDCPartition(f, None, v, ts, rename=ren)
                for f in sorted(
                    _glob.glob(os.path.join(d, "**", "*.parquet"),
                               recursive=True)
                )
            ]
        if v == 0 or (
            op in ManagedTable._CDC_APPEND_OPS
            and entry.get("logMode") == "delta"
        ):
            # Incremental entries only: a slow/merge-schema append
            # re-lands the whole snapshot — that shape is served by the
            # full-rewrite branch below... except an append's old rows
            # are NOT deletes, so it falls through to the raise.
            prev = (
                set(self.table._all_data_files(v - 1)) if v > 0 else set()
            )
            hive = bool(self.table.partition_spec())
            return [
                _CDCPartition(
                    f,
                    "insert",
                    v,
                    ts,
                    _partition_values_of(self.table, f) if hive else None,
                )
                for f in self.table._all_data_files(v)
                if f not in prev
            ]
        if op in ManagedTable._CDC_NOCHANGE_OPS or (
            entry.get("logMode") == "delta"
            and not entry.get("add")
            and not entry.get("remove")
            and "deletionVector" not in entry
        ):
            return []
        if op in ManagedTable._CDC_REPLACE_OPS and v > 0:
            # Remove/add-action serving for full-snapshot rewrites
            # (Delta's rule): every pre-image row (minus rows a DV had
            # already killed) is a delete, every new row an insert.
            return [
                _CDCPartition(
                    p.file_path, "delete", v, ts,
                    p.partition_values, p.deleted_rows,
                )
                for p in _snapshot_partitions(self.table, v - 1)
            ] + [
                _CDCPartition(
                    p.file_path, "insert", v, ts,
                    p.partition_values, p.deleted_rows,
                )
                for p in _snapshot_partitions(self.table, v)
            ]
        raise RuntimeError(
            f"readChangeFeed: version {v} ({op!r}) recorded no change "
            "data — set enableChangeDataFeed before DML, or read "
            "through table_changes_per_commit"
        )

    def read_partition(self, part: _CDCPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(part.file_path)
        if part.deleted_rows:
            tbl = _apply_deletion_vector(tbl, part.deleted_rows)
        n = tbl.num_rows
        # Data files store physical names: rename to logical so the
        # alignment below finds them. cdc files are logical-named AS OF
        # their commit — part.rename carries the old->end logical map
        # when a RENAME sits inside the read window.
        if (
            part.change_type is not None
            and self.physical_names != self.logical_names
        ):
            ren = dict(zip(self.physical_names, self.logical_names))
            tbl = tbl.rename_columns(
                [ren.get(c, c) for c in tbl.column_names]
            )
        elif part.change_type is None and part.rename:
            tbl = tbl.rename_columns(
                [part.rename.get(c, c) for c in tbl.column_names]
            )
        cols = []
        for field in self.arrow_schema:
            if field.name == "_change_type":
                if part.change_type is not None:
                    cols.append(
                        pa.array(
                            [part.change_type] * n, type=pa.string()
                        ).cast(field.type)
                    )
                else:
                    cols.append(
                        tbl.column("_change_type").cast(field.type)
                    )
            elif field.name == "_commit_version":
                cols.append(
                    pa.array([part.version] * n, type=pa.int64()).cast(
                        field.type
                    )
                )
            elif field.name == "_commit_timestamp":
                cols.append(
                    pa.array(
                        [int(part.ts * 1_000_000)] * n,
                        type=pa.timestamp("us", tz="UTC"),
                    ).cast(field.type)
                )
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            elif field.name in part.partition_values:
                sval = part.partition_values[field.name]
                if sval is None:
                    cols.append(pa.nulls(n, type=field.type))
                else:
                    cols.append(
                        pa.array([sval] * n, type=pa.string()).cast(
                            field.type
                        )
                    )
            else:
                # Column added after this commit: end-schema NULL fill.
                cols.append(pa.nulls(n, type=field.type))
        yield from pa.Table.from_arrays(
            cols, schema=self.arrow_schema
        ).to_batches()


class _CDCSnapshotReader(DataSourceReader):
    """Batch CDF read (Delta's ``spark.read ... .option("readChangeFeed",
    "true").option("startingVersion", v)``): every change between
    startingVersion and endingVersion (default head), one file per
    partition."""

    def __init__(self, options):
        from .managed_table import iso_to_epoch_utc

        self.table = _table_from_options(options)
        sv = options.get("startingversion")
        st = options.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError(
                "readChangeFeed: specify startingVersion OR "
                "startingTimestamp, not both"
            )
        if sv is None and st is None:
            raise ValueError(
                "readChangeFeed batch read requires startingVersion "
                "or startingTimestamp"
            )
        hist = self.table.history()
        if st is not None:
            # Delta's CDF rule: earliest commit at or after the stamp.
            cut = iso_to_epoch_utc(st)
            vs = [h["version"] for h in hist if h["timestamp"] >= cut]
            if not vs:
                raise ValueError(
                    f"readChangeFeed: no commit at or after {st!r}"
                )
            self.v0 = min(vs)
        else:
            self.v0 = int(sv)
        ev = options.get("endingversion")
        et = options.get("endingtimestamp")
        if ev is not None and et is not None:
            raise ValueError(
                "readChangeFeed: specify endingVersion OR "
                "endingTimestamp, not both"
            )
        head = self.table.latest_version()
        if et is not None:
            # Latest commit at or before the stamp, both inclusive.
            cut = iso_to_epoch_utc(et)
            vs = [h["version"] for h in hist if h["timestamp"] <= cut]
            if not vs:
                raise ValueError(
                    f"readChangeFeed: no commit at or before {et!r}"
                )
            self.v1 = max(vs)
        else:
            self.v1 = int(ev) if ev is not None else head
        # Delta's CDF batch read raises on inverted or out-of-range
        # windows (endBeforeStartVersionInCDC / version-out-of-range)
        # rather than silently returning zero rows — a silent empty
        # result masks caller typos in startingVersion.
        if self.v0 > head + 1:
            raise ValueError(
                f"readChangeFeed: startingVersion ({self.v0}) is beyond "
                f"the table head ({head})"
            )
        if self.v0 > self.v1:
            raise ValueError(
                f"readChangeFeed: endingVersion ({self.v1}) must not be "
                f"less than startingVersion ({self.v0})"
            )
        self.core = _CDCReaderCore(self.table, self.v1)

    def partitions(self):
        return [
            p
            for v in range(self.v0, self.v1 + 1)
            for p in self.core.version_partitions(v)
        ]

    def read(self, partition: _CDCPartition):
        return self.core.read_partition(partition)


class _CDCTailReader(DataSourceStreamReader):
    """Streaming CDF tail (Delta's ``readStream ... .option(
    "readChangeFeed", "true")``): offsets are commit versions; each
    micro-batch serves the change rows of the commits in (start, end].
    Default start is the log head (a CDC consumer wants NEW changes);
    ``startingVersion`` rewinds — 0 serves the initial snapshot as
    inserts first, like Delta."""

    def __init__(self, options):
        self.table = _table_from_options(options)
        if options.get("startingtimestamp") is not None:
            raise ValueError(
                "readChangeFeed: use startingVersion (timestamps are "
                "supported on the batch table_changes forms)"
            )
        self.starting_version = options.get("startingversion")
        # Bounded catch-up (Delta's maxFilesPerTrigger analogue at
        # version granularity): a consumer resuming far behind the head
        # drains in batches of at most N commits instead of one giant
        # task wave. The Python API gives latestOffset no start, so the
        # reader carries its own planner position.
        mvt = options.get("maxversionspertrigger")
        self.max_versions = max(1, int(mvt)) if mvt is not None else None
        self._planned: int | None = None
        # Same Python-API limitation (and same contract) as the file
        # tail: the engine may ask latestOffset before initialOffset
        # ever runs, so an unknown-position stream's first batch is an
        # uncapped catch-up. assumeFresh=true promises there is no
        # prior checkpoint, letting the cap engage from batch one.
        if str(options.get("assumefresh", "false")).lower() in ("true", "1"):
            sv = options.get("startingversion")
            if sv is not None and str(sv).lower() != "latest":
                self._planned = int(sv) - 1
        head = self.table.latest_version()
        self.core = _CDCReaderCore(self.table, head)
        self._pinned_schema_json = json.dumps(
            self.table._state(head).get("schema"), sort_keys=True
        )

    def initialOffset(self):
        if self.starting_version is None or (
            str(self.starting_version).lower() == "latest"
        ):
            return {"version": self.table.latest_version()}
        sv = int(self.starting_version)
        head = self.table.latest_version()
        if sv > head + 1:
            raise ValueError(
                f"startingVersion {sv} exceeds the table's latest "
                f"version {head}"
            )
        off = {"version": sv - 1}
        self._planned = off["version"]
        return off

    def latestOffset(self):
        head = self.table.latest_version()
        if self.max_versions is None or self._planned is None:
            self._planned = head
            return {"version": head}
        nxt = min(self._planned + self.max_versions, head)
        self._planned = nxt
        return {"version": nxt}

    def partitions(self, start, end):
        s, e = start["version"], end["version"]
        # Keep the planner position honest across checkpoint restarts
        # (Spark replans from its own offsets; ours must not lag).
        if self._planned is None or self._planned < e:
            self._planned = e
        cur = json.dumps(
            self.table._state(e).get("schema"), sort_keys=True
        )
        if cur != self._pinned_schema_json:
            raise RuntimeError(
                "readChangeFeed: table schema changed since the stream "
                "started — restart the stream to pick up the new schema"
            )
        return [
            p
            for v in range(s + 1, e + 1)
            for p in self.core.version_partitions(v)
        ]

    def read(self, partition: _CDCPartition):
        return self.core.read_partition(partition)

    def commit(self, end):
        pass


class _TailReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table = _table_from_options(options)
        self.ignore_changes = str(
            options.get("ignorechanges", "false")
        ).lower() in ("true", "1")
        # Delta's maxFilesPerTrigger: admission control for backfills.
        # Without it, the first micro-batch of a stream over a 100 TB
        # table is the WHOLE snapshot in one batch — one giant task
        # wave, one giant state update, no incremental checkpointing.
        # With it, latestOffset walks forward at most N files per
        # trigger; offsets gain a within-unit file index so even the
        # initial snapshot is served in chunks.
        #
        # The Python DataSource API gives latestOffset() no start
        # offset (the JVM SupportsAdmissionControl API does), so the
        # planner position must be carried by the reader itself. With
        # a ``streamId`` option the position persists in a tiny
        # ``_streams/<id>.json`` sidecar next to the table — capping is
        # then deterministic from the very first batch and across
        # restarts. Without it the position is in-memory only: the
        # first trigger of a (re)started stream is an uncapped
        # catch-up, and the cap engages from the second trigger on.
        mft = options.get("maxfilespertrigger")
        self.max_files = max(1, int(mft)) if mft is not None else None
        # Delta's maxBytesPerTrigger: a SOFT byte cap — each trigger
        # serves at least one file, then stops once the budget is
        # spent. Composable with maxFilesPerTrigger (whichever budget
        # exhausts first ends the batch).
        mbt = options.get("maxbytespertrigger")
        self.max_bytes = max(1, int(mbt)) if mbt is not None else None
        self._capped = self.max_files is not None or self.max_bytes is not None
        self.stream_id = options.get("streamid")
        self._last_planned = None  # most recent offset handed to Spark
        self._unit_cache: dict = {}  # (v, v_snap) -> [_FilePartition]
        # Delta's startingVersion: where a FRESH stream begins.
        # Default: the current snapshot, then the tail. "latest": skip
        # the snapshot, serve only commits after stream start (a CDC
        # consumer that only wants new data). An integer v: serve the
        # appends of versions >= v (no snapshot) — resuming a pipeline
        # at a known log position.
        self.starting_version = options.get("startingversion")
        # Delta's startingTimestamp: begin at the earliest commit AT or
        # AFTER the given ISO timestamp (mutually exclusive with
        # startingVersion, like Delta). A timestamp before the first
        # commit starts from version 0; one past the head raises.
        self.starting_timestamp = options.get("startingtimestamp")
        if (
            self.starting_version is not None
            and self.starting_timestamp is not None
        ):
            raise ValueError(
                "managed_table tail: specify startingVersion OR "
                "startingTimestamp, not both"
            )
        # assumeFresh=true: the caller PROMISES this stream has no
        # prior checkpoint, so a missing position sidecar means
        # "genuinely fresh" and the cap applies from the very first
        # batch (the engine asks latestOffset before initialOffset has
        # ever run, so without this promise the first batch of an
        # unknown-position stream must be an uncapped catch-up — the
        # alternative, guessing "fresh", would replay everything a
        # checkpointed restart already served). Combining assumeFresh
        # with an EXISTING checkpoint is user error and duplicates.
        self.assume_fresh = str(
            options.get("assumefresh", "false")
        ).lower() in ("true", "1")
        # Schema fixed at stream start (Delta restarts streams on
        # schema change); files are aligned to it per batch.
        self._pinned_version = (
            self.table.latest_version() if self.table.exists() else None
        )
        self.arrow_schema = (
            _log_arrow_schema(self.table, self._pinned_version)
            if self._pinned_version is not None
            else None
        )
        self._pinned_schema_json = (
            json.dumps(
                self.table._state(self._pinned_version).get("schema"),
                sort_keys=True,
            )
            if self._pinned_version is not None
            else None
        )

    def _check_schema_unchanged(self, version: int) -> None:
        """Delta fails a stream explicitly when the source schema
        changes so the user restarts it with the new schema; without
        this, post-widening batches would be cast DOWN to the
        stream-start schema — silent narrowing, or a deep executor
        Arrow cast error on overflow."""
        if self._pinned_schema_json is None:
            return
        cur = json.dumps(
            self.table._state(version).get("schema"), sort_keys=True
        )
        if cur != self._pinned_schema_json:
            raise RuntimeError(
                "managed_table tail: table schema changed since the "
                "stream started — restart the stream to pick up the "
                "new schema"
            )

    def _initial_off(self) -> dict:
        """The stream's starting offset. Default: -1 (first batch =
        current snapshot, then the tail). startingVersion overrides;
        offsets mean "fully served through version v", so starting AT
        version v is offset v-1."""
        if self.starting_timestamp is not None:
            from .managed_table import iso_to_epoch_utc

            cutoff = iso_to_epoch_utc(self.starting_timestamp)
            at_or_after = [
                h["version"]
                for h in self.table.history()
                if h["timestamp"] >= cutoff
            ]
            if not at_or_after:
                raise ValueError(
                    f"startingTimestamp {self.starting_timestamp!r} is "
                    "after the table's latest commit — a stream cannot "
                    "begin past the head"
                )
            # Offsets mean "fully served through v": beginning AT
            # version v is offset v-1; v=0 degrades to snapshot-start.
            sv = min(at_or_after)
            return {"version": sv - 1} if sv > 0 else {"version": -1}
        if self.starting_version is None:
            return {"version": -1}
        if str(self.starting_version).lower() == "latest":
            return {
                "version": (
                    self.table.latest_version() if self.table.exists() else -1
                )
            }
        sv = int(self.starting_version)
        head = self.table.latest_version() if self.table.exists() else -1
        if sv > head + 1:
            raise ValueError(
                f"startingVersion {sv} exceeds the table's latest "
                f"version {head} — a stream cannot begin past the head"
            )
        off = {"version": max(0, sv) - 1}
        if off["version"] < 0:
            off = {"version": -1}  # from 0 == snapshot semantics
        return off

    def initialOffset(self):
        # Only called for streams WITHOUT a checkpoint; persisting the
        # position seeds the streamId sidecar (note the engine may ask
        # latestOffset FIRST, so a capped fresh backfill additionally
        # needs assumeFresh for its very first batch to be capped).
        off = self._initial_off()
        self._last_planned = off
        if self.stream_id and self._capped:
            self._save_pos(off)
        return off

    # -- rate-limited offset walking ------------------------------------
    #
    # Offsets are {"version": v} (legacy: everything through v fully
    # served) or {"version": v, "idx": i, "snap": v_snap} (rate-limited:
    # units through v-1 fully served plus the first i files of unit v).
    # Unit v_snap is the pinned initial snapshot's file list; every unit
    # v > v_snap is the files version v appended. The snapshot version
    # rides INSIDE the offset so checkpoint restarts replay the exact
    # same chunking.

    def _unit_files(self, v: int, v_snap: int) -> list[_FilePartition]:
        # Memoized per (v, v_snap): the log is immutable, and a capped
        # backfill calls this once per TRIGGER from latestOffset and
        # again from partitions — without the cache a K-file snapshot
        # served m files at a time costs O(K^2/m) driver work
        # (rebuilding all K partitions, re-reading the DV sidecar,
        # re-parsing partition values every trigger).
        cached = self._unit_cache.get((v, v_snap))
        if cached is not None:
            return cached
        out = self._unit_files_uncached(v, v_snap)
        self._unit_cache[(v, v_snap)] = out
        return out

    def _unit_files_uncached(
        self, v: int, v_snap: int
    ) -> list[_FilePartition]:
        if v == v_snap:
            return _snapshot_partitions(self.table, v)
        prev = set(self.table._all_data_files(v - 1))
        entry = self.table._entry(v) or {}
        op = entry.get("operation", "")
        appended = [
            f for f in self.table._all_data_files(v) if f not in prev
        ]
        if op not in ("APPEND", "COPY INTO"):
            if not self.ignore_changes:
                raise RuntimeError(
                    f"managed_table tail: version {v} is {op!r}, not an "
                    "append — rewritten/deleted rows cannot be streamed "
                    "exactly-once (set ignoreChanges to skip such commits)"
                )
            return []
        hive = bool(self.table.partition_spec())
        return [
            _FilePartition(
                f,
                partition_values=(
                    _partition_values_of(self.table, f) if hive else None
                ),
            )
            for f in appended
        ]

    def _pos_path(self) -> str:
        return os.path.join(
            self.table.path, "_streams", f"{self.stream_id}.json"
        )

    def _load_pos(self):
        try:
            with open(self._pos_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _save_pos(self, off: dict) -> None:
        import uuid as _uuid

        try:
            d = os.path.dirname(self._pos_path())
            os.makedirs(d, exist_ok=True)
            tmp = self._pos_path() + f".tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(off, f)
            os.replace(tmp, self._pos_path())
        except OSError:
            # Read-only table storage: degrade to in-memory position
            # (the cap then behaves as without streamId). Exactly-once
            # is unaffected — Spark's offset log owns it.
            pass

    def latestOffset(self):
        head = self.table.latest_version()
        self._check_schema_unchanged(head)
        if not self._capped:
            return {"version": head}
        last = self._last_planned
        if last is None and self.stream_id:
            last = self._load_pos()
        if last is None and self.assume_fresh:
            # The caller promised there is no prior checkpoint: start
            # from the declared beginning, capped from batch one.
            last = self._initial_off()
        if last is None:
            # No in-memory position and no sidecar. This could be a
            # fresh stream (the engine asks latestOffset before
            # initialOffset has seeded anything) OR a restart whose
            # checkpointed position is unknown here. Assuming "fresh"
            # would re-pin the snapshot and REPLAY everything a
            # checkpointed restart already served — an exactly-once
            # violation — so the safe move is one uncapped catch-up to
            # the head; the cap engages from the next trigger. Pass
            # assumeFresh=true to cap a genuinely fresh backfill's
            # first batch.
            off = {"version": head}
            self._last_planned = off
            return off
        if last["version"] < 0:
            # Nothing served yet: pin the snapshot unit at the head.
            cur_v, cur_i, v_snap = head, 0, head
        else:
            cur_v, cur_i = last["version"], last.get("idx")
            v_snap = last.get("snap", last["version"])
            if cur_i is None:  # legacy offset: unit fully served
                cur_v, cur_i = cur_v + 1, 0
        if cur_v > head:
            # Fully caught up (and the last unit was version-complete):
            # repeat the previous offset verbatim so Spark sees no
            # progress and plans no batch.
            return dict(last)
        fbudget = self.max_files
        bbudget = self.max_bytes
        took = 0
        exhausted = False
        while not exhausted and cur_v <= head:
            unit = self._unit_files(cur_v, v_snap)
            n = len(unit)
            while cur_i < n:
                if fbudget is not None and fbudget <= 0:
                    exhausted = True
                    break
                sz = 0
                if bbudget is not None:
                    try:
                        sz = os.path.getsize(unit[cur_i].file_path)
                    except OSError:
                        sz = 0
                if fbudget is not None:
                    fbudget -= 1
                if bbudget is not None:
                    bbudget -= sz
                cur_i += 1
                took += 1
                # Soft max (Delta's admission rule): a file is admitted
                # whenever bytes-so-far are still under the budget, so
                # the CROSSING file lands in this batch rather than
                # being deferred; stop once the cumulative size has
                # reached/exceeded the cap.
                if bbudget is not None and bbudget <= 0:
                    exhausted = True
                    break
            if exhausted:
                break
            if cur_i >= n and cur_v < head:
                cur_v, cur_i = cur_v + 1, 0
            elif cur_i >= n:
                break
        off = {"version": cur_v, "idx": cur_i, "snap": v_snap}
        self._last_planned = off
        if self.stream_id:
            self._save_pos(off)
        return off

    def partitions(self, start, end):
        s, e = start["version"], end["version"]
        self._check_schema_unchanged(e)
        self._last_planned = dict(end)
        if "idx" not in start and "idx" not in end:
            # Legacy (uncapped) protocol — the original one-unit-per-
            # version walk, snapshot served whole.
            if s < 0:
                return _snapshot_partitions(self.table, e)
            seen = set(self.table._all_data_files(s))
            parts: list[_FilePartition] = []
            for v in range(s + 1, e + 1):
                entry = self.table._entry(v) or {}
                op = entry.get("operation", "")
                appended = [
                    f
                    for f in self.table._all_data_files(v)
                    if f not in seen
                ]
                if op not in ("APPEND", "COPY INTO"):
                    if not self.ignore_changes:
                        raise RuntimeError(
                            f"managed_table tail: version {v} is {op!r}, "
                            "not an append — rewritten/deleted rows cannot "
                            "be streamed exactly-once (set ignoreChanges "
                            "to skip such commits)"
                        )
                    seen.update(appended)
                    continue
                hive = bool(self.table.partition_spec())
                parts.extend(
                    _FilePartition(
                        f,
                        partition_values=(
                            _partition_values_of(self.table, f)
                            if hive
                            else None
                        ),
                    )
                    for f in appended
                )
                seen.update(appended)
            return parts
        v_snap = end.get("snap", start.get("snap"))
        e_idx = end.get("idx")
        if s < 0:
            s_v, s_i = v_snap, 0
        elif "idx" in start:
            s_v, s_i = s, start["idx"]
        else:
            s_v, s_i = s + 1, 0
        if v_snap is None:
            v_snap = s_v  # defensive: treat the first unit as snapshot
        parts: list[_FilePartition] = []
        v = s_v
        while v <= e:
            files = self._unit_files(v, v_snap)
            lo = s_i if v == s_v else 0
            hi = e_idx if (v == e and e_idx is not None) else len(files)
            parts.extend(files[lo:hi])
            v += 1
        # Fully-served units will never be asked for again: bound the
        # memo so a long-running stream's cache stays O(in-flight).
        for key in [k for k in self._unit_cache if k[0] < e]:
            del self._unit_cache[key]
        return parts

    def read(self, partition: _FilePartition):
        return _read_file_batches(partition, self.arrow_schema)

    def commit(self, end):
        pass


class _WriteMessage(WriterCommitMessage):
    def __init__(self, file_path: str | None, n_rows: int):
        self.file_path = file_path
        self.n_rows = n_rows


class _BatchWriter(DataSourceWriter):
    """``df.write.format("managed_table")``: the Delta write protocol in
    miniature — executors write their partition's parquet file into a
    staging dir (no coordination), the driver's ``commit`` atomically
    renames staging into the next version and writes the log entry
    (O_EXCL; a concurrent-commit loser re-renames and retries), and
    ``abort`` removes staging so failed jobs leave no trace. Append
    commits are incremental (``dataPaths`` manifest); overwrite commits
    own the full snapshot."""

    def __init__(self, options, schema, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("managed_table sink requires a 'path' option")
        self.schema = schema
        self.overwrite = overwrite
        self.staging = os.path.join(
            self.path, "_staging", uuid.uuid4().hex
        )
        # Snapshot anchor at write-plan time (the transaction's read
        # version): commit() checks every later commit under the
        # blind-append commute rule, so an OVERWRITE or schema change
        # landing during the write job fails the append instead of
        # being silently built on.
        t = ManagedTable(None, self.path)
        self.read_version = t.latest_version() if t.exists() else None
        # Identity columns allocate from a driver-coordinated high-water
        # mark; executor-side sink writes cannot do that. Fail at plan
        # time with the right pointer instead of a cryptic schema error
        # (foreachBatch -> table.append() is the streaming path that
        # DOES mint keys, with txn idempotence).
        if t.exists() and t.identity_columns():
            raise ValueError(
                "managed_table sink cannot write to a table with "
                "GENERATED ALWAYS AS IDENTITY columns; use "
                "foreachBatch with ManagedTable.append (txn_app/"
                "txn_version for exactly-once) instead"
            )
        # Row-tracked tables work through this sink: commit() runs on
        # the DRIVER, so it assigns __rowIdBase spans from the
        # high-water mark there (per attempt, against the attempt's
        # predecessor) and engages the row-id commute rule — exactly
        # what ManagedTable's own incremental commit does.
        # Generated columns are enforced as implicit CHECK constraints
        # inside ManagedTable.append; the sink's executor-side write
        # path never runs that job, so it must refuse these tables the
        # same way it refuses explicitly constrained ones (commit()).
        if t.exists() and t.generated_columns():
            raise ValueError(
                "managed_table sink bypasses generated-column "
                "validation; use foreachBatch with ManagedTable.append "
                "on tables with GENERATED ALWAYS AS (expr) columns"
            )
        # Column-mapped tables: executors must write PHYSICAL column
        # names (stable across renames). Captured at plan time; a
        # mapping change after this point is a schema commit, which the
        # commute rules turn into an explicit abort.
        self.physical_names = None
        if self.read_version is not None and not overwrite:
            mapping = t._state(self.read_version).get("columnMapping")
            if ManagedTable._mapping_nontrivial(mapping):
                self.physical_names = [
                    mapping.get(f.name, f.name) for f in schema.fields
                ]
        # Hive-partitioned tables: executors split their rows by the
        # partition values (captured at plan time) and write one file
        # per k=v dir — partition columns live in the PATH, not the
        # file, exactly like ManagedTable's own partitionBy writes.
        # Restricted to value types whose str() round-trips through
        # hive path encoding unambiguously.
        self.partition_spec = t.partition_spec() if t.exists() else []
        if self.partition_spec:
            by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
            for c in self.partition_spec:
                if c not in by_name:
                    raise ValueError(
                        f"managed_table sink: partition column {c!r} "
                        "missing from the batch schema"
                    )
                if by_name[c] not in (
                    "tinyint", "smallint", "int", "bigint", "string", "date"
                ):
                    raise ValueError(
                        "managed_table sink: partition columns must be "
                        f"int/string/date, got {c}: {by_name[c]}"
                    )

    @staticmethod
    def _hive_val(v) -> str:
        import datetime
        import re as _re

        if v is None:
            return "__HIVE_DEFAULT_PARTITION__"
        s = v.isoformat() if isinstance(v, datetime.date) else str(v)
        if not _re.fullmatch(r"[A-Za-z0-9_.\-]+", s):
            raise ValueError(
                f"managed_table sink: partition value {s!r} needs hive "
                "path escaping, which this sink does not implement"
            )
        return s

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import uuid

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        rows = list(iterator)
        if not rows:
            return _WriteMessage(None, 0)
        names = [f.name for f in self.schema.fields]
        if self.partition_spec:
            idx = {n: i for i, n in enumerate(names)}
            groups: dict[tuple, list] = {}
            for r in rows:
                key = tuple(r[idx[c]] for c in self.partition_spec)
                groups.setdefault(key, []).append(r)
            data_fields = [
                f
                for f in self.schema.fields
                if f.name not in self.partition_spec
            ]
            arrow_schema = to_arrow_schema(StructType(data_fields))
            for key, grp in groups.items():
                subdir = os.path.join(
                    self.staging,
                    *[
                        f"{c}={self._hive_val(v)}"
                        for c, v in zip(self.partition_spec, key)
                    ],
                )
                os.makedirs(subdir, exist_ok=True)
                cols = {
                    f.name: [r[idx[f.name]] for r in grp]
                    for f in data_fields
                }
                pq.write_table(
                    pa.Table.from_pydict(cols, schema=arrow_schema),
                    os.path.join(
                        subdir, f"part-{uuid.uuid4().hex}.parquet"
                    ),
                )
            return _WriteMessage(None, len(rows))
        cols = {n: [r[i] for r in rows] for i, n in enumerate(names)}
        table = pa.Table.from_pydict(cols, schema=to_arrow_schema(self.schema))
        if self.physical_names is not None:
            table = table.rename_columns(self.physical_names)
        os.makedirs(self.staging, exist_ok=True)
        fpath = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, fpath)
        return _WriteMessage(fpath, len(rows))

    def commit(self, messages):
        import time as _time

        from .managed_table import (
            ConcurrentWriteError,
            _scan_parquet_footers,
        )

        table = ManagedTable(None, self.path)
        if table.constraints():
            raise ValueError(
                "managed_table sink bypasses Spark-side CHECK validation; "
                "use ManagedTable.append() on constrained tables"
            )
        if table.exists() and not self.overwrite:
            # The executors wrote this batch against self.schema; a
            # table whose log schema no longer matches must reject the
            # append (the micro-batch is stale), not absorb it.
            logical = table._schema_of(table._state(table.latest_version()))
            if logical is not None:
                want = [(f.name, f.dataType) for f in logical.fields]
                got = [(f.name, f.dataType) for f in self.schema.fields]
                if want != got:
                    import shutil

                    shutil.rmtree(self.staging, ignore_errors=True)
                    raise ValueError(
                        "managed_table sink: batch schema does not match "
                        f"the table schema (table {want}, batch {got}); "
                        "restart the writer against the current schema"
                    )
        os.makedirs(self.staging, exist_ok=True)  # all-empty partitions
        n_rows = sum(m.n_rows for m in messages if m is not None)
        attempt_from = (
            self.read_version + 1
            if (self.read_version is not None and not self.overwrite)
            else None
        )
        for _attempt in range(ManagedTable._APPEND_RETRIES + 1):
            version = (table.latest_version() + 1) if table.exists() else 0
            if version > 0:
                # Same protocol gate the library's own commits apply —
                # the sink writes entries directly and must not bypass.
                table._check_writer(version - 1)
            rt = table.exists() and table.row_tracking_enabled()
            if attempt_from is not None and version - 1 >= attempt_from:
                # Same blind-append rule as ManagedTable appends: a
                # micro-batch losing the race to a full-snapshot
                # OVERWRITE or a schema change must NOT be silently
                # appended on top of the redefined table. On a
                # row-tracked table, a concurrent id allocation is a
                # real conflict too (overlapping spans).
                commutes = table._append_commutes_with
                if rt:
                    commutes = table._row_id_append_commutes(commutes)
                if not commutes(attempt_from, version - 1):
                    import shutil

                    shutil.rmtree(self.staging, ignore_errors=True)
                    raise ConcurrentWriteError(
                        "managed_table sink: a non-append commit landed "
                        "while this batch was committing; the append does "
                        "not commute with it"
                    )
            final = table._local_data_dir(version)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            try:
                os.rename(self.staging, final)
            except OSError:
                # Target taken by a concurrent writer: retry at next v.
                continue
            _n, stats = _scan_parquet_footers(final, rel_root=self.path)
            rid_hwm = None
            if rt:
                # Fresh rows: positional spans from the mark, computed
                # against THIS attempt's predecessor (a retry re-runs
                # this, so a raced-in allocator's mark is respected).
                stats, rid_hwm = table._fill_row_bases(stats, version - 1)
            if self.overwrite or version == 0:
                entry = {
                    "version": version,
                    "timestamp": _time.time(),
                    "operation": "CREATE OR OVERWRITE",
                    "operationMetrics": {"numOutputRows": n_rows},
                    "fileStats": stats,
                    # Snapshot schema (the batch's logical schema):
                    # keeps partitioned snapshots readable through the
                    # DataSource, which refuses schema-less ones.
                    "schema": self.schema.jsonValue(),
                    **(
                        {"rowIdHighWaterMark": rid_hwm}
                        if rid_hwm is not None
                        else {}
                    ),
                }
            else:
                prev = table._entry(version - 1) or {}
                prev_rows = (prev.get("operationMetrics") or {}).get(
                    "numOutputRows"
                )
                # Delta-action entry: only this batch's files + stats
                # (O(batch) metadata); prior files and the DV pointer
                # carry through log replay.
                entry = {
                    "version": version,
                    "timestamp": _time.time(),
                    "operation": "APPEND",
                    "operationMetrics": {
                        "numAppendedRows": n_rows,
                        "numOutputRows": (
                            prev_rows + n_rows
                            if isinstance(prev_rows, int)
                            else None
                        ),
                    },
                    "logMode": "delta",
                    "add": stats,
                    "remove": [],
                    "addPaths": [final],
                    **(
                        {"rowIdHighWaterMark": rid_hwm}
                        if rid_hwm is not None
                        else {}
                    ),
                }
            try:
                table._write_entry(version, entry)
                return
            except ConcurrentWriteError:
                os.rename(final, self.staging)
                table._state_cache.clear()  # see the interloper's state
                if attempt_from is None:
                    attempt_from = version
        raise ConcurrentWriteError(
            f"managed_table sink: gave up after "
            f"{ManagedTable._APPEND_RETRIES + 1} commit attempts on "
            f"{self.path}"
        )

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class ManagedTableDataSource(DataSource):
    @classmethod
    def name(cls):
        return "managed_table"

    @staticmethod
    def _cdf_requested(options) -> bool:
        return str(options.get("readchangefeed", "false")).lower() in (
            "true",
            "1",
        )

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow.parquet as pq

        table = _table_from_options(self.options)
        v = self.options.get("version")
        version = int(v) if v is not None else table.latest_version()
        if self._cdf_requested(self.options):
            return _CDCReaderCore(table, version).spark_schema
        # The log is the schema authority (metadata-only ADD COLUMN /
        # type widening make mixed physical file schemas a normal
        # state — the first file's footer may be stale and narrow).
        # Hive-partitioned tables are served through it too: the
        # recorded schema INCLUDES partition columns (the committed
        # DataFrame carried them), and the readers materialize each
        # file's `k=v` path values as typed constant columns.
        logical = table._schema_of(table._state(version))
        if logical is not None:
            return logical
        if table.partition_spec():
            raise ValueError(
                "managed_table source cannot serve a LEGACY "
                "hive-partitioned table (no schema in its log — a bare "
                "file footer loses the partition columns); use "
                "ManagedTable.read()"
            )
        files = table._all_data_files(version)
        if files:
            return from_arrow_schema(pq.read_schema(files[0]))
        raise ValueError(f"no data files in {table.path}")

    def reader(self, schema):
        if self._cdf_requested(self.options):
            return _CDCSnapshotReader(self.options)
        return _SnapshotReader(self.options)

    def streamReader(self, schema):
        if self._cdf_requested(self.options):
            return _CDCTailReader(self.options)
        return _TailReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _BatchWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Register the format with a session:
    ``datasource.register(spark)`` then
    ``spark.read.format("managed_table").option("path", p).load()``."""
    spark.dataSource.register(ManagedTableDataSource)
