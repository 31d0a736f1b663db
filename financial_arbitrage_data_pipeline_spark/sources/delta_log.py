"""Delta Lake transaction-log bridge — the OPEN lakehouse commit format.

The reference persists its durable ticket/fill state through a
hand-rolled Postgres upsert sink (`/root/reference/database/postgres/
writer.py:351-407`). Our engine's durable sink is the bucketed
parquet MERGE table (`operators/upsert.py`) with its own manifest
commit log. This module bridges that table into the PUBLIC Delta Lake
transaction-log format so the state becomes readable by ANY Delta
client — delta-spark, delta-rs, Trino, DuckDB's delta extension —
with no dependency on this engine.

Everything here is implemented from the openly published protocol
specification (delta.io, PROTOCOL.md: "Delta Transaction Log
Protocol") — no Delta library is imported:

- ``_delta_log/{version:020d}.json`` — one commit per file, one JSON
  action per line. Actions used: ``protocol`` (minReaderVersion=1,
  minWriterVersion=2 — the base feature set: nothing here needs
  deletion vectors / column mapping / generated columns), ``metaData``
  (``schemaString`` is the Spark StructType JSON — Delta's schema
  serialization IS Spark's), ``add`` (relative URL-encoded path,
  ``partitionValues``, ``size``, ``modificationTime``, ``dataChange``,
  ``stats`` JSON with ``numRecords``), ``remove`` (tombstone with
  ``deletionTimestamp``), ``commitInfo`` (informational).
- ``{version:020d}.checkpoint.parquet`` every ``checkpoint_interval``
  commits + ``_last_checkpoint`` ``{"version": V, "size": N}`` — the
  replay shortcut: a reader starts from the newest checkpoint at or
  below its target version and replays only the JSON tail, so log
  replay cost is O(interval), not O(commits since table creation).
- State reconstruction follows the protocol's reconciliation rule:
  latest ``metaData``/``protocol`` win; an ``add`` for a path
  supersedes earlier actions for that path; a ``remove`` tombstones it.

Scale notes (100 TB):
- The log carries FILE METADATA only — export cost is proportional to
  files touched, never to table bytes. ``add.stats`` gives any Delta
  reader per-file ``numRecords`` (and min/max would slot in the same
  field) for data skipping.
- ``export_delta_log`` derives each version's add/remove delta from the
  merge table's own undo-log, so a commit that touched 3 of 100k
  buckets emits 3 removes + 3 adds.
- Readers never list data directories: the active file set comes
  entirely from log replay (the protocol's core scalability property —
  object-store LIST is eventually consistent and slow; the log is the
  source of truth).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

DELTA_LOG_DIR = "_delta_log"
LAST_CHECKPOINT = "_last_checkpoint"
CHECKPOINT_INTERVAL = 10
# Marks a _delta_log as DERIVED by export_delta_log (vs a table some
# real Delta writer owns). The merge engine deletes a stale derived log
# on the next merge (re-export rebuilds it) but refuses to touch data
# files under a log it did not derive.
EXPORT_SENTINEL = ".spark_graft_export"
PROTOCOL_ACTION = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
# Checkpoints must carry unexpired remove tombstones (PROTOCOL.md
# "Checkpoints": reconciliation keeps removes until the retention window
# lapses) — otherwise files tombstoned before a checkpoint become
# invisible to VACUUM/FSCK once pre-checkpoint JSON commits are deleted.
# Mirrors delta.deletedFileRetentionDuration's 1-week default.
TOMBSTONE_RETENTION_MS = 7 * 24 * 3600 * 1000

# Checkpoint rows are the union-struct encoding of the log actions
# (PROTOCOL.md "Checkpoints": one action per row, null-padded columns).
_CHECKPOINT_SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {
            "name": "txn",
            "type": {
                "type": "struct",
                "fields": [
                    {"name": "appId", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "version", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "lastUpdated", "type": "long", "nullable": True, "metadata": {}},
                ],
            },
            "nullable": True,
            "metadata": {},
        },
        {
            "name": "add",
            "type": {
                "type": "struct",
                "fields": [
                    {"name": "path", "type": "string", "nullable": True, "metadata": {}},
                    {
                        "name": "partitionValues",
                        "type": {"type": "map", "keyType": "string", "valueType": "string", "valueContainsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                    {"name": "size", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "modificationTime", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "dataChange", "type": "boolean", "nullable": True, "metadata": {}},
                    {"name": "stats", "type": "string", "nullable": True, "metadata": {}},
                    {
                        "name": "tags",
                        "type": {"type": "map", "keyType": "string", "valueType": "string", "valueContainsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                    {
                        "name": "deletionVector",
                        "type": {
                            "type": "struct",
                            "fields": [
                                {"name": "storageType", "type": "string", "nullable": True, "metadata": {}},
                                {"name": "pathOrInlineDv", "type": "string", "nullable": True, "metadata": {}},
                                {"name": "offset", "type": "long", "nullable": True, "metadata": {}},
                                {"name": "sizeInBytes", "type": "long", "nullable": True, "metadata": {}},
                                {"name": "cardinality", "type": "long", "nullable": True, "metadata": {}},
                            ],
                        },
                        "nullable": True,
                        "metadata": {},
                    },
                ],
            },
            "nullable": True,
            "metadata": {},
        },
        {
            "name": "remove",
            "type": {
                "type": "struct",
                "fields": [
                    {"name": "path", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "deletionTimestamp", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "dataChange", "type": "boolean", "nullable": True, "metadata": {}},
                ],
            },
            "nullable": True,
            "metadata": {},
        },
        {
            "name": "metaData",
            "type": {
                "type": "struct",
                "fields": [
                    {"name": "id", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "name", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "description", "type": "string", "nullable": True, "metadata": {}},
                    {
                        "name": "format",
                        "type": {
                            "type": "struct",
                            "fields": [
                                {"name": "provider", "type": "string", "nullable": True, "metadata": {}},
                                {
                                    "name": "options",
                                    "type": {"type": "map", "keyType": "string", "valueType": "string", "valueContainsNull": True},
                                    "nullable": True,
                                    "metadata": {},
                                },
                            ],
                        },
                        "nullable": True,
                        "metadata": {},
                    },
                    {"name": "schemaString", "type": "string", "nullable": True, "metadata": {}},
                    {
                        "name": "partitionColumns",
                        "type": {"type": "array", "elementType": "string", "containsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                    {
                        "name": "configuration",
                        "type": {"type": "map", "keyType": "string", "valueType": "string", "valueContainsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                    {"name": "createdTime", "type": "long", "nullable": True, "metadata": {}},
                ],
            },
            "nullable": True,
            "metadata": {},
        },
        {
            "name": "protocol",
            "type": {
                "type": "struct",
                "fields": [
                    {"name": "minReaderVersion", "type": "integer", "nullable": True, "metadata": {}},
                    {"name": "minWriterVersion", "type": "integer", "nullable": True, "metadata": {}},
                    {
                        "name": "readerFeatures",
                        "type": {"type": "array", "elementType": "string", "containsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                    {
                        "name": "writerFeatures",
                        "type": {"type": "array", "elementType": "string", "containsNull": True},
                        "nullable": True,
                        "metadata": {},
                    },
                ],
            },
            "nullable": True,
            "metadata": {},
        },
    ],
}


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, DELTA_LOG_DIR)


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.json")


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:020d}.checkpoint.parquet")


def _encode_path(rel_path: str) -> str:
    """Relative URL-encoded path, the protocol's add/remove path form
    (Hadoop/object-store readers resolve it with URI decoding)."""
    return urllib.parse.quote(rel_path.replace(os.sep, "/"), safe="/")


def _decode_path(encoded: str) -> str:
    return urllib.parse.unquote(encoded)


def _now_ms() -> int:
    return int(time.time() * 1000)


def _parquet_num_records(path: str) -> int:
    """numRecords from the parquet footer — metadata-only, no data read.

    At 100 TB the writer stamps stats at write time from the in-flight
    row count; the footer path here is the after-the-fact equivalent
    for files the merge engine already produced."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _list_parquet(dir_path: str) -> list[str]:
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _parquet_col_stats(path: str) -> tuple[dict, dict, dict]:
    """Per-column (minValues, maxValues, nullCount) from the parquet
    footer — metadata-only, no data read. Only top-level primitive
    columns whose statistics decode to JSON-representable scalars are
    stamped; everything else is simply absent (readers must treat a
    missing stat as 'unknown', per PROTOCOL.md data-skipping rules)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    # A stat is stamped only if EVERY row group contributes to it —
    # a partial min/max (or nullCount) over a subset of row groups is
    # worse than none: stats-based pruning would skip files whose
    # matching rows live in the uncovered row groups (lost updates in
    # _candidate_merge_paths, mis-skips in third-party readers). Track
    # min/max and nullCount completeness independently: a column can
    # lose its min/max (e.g. non-UTF-8 binary) while its nullCount
    # stays exact.
    dropped_mm: set[str] = set()
    dropped_null: set[str] = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested leaves: no top-level stat
            st = col.statistics
            if name not in dropped_null:
                if st is None or st.null_count is None:
                    dropped_null.add(name)
                    nulls.pop(name, None)
                else:
                    nulls[name] = nulls.get(name, 0) + st.null_count
            if name in dropped_mm:
                continue
            if st is None or not st.has_min_max:
                dropped_mm.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    dropped_mm.add(name)
                    mins.pop(name, None)
                    maxs.pop(name, None)
                    continue
            if not isinstance(mn, (bool, int, float, str)):
                dropped_mm.add(name)  # timestamps/decimals: skip, stay honest
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return mins, maxs, nulls


def _add_action(
    table_dir: str,
    abs_path: str,
    *,
    partition_values: dict[str, str] | None = None,
    stats: bool = True,
) -> dict:
    rel = os.path.relpath(abs_path, table_dir)
    st = os.stat(abs_path)
    add = {
        "path": _encode_path(rel),
        "partitionValues": dict(partition_values or {}),
        "size": st.st_size,
        "modificationTime": int(st.st_mtime * 1000),
        "dataChange": True,
    }
    if stats:
        mins, maxs, nulls = _parquet_col_stats(abs_path)
        body: dict = {"numRecords": _parquet_num_records(abs_path)}
        if mins:
            body["minValues"] = mins
            body["maxValues"] = maxs
        if nulls:
            body["nullCount"] = nulls
        add["stats"] = json.dumps(body)
    return {"add": add}


def _dv_remove_body(
    encoded_path: str, ts: int, old_add: dict, data_change: bool
) -> dict:
    """Remove-action body that carries the superseded add's
    deletionVector descriptor when it had one — the protocol's shape,
    and what VACUUM needs to reclaim unreferenced DV files."""
    body = {
        "path": encoded_path,
        "deletionTimestamp": ts,
        "dataChange": data_change,
    }
    if old_add.get("deletionVector"):
        body["deletionVector"] = old_add["deletionVector"]
    return body


def _remove_action(encoded_path: str) -> dict:
    return {
        "remove": {
            "path": encoded_path,
            "deletionTimestamp": _now_ms(),
            "dataChange": True,
        }
    }


def _metadata_action(
    table_dir: str,
    schema: StructType,
    *,
    name: str | None,
    partition_columns: list[str] | None = None,
) -> dict:
    # Deterministic table id: exports of the same table agree across runs.
    table_id = str(uuid.uuid5(uuid.NAMESPACE_URL, "spark-graft-delta:" + os.path.abspath(table_dir)))
    return {
        "metaData": {
            "id": table_id,
            "name": name,
            "description": None,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": list(partition_columns or []),
            "configuration": {},
            "createdTime": _now_ms(),
        }
    }


class DeltaCommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency): re-read the log and retry on top of the new head."""


def _write_commit(table_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    tmp = _commit_path(table_dir, version) + f".tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    # put-if-absent, the protocol's commit atomicity rule: os.rename
    # REPLACES silently, so two writers racing to version N would lose a
    # commit — link() fails loudly on an existing target instead
    try:
        os.link(tmp, _commit_path(table_dir, version))
    except FileExistsError:
        raise DeltaCommitConflict(
            f"version {version} of {table_dir} was committed concurrently"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def delta_versions(table_dir: str) -> list[int]:
    """Committed versions present as JSON commits, ascending."""
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    )


# ---------------------------------------------------------------------------
# State replay (reader side)
# ---------------------------------------------------------------------------


class _LogState:
    """Reconstructed snapshot: active files + latest metaData/protocol."""

    def __init__(self) -> None:
        self.files: dict[str, dict] = {}  # encoded path -> add action body
        # encoded path -> remove action body: tombstones the protocol
        # keeps through checkpoints until the retention window lapses,
        # so VACUUM still sees pre-checkpoint removes after the JSON
        # commits carrying them are deleted (ADVICE r10)
        self.tombstones: dict[str, dict] = {}
        self.metadata: dict | None = None
        self.protocol: dict | None = None
        # appId -> highest committed writer version (the protocol's
        # idempotent-writer mechanism: a streaming sink records
        # (appId=queryId, version=batchId) and skips batches at or
        # below the recorded version on restart/redelivery)
        self.txns: dict[str, int] = {}

    def apply(self, action: dict) -> None:
        if "add" in action:
            self.files[action["add"]["path"]] = action["add"]
            # an add supersedes an earlier remove for the same path
            self.tombstones.pop(action["add"]["path"], None)
        elif "remove" in action:
            self.files.pop(action["remove"]["path"], None)
            self.tombstones[action["remove"]["path"]] = action["remove"]
        elif "metaData" in action:
            self.metadata = action["metaData"]
        elif "protocol" in action:
            self.protocol = action["protocol"]
        elif "txn" in action:
            t = action["txn"]
            prev = self.txns.get(t["appId"])
            if prev is None or t["version"] > prev:
                self.txns[t["appId"]] = t["version"]
        # commitInfo: informational, no state effect


def _read_commit_actions(table_dir: str, version: int) -> list[dict]:
    with open(_commit_path(table_dir, version), encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _latest_checkpoint_at_or_below(table_dir: str, version: int) -> int | None:
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return None
    cps = [
        int(f.split(".", 1)[0])
        for f in os.listdir(d)
        if f.endswith(".checkpoint.parquet")
    ]
    cps = [v for v in cps if v <= version]
    return max(cps) if cps else None


def _state_from_checkpoint(spark: SparkSession, table_dir: str, cp_version: int) -> _LogState:
    """Driver-side pyarrow read — a checkpoint is a small metadata file
    and loading it must not cost a Spark job (measured: the fixed
    job-submission overhead exceeded parsing ~10k JSON commits,
    inverting the checkpoint's entire purpose; BENCH_delta_replay.json
    carries the before/after)."""
    import pyarrow.parquet as pq

    table = pq.read_table(_checkpoint_path(table_dir, cp_version))

    map_fields = {"partitionValues", "tags", "options", "configuration"}

    def norm(body: dict) -> dict:
        out = {}
        for k, v in body.items():
            if v is None:
                continue
            if k in map_fields and isinstance(v, list):
                out[k] = dict(v)  # arrow maps arrive as (key, value) pairs
            elif isinstance(v, dict):
                out[k] = norm(v)
            else:
                out[k] = v
        return out

    def struct_rows(name: str):
        """Row dicts of one action column via COLUMNAR field access —
        `to_pylist()` on the nested struct column converts every null
        sub-field of every row and measures ~8x slower on a 10k-file
        checkpoint (it erased the checkpoint's win over full JSON
        replay; BENCH_delta_replay.json carries the curve)."""
        import pyarrow as pa

        if name not in table.column_names:
            return
        col = table.column(name).combine_chunks()
        valid = col.is_valid().to_pylist()
        if not any(valid):
            return
        names = [f.name for f in col.type]
        field_lists = []
        for f in names:
            arr = col.field(f)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_map(arr.type) and len(arr.keys) == 0:
                # every map in the column is empty/null (the common case
                # for partitionValues/tags): one offsets probe replaces
                # 10k per-row conversions
                field_lists.append(None)
            else:
                field_lists.append(arr.to_pylist())
        for i, ok in enumerate(valid):
            if ok:
                body = {
                    k: vals[i]
                    for k, vals in zip(names, field_lists)
                    if vals is not None and vals[i] is not None
                }
                for k, vals in zip(names, field_lists):
                    if vals is None:
                        body[k] = {}
                yield body

    state = _LogState()
    for key in ("protocol", "metaData", "txn", "add", "remove"):
        for body in struct_rows(key):
            state.apply({key: norm(body)})
    return state


def replay_state(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> _LogState:
    """Protocol-rule replay to `version` (default: latest). Starts from
    the newest checkpoint at or below the target when one exists, so
    pre-checkpoint JSON commits may be absent (vacuumed) — the property
    checkpoints exist to provide."""
    versions = delta_versions(table_dir)
    cp = None if version is None else _latest_checkpoint_at_or_below(table_dir, version)
    if version is None:
        if versions:
            version = versions[-1]
        else:
            cp_all = _latest_checkpoint_at_or_below(table_dir, 1 << 62)
            if cp_all is None:
                raise FileNotFoundError(f"no Delta log at {table_dir}")
            version = cp_all
        cp = _latest_checkpoint_at_or_below(table_dir, version)
    state = _LogState()
    start = 0
    if cp is not None:
        state = _state_from_checkpoint(spark, table_dir, cp)
        start = cp + 1
    for v in range(start, version + 1):
        if not os.path.exists(_commit_path(table_dir, v)):
            raise FileNotFoundError(
                f"missing Delta commit {v} for {table_dir} (no covering checkpoint)"
            )
        for action in _read_commit_actions(table_dir, v):
            state.apply(action)
    if state.metadata is None or state.protocol is None:
        raise ValueError(f"Delta log at {table_dir} lacks metaData/protocol by v{version}")
    _check_reader_protocol(state.protocol, table_dir)
    return state


# Reader features this engine implements beyond protocol v1. Anything
# else (columnMapping, v2Checkpoint, timestampNtz, typeWidening, ...)
# stays a LOUD refusal: reading past an unimplemented reader feature
# returns wrong rows silently, the one failure mode the bridge bans.
SUPPORTED_READER_FEATURES = {"deletionVectors"}


def _check_reader_protocol(protocol: dict, table_dir: str) -> None:
    mrv = protocol["minReaderVersion"]
    if mrv <= 1:
        return
    if mrv == 3:
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = feats - SUPPORTED_READER_FEATURES
        if not unsupported:
            return
        raise ValueError(
            f"table at {table_dir} requires unsupported reader features "
            f"{sorted(unsupported)} (supported: "
            f"{sorted(SUPPORTED_READER_FEATURES)})"
        )
    # v2 == columnMapping without the feature vocabulary — unsupported
    raise ValueError(f"table requires reader version {mrv}")


def stats_keep_file(add: dict, stats_filter: dict[str, tuple]) -> bool:
    """Data-skipping decision for one add action: False only when the
    file's logged [minValues, maxValues] range PROVABLY excludes every
    bound in `stats_filter` ({col: (lo, hi)}, either end None for
    one-sided). A column with no stamped stat is UNKNOWN → the file must
    be read (the _parquet_col_stats contract: stats are complete over
    every row group or absent entirely, never partial). Comparison
    errors (caller bound of a different type than the logged scalar)
    also degrade to keep — skipping must never be able to lose rows."""
    try:
        stats = json.loads(add.get("stats") or "{}")
    except (TypeError, ValueError):
        return True
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    for col, (lo, hi) in stats_filter.items():
        if col not in mins or col not in maxs:
            continue  # unknown: must read
        try:
            if hi is not None and mins[col] > hi:
                return False
            if lo is not None and maxs[col] < lo:
                return False
        except TypeError:
            continue  # incomparable bound: must read
    return True


def read_delta_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    partition_filter: dict[str, list[str]] | None = None,
    stats_filter: dict[str, tuple] | None = None,
) -> DataFrame:
    """DataFrame over the Delta table at `version` via pure log replay —
    no directory listing. The metaData schemaString is imposed on the
    scan, so files written before a schema widening surface the later
    columns as nulls (the protocol's evolution semantics).

    `partition_filter` ({col: allowed values}) prunes files by the
    log's partitionValues BEFORE any parquet footer is opened — the
    metadata-only pruning that makes a selective read of a 100 TB
    partitioned table cost O(matching partition), not O(table). For a
    partitioned table the partition columns are reattached from the
    log metadata (the data files do not contain them, per protocol).

    `stats_filter` ({col: (lo, hi)}, either end None) is Delta's second
    metadata-only pruning tier — DATA SKIPPING by the per-file
    minValues/maxValues the writer stamps from parquet footers: files
    whose logged range provably misses [lo, hi] are never opened, and
    the surviving scan gets the equivalent row-level BETWEEN filter so
    the result is exactly the rows satisfying every bound (NULLs
    excluded, as in SQL range predicates). On an unclustered table the
    ranges are wide and nothing skips; cluster by the filter columns
    (repartitionByRange at write, or OPTIMIZE ... zorder_by for two
    dimensions) to make the ranges tight. Returns only the matching
    rows; the pruning itself is observable via `stats_selected_files`."""
    state = replay_state(spark, table_dir, version)
    schema = StructType.fromJson(json.loads(state.metadata["schemaString"]))
    pcols = state.metadata.get("partitionColumns") or []
    if partition_filter:
        unknown = set(partition_filter) - set(pcols)
        if unknown:
            raise ValueError(f"partition_filter on non-partition columns: {unknown}")
    if stats_filter:
        known = {f.name for f in schema.fields}
        unknown = set(stats_filter) - known
        if unknown:
            raise ValueError(f"stats_filter on unknown columns: {unknown}")

    def keep(add: dict) -> bool:
        if not partition_filter:
            return True
        pv = add.get("partitionValues", {})
        return all(pv.get(c) in set(vals) for c, vals in partition_filter.items())

    selected = {p: a for p, a in state.files.items() if keep(a)}
    if stats_filter:
        selected = {
            p: a for p, a in selected.items() if stats_keep_file(a, stats_filter)
        }
    dv_selected = {p: a for p, a in selected.items() if a.get("deletionVector")}
    plain = {p: a for p, a in selected.items() if p not in dv_selected}
    df = _read_fileset(spark, table_dir, schema, pcols, plain)
    if dv_selected:
        df = df.unionByName(
            _read_fileset_with_dvs(spark, table_dir, schema, pcols, dv_selected)
        )
    if stats_filter:
        for col, (lo, hi) in stats_filter.items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
    return df


def stats_selected_files(
    spark: SparkSession,
    table_dir: str,
    stats_filter: dict[str, tuple],
    version: int | None = None,
) -> tuple[int, int]:
    """(files the stats_filter keeps, total active files) — the
    observable data-skipping rate, for tests and the bridge queries'
    self-enforcement (a 'skipping' read that opens every file should
    fail loudly, not silently degrade to a full scan)."""
    state = replay_state(spark, table_dir, version)
    kept = sum(1 for a in state.files.values() if stats_keep_file(a, stats_filter))
    return kept, len(state.files)


def _read_fileset(
    spark: SparkSession,
    table_dir: str,
    schema: StructType,
    pcols: list[str],
    selected: dict[str, dict],
    with_meta: bool = False,
) -> DataFrame:
    """DataFrame over an explicit {encoded path: add body} subset with
    the log schema imposed — the shared scan of the full reader and the
    merge's candidate-files read. `with_meta` appends the scan's
    (__dv_file, __dv_row) = (scheme-stripped _metadata.file_path,
    _metadata.row_index) — the physical row coordinates deletion
    vectors are keyed by."""
    meta_cols = (
        [
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_row"),
        ]
        if with_meta
        else []
    )
    if not selected:
        out_schema = StructType(list(schema.fields))
        if with_meta:
            out_schema = out_schema.add("__dv_file", "string").add(
                "__dv_row", "long"
            )
        return spark.createDataFrame([], out_schema)
    if not pcols:
        paths = [os.path.join(table_dir, _decode_path(p)) for p in sorted(selected)]
        # explicit field select drops any partition-style tokens a path
        # component (e.g. `__bucket__=3`) would otherwise surface as columns
        return (
            spark.read.schema(schema)
            .option("basePath", table_dir)
            .parquet(*paths)
            .select(*[F.col(f.name) for f in schema.fields], *meta_cols)
        )
    # partitioned: group files by partitionValues tuple, read each group
    # with the DATA schema, reattach partition columns as typed literals
    data_schema = StructType([f for f in schema.fields if f.name not in pcols])
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in pcols}
    groups: dict[tuple, list[str]] = {}
    for p, a in selected.items():
        key = tuple(a["partitionValues"][c] for c in pcols)
        groups.setdefault(key, []).append(
            os.path.join(table_dir, _decode_path(p))
        )
    parts: list[DataFrame] = []
    for key in sorted(groups):
        df = spark.read.schema(data_schema).parquet(*sorted(groups[key]))
        df = df.select(*[F.col(f.name) for f in data_schema.fields], *meta_cols)
        for c, v in zip(pcols, key):
            df = df.withColumn(c, F.lit(v).cast(ptypes[c]))
        parts.append(
            df.select(
                *[F.col(f.name) for f in schema.fields],
                *(["__dv_file", "__dv_row"] if with_meta else []),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


# Deleted-set join strategy bound: total DV cardinality at or below this
# broadcasts the deleted-rows side (16 B/row keyed struct — ~32 MB at
# the bound); above it the anti-join is pinned SHUFFLE_HASH so a
# terabyte-scale deleted set can never be built driver/broadcast-side
# (the same doc-scale-broadcast ban as SCALE.md §39).
DV_BROADCAST_MAX_DELETED = 2_000_000


def _deleted_rows_df(
    spark: SparkSession, table_dir: str, dv_selected: dict[str, dict]
) -> DataFrame:
    """(__dv_file, __dv_row) rows of every deleted row in `dv_selected`.
    The driver handles only DESCRIPTORS (O(#files)); bitmap decode runs
    on executors, one task per DV, so deleted row indexes never pass
    through the driver — at 100 TB a table can carry thousands of DVs
    with millions of rows each and this stays a parallel scan."""
    desc_rows = [
        (
            os.path.abspath(
                os.path.join(table_dir, _decode_path(p))
            ).replace(os.sep, "/"),
            json.dumps(a["deletionVector"]),
        )
        for p, a in sorted(dv_selected.items())
    ]
    desc_df = spark.createDataFrame(
        desc_rows, "__dv_file string, dv_json string"
    ).repartition(min(len(desc_rows), 32))
    abs_table_dir = os.path.abspath(table_dir)

    def decode(batches):
        import pandas as pd

        from financial_arbitrage_data_pipeline_spark.sources.deletion_vectors import (
            dv_row_indexes,
        )

        for pdf in batches:
            for fp, dvj in zip(pdf["__dv_file"], pdf["dv_json"]):
                idx = dv_row_indexes(abs_table_dir, json.loads(dvj))
                yield pd.DataFrame({"__dv_file": fp, "__dv_row": idx})

    return desc_df.mapInPandas(decode, "__dv_file string, __dv_row long")


def _read_fileset_with_dvs(
    spark: SparkSession,
    table_dir: str,
    schema: StructType,
    pcols: list[str],
    dv_selected: dict[str, dict],
) -> DataFrame:
    """Scan of DV-carrying files with each file's deleted row positions
    anti-joined away — the merge-on-read half of a Delta read. Join
    strategy is decided from LOG METADATA (the descriptors' summed
    cardinality), not a Catalyst estimate, so a huge deleted set can
    never be auto-broadcast."""
    scan = _read_fileset(spark, table_dir, schema, pcols, dv_selected, with_meta=True)
    deleted = _deleted_rows_df(spark, table_dir, dv_selected)
    total_card = sum(
        a["deletionVector"].get("cardinality", 0) for a in dv_selected.values()
    )
    if total_card <= DV_BROADCAST_MAX_DELETED:
        deleted = F.broadcast(deleted)
    else:
        deleted = deleted.hint("shuffle_hash")
    out = scan.join(deleted, ["__dv_file", "__dv_row"], "left_anti")
    return out.select(*[F.col(f.name) for f in schema.fields])


# ---------------------------------------------------------------------------
# Checkpoint writer
# ---------------------------------------------------------------------------


def _write_checkpoint(spark: SparkSession, table_dir: str, version: int, state: _LogState) -> None:
    schema = StructType.fromJson(_CHECKPOINT_SCHEMA_JSON)
    rows: list[tuple] = [
        (
            None,
            None,
            None,
            None,
            (
                state.protocol["minReaderVersion"],
                state.protocol["minWriterVersion"],
                state.protocol.get("readerFeatures"),
                state.protocol.get("writerFeatures"),
            ),
        ),
        (
            None,
            None,
            None,
            (
                state.metadata["id"],
                state.metadata.get("name"),
                state.metadata.get("description"),
                (state.metadata["format"]["provider"], state.metadata["format"].get("options", {})),
                state.metadata["schemaString"],
                state.metadata.get("partitionColumns", []),
                state.metadata.get("configuration", {}),
                state.metadata.get("createdTime"),
            ),
            None,
        ),
    ]
    for app_id in sorted(state.txns):
        rows.append(((app_id, state.txns[app_id], None), None, None, None, None))
    # unexpired tombstones survive into the checkpoint (the protocol's
    # reconciliation rule): a remove older than the retention horizon
    # was already VACUUM-eligible and may be dropped; everything newer
    # must remain visible to VACUUM after pre-checkpoint JSON deletion
    horizon = _now_ms() - TOMBSTONE_RETENTION_MS
    for path in sorted(state.tombstones):
        r = state.tombstones[path]
        if r.get("deletionTimestamp", 0) >= horizon:
            rows.append(
                (
                    None,
                    None,
                    (r["path"], r.get("deletionTimestamp"), r.get("dataChange", True)),
                    None,
                    None,
                )
            )
    for path in sorted(state.files):
        a = state.files[path]
        dv = a.get("deletionVector")
        rows.append(
            (
                None,
                (
                    a["path"],
                    a.get("partitionValues", {}),
                    a.get("size"),
                    a.get("modificationTime"),
                    a.get("dataChange", True),
                    a.get("stats"),
                    a.get("tags"),
                    (
                        dv["storageType"],
                        dv["pathOrInlineDv"],
                        dv.get("offset"),
                        dv["sizeInBytes"],
                        dv["cardinality"],
                    )
                    if dv
                    else None,
                ),
                None,
                None,
                None,
            )
        )
    df = spark.createDataFrame(rows, schema).coalesce(1)
    tmp = _checkpoint_path(table_dir, version) + ".__tmp__"
    df.write.mode("overwrite").parquet(tmp)
    part = _list_parquet(tmp)[0]
    os.replace(part, _checkpoint_path(table_dir, version))
    shutil.rmtree(tmp, ignore_errors=True)
    with open(os.path.join(_log_dir(table_dir), LAST_CHECKPOINT), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)


def _maybe_checkpoint(
    spark: SparkSession, table_dir: str, version: int, interval: int
) -> None:
    if interval and version > 0 and version % interval == 0:
        _write_checkpoint(spark, table_dir, version, replay_state(spark, table_dir, version))


# ---------------------------------------------------------------------------
# Native write path: create / append commits
# ---------------------------------------------------------------------------


def _materialize_files(
    spark_df: DataFrame,
    table_dir: str,
    version: int,
    partition_cols: list[str] | None = None,
    token: str | None = None,
) -> list[tuple[str, dict[str, str]]]:
    """Write the batch as parquet files with version-scoped names and
    return (abs_path, partitionValues) pairs. Partitioned writes use
    the Hive-style `<col>=<value>/` layout real Delta writers emit;
    partition column VALUES live only in the path + the log's
    partitionValues map — the data files do not contain the columns
    (the protocol's storage rule).

    `token` makes file (and stage-dir) names unique per WRITE ATTEMPT,
    the way real Delta writers embed a GUID: two optimistic writers
    racing toward the same version then stage disjoint files, and the
    commit-conflict loser's files never alias the winner's."""
    tag = f"{version:05d}" + (f"-{token}" if token else "")
    tmp = os.path.join(table_dir, f".__stage_v{tag}__")
    w = spark_df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(tmp)
    out: list[tuple[str, dict[str, str]]] = []
    if not partition_cols:
        for i, part in enumerate(_list_parquet(tmp)):
            dst = os.path.join(table_dir, f"part-{tag}-{i:05d}.snappy.parquet")
            os.replace(part, dst)
            out.append((dst, {}))
    else:
        i = 0
        for dirpath, _dirnames, filenames in sorted(os.walk(tmp)):
            pvals: dict[str, str] = {}
            rel = os.path.relpath(dirpath, tmp)
            if rel != ".":
                for seg in rel.split(os.sep):
                    k, _, v = seg.partition("=")
                    if v == "__HIVE_DEFAULT_PARTITION__":
                        raise NotImplementedError(
                            f"null partition value in column {k!r}: the "
                            "protocol encodes it as a null map entry, "
                            "which this writer does not implement — "
                            "filter nulls or pick a non-null partition key"
                        )
                    pvals[k] = urllib.parse.unquote(v)
            if set(pvals) != set(partition_cols):
                continue
            for f in sorted(filenames):
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                ddir = os.path.join(
                    table_dir,
                    *(f"{c}={urllib.parse.quote(pvals[c], safe='')}" for c in partition_cols),
                )
                os.makedirs(ddir, exist_ok=True)
                dst = os.path.join(ddir, f"part-{tag}-{i:05d}.snappy.parquet")
                os.replace(os.path.join(dirpath, f), dst)
                out.append((dst, dict(pvals)))
                i += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def create_delta_table(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    *,
    name: str | None = None,
    partition_by: list[str] | None = None,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> int:
    """Version-0 commit: protocol + metaData + the seed files.
    `partition_by` declares protocol partitioning: files land in
    Hive-style dirs, partition values live in the log (add.
    partitionValues) and NOT in the data files, and every later append
    inherits the layout from metaData.partitionColumns."""
    os.makedirs(table_dir, exist_ok=True)
    if delta_versions(table_dir):
        raise FileExistsError(f"Delta log already exists at {table_dir}")
    files = _materialize_files(df, table_dir, 0, partition_by)
    actions: list[dict] = [
        {"commitInfo": {"operation": "CREATE TABLE AS SELECT", "engine": "spark-graft"}},
        dict(PROTOCOL_ACTION),
        _metadata_action(table_dir, df.schema, name=name, partition_columns=partition_by),
    ]
    actions += [_add_action(table_dir, f, partition_values=pv) for f, pv in files]
    _write_commit(table_dir, 0, actions)
    _maybe_checkpoint(spark, table_dir, 0, checkpoint_interval)
    return 0


def commit_append(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    *,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Blind-append commit (adds only — no reconciliation needed, the
    cheapest Delta write). Returns the new version.

    `txn_app_id`/`txn_version` record the protocol's `txn` action —
    the idempotent-writer handshake a streaming sink uses: it stamps
    (appId=queryId, version=batchId) on every commit and consults
    `last_txn_version` before writing, so a redelivered micro-batch
    after a crash/restart becomes a no-op instead of duplicate rows."""
    versions = delta_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no Delta table at {table_dir}; create first")
    version = versions[-1] + 1
    pcols = replay_state(spark, table_dir).metadata.get("partitionColumns") or []
    files = _materialize_files(df, table_dir, version, pcols or None)
    actions: list[dict] = [
        {"commitInfo": {"operation": "WRITE", "operationParameters": {"mode": "Append"}, "engine": "spark-graft"}}
    ]
    if txn_app_id is not None:
        if txn_version is None:
            raise ValueError("txn_app_id requires txn_version")
        actions.append(
            {"txn": {"appId": txn_app_id, "version": int(txn_version), "lastUpdated": _now_ms()}}
        )
    actions += [_add_action(table_dir, f, partition_values=pv) for f, pv in files]
    _write_commit(table_dir, version, actions)
    _maybe_checkpoint(spark, table_dir, version, checkpoint_interval)
    return version


def last_txn_version(spark: SparkSession, table_dir: str, app_id: str) -> int | None:
    """Highest committed `txn` version for `app_id`, or None — the
    restart-side half of the idempotent-writer handshake."""
    return replay_state(spark, table_dir).txns.get(app_id)


DV_PROTOCOL_ACTION = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


def commit_deletion_vectors(
    spark: SparkSession,
    table_dir: str,
    deleted_rows: dict[str, list[int]],
    *,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> int:
    """Merge-on-read DELETE: mark physical row positions of active data
    files deleted WITHOUT rewriting the files — one on-disk DV file for
    the whole commit (multi-DV layout, like real writers), a
    remove+add pair per touched data file (the add re-emitted with the
    new `deletionVector` descriptor), and a protocol upgrade to
    readerFeatures=[deletionVectors] on first use. A file that already
    carries a DV gets the UNION of its old and new deleted sets (the
    protocol requires a full replacement descriptor, not a delta).

    `deleted_rows` maps the add action's (encoded) path to row indexes.
    Indexes are validated against the file's logged numRecords when
    stats are present — an out-of-range position is a caller bug that
    must not be persisted. Driver cost is O(deleted rows in THIS
    commit) — the caller's batch, not the table; superseded DV files
    are left for a later cleanup (vacuum's sweep ignores non-parquet).
    """
    from financial_arbitrage_data_pipeline_spark.sources.deletion_vectors import (
        dv_row_indexes,
        roaring_array_serialize,
        write_dv_file,
    )

    state = replay_state(spark, table_dir)
    version = delta_versions(table_dir)[-1] + 1
    blobs: list[bytes] = []
    targets: list[tuple[str, dict, int]] = []  # (path, add body, cardinality)
    for path in sorted(deleted_rows):
        add = state.files.get(path)
        if add is None:
            raise ValueError(f"{path} is not an active file of {table_dir}")
        idx = set(int(i) for i in deleted_rows[path])
        if not idx:
            continue
        if min(idx) < 0:
            raise ValueError(f"negative row index for {path}")
        try:
            n_records = json.loads(add.get("stats") or "{}").get("numRecords")
        except ValueError:
            n_records = None
        if n_records is not None and max(idx) >= n_records:
            raise ValueError(
                f"row index {max(idx)} out of range for {path} "
                f"({n_records} rows)"
            )
        old_dv = add.get("deletionVector")
        if old_dv:
            idx |= set(dv_row_indexes(table_dir, old_dv))
        ordered = sorted(idx)
        blobs.append(roaring_array_serialize(ordered))
        targets.append((path, add, len(ordered)))
    if not targets:
        raise ValueError("no rows to delete")
    descriptors = write_dv_file(table_dir, blobs)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {"mode": "merge-on-read"},
                "engine": "spark-graft",
            }
        }
    ]
    if (state.protocol or {}).get("minReaderVersion", 1) < 3:
        actions.append(json.loads(json.dumps(DV_PROTOCOL_ACTION)))
    now = _now_ms()
    for (path, add, card), desc in zip(targets, descriptors):
        desc = dict(desc, cardinality=card)
        # the remove carries the SUPERSEDED descriptor (protocol shape):
        # it is what lets VACUUM reclaim the old DV file once the
        # tombstone expires and no active add shares the .bin
        actions.append({"remove": _dv_remove_body(path, now, add, True)})
        actions.append({"add": {**add, "deletionVector": desc, "dataChange": True}})
    _write_commit(table_dir, version, actions)
    _maybe_checkpoint(spark, table_dir, version, checkpoint_interval)
    return version


def delete_from_delta_table(
    spark: SparkSession,
    table_dir: str,
    predicate,
    *,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> int | None:
    """DELETE WHERE via deletion vectors (merge-on-read): no data file
    is rewritten — matching physical row positions are packed into
    per-file roaring bitmaps ON THE EXECUTORS (one `applyInPandas`
    group per touched file), and only the SERIALIZED bitmaps cross to
    the driver: O(touched files) rows of kilobyte-scale blobs, never
    the deleted row ids themselves. That is the shape that survives a
    100 TB table: a delete touching 10k files with 10M rows each moves
    ~10k compact blobs, not 10^11 indexes. Files already carrying a DV
    get the union of old and new deleted sets.

    `predicate` is a SQL string or Column over the table's columns.
    Returns the committed version, or None when nothing matched."""
    from financial_arbitrage_data_pipeline_spark.sources.deletion_vectors import (
        dv_row_indexes,
        roaring_array_deserialize,
        roaring_array_serialize,
        write_dv_file,
    )

    state = replay_state(spark, table_dir)
    if not state.files:
        return None
    schema = StructType.fromJson(json.loads(state.metadata["schemaString"]))
    pcols = state.metadata.get("partitionColumns") or []
    scan = _read_fileset(spark, table_dir, schema, pcols, state.files, with_meta=True)
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    matches = scan.filter(cond).select("__dv_file", "__dv_row")

    def pack(pdf):
        import pandas as pd

        idx = sorted({int(i) for i in pdf["__dv_row"]})
        return pd.DataFrame(
            {
                "f": [pdf["__dv_file"].iloc[0]],
                "blob": [roaring_array_serialize(idx)],
                "card": [len(idx)],
            }
        )

    packed = matches.groupBy("__dv_file").applyInPandas(
        pack, "f string, blob binary, card long"
    ).collect()
    if not packed:
        return None
    by_abs = {
        os.path.abspath(os.path.join(table_dir, _decode_path(p))).replace(
            os.sep, "/"
        ): p
        for p in state.files
    }
    version = delta_versions(table_dir)[-1] + 1
    blobs: list[bytes] = []
    targets: list[tuple[str, dict, int]] = []
    for r in sorted(packed, key=lambda r: r["f"]):
        path = by_abs[r["f"]]
        add = state.files[path]
        blob, card = bytes(r["blob"]), int(r["card"])
        old_dv = add.get("deletionVector")
        if old_dv:
            merged = sorted(
                set(dv_row_indexes(table_dir, old_dv))
                | set(roaring_array_deserialize(blob))
            )
            blob, card = roaring_array_serialize(merged), len(merged)
        blobs.append(blob)
        targets.append((path, add, card))
    descriptors = write_dv_file(table_dir, blobs)
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {"mode": "merge-on-read"},
                "engine": "spark-graft",
            }
        }
    ]
    if (state.protocol or {}).get("minReaderVersion", 1) < 3:
        actions.append(json.loads(json.dumps(DV_PROTOCOL_ACTION)))
    now = _now_ms()
    for (path, add, card), desc in zip(targets, descriptors):
        desc = dict(desc, cardinality=card)
        actions.append({"remove": _dv_remove_body(path, now, add, True)})
        actions.append({"add": {**add, "deletionVector": desc, "dataChange": True}})
    _write_commit(table_dir, version, actions)
    _maybe_checkpoint(spark, table_dir, version, checkpoint_interval)
    return version


# Rewrite paths (OPTIMIZE / MERGE) are DV-AWARE: they scan through the
# DV-applying reader, so a rewritten file contains exactly the LIVE
# rows and the rewrite drops the deletion vector (real Delta's
# purge-on-rewrite). The superseded DV .bin files become unreferenced
# (vacuum's sweep intentionally touches only *.parquet; .bin orphans
# are kilobyte-scale metadata).


def optimize_compact(
    spark: SparkSession,
    table_dir: str,
    *,
    target_files: int = 1,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
    zorder_by: tuple[str, str] | None = None,
    zorder_bits: int = 8,
) -> int:
    """OPTIMIZE: bin-pack the active files into `target_files` larger
    ones in a single commit of remove+add actions with
    ``dataChange: false`` — the protocol's marker that the commit
    rearranges bytes without changing table content (streaming readers
    treating the log as a CDC feed skip it; concurrent writers conflict-
    check against it like any commit).

    This is the lifecycle complement of the streaming txn sink: a
    micro-batch-per-commit table accretes one small file per trigger,
    and at 100 TB the scan dies by open-file overhead long before
    bytes; periodic compaction restores O(target) files while every
    version before it stays time-travelable (the small files remain on
    disk until VACUUM expires their tombstones).

    `zorder_by=(x, y)` clusters the rewrite on the Morton z-curve of
    two columns (Delta's OPTIMIZE ... ZORDER BY): range-partition +
    sort on the interleaved key, so every output file covers a tight
    range in BOTH dimensions and the stamped minValues/maxValues make
    `stats_filter` reads skip files for predicates on either column —
    the clustering trade a single-column sort cannot make. Columns
    must be non-negative ints < 2^zorder_bits (quantile-bucket them
    upstream otherwise — `operators/layout.with_quantile_buckets`).
    Layout-only like plain compaction: same rows, dataChange=false."""
    state = replay_state(spark, table_dir)
    old_paths = sorted(state.files)
    pcols = state.metadata.get("partitionColumns") or []
    df = read_delta_table(spark, table_dir)
    if zorder_by is not None:
        if pcols:
            raise NotImplementedError(
                "zorder_by on a partitioned table is not supported: z-cluster "
                "within partitions needs per-partition range bounds"
            )
        from financial_arbitrage_data_pipeline_spark.operators.layout import (
            zorder_key,
        )

        x, y = zorder_by
        df = (
            df.withColumn("__z", zorder_key(x, y, zorder_bits))
            .repartitionByRange(max(1, target_files), "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        df = df.coalesce(max(1, target_files))
    version = delta_versions(table_dir)[-1] + 1
    new_files = _materialize_files(df, table_dir, version, pcols or None)
    actions: list[dict] = [
        {"commitInfo": {"operation": "OPTIMIZE", "engine": "spark-graft"}}
    ]
    now = _now_ms()
    for p in old_paths:
        actions.append(
            {"remove": _dv_remove_body(p, now, state.files[p], False)}
        )
    for f, pv in new_files:
        a = _add_action(table_dir, f, partition_values=pv)
        a["add"]["dataChange"] = False
        actions.append(a)
    _write_commit(table_dir, version, actions)
    _maybe_checkpoint(spark, table_dir, version, checkpoint_interval)
    return version


# Last MERGE prune accounting (module-level, observability only — the
# durable copy rides the commit's commitInfo.operationMetrics). VERDICT
# r11 task 6: the foreign-stats degrade path used to fall back to
# reading every stats-bearing file SILENTLY; a silent full scan at
# 100 TB is an incident, so the counters must be visible both to the
# caller (this dict) and in artifacts (the committed log).
LAST_MERGE_PRUNE: dict = {}


def _candidate_merge_paths(
    spark: SparkSession,
    table_dir: str,
    state: _LogState,
    key: str,
    updates: DataFrame,
    pcols: list[str],
    schema: StructType,
) -> tuple[set[str], dict]:
    """Active files that MAY contain an update key — the copy-on-write
    pruning step. A file is skipped only when its log metadata PROVES no
    update key can live in it: for a partition-column key, by its
    partitionValues entry; otherwise by the add.stats minValues/
    maxValues range for the key column. Files without usable stats are
    always candidates (stats are advisory; correctness never depends on
    them). The check is a DISTRIBUTED semi-join of the update keys
    against the broadcast file ranges — the file list is already
    driver-resident (it IS the replayed log), but the update keys are
    never collected.

    Returns (candidate paths, prune report): the report carries
    {files_total, files_candidates, files_no_stats, degraded, mode} —
    `degraded` is True when stats existed but could not be used (the
    foreign-encoding fall-back that reads every stats-bearing file),
    so a silent full scan is observable, never silent."""
    from pyspark.sql.types import StructField

    key_field = next((f for f in schema.fields if f.name == key), None)
    if key_field is None:
        raise ValueError(f"merge key {key!r} not in table schema")
    keys = updates.select(F.col(key).alias("__k__")).distinct()
    n_total = len(state.files)

    def report(cands: set[str], *, mode: str, no_stats: int = 0, degraded: bool = False) -> dict:
        return {
            "files_total": n_total,
            "files_candidates": len(cands),
            "files_no_stats": no_stats,
            "degraded": degraded,
            "mode": mode,
        }

    if key in pcols:
        rows = [(p, a.get("partitionValues", {}).get(key)) for p, a in state.files.items()]
        ranges = spark.createDataFrame(
            rows, StructType([StructField("__path__", StringType(), False),
                              StructField("__pv__", StringType(), True)])
        )
        hit = keys.join(
            F.broadcast(ranges),
            F.col("__k__").cast("string") == F.col("__pv__"),
            "inner",
        )
        cands = {r["__path__"] for r in hit.select("__path__").distinct().collect()}
        return cands, report(cands, mode="partition")

    always: set[str] = set()
    rows = []
    for p, a in state.files.items():
        try:
            st = json.loads(a["stats"]) if a.get("stats") else {}
            mn = st.get("minValues", {}).get(key)
            mx = st.get("maxValues", {}).get(key)
        except (ValueError, TypeError):
            mn = mx = None
        if mn is None or mx is None:
            always.add(p)  # no stats => must read
        else:
            rows.append((p, mn, mx))
    if not rows:
        return always, report(always, mode="stats", no_stats=len(always))
    try:
        ranges = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("__path__", StringType(), False),
                    StructField("__mn__", key_field.dataType, True),
                    StructField("__mx__", key_field.dataType, True),
                ]
            ),
        )
    except Exception:
        # stats value shape doesn't round-trip into the key's Spark type
        # (e.g. a reader-foreign encoding): stats are advisory — degrade
        # to reading every stats-bearing file rather than guessing, and
        # SAY SO in the report (a silent full scan at 100 TB is an
        # incident, not a fallback)
        cands = always | {p for p, _, _ in rows}
        return cands, report(cands, mode="stats", no_stats=len(always), degraded=True)
    hit = keys.join(
        F.broadcast(ranges),
        (F.col("__k__") >= F.col("__mn__")) & (F.col("__k__") <= F.col("__mx__")),
        "inner",
    )
    cands = always | {r["__path__"] for r in hit.select("__path__").distinct().collect()}
    return cands, report(cands, mode="stats", no_stats=len(always))


def merge_delta_table(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str,
    set_exprs: dict,
    *,
    insert_missing: bool = False,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    evolve_schema: bool = False,
    evolve_cols: list[str] | None = None,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
    max_attempts: int = 4,
) -> int | None:
    """K4 through the OPEN protocol: copy-on-write MERGE INTO a native
    Delta table — `WHEN MATCHED UPDATE SET <set_exprs>` (+ optional
    `WHEN NOT MATCHED INSERT`), committed as remove+add actions in ONE
    log version. Parity with the bucketed merge table's semantics
    (`operators/upsert.py:merge_into_parquet`), expressed in the
    protocol's own mechanisms:

    - **File pruning**: only files whose key-column stats range (or
      partitionValues, for a partition key) can contain an update key
      are read and rewritten — O(touched files), never O(table). The
      adds this writer stamps carry minValues/maxValues straight from
      the parquet footers, so its own tables always prune.
    - **Exactly-once redelivery** via the protocol's `txn` action:
      pass (txn_app_id, txn_version); a replayed/redelivered batch at
      or below the recorded version is a no-op, checked against the
      SAME snapshot the merge will commit against (a concurrent
      committer bumping the txn makes this attempt lose the version
      race and re-check on retry — the protocol's locked-recheck
      equivalent of the bucketed path's post-lock marker re-read).
    - **Schema widening** (`evolve_schema`/`evolve_cols`, same
      allowlist semantics as the bucketed path): new columns re-emit
      `metaData` with the widened schemaString in the same commit;
      untouched files surface typed nulls through the imposed-schema
      read, exactly as the protocol prescribes.
    - **Crash safety**: data files are staged under attempt-unique
      names BEFORE the commit JSON exists; a crash pre-commit leaves
      the table untouched (orphan files are invisible to replay) and
      the re-run applies cleanly. Optimistic concurrency via the
      log's put-if-absent commit: a lost race discards this attempt's
      staged files and retries on the new head.

    Reference anchor: the Postgres upsert the reference relies on for
    the same lifecycle (`/root/reference/database/postgres/
    writer.py:351-407`). Returns the committed version, or None when
    the merge was a redelivery no-op (or provably changed nothing).

    Note on partitioned tables + `insert_missing`: an inserted row's
    partition column must get a non-null value via set_exprs (columns
    not covered default to null, and a null partition value is
    refused at write)."""
    from financial_arbitrage_data_pipeline_spark.operators.upsert import (
        _evolution_new_cols,
        _merged_output,
    )
    from pyspark.sql.types import StructField

    if evolve_cols is not None and not evolve_schema:
        raise ValueError("evolve_cols requires evolve_schema=True")
    if (txn_app_id is None) != (txn_version is None):
        raise ValueError("txn_app_id and txn_version must be passed together")

    last_err: Exception | None = None
    for _attempt in range(max_attempts):
        versions = delta_versions(table_dir)
        cp_only = not versions and _latest_checkpoint_at_or_below(table_dir, 1 << 62)
        if not versions and not cp_only:
            raise FileNotFoundError(f"no Delta table at {table_dir}; create first")
        state = replay_state(spark, table_dir)
        head = versions[-1] if versions else _latest_checkpoint_at_or_below(table_dir, 1 << 62)
        mwv = state.protocol.get("minWriterVersion", 2)
        wfeats = set(state.protocol.get("writerFeatures") or [])
        # v7 is writable iff every demanded writer feature is one this
        # merge actually honors (deletionVectors: the candidate scan is
        # DV-applying and rewrites drop the DV). Anything else — e.g.
        # columnMapping, rowTracking — keeps the loud refusal.
        if mwv > 2 and not (mwv == 7 and wfeats <= {"deletionVectors"}):
            raise ValueError(
                "table requires writer features beyond minWriterVersion=2 "
                f"({state.protocol}) — this writer would corrupt it"
            )
        if txn_app_id is not None:
            prev = state.txns.get(txn_app_id)
            if prev is not None and txn_version <= prev:
                return None  # redelivered batch: the protocol's no-op
        schema = StructType.fromJson(json.loads(state.metadata["schemaString"]))
        pcols = state.metadata.get("partitionColumns") or []
        new_cols = _evolution_new_cols(
            updates, {f.name for f in schema.fields}, evolve_schema, evolve_cols
        )
        data_cols = [f.name for f in schema.fields] + new_cols
        cand, prune = _candidate_merge_paths(
            spark, table_dir, state, key, updates, pcols, schema
        )
        LAST_MERGE_PRUNE.clear()
        LAST_MERGE_PRUNE.update(prune)
        selected = {p: state.files[p] for p in cand}
        if not selected and not insert_missing and txn_app_id is None and not new_cols:
            return None  # provably no matched file, nothing to record

        staged: list[tuple[str, dict[str, str]]] = []
        widened = schema
        if new_cols:
            widened = StructType(
                list(schema.fields)
                + [StructField(c, updates.schema[c].dataType, True) for c in new_cols]
            )
        if selected or insert_missing:
            # DV-aware candidate scan: a selected file's deleted rows
            # must not re-enter the rewrite (they'd resurrect); the
            # rewrite output carries no DV — purge-on-rewrite.
            dv_sel = {p: a for p, a in selected.items() if a.get("deletionVector")}
            plain_sel = {p: a for p, a in selected.items() if p not in dv_sel}
            target = _read_fileset(spark, table_dir, schema, pcols, plain_sel)
            if dv_sel:
                target = target.unionByName(
                    _read_fileset_with_dvs(spark, table_dir, schema, pcols, dv_sel)
                )
            merged = _merged_output(
                target, updates, key, set_exprs, insert_missing,
                data_cols, frozenset(new_cols),
            )
            staged = _materialize_files(
                merged, table_dir, head + 1, pcols or None,
                token=uuid.uuid4().hex[:12],
            )
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "MERGE",
                    "operationParameters": {"predicate": f"t.{key} = u.{key}"},
                    # prune observability (VERDICT r11 task 6): the
                    # kept/total counters and the degraded flag ride the
                    # commit itself, real Delta's operationMetrics shape,
                    # so a silent full scan is visible in the artifact
                    "operationMetrics": {
                        "numTargetFilesTotal": prune["files_total"],
                        "numTargetFilesScanned": prune["files_candidates"],
                        "numTargetFilesNoStats": prune["files_no_stats"],
                        "pruneDegraded": prune["degraded"],
                        "pruneMode": prune["mode"],
                    },
                    "engine": "spark-graft",
                }
            }
        ]
        if txn_app_id is not None:
            actions.append(
                {"txn": {"appId": txn_app_id, "version": int(txn_version), "lastUpdated": _now_ms()}}
            )
        if new_cols:
            md = dict(state.metadata)  # keep id/createdTime: the table's identity
            md["schemaString"] = widened.json()
            actions.append({"metaData": md})
        for p in sorted(selected):
            actions.append(
                {"remove": _dv_remove_body(p, _now_ms(), selected[p], True)}
            )
        actions += [_add_action(table_dir, f, partition_values=pv) for f, pv in staged]
        try:
            _write_commit(table_dir, head + 1, actions)
        except DeltaCommitConflict as e:
            last_err = e
            for f, _pv in staged:  # loser cleans its own staged files
                try:
                    os.remove(f)
                except OSError:
                    pass
            continue
        _maybe_checkpoint(spark, table_dir, head + 1, checkpoint_interval)
        return head + 1
    raise DeltaCommitConflict(
        f"merge lost {max_attempts} optimistic version races on {table_dir}"
    ) from last_err


# Listing-sweep safety floor (ADVICE r11 item 3): with retention_ms=0
# the sweep's mtime guard is vacuous — a concurrent writer's
# materialized-but-not-yet-committed parquet (in no log yet) would be
# deleted the instant it lands. Real Delta guards this with an enforced
# minimum retention (retentionDurationCheck, default 7 days); here the
# floor applies to the LISTING SWEEP only (tombstone-driven deletes are
# log-committed and need no mtime heuristic).
MIN_SWEEP_RETENTION_MS = 3_600_000


def _vacuum_dv_files(
    table_dir: str, state: _LogState, removes: dict[str, dict], cutoff: int
) -> list[str]:
    """Reclaim superseded deletion-vector files: a remove that carries a
    `deletionVector` descriptor (the DV its add was replaced under) makes
    the .bin reclaimable once (a) that tombstone aged past the cutoff and
    (b) no ACTIVE add and no UNEXPIRED tombstone references the same file
    — one multi-DV .bin can back several data files from one commit, so
    reference counting is by resolved path. Only paths inside the table
    root are ever deleted ('p'-storage can point anywhere; a foreign
    absolute path is not ours to reclaim). Inline ('i') DVs have no file.
    Caveat: checkpoints don't carry remove-side DV descriptors, so a DV
    superseded before a checkpoint whose JSON commit was deleted stays an
    orphan — safe (never wrong rows), just unreclaimed kilobytes."""
    from financial_arbitrage_data_pipeline_spark.sources.deletion_vectors import (
        dv_absolute_path,
    )

    root = os.path.abspath(table_dir)

    def resolve(dv: dict) -> str | None:
        if not dv or dv.get("storageType") == "i":
            return None
        try:
            p = dv_absolute_path(table_dir, dv)
        except (ValueError, KeyError):
            return None
        return os.path.abspath(p) if p else None

    protected: set[str] = set()
    for a in state.files.values():
        p = resolve(a.get("deletionVector"))
        if p:
            protected.add(p)
    for r in removes.values():
        if r.get("deletionTimestamp", 0) > cutoff:
            p = resolve(r.get("deletionVector"))
            if p:
                protected.add(p)
    deleted: list[str] = []
    for path in sorted(removes):
        r = removes[path]
        if r.get("deletionTimestamp", 0) > cutoff:
            continue
        p = resolve(r.get("deletionVector"))
        if (
            p
            and p not in protected
            and p.startswith(root + os.sep)
            and os.path.exists(p)
        ):
            os.remove(p)
            deleted.append(_encode_path(os.path.relpath(p, table_dir)))
    return deleted


def vacuum_delta(
    spark: SparkSession,
    table_dir: str,
    *,
    retention_ms: int = 0,
    force_listing_sweep: bool = False,
) -> list[str]:
    """VACUUM: physically delete data files that are (a) not in the
    CURRENT active set and (b) tombstoned by a `remove` whose
    `deletionTimestamp` is older than the retention window. Time travel
    to versions that referenced a vacuumed file fails loudly at read
    time — the protocol's documented trade of history for storage.
    Returns the deleted relative paths.

    Tombstone sources: the replayed state's tombstone set (which a
    checkpoint carries forward, so removes whose JSON commits were
    deleted stay reclaimable — ADVICE r10) UNION the removes in every
    surviving JSON commit (covers tombstones a checkpoint already
    expired but whose commits still exist).

    Like real Delta VACUUM, a directory-listing sweep then reclaims
    data files the log no longer references AT ALL — the case where a
    tombstone aged past TOMBSTONE_RETENTION_MS before any vacuum ran,
    a checkpoint dropped it, and the pre-checkpoint JSON commits were
    deleted: without the sweep such files would be orphaned forever.
    The sweep protects the active set, every unexpired tombstone, and
    any file whose mtime is newer than the retention cutoff (an
    in-flight writer's not-yet-committed file — the same race real
    Delta's 7-day-minimum retention check exists to paper over). The
    mtime guard is only meaningful with a real retention window, so the
    sweep runs only when retention_ms >= MIN_SWEEP_RETENTION_MS or the
    caller passes force_listing_sweep=True (mirroring real VACUUM's
    retentionDurationCheck escape hatch)."""
    state = replay_state(spark, table_dir)
    active = set(state.files)
    cutoff = _now_ms() - retention_ms
    removes: dict[str, dict] = dict(state.tombstones)
    for v in delta_versions(table_dir):
        for action in _read_commit_actions(table_dir, v):
            r = action.get("remove")
            if r:
                removes.setdefault(r["path"], r)
    deleted: list[str] = []
    for path in sorted(removes):
        r = removes[path]
        if path in active or r.get("deletionTimestamp", 0) > cutoff:
            continue
        abs_path = os.path.join(table_dir, _decode_path(path))
        if os.path.exists(abs_path):
            os.remove(abs_path)
            deleted.append(path)
    deleted.extend(_vacuum_dv_files(table_dir, state, removes, cutoff))
    # Listing sweep: unreferenced files (no add, no live tombstone).
    if retention_ms < MIN_SWEEP_RETENTION_MS and not force_listing_sweep:
        return sorted(set(deleted))
    # Protection compares DECODED paths (ADVICE r11 item 2): a foreign
    # writer may log Hive partition paths with a literal '=' where this
    # engine logs '%3D' — re-encoding the filesystem relpath would only
    # match logs this engine wrote, and the sweep would delete ACTIVE
    # files of a foreign partitioned table. _decode_path is the
    # protocol-correct normalization for whatever quoting the log used.
    protected = {_decode_path(p) for p in active}
    for path, r in removes.items():
        if r.get("deletionTimestamp", 0) > cutoff:
            protected.add(_decode_path(path))
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            abs_path = os.path.join(root, f)
            rel_fs = os.path.relpath(abs_path, table_dir).replace(os.sep, "/")
            if rel_fs in protected:
                continue
            if os.stat(abs_path).st_mtime * 1000 > cutoff:
                continue
            os.remove(abs_path)
            deleted.append(_encode_path(rel_fs))
    return sorted(set(deleted))


# ---------------------------------------------------------------------------
# Merge-table export: bucketed MERGE history -> Delta log
# ---------------------------------------------------------------------------


def _merge_version_fileset(
    spark: SparkSession, table_dir: str, version: int, log: list[dict]
) -> list[str]:
    from financial_arbitrage_data_pipeline_spark.operators.upsert import _asof_bucket_paths

    bucket_dirs = _asof_bucket_paths(table_dir, version, log)
    files: list[str] = []
    for b in sorted(bucket_dirs):
        files.extend(_list_parquet(bucket_dirs[b]))
    return files


def export_delta_log(
    spark: SparkSession,
    table_dir: str,
    *,
    name: str | None = None,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> int:
    """Mirror a bucketed MERGE table's full commit history (see
    `operators/upsert.py`) into a conformant `_delta_log`, one Delta
    version per merge commit. Add/remove deltas come from the merge
    undo-log — a merge that touched B of N buckets emits O(B) actions.
    A new metaData action is emitted at any version whose file schema
    widens (the MERGE schema-evolution path), so Delta readers see the
    same evolution boundary the native as-of reader enforces.

    Idempotent rebuild: an existing `_delta_log` is replaced (the
    export is derived state; the merge manifest stays authoritative).

    Returns the latest Delta version (== the merge table's last seq).
    """
    from financial_arbitrage_data_pipeline_spark.operators.upsert import (
        _bucketed_n,
        _read_commit_log,
        history_versions,
    )

    if _bucketed_n(table_dir) is None:
        raise ValueError(
            f"{table_dir} is not a bucketed merge table (no _n_buckets "
            "marker) — export derives its file sets from the bucketed "
            "layout; for arbitrary DataFrames use create_delta_table"
        )
    log = _read_commit_log(table_dir)
    versions = history_versions(table_dir)
    if versions[0] != 0:
        raise ValueError(
            "export requires full history (vacuumed tables lose early "
            f"versions; earliest available: {versions[0]})"
        )
    ldir = _log_dir(table_dir)
    if os.path.isdir(ldir):
        # Only replace a _delta_log THIS engine derived (marked by the
        # export sentinel). A log without the sentinel belongs to a real
        # Delta writer coexisting with the bucketed layout; destroying
        # its transaction history would corrupt that table — the same
        # refusal merge_into_parquet applies before touching data files
        # under a foreign log (ADVICE r10).
        if not os.path.exists(os.path.join(ldir, EXPORT_SENTINEL)):
            raise FileExistsError(
                f"{ldir} exists but was not derived by export_delta_log "
                "(no export sentinel) — refusing to overwrite a foreign "
                "Delta transaction log; remove it explicitly if it is "
                "truly abandoned"
            )
        shutil.rmtree(ldir)

    prev_files: dict[str, str] = {}  # encoded rel path -> abs path
    prev_schema_json: str | None = None
    for v in versions:
        files = {
            _encode_path(os.path.relpath(p, table_dir)): p
            for p in _merge_version_fileset(spark, table_dir, v, log)
        }
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "CREATE TABLE AS SELECT" if v == 0 else "MERGE",
                    "engine": "spark-graft",
                    "mergeSeq": v,
                }
            }
        ]
        # schema at this version, from this version's own files
        schema = (
            spark.read.option("mergeSchema", "true")
            .parquet(*files.values())
            .drop("__bucket__")
            .schema
        )
        if v == 0:
            actions.append(dict(PROTOCOL_ACTION))
        if schema.json() != prev_schema_json:
            actions.append(_metadata_action(table_dir, schema, name=name))
            prev_schema_json = schema.json()
        for gone in sorted(set(prev_files) - set(files)):
            actions.append(_remove_action(gone))
        for added in sorted(set(files) - set(prev_files)):
            actions.append(_add_action(table_dir, files[added]))
        _write_commit(table_dir, v, actions)
        _maybe_checkpoint(spark, table_dir, v, checkpoint_interval)
        prev_files = files
    with open(os.path.join(ldir, EXPORT_SENTINEL), "w", encoding="utf-8") as fh:
        fh.write("derived from the merge commit manifest; re-export to refresh\n")
    return versions[-1]
