"""Minimal versioned-table format: manifest-based snapshots with
time travel and compaction (SURVEY §2.B round-5 deepening).

The table-level analog of the reference's versioned cells (§1.1:
every (row, family, qualifier) keeps timestamped versions; reads pick
a version by time range) — here every COMMIT keeps the table state,
and reads pick a version by number. This is the core mechanic of a
lakehouse table format (Delta/Iceberg), reduced to what plain parquet
plus an atomic manifest rename can provide:

- each commit writes its own immutable data directory
  `<table>/data/v<N>/` (parquet, written by Spark, any parallelism);
- a manifest `<table>/_manifests/v<N>.json` lists the data dirs that
  COMPOSE that version (append = parent's dirs + the new dir;
  overwrite/compact = just the new dir) plus parent/op metadata;
- the manifest is published atomically (fsync'd temp file + link(2))
  — a reader never observes a half-written version. (On an object
  store this is exactly the commit problem Delta's log and Iceberg's
  catalog solve; single-writer is assumed here, and a violation is
  LOUD: each version is claimed with an exclusive mkdir before any
  data is written, so of two racing committers exactly one wins and
  the other raises SnapshotConflictError — never last-writer-wins.)

Readers never list data directories — they read the closed file-set
named by the manifest, so a crashed half-written commit dir is
invisible until its manifest lands. Compaction rewrites the CURRENT
file-set into fewer, larger files as a new version: old versions stay
readable (time travel), and the small-file problem — the operational
tax of every streaming/incremental 100 TB pipeline — is paid down
without blocking readers.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def latest_version(path: str) -> int | None:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    ]
    return max(versions) if versions else None


class SnapshotConflictError(RuntimeError):
    """A second writer raced this commit to the same version number.

    The format is single-writer by design (the rename-based commit has no
    distributed arbiter — that is exactly the commit problem Delta's log
    and Iceberg's catalog exist to solve). This error makes a violation
    LOUD instead of silently last-writer-wins: the loser of the race gets
    this exception and its data dir never becomes referenced. Recovery
    for a crashed winner (claimed dir, never published): the orphan dir
    is unreferenced by every manifest, so `vacuum_snapshots` reclaims it,
    after which the version number is claimable again."""


def _claim_version(path: str, version: int) -> str:
    """Atomically claim `version` by creating its data dir with an
    exclusive mkdir (the POSIX-atomic O_EXCL analog for directories).
    Exactly one of any set of racing writers succeeds; the rest raise
    SnapshotConflictError BEFORE writing any data, so the winner's
    files can never be clobbered by a loser writing the same path."""
    rel = os.path.join("data", f"v{version}")
    d = os.path.join(path, rel)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    try:
        os.mkdir(d)
    except FileExistsError:
        raise SnapshotConflictError(
            f"version {version} at {path} is already claimed: a concurrent "
            "(or crashed) writer owns its data dir. If no writer is live, "
            "vacuum_snapshots() reclaims unreferenced claim dirs."
        ) from None
    return rel


def _publish(path: str, manifest: dict) -> None:
    """Atomic manifest publish: write to a temp name, fsync, then
    hard-link to the final name. link(2) fails atomically if the final
    name exists, so even a writer that somehow bypassed the version
    claim cannot overwrite a published manifest — a reader observes
    either nothing or the complete winning manifest, never a torn or
    replaced one."""
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"v{manifest['version']}.json")
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise SnapshotConflictError(
            f"manifest v{manifest['version']} at {path} was published by a "
            "concurrent writer"
        ) from None
    finally:
        os.remove(tmp)


def commit_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "append",
    target_files: int | None = None,
    partition_by: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    reclaim_crashed: bool = False,
) -> int:
    """Commit `df` as the next version of the table at `path`.

    mode='overwrite' starts the file-set fresh; mode='append' adds the
    new data dir to the parent version's file-set. `target_files`
    optionally coalesces the write (used by compaction). `partition_by`
    lays the commit's data dir out hive-partitioned on those columns —
    readers get partition pruning through every version that commit
    participates in (Spark discovers the partition columns per data
    dir, so differently-partitioned commits can coexist in one
    version's file-set as long as the COLUMN SET is consistent — the
    additive-evolution rule applies to partition columns too). Returns
    the committed version number.

    `txn=(app_id, txn_id)` records an idempotent-writer watermark in the
    manifest (Delta's txn/appId pattern): an AT-LEAST-ONCE writer (a
    streaming foreachBatch) tags each commit with its monotonically
    increasing batch id, and on retry consults `last_txn_id` — a replay
    of an already-committed batch becomes a no-op instead of a
    duplicate append.

    `reclaim_crashed=True` is the SINGLE-WRITER crash-recovery switch:
    if the next version's data dir is already claimed but has NO
    published manifest, it is treated as this writer's own crashed
    prior attempt (the only possibility under a single writer — a
    manifest publishes atomically after the data job), deleted, and
    re-claimed, so a retried commit makes progress instead of wedging
    on SnapshotConflictError. It MUST stay False anywhere two writers
    could genuinely race: a loser that reclaimed would clobber the
    winner's in-flight data dir."""
    assert mode in ("append", "overwrite")
    parent = latest_version(path)
    version = 1 if parent is None else parent + 1
    if reclaim_crashed:
        mdir = os.path.join(_manifest_dir(path), f"v{version}.json")
        d = os.path.join(path, "data", f"v{version}")
        if os.path.isdir(d) and not os.path.exists(mdir):
            import shutil

            shutil.rmtree(d)
    rel = _claim_version(path, version)  # loses loudly, never clobbers
    if target_files:
        df = df.coalesce(target_files)
    # mode MUST be append, not overwrite: Spark's overwrite deletes the
    # target directory before recreating it, which would momentarily
    # remove the exclusive-mkdir claim marker — a racing writer could
    # re-claim the same version in that window and both would write the
    # same dir. Appending into the freshly-claimed EMPTY dir writes the
    # identical file-set while the claim stays on disk for its whole life.
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(path, rel))
    dirs = [rel]
    if mode == "append" and parent is not None:
        dirs = _read_manifest(path, parent)["dirs"] + dirs
    # the manifest carries the commit's schema: an EMPTY commit writes no
    # parquet files (a partitioned empty write leaves only _SUCCESS), so
    # the schema must survive in metadata for readers — empty delta
    # batches are routine in an incremental pipeline and must not make a
    # version unreadable
    manifest = {
        "version": version,
        "parent": parent,
        "op": mode,
        "dirs": dirs,
        "schema": df.schema.json(),
    }
    if txn is not None:
        manifest["txn"] = {"app": txn[0], "id": int(txn[1])}
    _publish(path, manifest)
    return version


def last_txn_id(path: str, app: str) -> int | None:
    """Highest txn id `app` has committed to this table (None if none) —
    the read side of the idempotent-writer contract. Walks the lineage
    from the latest version through parents, so expired (vacuumed)
    manifests never break it and the cost is O(lineage), metadata
    only."""
    v = latest_version(path)
    best: int | None = None
    while v is not None:
        try:
            m = _read_manifest(path, v)
        except FileNotFoundError:
            break  # older history vacuumed away
        t = m.get("txn")
        if t and t.get("app") == app:
            best = t["id"] if best is None else max(best, t["id"])
        v = m.get("parent")
    return best


def _dir_rel(d) -> str:
    """Manifest dir entries are plain strings (no exclusions) or dicts
    `{"path": rel, "exclude": {col: [values]}}` (partition-level
    tombstones left by replace_partitions)."""
    return d if isinstance(d, str) else d["path"]


def _dir_excludes(d) -> dict[str, list]:
    return {} if isinstance(d, str) else dict(d.get("exclude", {}))


def replace_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
    values: list,
    target_files: int | None = None,
) -> int:
    """Commit a COPY-ON-WRITE rewrite of the partitions holding `values`:
    the new version's file-set is the parent's dirs — each tagged with a
    partition-level tombstone excluding `values` — plus one new dir
    holding `df`, the affected partitions' replacement rows (for a
    delete: their survivors). This is how a 100 TB table retires rows
    (dedup kills, takedowns) without rewriting itself: work is
    O(affected partitions), the untouched partitions' files are never
    opened, and the parent's files are never modified — older versions
    still read the pre-delete rows (time travel), and the excluded
    partitions' bytes are physically reclaimed only when a later
    compaction makes them unreferenced and vacuum_snapshots runs (the
    same OPTIMIZE-then-VACUUM interplay Delta has).

    Readers apply the tombstone as a PARTITION filter, so the excluded
    directories are pruned from the scan, not scanned-and-dropped.
    PRECONDITION (caller-owned, like every overwrite's): every row of
    `df` lies in a `values` partition — rows outside it would duplicate
    the untouched partitions' data. Delta reads refuse a lineage
    containing this op (added dirs no longer equal added rows)."""
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if not values:
        raise ValueError("replace_partitions needs a non-empty values list")
    if any(v is None for v in values):
        raise ValueError(
            "replace_partitions cannot replace the null partition "
            "(__HIVE_DEFAULT_PARTITION__): tombstones are value-keyed"
        )
    version = parent + 1
    rel = _claim_version(path, version)  # loses loudly, never clobbers
    if target_files:
        df = df.repartition(target_files, partition_col)
    # append into the claimed EMPTY dir (see commit_snapshot)
    df.write.mode("append").partitionBy(partition_col).parquet(
        os.path.join(path, rel)
    )
    dirs = []
    for d in _read_manifest(path, parent)["dirs"]:
        ex = _dir_excludes(d)
        merged = sorted(set(ex.get(partition_col, [])) | set(values))
        ex[partition_col] = merged
        dirs.append({"path": _dir_rel(d), "exclude": ex})
    dirs.append(rel)
    _publish(
        path,
        {
            "version": version,
            "parent": parent,
            "op": "replace",
            "dirs": dirs,
            "replaced": {partition_col: sorted(values)},
            "schema": df.schema.json(),
        },
    )
    return version


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read the table as of `version` (default: latest). Time travel is
    free: any still-published manifest names a complete file-set.

    Default reads use mergeSchema=True because a version's file-set may
    span commits with EVOLVED schemas (columns added over time): the
    merged schema is the union, and files written before a column
    existed surface NULL for it — additive evolution with no rewrite of
    history, the same contract Delta/Iceberg give. (Column renames/
    drops are not modeled; additive-only is the safe subset plain
    parquet can honor.)

    `schema` (a DDL string) opts a STABLE-schema table out of inference:
    no footer reads for schema merging, empty dirs readable, and — the
    reason it exists — hive partition columns keep their DECLARED types
    instead of path-string inference (an int-inferred partition column
    needs a cast that can cost a join its dynamic partition pruning)."""
    if version is None:
        version = latest_version(path)
        if version is None:
            raise FileNotFoundError(f"no snapshot versions at {path}")
    m = _read_manifest(path, version)
    return _read_dirs(spark, path, m["dirs"], m.get("schema"), version, schema)


def _read_dirs(
    spark: SparkSession,
    path: str,
    dirs: list,
    schema_json: str | None,
    version: int,
    user_schema: str | None = None,
) -> DataFrame:
    # each data dir is its own hive-partitioned (or flat) root, so read
    # them separately and union — one multi-path read would demand a
    # shared basePath the independent commit dirs don't have. Filters
    # push through the union into every per-dir scan, so partition
    # pruning still applies commit-by-commit. Dirs with no parquet files
    # (empty commits) are skipped — they contribute no rows, and reading
    # them would fail schema inference. A dir entry's partition-level
    # tombstones (replace_partitions) become NOT-isin filters on the
    # partition column, so the excluded directories are PRUNED from that
    # dir's scan — never scanned-and-dropped.
    def has_files(rel: str) -> bool:
        root = os.path.join(path, rel)
        for cur, _dirs, files in os.walk(root):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    from pyspark.sql import functions as F

    parts = []
    for d in dirs:
        rel = _dir_rel(d)
        if user_schema is None and not has_files(rel):
            continue
        reader = (
            spark.read.schema(user_schema)
            if user_schema is not None
            else spark.read.option("mergeSchema", "true")
        )
        part = reader.parquet(os.path.join(path, rel))
        for col, values in _dir_excludes(d).items():
            # isNull-preserving: NOT-isin alone is null-rejecting and
            # would silently drop a __HIVE_DEFAULT_PARTITION__ (null
            # partition value) from every tagged dir
            part = part.filter(
                F.col(col).isNull() | ~F.col(col).isin(values)
            )
        parts.append(part)
    if not parts:
        # a dir-set composed entirely of empty commits: reconstruct the
        # empty table from the manifest's schema
        from pyspark.sql.types import StructType

        if schema_json is None:
            raise FileNotFoundError(
                f"version {version} at {path} has no data files and no "
                "recorded schema"
            )
        return spark.createDataFrame([], StructType.fromJson(json.loads(schema_json)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def read_delta(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Read ONLY the rows added between two published versions — the
    incremental-consumption primitive: `to_version`'s file-set minus
    `from_version`'s, read at FILE level (no anti-join, no scan of the
    base data). For an append-only lineage the dirs a version adds ARE
    its row delta, so "what did this ingest batch bring" costs
    O(delta), however large the table has grown — the shape every
    per-arrival pipeline check (contamination, dedup rate, quality
    drift) needs at 100 TB. Every commit in (from, to] must be an
    append: an overwrite breaks the added-dirs == added-rows identity,
    and this refuses loudly rather than return a wrong delta."""
    if to_version is None:
        to_version = latest_version(path)
        if to_version is None:
            raise FileNotFoundError(f"no snapshot versions at {path}")
    if not 0 <= from_version <= to_version:
        raise ValueError(
            f"bad delta range: from={from_version} to={to_version}"
        )
    for v in range(from_version + 1, to_version + 1):
        m_v = _read_manifest(path, v)
        # the table-CREATING commit (parent None) adds every row it
        # writes whatever its op; any later overwrite discards dirs and
        # breaks the identity
        if m_v["op"] != "append" and m_v.get("parent") is not None:
            raise ValueError(
                f"version {v} at {path} is op={m_v['op']!r}: a delta read "
                "is only defined over an append-only lineage"
            )
    base: set[str] = (
        {_dir_rel(d) for d in _read_manifest(path, from_version)["dirs"]}
        if from_version
        else set()
    )
    m = _read_manifest(path, to_version)
    new_dirs = [d for d in m["dirs"] if _dir_rel(d) not in base]
    return _read_dirs(spark, path, new_dirs, m.get("schema"), to_version)


def compact_snapshot(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite the CURRENT version's file-set into `target_files` files
    as a new version. Readers of old versions are unaffected; the new
    version's scan does the same work over far fewer file-open/footer
    costs — the maintenance pass that keeps an incrementally-written
    100 TB table scannable.

    `partition_by` preserves a hive layout THROUGH compaction: the
    rewrite shuffles into `target_files` tasks hash-keyed on the
    partition columns (each partition value lands in exactly one task,
    so the compacted version holds at most one file per partition per
    task that owns it) and lays the single output dir out partitioned —
    so a reader's partition pruning, and any join's dynamic partition
    pruning against it, survive the rewrite. Omitting it for a table
    whose commits were partitioned FLATTENS the layout (the partition
    column becomes a plain data column) — legal but almost never what a
    pruned-read table wants."""
    parent = latest_version(path)
    if parent is None:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    current = read_snapshot(spark, path, parent)
    version = parent + 1
    rel = _claim_version(path, version)  # loses loudly, never clobbers
    # append, not overwrite, for the same reason as commit_snapshot: the
    # claimed dir must never be deleted or the claim evaporates mid-write
    if partition_by:
        writer = (
            current.repartition(target_files, *partition_by)
            .write.mode("append")
            .partitionBy(*partition_by)
        )
    else:
        writer = current.coalesce(target_files).write.mode("append")
    writer.parquet(os.path.join(path, rel))
    _publish(
        path,
        {
            "version": version,
            "parent": parent,
            "op": "compact",
            "dirs": [rel],
            "schema": current.schema.json(),
        },
    )
    return version


def vacuum_snapshots(path: str, keep_from: int) -> list[str]:
    """Expire history: drop every version older than `keep_from` and
    physically delete data directories no retained version references.

    Reference counting is the crux — an append-composed version REUSES
    its ancestors' data dirs, so "older than the retention horizon"
    does NOT imply deletable: a dir written at v1 and still listed in
    the retained v4's manifest must survive. Only after a compaction
    (which rewrites the file-set into its own dir) does old data
    actually become unreferenced and reclaimable — the same
    interplay Delta's VACUUM has with OPTIMIZE. Manifests are removed
    first, then unreferenced data dirs, so a crash mid-vacuum can only
    leave orphaned (never dangling) data. Returns the deleted data
    dirs (relative paths)."""
    import shutil

    latest = latest_version(path)
    if latest is None or keep_from > latest:
        raise ValueError(f"keep_from={keep_from} exceeds latest version {latest}")
    mdir = _manifest_dir(path)
    versions = sorted(
        int(n[1:-5])
        for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".json")
    )
    referenced: set[str] = set()
    for v in versions:
        if v >= keep_from:
            referenced.update(
                _dir_rel(d) for d in _read_manifest(path, v)["dirs"]
            )
    removed = []
    for v in versions:
        if v < keep_from:
            os.remove(os.path.join(mdir, f"v{v}.json"))
    data_root = os.path.join(path, "data")
    for name in sorted(os.listdir(data_root)):
        rel = os.path.join("data", name)
        if rel not in referenced:
            shutil.rmtree(os.path.join(data_root, name))
            removed.append(rel)
    return removed


def data_file_count(path: str, version: int) -> int:
    """Number of parquet data files composing `version` (metadata-only).
    Recursive, so hive-partitioned commit dirs count their per-partition
    files."""
    m = _read_manifest(path, version)
    n = 0
    for d in m["dirs"]:
        for _cur, _dirs, files in os.walk(os.path.join(path, _dir_rel(d))):
            n += sum(1 for name in files if name.endswith(".parquet"))
    return n
