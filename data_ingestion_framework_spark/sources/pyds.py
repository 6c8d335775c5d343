"""The table store as a native Spark 4 Python DataSource.

Registers format ``difs`` so ANY Spark job — including one that never
imports this package — can scan a :class:`ParquetTable` with the
engine-level API, commit-log semantics included:

    spark.dataSource.register(ParquetTableDataSource)
    spark.read.format("difs").option("path", p).load()
    spark.read.format("difs").option("path", p).option("version", 3).load()

What the source honors (driver-side planning is pure ``os``/``json``/
``pyarrow`` — no SparkSession, mirroring the commit-log planner):

- ``strict_files`` — the scan reads exactly the latest commit's file
  list (log-as-source-of-truth; a crashed writer's stray file is
  invisible), else the directory walk;
- ``version`` — ``VERSION AS OF``: the commit's file list resolved
  against live + retained ``_history`` roots, like ``as_of``;
- deletion vectors — each file's DV row indices load driver-side and
  ship with its partition; the executor masks them out per batch.

One InputPartition per data file (file-parallel — the natural scan
granularity), executor reads stream ``pyarrow`` record batches (never
whole files), and rows arrive in Spark through the Arrow path.

Unsupported (refused loudly, use ``ParquetTable.read()``): partitioned
layouts (directory-encoded columns), column mapping, widened schemas —
each needs metadata this standalone scanner intentionally doesn't
reimplement.

This is a compatibility/integration surface: the JVM parquet scan in
``read()`` stays the fast path (codegen, vectorized, pushdown); the
Python data source pays one Python worker hop per batch by design.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

LOG = "_commits"
HIST = "_history"
PROPS = "_table.json"
_AUX_PREFIXES = ("_", ".")


def _props(path: str) -> dict:
    f = os.path.join(path, PROPS)
    if os.path.isfile(f):
        with open(f) as fh:
            return json.load(fh)
    return {}


def _records(path: str) -> list[str]:
    d = os.path.join(path, LOG)
    if not os.path.isdir(d):
        return []
    return sorted(
        n
        for n in os.listdir(d)
        if n.endswith(".json")
        and not n.startswith(_AUX_PREFIXES)
        and n[:8].isdigit()
    )


def _record(path: str, name: str) -> dict:
    with open(os.path.join(path, LOG, name)) as f:
        return json.load(f)


def _walk_data_files(root: str) -> list[str]:
    out = []
    for cur, dirs, names in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith(_AUX_PREFIXES)]
        for n in names:
            if n.startswith(_AUX_PREFIXES) or not n.endswith(".parquet"):
                continue
            out.append(os.path.relpath(os.path.join(cur, n), root))
    return sorted(out)


def _dv_rows(roots: list[str], max_seq: int | None) -> dict[str, list[int]]:
    """file_name → sorted row indices to drop, folded across the
    contributing roots' ``_dv`` sidecars (as_of's union semantics)."""
    import pyarrow.parquet as pq

    out: dict[str, set[int]] = {}
    for root in roots:
        d = os.path.join(root, "_dv")
        if not os.path.isdir(d):
            continue
        for cur, _ds, names in os.walk(d):
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(cur, n))
                cols = t.column_names
                for row in t.to_pylist():
                    if (
                        max_seq is not None
                        and "dv_seq" in cols
                        and row["dv_seq"] > max_seq
                    ):
                        continue
                    out.setdefault(row["file_name"], set()).add(
                        row["row_index"]
                    )
    return {k: sorted(v) for k, v in out.items()}


class _Plan:
    """Driver-side scan plan: absolute file paths + per-file DV skips."""

    def __init__(self, path: str, version: int | None):
        props = _props(path)
        if props.get("column_mapping") or props.get("colmap"):
            raise ValueError("difs source: column-mapped tables need ParquetTable.read()")
        if props.get("widened_schema"):
            raise ValueError("difs source: type-widened tables need ParquetTable.read()")
        if props.get("added_columns"):
            raise ValueError(
                "difs source: tables with metadata-added columns need "
                "ParquetTable.read() (the scanner does not project "
                "missing columns)"
            )
        if props.get("schema_evolved"):
            # mergeSchema-evolved tables have per-file footer schemas;
            # this scanner declares ONE schema from the first file, so
            # later files would mismatch at executor time — refuse at
            # plan time like the other unsupported metadata.
            raise ValueError(
                "difs source: schema-evolved tables (mixed footers) need "
                "ParquetTable.read()"
            )
        names = _records(path)
        if version is not None:
            match = [n for n in names if int(n[:8]) == version]
            if not match:
                raise ValueError(f"difs source: no commit {version} in {path}")
            rels = _record(path, match[0]).get("files") or []
            roots = [path]
            hist = os.path.join(path, HIST)
            if os.path.isdir(hist):
                roots += [os.path.join(hist, d) for d in sorted(os.listdir(hist))]
            files = []
            for rel in rels:
                for root in roots:
                    cand = os.path.join(root, rel)
                    if os.path.isfile(cand):
                        files.append((rel, cand))
                        break
                else:
                    raise ValueError(
                        f"difs source: file {rel} of commit {version} "
                        "no longer retained (vacuumed?)"
                    )
            # contributing roots are exactly the distinct (abs - rel) prefixes
            dv_roots = sorted({p[: -len(rel) - 1] for rel, p in files})
            self.dv = _dv_rows(dv_roots, max_seq=version)
        else:
            if props.get("strict_files"):
                rels = (
                    _record(path, names[-1]).get("files") if names else []
                ) or []
            else:
                rels = _walk_data_files(path)
            files = [(rel, os.path.join(path, rel)) for rel in rels]
            self.dv = _dv_rows([path], max_seq=None)
        for rel, _p in files:
            if any("=" in comp for comp in rel.split(os.sep)[:-1]):
                raise ValueError(
                    "difs source: partitioned layouts need ParquetTable.read()"
                )
        self.files = files


def _filter_column(f) -> str | None:
    """Top-level column name of a pushable comparison filter, else
    None. Pushable: EqualTo / GreaterThan(OrEqual) / LessThan(OrEqual)
    / In with an int/float/str literal on a depth-1 column."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    if not isinstance(
        f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)
    ):
        return None
    if len(f.attribute) != 1:
        return None
    vals = f.value if isinstance(f, In) else (f.value,)
    import math

    for v in vals:
        if not isinstance(v, (int, float, str)) or isinstance(v, bool):
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
    return f.attribute[0]


def _file_stats(path: str, col: str, cache: dict):
    """(min, max) of ``col`` across the file's row groups from footer
    stats, or None when any row group lacks them (never prune blind)."""
    import pyarrow.parquet as pq

    key = (path, col)
    if key in cache:
        return cache[key]
    out = None
    try:
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col in idx:
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if ok and lo is not None:
                out = (lo, hi)
    except Exception:
        out = None
    cache[key] = out
    return out


def _file_may_match(path: str, f, cache: dict) -> bool:
    """False only when footer min/max PROVE no row satisfies ``f``.

    NUMERIC literals only: parquet string statistics may be TRUNCATED
    for long values (the footer's max can understate the true max), so
    string predicates never prune files here — they still filter
    exactly batch-side in ``read()``, and Spark re-checks regardless."""
    vals = f.value if isinstance(f.value, (tuple, list)) else (f.value,)
    if any(isinstance(v, str) for v in vals):
        return True
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    col = _filter_column(f)
    st = _file_stats(path, col, cache)
    if st is None:
        return True
    lo, hi = st
    try:
        if isinstance(f, EqualTo):
            return lo <= f.value <= hi
        if isinstance(f, In):
            return any(lo <= v <= hi for v in f.value)
        if isinstance(f, GreaterThan):
            return hi > f.value
        if isinstance(f, GreaterThanOrEqual):
            return hi >= f.value
        if isinstance(f, LessThan):
            return lo < f.value
        if isinstance(f, LessThanOrEqual):
            return lo <= f.value
    except TypeError:
        return True  # stats/literal type mismatch — never prune blind
    return True


def _apply_arrow_filter(batch, f):
    """Evaluate one pushed filter on an Arrow batch (null comparisons
    drop the row, matching SQL semantics). Unknown shapes pass the
    batch through — Spark re-applies every filter post-scan anyway."""
    import pyarrow.compute as pc

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    col = _filter_column(f)
    if col is None or col not in batch.schema.names:
        return batch
    c = batch.column(col)
    try:
        if isinstance(f, EqualTo):
            mask = pc.equal(c, f.value)
        elif isinstance(f, In):
            import pyarrow as pa

            mask = pc.is_in(c, value_set=pa.array(list(f.value), c.type))
        elif isinstance(f, GreaterThan):
            mask = pc.greater(c, f.value)
        elif isinstance(f, GreaterThanOrEqual):
            mask = pc.greater_equal(c, f.value)
        elif isinstance(f, LessThan):
            mask = pc.less(c, f.value)
        elif isinstance(f, LessThanOrEqual):
            mask = pc.less_equal(c, f.value)
        else:
            return batch
        return batch.filter(pc.fill_null(mask, False))
    except Exception:
        return batch


class ParquetTableReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("difs source: option 'path' is required")
        version = options.get("version")
        self.plan = _Plan(path, int(version) if version is not None else None)

    def partitions(self):
        files = self.plan.files
        for f in getattr(self, "filters", []):
            files = [
                (rel, p)
                for rel, p in files
                if _file_may_match(p, f, self._stats_cache)
            ]
        return [
            InputPartition(
                (abs_path, tuple(self.plan.dv.get(os.path.basename(abs_path), ())))
            )
            for _rel, abs_path in files
        ]

    @property
    def _stats_cache(self):
        if not hasattr(self, "_stats"):
            self._stats = {}
        return self._stats

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        abs_path, skip = partition.value
        skip = set(skip)
        offset = 0
        pf = pq.ParquetFile(abs_path)
        for batch in pf.iter_batches():
            n = batch.num_rows
            if skip:
                # the DV mask indexes ORIGINAL row positions — apply it
                # before any filter-derived mask shifts row numbering
                mask = pa.array(
                    [offset + i not in skip for i in range(n)], pa.bool_()
                )
                batch = batch.filter(mask)
            offset += n
            for f in getattr(self, "filters", []):
                if batch.num_rows:
                    batch = _apply_arrow_filter(batch, f)
            if batch.num_rows:
                yield batch


class ParquetTablePushdownReader(ParquetTableReader):
    """The batch reader with Spark 4.1 filter pushdown. OPT-IN via
    ``.option("pushdown", "true")`` because Spark HARD-FAILS any reader
    that merely DEFINES ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false — a vanilla
    session must keep working against the default reader. With both
    switches on: footer min/max stats prune whole files driver-side,
    Arrow masks filter batches executor-side (after the DV mask — DV
    indices address ORIGINAL row positions), and every filter is ALSO
    handed back to Spark for re-evaluation, so the pushdown can only
    reduce bytes moved, never change results."""

    def pushFilters(self, filters):
        self.filters = [f for f in filters if _filter_column(f) is not None]
        return filters


class ParquetTableStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("difs")``: replay the commit log as
    micro-batches — each trigger reads the files ADDED by commits in
    ``(startOffset, endOffset]``, so the table itself is the stream
    (the Delta streaming-source model; the in-package sibling is
    ``streaming/table_stream.py``, which drives foreachBatch merges).
    Offsets are commit seqs — exactly-once replay falls out of the
    log's append-only numbering. Non-file-additive commits (overwrite,
    compact, delete) in the range raise, the same soundness rule as
    ``read_since``: file-level increments only mean rows-appended
    while every commit is additive."""

    _ADDITIVE = {
        "append",
        "create",
        "set_partition_spec",
        "fsck_remove_orphans",
        "add_column",  # metadata-only; new column arrives via later appends
        "set_column_default",
        "drop_column_default",
        "set_column_mask",
        "drop_column_mask",
        "set_row_filter",
        "drop_row_filter",
        "cdf_reconcile",  # file-neutral crash marker (see read_since)
    }

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("difs source: option 'path' is required")
        # rate limiting (Auto Loader's maxFilesPerTrigger analogue, in
        # commit units — the log's natural batch): each trigger's
        # latestOffset advances at most N commits past the last offset
        # this reader handed out, so a backlogged table drains in
        # bounded micro-batches instead of one giant catch-up batch.
        # The anchor is seeded by initialOffset (fresh query) or the
        # first partitions() call (restart, where the engine reveals
        # the committed start); the one trigger before an anchor
        # exists runs uncapped rather than risk handing the engine an
        # offset BEHIND its committed start.
        raw = options.get("maxcommitspertrigger")
        self._max_commits = int(raw) if raw is not None else None
        if self._max_commits is not None and self._max_commits < 1:
            raise ValueError("difs stream: maxCommitsPerTrigger must be >= 1")
        self._anchor: int | None = None
        self._refuse_unsupported()

    def _refuse_unsupported(self) -> None:
        # same plan-time refusals as the batch _Plan: this reader
        # declares ONE schema and projects no metadata — a column-
        # mapped / widened / evolved / defaulted table would fail
        # confusingly at executor time (or worse, read stale names).
        # Called at __init__ AND per trigger (latestOffset): add_column
        # is file-neutral so it passes the _ADDITIVE commit check, yet a
        # table evolved AFTER the stream started would deliver files
        # carrying the new column — stop with the plan-time error, not
        # an executor-side arrow mismatch mid-query.
        props = _props(self.path)
        for key, what in (
            ("column_mapping", "column-mapped"),
            ("colmap", "column-mapped"),
            ("widened_schema", "type-widened"),
            ("schema_evolved", "schema-evolved"),
            ("added_columns", "metadata-added-column"),
        ):
            if props.get(key):
                raise ValueError(
                    f"difs stream: {what} tables need "
                    "streaming/table_stream.py (this scanner does not "
                    "project table metadata)"
                )

    def initialOffset(self):
        self._anchor = 0
        return {"seq": 0}

    def latestOffset(self):
        self._refuse_unsupported()
        names = _records(self.path)
        latest = int(names[-1][:8]) if names else 0
        if self._max_commits is not None and self._anchor is not None:
            latest = min(latest, self._anchor + self._max_commits)
        self._anchor = max(latest, self._anchor or 0)
        return {"seq": latest}

    def partitions(self, start, end):
        lo, hi = start["seq"], end["seq"]
        if self._anchor is None or hi > self._anchor:
            # restart replaying a recovered batch: the engine reveals
            # its frontier before ever calling latestOffset — cap the
            # NEXT trigger from this batch's end
            self._anchor = hi
        if hi <= lo:
            return []
        names = _records(self.path)
        recs = [
            _record(self.path, n) for n in names if lo <= int(n[:8]) <= hi
        ]
        by_seq = {r["seq"]: r for r in recs}
        parts = []
        prev_files = set(by_seq[lo]["files"]) if lo in by_seq else set()
        if lo and lo not in by_seq:
            raise ValueError(
                f"difs stream: commit {lo} missing from the log — cannot "
                "derive the files added after it"
            )
        for seq in range(lo + 1, hi + 1):
            rec = by_seq.get(seq)
            if rec is None:
                continue
            if rec["op"] not in self._ADDITIVE:
                raise ValueError(
                    f"difs stream: commit {seq} is {rec['op']!r} (not "
                    "file-additive) — restart the stream from a fresh "
                    "full read"
                )
            cur = set(rec["files"])
            for rel in sorted(cur - prev_files):
                if any("=" in c for c in rel.split(os.sep)[:-1]):
                    raise ValueError(
                        "difs stream: partitioned layouts need "
                        "streaming/table_stream.py"
                    )
                parts.append(
                    InputPartition((os.path.join(self.path, rel), ()))
                )
            prev_files = cur
        return parts

    def read(self, partition):
        yield from ParquetTableReader.read(self, partition)

    def commit(self, end):
        pass


class ParquetTableWriter(DataSourceArrowWriter):
    """``df.write.format("difs").mode("append")``: executor tasks write
    parquet files under dotted TEMP names (invisible to every reader —
    the store's walkers and Spark's path filter skip dot-prefixed
    entries), and the driver-side ``commit`` renames them live and
    appends ONE commit record listing exactly those files — the same
    two-phase write-then-publish discipline the store's own writers
    use, so a task retry or abort never leaks a visible file. The
    record lands via the put-if-absent link, so a concurrent writer
    loses loudly instead of corrupting the log. Unpartitioned append
    only (layout-changing writes belong to ParquetTable's API)."""

    def __init__(self, options: dict, overwrite: bool, schema=None):
        self.path = options.get("path")
        self.schema = schema
        if not self.path:
            raise ValueError("difs sink: option 'path' is required")
        if overwrite:
            raise ValueError(
                "difs sink supports mode('append') only — overwrite is a "
                "staged-swap lifecycle, use ParquetTable.overwrite()"
            )
        props = _props(self.path)
        if props.get("partition_spec") or any(
            "=" in c for rel in _walk_data_files(self.path) for c in rel.split(os.sep)[:-1]
        ):
            raise ValueError("difs sink: partitioned tables need ParquetTable")
        # This writer bypasses the store's column-mapping rewrite,
        # widened-schema upcasts, and CHECK-constraint gate — refuse
        # those targets loudly (mirroring _Plan) instead of committing
        # a batch the table's own readers can't honor.
        if props.get("column_mapping") or props.get("colmap"):
            raise ValueError("difs sink: column-mapped tables need ParquetTable.append()")
        if props.get("widened_schema"):
            raise ValueError("difs sink: type-widened tables need ParquetTable.append()")
        if props.get("schema_evolved"):
            raise ValueError("difs sink: schema-evolved tables need ParquetTable.append()")
        if props.get("added_columns") or props.get("column_defaults"):
            raise ValueError(
                "difs sink: table has DEFAULT columns — this writer "
                "cannot stamp them, use ParquetTable.append()"
            )
        if props.get("constraints"):
            raise ValueError(
                "difs sink: table has CHECK constraints — this writer "
                "cannot enforce them, use ParquetTable.append()"
            )
        if props.get("generated_columns") or props.get("generated"):
            raise ValueError(
                "difs sink: table has generated columns — use "
                "ParquetTable.append()"
            )
        self._validate_schema()
        os.makedirs(self.path, exist_ok=True)

    def _validate_schema(self) -> None:
        """A mismatched batch schema must fail at PLAN time — a silent
        commit of differently-typed files breaks every later read (the
        store's append() widens or refuses; this writer does neither).
        The comparison is ORDERED: the difs reader pins the table schema
        from files[0]'s arrow field ORDER, so a column-reordered frame
        with identical names/types would commit files whose arrow
        ordering diverges and fail later reads at executor time. The
        table's stored arrow schema is also kept so write() casts every
        batch to IT (field metadata/nullability converge on the table's
        canonical form), never to the batch's own schema."""
        self._table_arrow_schema = None
        if self.schema is None:
            return
        existing = _walk_data_files(self.path)
        if not existing:
            return
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        stored_arrow = pq.read_schema(os.path.join(self.path, existing[0]))
        table_schema = from_arrow_schema(stored_arrow)
        declared = [(f.name, f.dataType) for f in self.schema.fields]
        stored = [(f.name, f.dataType) for f in table_schema.fields]
        if declared != stored:
            raise ValueError(
                "difs sink: batch schema does not match the table's "
                f"(batch {[n for n, _ in declared]}, table "
                f"{[n for n, _ in stored]}, ordered — a type, name, or "
                "COLUMN ORDER differs; the table schema is pinned by its "
                "first file) — align the frame or use "
                "ParquetTable.append(merge_schema=True)"
            )
        self._table_arrow_schema = stored_arrow

    def write(self, iterator):
        # Arrow path (DataSourceArrowWriter): batches stream straight
        # into one parquet file per task — no per-row Python loop. The
        # declared schema pins types (pyarrow inference from values
        # would drift on all-null or temporal columns).
        import uuid as _uuid

        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        # prefer the TABLE's stored arrow schema (pinned by files[0] in
        # _validate_schema) over the batch's own — committed files then
        # carry byte-identical arrow schemas regardless of incoming
        # field-metadata or nullability noise
        arrow_schema = getattr(self, "_table_arrow_schema", None)
        if arrow_schema is None and self.schema is not None:
            arrow_schema = to_arrow_schema(self.schema)
        tmp = f".inflight-{_uuid.uuid4().hex}.parquet"
        writer = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(self.path, tmp), arrow_schema or batch.schema
                )
            if arrow_schema is not None and batch.schema != arrow_schema:
                batch = batch.cast(arrow_schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is None:
            return WriterCommitMessage()
        writer.close()
        if n == 0:
            os.unlink(os.path.join(self.path, tmp))
            return WriterCommitMessage()
        msg = WriterCommitMessage()
        msg.file = tmp
        return msg

    def commit(self, messages):
        _publish_append(self.path, messages, {"writer": "difs-datasource"})

    def abort(self, messages):
        _drop_inflight(self.path, messages)


def _drop_inflight(path: str, messages) -> None:
    for m in messages:
        tmp = getattr(m, "file", None)
        if tmp:
            try:
                os.unlink(os.path.join(path, tmp))
            except OSError:
                pass


def _publish_append(path: str, messages, metrics: dict) -> list[str]:
    """Rename the tasks' in-flight files live and append ONE put-if-
    absent commit record. The file list is previous-record files ∪ the
    files THIS commit renamed — never a directory walk, which would
    launder a crashed writer's stray uncommitted file into a
    strict_files table's log (the store's own _record_commit admits
    prev∪new only; a log-less directory's first commit adopts what was
    already there as its base state)."""
    import json as _json
    import time as _time
    import uuid as _uuid

    import pyarrow.parquet as pq

    new = []
    for m in messages:
        tmp = getattr(m, "file", None)
        if not tmp:
            continue
        final = "part-" + tmp[len(".inflight-"):]
        os.rename(os.path.join(path, tmp), os.path.join(path, final))
        new.append(final)
    names = _records(path)
    seq = (int(names[-1][:8]) + 1) if names else 1
    if names:
        prev = _record(path, names[-1]).get("files") or []
    else:
        prev = [f for f in _walk_data_files(path) if f not in set(new)]
    rows = sum(
        pq.ParquetFile(os.path.join(path, f)).metadata.num_rows for f in new
    )
    rec = {
        "seq": seq,
        "ts": _time.time(),
        "op": "append",
        "rows_written": rows,
        "metrics": metrics,
        "files": sorted(set(prev) | set(new)),
        "stats": {},
    }
    log = os.path.join(path, LOG)
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, f".tmp-{_uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        _json.dump(rec, f)
    try:
        os.link(tmp, os.path.join(log, f"{seq:08d}.json"))
    except FileExistsError:
        raise RuntimeError(
            f"difs sink: commit {seq} already exists — concurrent writer"
        ) from None
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return new


class ParquetTableStreamWriter(ParquetTableWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("difs")``: every micro-batch appends
    through the commit log with ``(stream_query_id, stream_batch_id)``
    in the record metrics — Delta's idempotent-write discipline
    (txnAppId + txnVersion), so a checkpoint restart that re-delivers a
    batch publishes NOTHING the second time (the in-flight files are
    dropped instead), while a SECOND streaming query (fresh checkpoint,
    batch ids restarting at 0) writing to the same table appends
    normally instead of colliding with the first query's ledger entries
    and silently losing data. The query identity is the writer's
    ``queryId`` option when given, else the checkpoint location (the
    engine forwards ``checkpointLocation`` into the source options) —
    both stable across restarts of the SAME query. With neither (temp
    checkpoint), a per-run id is minted: no cross-run replay can exist
    without a durable checkpoint, so scoping to the run is exact.
    Legacy records carrying only ``stream_batch_id`` are treated as
    this query's (the pre-query-id contract: one query per table).
    Completes the difs matrix: batch/stream × read/write all speak the
    log."""

    def __init__(self, options: dict, overwrite: bool, schema=None):
        super().__init__(options, overwrite, schema)
        import hashlib as _hashlib
        import uuid as _uuid

        ident = options.get("queryid") or options.get("checkpointlocation")
        if ident:
            self._query_id = _hashlib.sha256(
                str(ident).encode()
            ).hexdigest()[:16]
        else:
            self._query_id = "run-" + _uuid.uuid4().hex[:16]

    def commit(self, messages, batchId: int) -> None:
        for name in _records(self.path):
            m = _record(self.path, name).get("metrics", {})
            if (
                m.get("stream_batch_id") == batchId
                and m.get("stream_query_id", self._query_id)
                == self._query_id
            ):
                _drop_inflight(self.path, messages)  # replayed batch
                return
        _publish_append(
            self.path,
            messages,
            {
                "writer": "difs-datasource",
                "stream_batch_id": batchId,
                "stream_query_id": self._query_id,
            },
        )

    def abort(self, messages, batchId: int) -> None:
        _drop_inflight(self.path, messages)


class ParquetTableDataSource(DataSource):
    """``spark.read.format("difs")`` over a path-backed table."""

    @classmethod
    def name(cls) -> str:
        return "difs"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("difs source: option 'path' is required")
        version = self.options.get("version")
        plan = _Plan(path, int(version) if version is not None else None)
        if not plan.files:
            raise ValueError(f"difs source: no data files under {path}")
        return from_arrow_schema(pq.read_schema(plan.files[0][1]))

    def reader(self, schema):
        opts = dict(self.options)
        if str(opts.get("pushdown", "")).lower() in ("true", "1"):
            return ParquetTablePushdownReader(opts)
        return ParquetTableReader(opts)

    def streamReader(self, schema):
        return ParquetTableStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool):
        return ParquetTableWriter(dict(self.options), overwrite, schema)

    def streamWriter(self, schema, overwrite: bool):
        return ParquetTableStreamWriter(dict(self.options), overwrite, schema)
