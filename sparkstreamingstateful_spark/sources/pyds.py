"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API) —
the extensibility surface a connector plugin would use (SURVEY.md §2.1's
"source plugin" row): a parquet-directory reader implemented entirely in
Python with REAL split planning, column pruning, and filter pushdown.

This is deliberately a from-scratch connector, not a wrapper over
``spark.read.parquet``: it exists to prove the plumbing a user would need
for a format Spark has no built-in reader for (a proprietary log format,
an object-store manifest, a feature-store API...):

* ``partitions()`` plans one :class:`InputPartition` per (file,
  row-group) — the same split granularity Spark's own parquet scan uses,
  so a 1000-file / 10-row-group-each layout yields 10k independent
  splits that schedule across every executor. No driver-side data read
  happens at planning time (footer metadata only).
* ``pushFilters()`` accepts the simple comparison/``In`` predicates and
  evaluates them INSIDE the reader via Arrow compute expressions (exact
  row-level filtering); anything else is returned to Spark to re-apply.
  Spark drops accepted filters from the plan, so correctness of the
  pushdown contract is H-checked by the registered key's oracle, not
  just eyeballed.
* ``read()`` yields Arrow ``RecordBatch``es (the vectorized fast path —
  no per-row Python), reading ONLY its own row group and ONLY the
  pruned columns.

Scale: the driver holds one footer read per file at planning time and
ships (path, row-group, columns, filters) tuples to executors; memory is
O(one row group) per task regardless of table size.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def _ddl_type(arrow_type) -> str:
    import pyarrow as pa

    if pa.types.is_timestamp(arrow_type):
        return "timestamp"
    try:
        return _ARROW_TO_DDL[str(arrow_type)]
    except KeyError:
        raise ValueError(f"pyds: unmapped arrow type {arrow_type}") from None


class ParquetDirDataSource(DataSource):
    """``spark.read.format("sss_pyparquet").option("path", dir)``.

    Options: ``path`` (required, a directory of ``*.parquet`` files) and
    ``columns`` (optional comma-separated projection — pruning happens at
    the Arrow read, columns never reach the JVM)."""

    @classmethod
    def name(cls) -> str:
        return "sss_pyparquet"

    def _files(self) -> list[str]:
        path = self.options["path"]
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        if not files:
            raise ValueError(f"pyds: no parquet files under {path}")
        return files

    def schema(self) -> str:
        import pyarrow.parquet as pq

        arrow = pq.ParquetFile(self._files()[0]).schema_arrow
        cols = self.options.get("columns")
        names = [c.strip() for c in cols.split(",")] if cols else arrow.names
        return ", ".join(
            f"{n} {_ddl_type(arrow.field(n).type)}" for n in names
        )

    def reader(self, schema) -> DataSourceReader:
        return _ParquetDirReader(self._files(), [f.name for f in schema.fields])


class _ParquetDirReader(DataSourceReader):
    def __init__(self, files: list[str], columns: list[str]) -> None:
        self.files = files
        self.columns = columns
        self.accepted: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep the predicates Arrow can evaluate exactly; give the rest
        back to Spark. Accepted filters MUST be applied in read() — Spark
        removes them from its own plan."""
        for f in filters:
            simple = isinstance(
                f,
                (
                    EqualTo,
                    GreaterThan,
                    GreaterThanOrEqual,
                    LessThan,
                    LessThanOrEqual,
                    In,
                    IsNotNull,
                ),
            )
            # only top-level columns; nested paths go back to Spark
            if simple and len(f.attribute) == 1:
                self.accepted.append(f)
            else:
                yield f

    def _arrow_predicate(self):
        import pyarrow.compute as pc

        expr = None
        for f in self.accepted:
            field = pc.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = field == f.value
            elif isinstance(f, GreaterThan):
                e = field > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = field >= f.value
            elif isinstance(f, LessThan):
                e = field < f.value
            elif isinstance(f, LessThanOrEqual):
                e = field <= f.value
            elif isinstance(f, In):
                # the dataclass field is `value` (a tuple of values) in
                # PySpark 4.1.2, not `values`
                e = field.isin(list(f.value))
            elif isinstance(f, IsNotNull):
                e = field.is_valid()
            else:  # pragma: no cover — pushFilters only accepts the above
                raise AssertionError(f)
            expr = e if expr is None else expr & e
        return expr

    def partitions(self) -> Sequence[InputPartition]:
        import pyarrow.parquet as pq

        # footer metadata only — no data pages are read at planning time.
        # While here, every footer's schema is checked against the first
        # file's: the declared schema came from file 0 alone, and a
        # drifted file would otherwise MIS-READ (wrong types into a
        # fixed DDL), not error.
        parts, first_schema = [], None
        for path in self.files:
            pf = pq.ParquetFile(path)
            if first_schema is None:
                first_schema = pf.schema_arrow
            elif not pf.schema_arrow.equals(first_schema):
                raise ValueError(
                    f"pyds: schema drift in {path} vs {self.files[0]} — "
                    "a parquet directory served by this source must be "
                    "schema-homogeneous"
                )
            parts.extend(
                InputPartition((path, rg))
                for rg in range(pf.metadata.num_row_groups)
            )
        return parts

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        path, rg = partition.value
        table = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
        pred = self._arrow_predicate()
        if pred is not None:
            table = table.filter(pred)
        # declared column order, Arrow batches straight to the JVM
        yield from table.select(self.columns).to_batches()


def list_splits(path: str) -> list[tuple[str, int]]:
    """THE split rule for the streaming source: the sorted (file,
    row-group) list of a schema-homogeneous parquet directory. A single
    definition on purpose — the stream reader plans from it and
    ``stream_python_datasource``'s drain predicate counts it; two
    hand-rolled copies could drift and make the drain stop early or
    never fire."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    splits, first_schema = [], None
    for f in files:
        pf = pq.ParquetFile(f)
        if first_schema is None:
            first_schema = pf.schema_arrow
        elif not pf.schema_arrow.equals(first_schema):
            raise ValueError(
                f"pyds stream: schema drift in {f} vs {files[0]} — "
                "a parquet directory served by this source must be "
                "schema-homogeneous"
            )
        splits.extend((f, rg) for rg in range(pf.metadata.num_row_groups))
    if not splits:
        raise ValueError(f"pyds stream: no parquet splits under {path}")
    return splits


class ParquetDirStreamDataSource(DataSource):
    """Streaming twin of :class:`ParquetDirDataSource` — a custom
    micro-batch source with REAL offset management, the contract every
    connector plugin (Kafka-like, log-tail, CDC feed) must honor:

    * The offset is an index into the directory's ordered (file,
      row-group) split list; ``latestOffset()`` advances it by
      ``splits_per_batch`` per micro-batch, so a K-split layout replays
      as ⌈K / splits_per_batch⌉ micro-batches.
    * ``partitions(start, end)`` plans one :class:`InputPartition` per
      split in the offset range — reads happen on EXECUTORS (unlike the
      driver-side ``SimpleDataSourceStreamReader`` shortcut), O(one row
      group) of memory per task.
    * Replay determinism: the split list is sorted and immutable for a
      given directory, so re-reading any offset range after a restart
      yields identical rows — that plus the checkpoint's offset log is
      what makes the source exactly-once (pinned by
      tests/test_pyds.py::test_stream_source_replay_deterministic).

    Options: ``path`` (required), ``columns`` (optional projection),
    ``splits_per_batch`` (default 1)."""

    @classmethod
    def name(cls) -> str:
        return "sss_pyparquet_stream"

    def schema(self) -> str:
        return ParquetDirDataSource(dict(self.options)).schema()

    def streamReader(self, schema):
        return _ParquetDirStreamReader(
            list_splits(self.options["path"]),
            [f.name for f in schema.fields],
            int(self.options.get("splits_per_batch", "1")),
        )


class _ParquetDirStreamReader(DataSourceStreamReader):
    """Subclassing matters: the plan worker dispatches batch-vs-stream
    reads on ``isinstance(reader, DataSourceStreamReader)`` — a
    duck-typed reader gets called as a BATCH reader (measured:
    ``partitions()`` invoked with no offset arguments)."""

    def __init__(
        self, splits: list[tuple[str, int]], columns: list[str], per_batch: int
    ) -> None:
        self.splits = splits
        self.columns = columns
        self.per_batch = max(1, per_batch)
        self._pos = 0  # rate-limit cursor, lives for the query's lifetime

    def initialOffset(self) -> dict:
        return {"split": 0}

    def latestOffset(self) -> dict:
        # ``latestOffset`` doubles as the rate limiter (the Python source
        # API has no admission-control hook): advance at most
        # ``per_batch`` splits per call, so a K-split layout genuinely
        # replays as ⌈K/per_batch⌉ micro-batches instead of one. A
        # file-tail source would re-list the directory here; this layout
        # is immutable, so the cursor walks the known split list. NOTE:
        # the cursor restarts at 0 with the reader object — resuming an
        # EXISTING checkpoint mid-stream would briefly report latest <
        # committed until the cursor catches up; registered keys always
        # run a fresh checkpoint (runner.py), where this is unreachable.
        self._pos = min(self._pos + self.per_batch, len(self.splits))
        return {"split": self._pos}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            InputPartition((*self.splits[i], i))
            for i in range(start["split"], end["split"])
        ]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        path, rg, _ = partition.value
        table = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
        yield from table.select(self.columns).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint's offset log

    def stop(self) -> None:
        pass


class JsonlSinkDataSource(DataSource):
    """Custom Python data source WRITER — the sink half of the connector
    plugin surface, with the two-phase commit protocol every exactly-once
    sink needs:

    * Each task streams its partition's Arrow batches
      (:class:`DataSourceArrowWriter` — no per-row Python) into a
      ``_tmp_<uuid>.jsonl`` file and returns a commit message naming it.
    * ``commit()`` (driver, all tasks succeeded) renames every temp file
      to its final ``part-*.jsonl`` name and writes a ``_SUCCESS``
      manifest listing parts + row counts — a reader that requires
      ``_SUCCESS`` never observes a half-written directory, and a failed
      speculative/retried task's orphan temp file is never promoted.
    * ``abort()`` (any task failed) deletes the temp files.

    JSON-lines output: the interchange format the corpus pipelines here
    ingest from (scan_json); floats serialize via Python repr
    (shortest-roundtrip), so a read-back is value-exact for the
    long/double/string columns the H-check aggregates. Known limit:
    non-finite doubles (NaN/±inf) have no JSON representation —
    ``json.dumps`` would emit bare ``NaN`` tokens Spark's reader treats
    as corrupt records; route such columns through parquet/ORC."""

    @classmethod
    def name(cls) -> str:
        return "sss_jsonl"

    def writer(self, schema, overwrite: bool):
        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        if overwrite:
            # the .jsonl suffix also matches _tmp_*.jsonl orphans from a
            # crashed prior run (never promoted, but never welcome)
            for f in os.listdir(path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    os.remove(os.path.join(path, f))
        return _JsonlWriter(path)

    def streamWriter(self, schema, overwrite: bool):
        """STREAMING sink flavor (``df.writeStream.format("sss_jsonl")``):
        same per-task temp-file protocol, but commit is per MICRO-BATCH
        and must be IDEMPOTENT — after a failure between the sink commit
        and the checkpoint write, Spark re-runs the batch and calls
        ``commit`` again with the same batchId. The ``_COMMITTED`` log
        (one line per committed batch) makes the replay a no-op: temps
        of an already-committed batch are discarded instead of promoted,
        so downstream readers never see duplicated rows — the
        exactly-once contract every real streaming sink (Kafka
        transactional producer, Delta commit log) implements."""
        path = self.options["path"]
        os.makedirs(path, exist_ok=True)
        return _JsonlStreamWriter(path)


class _JsonlWriter(DataSourceArrowWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, batches) -> "WriterCommitMessage":
        import json
        import uuid

        tmp_name = f"_tmp_{uuid.uuid4().hex}.jsonl"
        n = 0
        # Serialization is deliberately per-row json.dumps, not
        # pandas.to_json: the sink's contract is VALUE-EXACT read-back
        # of doubles, which needs shortest-roundtrip float repr —
        # json.dumps uses repr (up to 17 significant digits as needed);
        # pandas.to_json caps double_precision at 15, which corrupts
        # doubles whose roundtrip needs 16–17 (e.g. 0.1+0.2). The loop
        # is batched per Arrow batch via writelines over a generator, so
        # the I/O layer stays buffered even though encoding is per-row.
        with open(os.path.join(self.path, tmp_name), "w") as f:
            for batch in batches:
                rows = batch.to_pylist()  # plain dicts from Arrow
                f.writelines(
                    json.dumps(row, separators=(",", ":")) + "\n" for row in rows
                )
                n += len(rows)
        msg = WriterCommitMessage()
        msg.tmp_name, msg.rows = tmp_name, n
        return msg

    def commit(self, messages) -> None:
        import json

        parts = []
        for i, m in enumerate(m for m in messages if m is not None):
            final = f"part-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            parts.append({"file": final, "rows": m.rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"parts": parts}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass


class _JsonlStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def _committed(self) -> set[int]:
        log = os.path.join(self.path, "_COMMITTED")
        if not os.path.exists(log):
            return set()
        with open(log) as f:
            return {int(line) for line in f if line.strip()}

    def write(self, batches) -> "WriterCommitMessage":
        # identical temp-file protocol to the batch writer
        return _JsonlWriter(self.path).write(batches)

    def commit(self, messages, batchId: int) -> None:
        msgs = [m for m in messages if m is not None]
        if batchId in self._committed():
            # replayed micro-batch: the previous attempt's output is
            # already visible — discard this attempt's temps (promoting
            # them would double every row of the batch)
            for m in msgs:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass
            return
        # Uncommitted batchId with leftover promoted parts = a prior
        # attempt crashed MID-promotion (renamed some parts, never
        # logged). The replay may produce fewer/different part counts
        # (task scheduling isn't deterministic), and os.replace only
        # overwrites matching indices — orphans at higher indices would
        # silently duplicate their rows. Clear the batch's slate first.
        import glob

        for orphan in glob.glob(
            os.path.join(self.path, f"batch-{batchId:05d}-part-*.jsonl")
        ):
            try:
                os.remove(orphan)
            except OSError:
                pass
        for i, m in enumerate(msgs):
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"batch-{batchId:05d}-part-{i:05d}.jsonl"),
            )
        # log AFTER promotion: a crash between rename and log replays the
        # batch, sees no log entry, and re-promotes — the renames are
        # per-file atomic and replayed temps carry fresh names, so the
        # worst case is the window Spark itself owns (commit-then-crash
        # before checkpoint), which the log turns into a no-op
        with open(os.path.join(self.path, "_COMMITTED"), "a") as f:
            f.write(f"{batchId}\n")

    def abort(self, messages, batchId: int) -> None:
        _JsonlWriter(self.path).abort(messages)


def register(spark) -> None:
    """Idempotent per-session registration. Python-side filter pushdown
    ships disabled by default (Spark 4.1) and a reader implementing
    ``pushFilters`` refuses to plan without it — opt in explicitly (a
    runtime SQL conf, safe on a plain driver session). Idempotence rides
    on a session conf marker, NOT ``id(spark)``: a stopped session's id
    can be reused by a brand-new one (CPython id recycling), which would
    silently skip registration; the conf dies with the session, so the
    marker can never outlive it."""
    if spark.conf.get("spark.sss.pyds.registered", None) != "true":
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(ParquetDirDataSource)
        spark.dataSource.register(ParquetDirStreamDataSource)
        spark.dataSource.register(JsonlSinkDataSource)
        spark.conf.set("spark.sss.pyds.registered", "true")
