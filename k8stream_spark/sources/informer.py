"""S1/S2 production shape — a custom PySpark streaming DataSource that
models the reference's informer contract (reference main.go:77-94):

  * initial LIST: on start, every row already in the watched spool is
    delivered once (informer cache sync, main.go:91-94);
  * WATCH: rows appended after an offset are delivered incrementally —
    exactly once per offset range, replayable from the checkpoint;
  * RESYNC: every ``resyncInterval`` seconds (config.go:19-23, default
    120) the full known state is re-delivered, like the shared informer
    factory re-firing OnUpdate for every cached object.  Downstream
    dedup (D1/D2) is what makes resync safe — the same contract the
    reference relies on (handler.go:142-151).

The "API server" here is a spool directory of JSON-lines files (the
container has no kube-apiserver); the DataSource machinery — offsets,
deterministic partition planning, executor-side reads, checkpoint replay
— is the production-real part.  Swapping the spool scan for real watch
bookmarks keeps every interface identical.

Scale posture: ``latestOffset``/``partitions`` run on the driver and
touch only file names + line counts; row parsing happens in ``read``
on executors, one partition per (file, row-range) — the source
parallelizes across files exactly like Spark's own file stream source.

Delivery is at-least-once across resync boundaries by design (resync
re-delivers), mirroring the reference's at-least-once contract
(README.md:73-81).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Iterator, Sequence
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType, TimestampNTZType

DEFAULT_RESYNC_INTERVAL = 120  # reference config.go:8 DEFAULT_RESYNC_INTERVAL


def _schema_for(kind: str) -> StructType:
    from k8stream_spark.schemas import K8S_EVENT_SCHEMA, K8S_SERVICE_SCHEMA

    if kind == "service":
        return K8S_SERVICE_SCHEMA
    return K8S_EVENT_SCHEMA


#: Byte-offset checkpoint stride (rows): the driver-side count pass
#: already reads every line, so it records the byte offset of every
#: OFFSET_STRIDE-th non-blank row for free; executor slices then seek
#: to the nearest checkpoint <= their start instead of skip-scanning
#: from line 0 (which multiplied total I/O by O(N/2) per slice on the
#: split single-huge-file initial-LIST case — r9 advice).
OFFSET_STRIDE = 1024


class _RangePartition(InputPartition):
    """One (file, row-range) slice; ``relist`` marks resync re-delivery.
    ``seek_row``/``seek_byte`` (annotated by ``_repack`` from the
    driver's offset index) let the executor seek near ``start`` and
    skip-scan at most OFFSET_STRIDE-1 lines."""

    def __init__(self, path: str, start: int, end: int, relist: bool):
        self.path = path
        self.start = start
        self.end = end
        self.relist = relist
        self.seek_row = 0
        self.seek_byte = 0
        self.end_byte = 0  # exclusive; 0 = read to EOF


class _SpoolSlices(InputPartition):
    """Several (file, row-range) slices delivered by ONE task.  The
    measured informer overhead is fixed per-partition Python worker
    startup (SCALE.md), so many tiny per-file slices — the steady-state
    spool shape — are packed together instead of paying that cost per
    file."""

    def __init__(self, slices: list[_RangePartition]):
        self.slices = slices


class InformerStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("k8s_informer source requires option 'path'")
        self._resync_s = int(
            options.get("resyncinterval", options.get("resyncInterval", 0))
        )
        self._mode = str(options.get("mode", "permissive")).lower()
        # Task sizing (r8 verdict item 7): split oversized ranges for
        # parallelism, pack small ones to amortize per-partition Python
        # worker startup — the measured fixed cost behind the informer
        # vs file-source gap.  0 disables repacking (one task per raw
        # range, the pre-r9 behavior).
        self._rows_per_part = int(
            options.get(
                "rowsperpartition", options.get("rowsPerPartition", 16384)
            )
        )
        # Parallelism floor for packing (r10): rowsPerPartition is a
        # CEILING on task size; packing all the way up to it can
        # collapse a batch to fewer tasks than the cluster has cores
        # (100k rows / 16384 = 6 tasks on 32 cores — measured ~15%
        # SLOWER than unpacked in the r10 sweep, both code versions).
        # Packing therefore never sizes tasks above total/minTasks.
        # Default 64 = 2× the local core count; on a cluster set to
        # ~2-3× total executor cores.
        self._min_tasks = max(
            1,
            int(options.get("mintasks", options.get("minTasks", 64))),
        )
        # (path → (size, mtime_ns, count, sig, byte_offsets)) so
        # unchanged files are not re-read on every trigger
        # (driver-side; checkpointed offsets stay pure [count, sig] —
        # the byte index is a cache, rebuilt for free on restart by
        # the next count pass, never serialized into the offset JSON).
        self._count_cache: dict[
            str, tuple[int, int, int, str, list[int]]
        ] = {}
        from pyspark.sql.types import StringType

        # Per-field coercion kind: "ts" normalizes to naive-UTC
        # datetimes, "str" stringifies non-string JSON values (the
        # ArrowInvalid guard), "raw" passes through untouched — map/
        # struct fields MUST stay raw or Spark's row-path converters
        # reject the stringified value (convert_map asserts dict).
        def _kind(dt):
            if isinstance(dt, TimestampNTZType):
                return "ts"
            if isinstance(dt, StringType):
                return "str"
            return "raw"

        self._fields = [(f.name, _kind(f.dataType)) for f in schema.fields]

        # Arrow fast path eligibility (see read()): only all-string/
        # all-ntz schemas build clean columnar batches; map columns
        # stay on the row path.
        self._all_simple = all(
            isinstance(f.dataType, (StringType, TimestampNTZType))
            for f in schema.fields
        )

    def _gen(self) -> int:
        """Resync generation derived from the wall clock
        (floor(now / resyncInterval)): epoch-anchored, so it needs no
        reader-side state and survives restarts — a checkpointed offset
        from any prior run compares correctly against a fresh reader.
        (A counter held in reader memory would reset on restart and
        silently suppress resyncs until it re-exceeded the checkpointed
        value.)"""
        if self._resync_s <= 0:
            return 0
        return int(time.time() // self._resync_s)

    # -- driver side -------------------------------------------------------
    def initialOffset(self) -> dict:
        # Empty counts → the first latestOffset delivers everything
        # currently in the spool: the informer's initial LIST/sync.
        # Starting at the CURRENT generation means the initial sync is
        # not also counted as a resync.
        return {"files": {}, "resync_gen": self._gen()}

    def latestOffset(self) -> dict:
        counts: dict[str, list] = {}
        if os.path.isdir(self._path):
            for name in sorted(os.listdir(self._path)):
                if name.startswith(".") or name.startswith("_"):
                    continue
                full = os.path.join(self._path, name)
                if not os.path.isfile(full):
                    continue
                st = os.stat(full)
                cached = self._count_cache.get(full)
                if cached and cached[0] == st.st_size and cached[1] == st.st_mtime_ns:
                    counts[full] = [cached[2], cached[3]]
                    continue
                n = 0
                first = b""
                pos = 0
                offs: list[int] = []
                with open(full, "rb") as fh:
                    for line in fh:
                        if line.strip():
                            if n == 0:
                                first = line
                            if n % OFFSET_STRIDE == 0:
                                offs.append(pos)
                            n += 1
                        pos += len(line)
                # File identity = inode + first-line hash.  A rotation
                # (rename-over / recreate) changes the inode; an in-place
                # truncate+rewrite usually changes the first line.  A
                # rewrite that keeps BOTH while growing past the old count
                # is indistinguishable from an append without hashing the
                # whole file every trigger — accepted residual, and it
                # errs toward under- not over-delivery only in that case.
                sig = "%x:%s" % (
                    st.st_ino,
                    hashlib.md5(first).hexdigest()[:12] if first else "empty",
                )
                self._count_cache[full] = (
                    st.st_size, st.st_mtime_ns, n, sig, offs
                )
                counts[full] = [n, sig]
        return {"files": counts, "resync_gen": self._gen()}

    @staticmethod
    def _entry(files: dict, path: str) -> tuple[int, str | None]:
        """Normalize an offset entry: new offsets store [count, sig],
        checkpoints written before the identity signature store a bare
        int (sig unknown → None, count-only comparison)."""
        v = files.get(path, 0)
        if isinstance(v, (list, tuple)):
            return int(v[0]), v[1]
        return int(v), None

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for path in end["files"]:
            end_n, end_sig = self._entry(end["files"], path)
            known = path in start["files"]
            start_n, start_sig = (
                self._entry(start["files"], path) if known else (0, None)
            )
            rotated = (
                known
                and start_sig is not None
                and end_sig is not None
                and start_sig != end_sig
            )
            if rotated and end_n > 0:
                # The file was REPLACED (inode or first line changed):
                # the checkpointed line count describes the old content,
                # so deliver the new content from line 0 even when it
                # already has >= the old count — the case a pure count
                # comparison silently swallows.  Duplicates (old lines
                # re-read if the prefix happens to match) resolve
                # downstream, same as resync: at-least-once.
                parts.append(_RangePartition(path, 0, end_n, False))
            elif end_n > start_n:
                parts.append(_RangePartition(path, start_n, end_n, False))
            elif 0 < end_n < start_n:
                # The file SHRANK under a signature-less (pre-upgrade)
                # checkpoint: truncated/rotated in place, the stale count
                # no longer describes this content — deliver from line 0.
                parts.append(_RangePartition(path, 0, end_n, False))
        if end["resync_gen"] > start["resync_gen"]:
            # RESYNC: re-deliver the full known state (OnUpdate for every
            # cached object).  Overlap with the incremental slices above
            # is deliberate — at-least-once, resolved by downstream dedup.
            for path in end["files"]:
                end_n, _ = self._entry(end["files"], path)
                if end_n > 0:
                    parts.append(_RangePartition(path, 0, end_n, True))
        return self._repack(parts)

    def _repack(
        self, parts: list[_RangePartition]
    ) -> list[InputPartition]:
        """Size tasks to ~``rowsPerPartition`` rows: split oversized
        ranges (the initial-LIST single-huge-file case would otherwise
        serialize on one task) and pack small ones (the steady-state
        many-tiny-appends case would otherwise pay Python worker
        startup per file).  Deterministic given the same range list —
        the checkpoint-replay contract ``partitions`` already pins.
        Single-range groups stay plain ``_RangePartition``.

        ``rowsPerPartition`` is a size CEILING, not the sizing goal:
        the effective target is additionally clamped to
        ``total_rows // minTasks`` (bounded below by OFFSET_STRIDE so
        tasks never shrink under the seek-checkpoint stride), keeping
        at least ~minTasks tasks whenever the batch has the rows for
        it — packing a 100k-row batch into 16384-row tasks left a
        32-core box 80% idle (6 tasks, measured ~15% slower than
        unpacked); the floor packs/splits the same batch into ~64
        balanced tasks instead while the 10 GB-file ceiling bound is
        unchanged."""
        target = self._rows_per_part
        if target <= 0:
            return [self._annotate_seek(p) for p in parts]
        total = sum(p.end - p.start for p in parts)
        target = min(
            target, max(OFFSET_STRIDE, total // self._min_tasks)
        )
        split: list[_RangePartition] = []
        for p in parts:
            if p.end - p.start <= target:
                split.append(self._annotate_seek(p))
            else:
                s = p.start
                while s < p.end:
                    e = min(s + target, p.end)
                    split.append(
                        self._annotate_seek(
                            _RangePartition(p.path, s, e, p.relist)
                        )
                    )
                    s = e
        packed: list[InputPartition] = []
        cur: list[_RangePartition] = []
        cur_rows = 0
        for p in split:
            rows = p.end - p.start
            if cur and cur_rows + rows > target:
                packed.append(cur[0] if len(cur) == 1 else _SpoolSlices(cur))
                cur, cur_rows = [], 0
            cur.append(p)
            cur_rows += rows
        if cur:
            packed.append(cur[0] if len(cur) == 1 else _SpoolSlices(cur))
        return packed

    def _annotate_seek(self, p: _RangePartition) -> _RangePartition:
        """Attach the nearest byte-offset checkpoint <= ``p.start`` from
        the driver's count-pass index.  Safe for the append-only spool
        contract: earlier rows' byte offsets never move on append, and
        the rotation/rewrite cases are already delivered from row 0
        (seek_row stays 0).  A missing index (reader restart before the
        next count pass) degrades to the old skip-scan, never to wrong
        rows."""
        cached = self._count_cache.get(p.path)
        offs = cached[4] if cached and len(cached) > 4 else None
        if offs:
            if p.start > 0:
                k = min(p.start // OFFSET_STRIDE, len(offs) - 1)
                p.seek_row = k * OFFSET_STRIDE
                p.seek_byte = offs[k]
            # Exclusive END byte for the vectorized parse: offs[m] is
            # the start of row m*STRIDE >= p.end, so [seek_byte, offs[m])
            # covers the slice exactly; past the index -> EOF sentinel
            # (the row-slice take bound still caps delivery at p.end).
            m = (p.end + OFFSET_STRIDE - 1) // OFFSET_STRIDE
            if m < len(offs):
                p.end_byte = offs[m]
        return p

    def commit(self, end: dict) -> None:
        pass

    # -- executor side -----------------------------------------------------
    def read(self, partition: InputPartition) -> Iterator:
        """Deliver the partition's line range(s) — a single
        ``_RangePartition`` or a packed ``_SpoolSlices`` group.  Fast
        path: yield Arrow RecordBatches (Spark 4 Python data sources
        accept them) instead of per-row pickled tuples.  Honest
        accounting (SCALE.md): Arrow removed the row-at-a-time boundary
        cost but most of the informer-vs-file-source gap is fixed
        per-partition Python worker startup and driver-side offset
        planning — hence ``_repack``'s task sizing.  Falls back to row
        tuples when the schema has non-string/non-timestamp fields (the
        service schema's map columns) or pyarrow is unavailable."""
        ranges = (
            partition.slices
            if isinstance(partition, _SpoolSlices)
            else [partition]
        )
        if self._arrow_schema() is not None:
            return self._read_arrow(ranges)

        def rows() -> Iterator[tuple]:
            for r in ranges:
                yield from self._read_rows(r)

        return rows()

    def _arrow_schema(self):
        """pyarrow schema when every source field is string or
        TimestampNTZ (``self._all_simple``, recorded at init from the
        real Spark schema); None otherwise — map-typed columns (the
        service schema) take the row path."""
        if not self._all_simple:
            return None
        try:
            import pyarrow as pa
        except ImportError:  # pragma: no cover - pyarrow is baked in
            return None
        return pa.schema(
            [
                pa.field(
                    name, pa.timestamp("us") if kind == "ts" else pa.string()
                )
                for name, kind in self._fields
            ]
        )

    def _read_arrow(self, ranges: list[_RangePartition]) -> Iterator:
        import pyarrow as pa

        schema = self._arrow_schema()
        batch_rows = 4096
        cols: list[list] = [[] for _ in self._fields]
        n = 0
        # Batches accumulate ACROSS the packed ranges — many tiny files
        # still produce full-size Arrow batches.
        for partition in ranges:
            fast = self._read_range_fast(partition, schema)
            if fast is not None:
                # Flush any accumulated row-path rows first so delivery
                # order stays range order.
                if n:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(c, type=f.type)
                            for c, f in zip(cols, schema)
                        ],
                        schema=schema,
                    )
                    cols = [[] for _ in self._fields]
                    n = 0
                yield from fast.to_batches(max_chunksize=8192)
                continue
            for row in self._read_rows(partition):
                for i, v in enumerate(row):
                    cols[i].append(v)
                n += 1
                if n >= batch_rows:
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(c, type=f.type)
                            for c, f in zip(cols, schema)
                        ],
                        schema=schema,
                    )
                    cols = [[] for _ in self._fields]
                    n = 0
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                schema=schema,
            )

    def _read_range_fast(self, p: _RangePartition, schema):
        """Vectorized NDJSON parse of one range: slice the file at the
        driver-recorded byte bounds and hand the bytes to pyarrow's
        C++ line-delimited JSON reader with the EXPLICIT Arrow schema —
        measured 25× faster than the per-line ``json.loads`` loop on
        the 100k-row sf0.1 spool (0.62 s → 0.025 s parse).

        Semantics are pinned to the row path by construction — every
        divergence ERRORS and returns None, falling back to
        ``_read_rows`` for this range with full permissive behavior:
        malformed lines, JSON numbers/bools/objects in string fields
        (``_coerce``'s json-text rendering), epoch-number timestamps,
        duplicate keys (json.loads keeps the last; pa.json refuses).
        What the C++ reader handles IDENTICALLY (probed, r10): blank
        lines skipped like the non-blank offset counting, missing
        fields → null, extra fields ignored, ISO timestamps with 'Z' /
        numeric offsets converted to naive UTC exactly like
        ``_coerce``.  The rename-over race uses the same 1-byte
        newline-alignment guard as the seek path; misalignment or a
        row-count shortfall (file changed under the index) degrades to
        the row path, never to wrong rows."""
        try:
            import pyarrow as pa
            import pyarrow.json as pj
        except ImportError:  # pragma: no cover - pyarrow is baked in
            return None
        seek_row = getattr(p, "seek_row", 0)
        seek_byte = getattr(p, "seek_byte", 0)
        end_byte = getattr(p, "end_byte", 0)
        skip = p.start - seek_row
        take = p.end - p.start
        if skip < 0 or take <= 0:
            return None
        try:
            with open(p.path, "rb") as fh:
                if seek_byte > 0:
                    fh.seek(seek_byte - 1)
                    if fh.read(1) != b"\n":
                        return None  # index describes replaced content
                data = (
                    fh.read(end_byte - seek_byte)
                    if end_byte > seek_byte
                    else fh.read()
                )
        except OSError:
            return None
        if not data:
            return None
        try:
            tbl = pj.read_json(
                pa.BufferReader(data),
                parse_options=pj.ParseOptions(
                    explicit_schema=schema,
                    unexpected_field_behavior="ignore",
                ),
            )
        except Exception:
            return None
        if tbl.num_rows < skip + take:
            return None
        return tbl.slice(skip, take)

    def _read_rows(self, partition: _RangePartition) -> Iterator[tuple]:
        permissive = self._mode != "failfast"
        # Binary mode so the seek target (a byte offset recorded by the
        # driver's binary count pass) is exact; json.loads accepts
        # UTF-8 bytes directly.  seek_row/seek_byte default to 0 —
        # checkpoints recorded at most OFFSET_STRIDE rows before
        # ``start``, so the skip-scan below is bounded, not O(file).
        with open(partition.path, "rb") as fh:
            idx = getattr(partition, "seek_row", 0)
            if idx:
                seek_byte = getattr(partition, "seek_byte", 0)
                # Alignment guard: the offset index was recorded
                # against the file identity seen at latestOffset(); if
                # the path was renamed-over between planning and this
                # task, the byte offset can land MID-LINE in the new
                # content — which would silently shift every row in
                # the slice off-by-one (the old skip-scan delivered
                # wrong-but-aligned rows in the same rotation race,
                # redelivered from 0 on the next trigger's sig check).
                # A checkpointed offset is always preceded by '\n', so
                # one 1-byte read detects the mismatch and degrades to
                # the line-0 scan instead of misaligned rows.
                aligned = False
                if seek_byte > 0:
                    fh.seek(seek_byte - 1)
                    aligned = fh.read(1) == b"\n"
                if aligned:
                    fh.seek(seek_byte)
                else:
                    fh.seek(0)
                    idx = 0
            for line in fh:
                if not line.strip():
                    continue
                if idx >= partition.end:
                    break
                if idx >= partition.start:
                    try:
                        obj = json.loads(line)
                    except ValueError:
                        if permissive:
                            # PERMISSIVE parity with the JSON file source:
                            # a malformed line must not kill the stream.
                            # Offsets count non-blank lines (same rule as
                            # latestOffset), so the skipped line still
                            # advances idx to keep ranges aligned.
                            idx += 1
                            continue
                        raise
                    yield tuple(
                        _coerce(obj.get(name), kind)
                        for name, kind in self._fields
                    )
                idx += 1


def _coerce(value, kind: str):
    """Per-field-kind value normalization.

    ``"ts"``: epoch seconds / ISO strings → NAIVE UTC datetimes — the
    schema is TimestampNTZ, and a tz-aware value (ISO '...Z' or
    '+02:00') would error or shift with the session timezone.

    ``"str"``: always yield str-or-None — a syntactically valid line
    whose string field holds a JSON number/bool/object would otherwise
    raise ArrowInvalid on the fast path (``pa.array(..., pa.string())``)
    and kill the stream even in permissive mode, a harder failure than
    the documented malformed-line tolerance.  Non-string values render
    as their JSON text (5 → "5", true → "true", {...} → '{"..."}'),
    which keeps the downstream permissive ``from_json`` decode
    (ops/project.py) working on nested objects.

    ``"raw"`` (map/struct fields, row path only): untouched — Spark's
    row-path converters expect the native shape (convert_map asserts
    the value is a dict)."""
    if value is None:
        return None
    if kind == "str":
        return value if isinstance(value, str) else json.dumps(value)
    if kind == "raw":
        return value
    if isinstance(value, (int, float)):
        return datetime.fromtimestamp(value, tz=timezone.utc).replace(
            tzinfo=None
        )
    ts = datetime.fromisoformat(str(value))
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return ts


class K8sInformerDataSource(DataSource):
    """``spark.readStream.format("k8s_informer")`` — options:

    * ``path`` (required): spool directory of JSON-lines files;
    * ``kind``: ``event`` (default) | ``service`` — picks the schema;
    * ``resyncInterval``: seconds between full re-lists, 0 disables
      (reference default 120, config.go:8).
    """

    @classmethod
    def name(cls) -> str:
        return "k8s_informer"

    def schema(self) -> StructType:
        return _schema_for(self.options.get("kind", "event"))

    def streamReader(self, schema: StructType) -> InformerStreamReader:
        return InformerStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotently register the informer source with the session."""
    spark.dataSource.register(K8sInformerDataSource)


def informer_stream(
    spark,
    source_dir: str,
    kind: str = "event",
    resync_interval: int = 0,
    rows_per_partition: int | None = None,
):
    """readStream DataFrame over the informer source — drop-in for the
    file-stream builders in streaming/pipeline.py.
    ``rows_per_partition`` overrides the task-sizing target (see
    ``_repack``); None keeps the source default."""
    register(spark)
    reader = (
        spark.readStream.format("k8s_informer")
        .option("path", source_dir)
        .option("kind", kind)
        .option("resyncInterval", str(resync_interval))
    )
    if rows_per_partition is not None:
        reader = reader.option("rowsPerPartition", str(rows_per_partition))
    return reader.load()
