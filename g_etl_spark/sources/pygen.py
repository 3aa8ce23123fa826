"""Python Data Source API (Spark 4) — a deterministic distributed
row GENERATOR with filter pushdown, the registry's gateable example
of the `pyspark.sql.datasource` surface (the same mechanism a real
REST/paginated connector would ship on: partitions = shards/pages,
pushFilters = server-side predicates).

The generated rows are pure arithmetic on the row id (md5-derived),
so a SQL engine can replay them exactly — q434 hash-gates a scan
through this source against DuckDB over range().

Reference parity: the reference's pluggable source plugins
(/root/reference/src/g_etl/plugins/wfs.py:69-201 pagination, tested
here via sources/wfs.py) fetch pages imperatively; this is the
Spark-native shape — each page/shard is an InputPartition read in
parallel on executors, and predicates the backend can evaluate are
consumed in pushFilters instead of post-scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

GEN_SCHEMA = "id bigint, v bigint, cat string"


def gen_row(i: int) -> tuple[int, int, str]:
    """The row at id `i` — md5-derived so DuckDB replays it exactly:
    h = first 8 hex chars of md5(str(i)); v = h % 1000;
    cat = 'cat' || h % 7."""
    h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    return (i, h % 1000, f"cat{h % 7}")


class GenShard(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class GenReader(DataSourceReader):
    """Shards [0, rows) into `parts` ranges; consumes id-range
    predicates in pushFilters so fully-excluded shards are never
    scheduled (partition pruning inside the Python source)."""

    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.nparts = int(options.get("parts", 8))
        self.lo, self.hi = 0, self.n

    def pushFilters(self, filters):
        # Reset to the full range first: pushFilters folds the CURRENT
        # scan's predicate list only. Without this, a reader instance
        # reused across scans (or a second pushFilters call on the same
        # instance) would keep previously-consumed bounds and over-prune.
        self.lo, self.hi = 0, self.n
        rest = []
        for f in filters:
            if getattr(f, "attribute", None) == ("id",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            rest.append(f)
        return rest

    def partitions(self):
        step = max(1, self.n // self.nparts)
        out = []
        for s in range(0, self.n, step):
            e = min(self.n, s + step)
            if e > self.lo and s < self.hi:
                out.append(GenShard(max(s, self.lo), min(e, self.hi)))
        return out

    def read(self, part: GenShard):
        for i in range(part.start, part.end):
            yield gen_row(i)


class GenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "g_etl_gen"

    def schema(self) -> str:
        return GEN_SCHEMA

    def reader(self, schema):
        return GenReader(self.options)


def register(spark) -> None:
    """Idempotently register the source and enable Python filter
    pushdown on the session (runtime-settable SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GenSource)


# ---- JSONL writer: the sink half of the Python Data Source API ---------
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class JsonlCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonlWriter(DataSourceWriter):
    """Executor-parallel JSONL sink: each task writes one shard file
    (task-unique name — idempotent under retries because commit()
    publishes ONLY the shard list the successful attempt returns,
    into a manifest the reader side treats as the source of truth,
    exactly Spark's own _SUCCESS/commit-protocol shape)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl writer requires a 'path' option")
        # Honored in commit(): overwrite swaps the published shard set
        # atomically-at-the-manifest AND clears superseded part files,
        # so directory globs agree with the manifest. Clearing must NOT
        # happen here — __init__ runs before any task succeeds, and a
        # failed overwrite job must leave the previous publish intact.
        self.overwrite = bool(overwrite)

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(shard, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True,
                                   default=str) + "\n")
                n += 1
        return JsonlCommit(path=shard, n_rows=n)

    def commit(self, messages):
        new_shards = sorted(m.path for m in messages if m is not None)
        manifest = {
            "shards": new_shards,
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        if self.overwrite:
            # Publish-then-clear: once the new manifest is durable, drop
            # every part file it does not own (prior publishes and any
            # orphans), so .mode('overwrite') is a real directory-level
            # replace, not an append hidden behind the manifest.
            import glob

            keep = set(new_shards)
            for p in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if p not in keep:
                    try:
                        os.remove(p)
                    except OSError:
                        pass

    def abort(self, messages):
        # Spark's contract passes None for each FAILED task's message —
        # and abort only runs when at least one task failed, so None
        # entries are the norm here, not the exception. Remove only the
        # shards that successful tasks reported; the failed task's torn
        # file (if any) was never reported and is invisible to the
        # manifest-gated reader regardless.
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "g_etl_jsonl"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSink)


# ---- streaming source: paginated backfill across restarts --------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


class GenPageStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked paginated stream over the same deterministic
    generator rows: each read() serves ONE page and advances the
    offset — PythonMicroBatchStream doesn't implement AvailableNow,
    so trigger(availableNow=True) falls back to SINGLE-BATCH
    execution (engine-logged) and one restart drains exactly one
    page; the engine's checkpoint replays `readBetweenOffsets`
    exactly on recovery, so a multi-restart backfill is
    exactly-once by construction (q436's gate)."""

    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.page = int(options.get("page", 250))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        s = int(start["pos"])
        e = min(self.n, s + self.page)
        return iter([gen_row(i) for i in range(s, e)]), {"pos": e}

    def readBetweenOffsets(self, start, end):
        return iter(
            [gen_row(i) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class GenStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "g_etl_pages"

    def schema(self) -> str:
        return GEN_SCHEMA

    def simpleStreamReader(self, schema):
        return GenPageStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(GenStreamSource)
