"""S5 as a FIRST-CLASS Spark source: the paginated/partitioned REST
scan re-expressed on Spark 4's Python Data Source API
(``pyspark.sql.datasource``), so a listing API mounts like any other
format::

    spark.dataSource.register(RestPagesDataSource)
    df = (spark.read.format("rest_pages")
          .option("n_shards", "8").option("n_items", "1000")
          .load())

Why this is the right shape at scale (vs the helper functions in
``ingest.py``): the planner owns the parallelism. ``partitions()``
declares one input split per API shard, each executor task walks ONLY
its shard's page chain, and the rows enter the plan as a normal scan —
column pruning, limits, and downstream shuffles all compose. The
driver never holds the listing in memory (``paginated_scan``
accumulates driver-side, acceptable only for control-plane listings).

The HTTP transport itself is a seam, same policy as the reference's
Graph/Blob clients (citation:28-45 follows @odata.nextLink): this
container has no network, so the default transport is a DETERMINISTIC
synthetic pager (md5-derived names, fixed page size) generated
inside the reader — the partitioning, cursor walk, schema, and
pickling boundary are all real and tested. A production deployment
overrides ``fetch_page`` with the real HTTP call; everything the
executor needs must live on the reader instance (it is pickled to
workers — no by-reference closures).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

DEFAULT_SCHEMA = "item_id bigint, shard_id int, name string, size_bytes bigint"


class _ShardPartition(InputPartition):
    def __init__(self, shard_id: int, n_items: int, n_shards: int, page_size: int):
        self.shard_id = shard_id
        self.n_items = n_items
        self.n_shards = n_shards
        self.page_size = page_size


class RestPagesReader(DataSourceReader):
    """One input split per shard; each task walks its shard's cursor
    chain. Self-contained: every method uses only instance state and
    stdlib, so the pickled reader runs on any executor without
    importing this package."""

    def __init__(self, options: dict):
        self.n_shards = int(options.get("n_shards", "4"))
        self.n_items = int(options.get("n_items", "100"))
        self.page_size = int(options.get("page_size", "10"))

    def partitions(self):
        return [
            _ShardPartition(s, self.n_items, self.n_shards, self.page_size)
            for s in range(self.n_shards)
        ]

    # --- the transport seam -------------------------------------------------
    # Production: override to issue the real HTTP GET and parse the
    # next-cursor from the response. Deterministic fake here: shard s
    # owns item_ids {i : i % n_shards == s}; pages chain by offset.
    @staticmethod
    def fetch_page(part: _ShardPartition, cursor: str | None):
        offset = int(cursor) if cursor is not None else 0
        ids = [
            i
            for i in range(part.n_items)
            if i % part.n_shards == part.shard_id
        ][offset : offset + part.page_size]
        rows = [
            (
                i,
                part.shard_id,
                "item_" + hashlib.md5(f"rest:{i}".encode()).hexdigest()[:12],
                int(hashlib.md5(f"size:{i}".encode()).hexdigest()[:6], 16),
            )
            for i in ids
        ]
        nxt = (
            str(offset + part.page_size)
            if len(ids) == part.page_size
            else None
        )
        return rows, nxt

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        cursor: str | None = None
        while True:
            rows, cursor = self.fetch_page(partition, cursor)
            yield from rows
            if cursor is None:
                return


class RestPagesStreamReader(DataSourceStreamReader):
    """The INCREMENTAL form: a listing API polled as a Structured
    Streaming source. Offsets are item positions in the feed's stable
    order ({"pos": k}); each micro-batch covers [start, end) and
    ``partitions`` shards that range so executors fetch concurrently.
    ``read`` regenerates rows deterministically from the partition
    spec alone — exactly the property a replayable production feed
    needs (offset ranges must be re-fetchable for recovery; the
    checkpointed offset log makes delivery exactly-once downstream of
    a foreachBatch upsert sink, streaming/sinks.py).

    The feed advances ``batch_items`` per poll up to ``n_items`` — a
    deterministic stand-in for "new files appeared in the listing"
    that lets tests drain the stream to a known final state."""

    def __init__(self, options: dict):
        self.n_shards = int(options.get("n_shards", "4"))
        self.n_items = int(options.get("n_items", "100"))
        self.batch_items = int(options.get("batch_items", "25"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        if not hasattr(self, "_seen"):
            self._seen = 0
        self._seen = min(self._seen + self.batch_items, self.n_items)
        return {"pos": self._seen}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        # contiguous slices, one per shard, covering [lo, hi)
        step = max(1, (hi - lo + self.n_shards - 1) // self.n_shards)
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition) -> Iterator[tuple]:
        for i in range(partition.lo, partition.hi):
            yield (
                i,
                i % self.n_shards,
                "item_" + hashlib.md5(f"rest:{i}".encode()).hexdigest()[:12],
                int(hashlib.md5(f"size:{i}".encode()).hexdigest()[:6], 16),
            )

    def commit(self, end: dict) -> None:
        # a production source would ack/forget server-side cursors here
        pass


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(self.options)

    def streamReader(self, schema) -> RestPagesStreamReader:
        return RestPagesStreamReader(self.options)


class _UploadCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, names: list[str]):
        self.n_rows = n_rows
        self.names = names


class RestUploadWriter(DataSourceWriter):
    """K7's first-class form: each executor task PUTs its partition's
    documents and returns a commit message naming what it uploaded; the
    driver's ``commit`` sees every message only if EVERY task
    succeeded — the all-or-nothing visibility point a job-level
    manifest write hangs off (abort() is the compensation hook).
    Self-contained: the default transport writes ``<name>`` → bytes
    under the ``path`` option (the local-FS stand-in for the HTTP PUT,
    same seam as documents.upload_documents); a production subclass
    overrides ``put``."""

    def __init__(self, options: dict):
        self.path = options.get("path", "/tmp/rest_upload")
        self.name_col = options.get("name_col", "filename")
        self.payload_col = options.get("payload_col", "payload")

    def put(self, name: str, payload: bytes) -> None:
        import os

        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, name), "wb") as f:
            f.write(payload)

    def write(self, iterator):
        n, names = 0, []
        for row in iterator:
            name = row[self.name_col]
            payload = row[self.payload_col]
            self.put(
                name,
                payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode(),
            )
            n += 1
            names.append(name)
        return _UploadCommit(n, names)

    def commit(self, messages):
        # all tasks succeeded; write the job-level manifest atomically
        import json
        import os

        os.makedirs(self.path, exist_ok=True)
        manifest = {
            "n_rows": sum(m.n_rows for m in messages),
            "files": sorted(x for m in messages for x in m.names),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        # compensation hook: a production transport deletes the
        # partial uploads named in the surviving commit messages
        pass


class RestUploadDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_upload"

    def writer(self, schema, overwrite: bool) -> RestUploadWriter:
        return RestUploadWriter(self.options)
