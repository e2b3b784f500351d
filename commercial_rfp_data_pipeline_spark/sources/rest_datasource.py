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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return DEFAULT_SCHEMA

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(self.options)
