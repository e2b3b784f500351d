"""Driver-side ingest sources (SURVEY.md §2.1).

These are the reference's entry points that aren't bulk data paths:
header-promoted nested lists (S4), paginated REST listings (S5), and
the Excel bridge (S2, in io.py). Small control-plane data lands
driver-side and is parallelized immediately; bulk data rides parquet.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def from_header_rows(spark: SparkSession, data: list[list]) -> DataFrame:
    """S4: list-of-lists -> table, row 0 promoted to column names;
    empty input -> empty single-column frame
    (commercial_rfp_raw_data_ingestion_and_cleaning.py:153-157)."""
    if not data:
        return spark.createDataFrame([], "value string")
    header = [str(c) for c in data[0]]
    rows = [tuple(r) for r in data[1:]]
    if not rows:
        return spark.createDataFrame([], ", ".join(f"`{c}` string" for c in header))
    return spark.createDataFrame(rows, header)


def paginated_scan(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: str,
) -> DataFrame:
    """S5: follow next-page cursors until exhausted, accumulate items
    (citation:28-45 follows @odata.nextLink). The pagination protocol
    is inherently serial — run it driver-side, then parallelize. When
    the remote API supports keyed partitioned fetch (date ranges,
    shards), push the fetch into mapInPandas over a partition-spec
    DataFrame instead."""

    def pages() -> Iterator[dict]:
        cursor: str | None = None
        while True:
            items, cursor = fetch_page(cursor)
            yield from items
            if cursor is None:
                return

    rows = list(pages())
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)


def partitioned_fetch(
    spark: SparkSession,
    partitions: list[dict],
    fetch_partition: Callable[[dict], list[dict]],
    schema: str,
) -> DataFrame:
    """S5 at scale: when the remote API supports keyed fetch (date
    ranges, shard ids, id prefixes), distribute the I/O — one task per
    partition spec, each executor calling ``fetch_partition(spec)`` and
    yielding its rows as Arrow batches via mapInPandas. The serial
    cursor walk in ``paginated_scan`` stays for protocols that only
    offer a next-link; this is the fan-out form for the ones that
    don't. ``fetch_partition`` must be self-contained (pickled to
    executors) and idempotent (speculative retries may re-fetch a
    partition)."""
    import json

    spec_df = spark.createDataFrame(
        [(json.dumps(p),) for p in partitions], "spec string"
    ).repartition(max(1, len(partitions)))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for spec_json in pdf["spec"]:
                rows = fetch_partition(json.loads(spec_json))
                if rows:
                    yield pd.DataFrame(rows)

    return spec_df.mapInPandas(run, schema=schema)
