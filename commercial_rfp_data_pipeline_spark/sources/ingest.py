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


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id long, text string, lang string, source string",
) -> DataFrame:
    """Read a JSON-Lines document corpus — the interchange format every
    public LLM dataset ships in (C4/Pile/Dolma/RedPajama are gzipped
    JSONL shards). PERMISSIVE mode with an explicit schema: malformed
    lines land in ``_corrupt_record`` instead of failing the 100-TB job
    on one bad shard; callers split on ``_corrupt_record IS NULL`` and
    route rejects to a quarantine sink.

    Explicit schema matters at scale for a second reason: without it
    Spark runs a full inference pass over every shard before the real
    read — double I/O on the whole corpus."""
    full = schema + ", _corrupt_record string"
    return spark.read.schema(full).option("mode", "PERMISSIVE").json(path)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    compression: str = "gzip",
) -> None:
    """Write a corpus as shard-partitioned compressed JSONL — the
    emit format downstream training stacks consume, laid out as
    ``path/<shard_col>=<k>/part-*.json.gz`` so a loader can read any
    token-budget shard (``textops.assign_token_shards``) independently.
    One file per (shard, task); executors write in parallel, nothing
    lands on the driver."""
    (
        df.write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", compression)
        .json(path)
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id long, text string, lang string, source string",
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with the same hardening contract as `read_jsonl_corpus`:
    explicit schema (no inference pass doubling the 100-TB I/O),
    PERMISSIVE mode with `_corrupt_record` capture so one mangled row
    quarantines instead of killing the job, multiline/quote handling
    ON (real-world CSV text columns embed newlines and quotes).
    Callers split on `_corrupt_record IS NULL` and route rejects to a
    quarantine sink — the mirror of the reference's coerce-don't-crash
    ingest posture (ingestion_and_cleaning.py's errors='coerce')."""
    full = schema + ", _corrupt_record string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


def save_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive/Trino
    warehouses); same overwrite-rebuild contract as the parquet
    sinks. Native Spark writer: predicate pushdown and column pruning
    work on read-back exactly as with parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
