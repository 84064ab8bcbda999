"""Partition-aware parquet sink.

The reference ends every pipeline by writing a matrix file to a directory
tree (XenaDataset.transform → matrix TSV). The engine's sink is parquet,
laid out for the *next* reader: hive-partitioned by the columns queries
filter on (partition pruning), optionally sorted within files (row-group
min/max pruning), with a file-size cap so a 100 TB write never produces
unsplittable multi-GB files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_by``.

    ``sort_within`` clusters rows inside each task's files so parquet
    row-group statistics stay selective for range predicates.
    ``max_records_per_file`` bounds file size without an extra shuffle.
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed parquet table (hash-clustered on ``bucket_by``).

    Bucketing is the pre-paid shuffle: two tables bucketed on the same key
    with the same bucket count sort-merge-join with ZERO exchanges, and
    aggregations on the bucket key skip their shuffle too. At 100 TB this
    is the difference between re-shuffling the fact table per query and
    never shuffling it again. Bucketed layout needs the session catalog
    (``saveAsTable``) — plain ``.parquet(path)`` writes lose the bucket
    metadata.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(num_buckets), *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
