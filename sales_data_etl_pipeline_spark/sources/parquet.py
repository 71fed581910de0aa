"""Parquet source/sink (reference S8, ``save-data/save_data_parquet.py:97-121``).

The sink supports partitioned layout — the 100 TB design writes facts
partitioned by month so downstream time-range queries get partition
pruning (see plans.analytics monthly query), and optional bucketing so
repeated joins on the bucket key co-locate without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write a DataFrame as parquet.

    ``partition_by`` gives directory-level partition pruning;
    ``max_records_per_file`` guards against giant files from skewed
    partitions.
    """
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _is_spark_table_output(loc: str) -> bool:
    """True iff every file under ``loc`` is recognizable Spark table
    output, so a stale-location rmtree can only ever hit our own
    orphaned saveAsTable directory — never user data that happens to
    share a table's name."""
    import fnmatch
    import os

    file_ok = (
        "part-*",
        "_SUCCESS",
        "_committed*",
        "_started*",
        "*.crc",
        "._*",
    )
    for root, dirs, files in os.walk(loc):
        for d in list(dirs):
            # only key=value partition subdirs are expected
            if "=" not in d:
                return False
        for f in files:
            if not any(fnmatch.fnmatch(f, p) for p in file_ok):
                return False
    return True


def overwrite_table(
    df: DataFrame,
    name: str,
    *,
    bucket_by: tuple[int, str] | None = None,
    files_per_bucket: int = 1,
) -> None:
    """DROP+CREATE semantics (reference S5/S6, ``load-data/l_*.py:71-119``).

    The reference drops + recreates the Postgres table then inserts row by
    row with ON CONFLICT DO NOTHING; since ET already deduped, that is
    exactly ``mode('overwrite').saveAsTable`` (SURVEY.md §7.4 item 8).
    ``bucket_by=(n, key)`` co-locates future joins on ``key``.

    ``files_per_bucket`` (k, default 1) sets the bucket-aligned write
    parallelism: the pre-write shuffle targets k·n partitions, so the
    write runs k·n tasks and each bucket lands as AT MOST k files —
    alignment survives any multiple because partition ids and bucket
    ids share one hash family (bucket = murmur3(key) mod n, partition
    = murmur3(key) mod k·n, and (h mod k·n) mod n == h mod n), so each
    write task still holds exactly one bucket. k=1 gives the minimal
    file count for small dimension tables; a large fact table raises k
    to keep per-task write volume and per-file size bounded instead of
    serializing the write into n oversized files.

    Stale-location guard: with the default session-scoped catalog the
    table REGISTRATION dies with the session while its warehouse
    directory persists on disk, and the next session's overwrite fails
    with LOCATION_ALREADY_EXISTS (the catalog sees a CREATE, not an
    overwrite). True DROP+CREATE semantics must remove that orphaned
    location. A cluster deployment with a persistent metastore never
    enters this branch — the table stays registered and Spark's own
    overwrite path handles the location.

    The removal is deliberately narrow (r9 ADVICE): it resolves the
    database qualifier the way Spark lays warehouses out (``db.tbl`` →
    ``<wh>/<db>.db/<tbl>``, default db directly under ``<wh>``) and
    deletes ONLY when every file under the directory is recognizable
    Spark table output (part-*/_SUCCESS/_committed*/_started*/*.crc,
    with key=value partition subdirs) — an unrelated directory that
    merely shares the table's name is left in place and saveAsTable
    surfaces LOCATION_ALREADY_EXISTS instead of silently eating it.
    Concurrent sessions sharing one warehouse dir remain a documented
    non-goal of the session-scoped catalog (single-writer assumption).
    """
    spark = df.sparkSession
    if not spark.catalog.tableExists(name):
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            parts = name.lower().split(".")
            if len(parts) == 2 and parts[0] != "default":
                loc = os.path.join(wh.path, f"{parts[0]}.db", parts[1])
            else:
                loc = os.path.join(wh.path, parts[-1])
            if os.path.isdir(loc) and _is_spark_table_output(loc):
                shutil.rmtree(loc)
    if bucket_by:
        # Align the shuffle partitioning with the bucket function before
        # the write: bucketBy otherwise emits one file per (task, bucket)
        # pair — measured 1024 files for an 8.3 MB 32-bucket table here,
        # and tasks×buckets (millions of files) on a large cluster.
        # repartition(k·n, key) uses the same Murmur3 hash family as
        # bucket assignment, so each write task holds exactly one bucket
        # and the table lands as ≤ files_per_bucket files per bucket.
        if files_per_bucket < 1:
            raise ValueError(
                f"files_per_bucket must be >= 1, got {files_per_bucket}"
            )
        n, key = bucket_by
        df = df.repartition(n * files_per_bucket, key)
    writer = df.write.mode("overwrite").format("parquet")
    if bucket_by:
        n, key = bucket_by
        writer = writer.bucketBy(n, key).sortBy(key)
    writer.saveAsTable(name)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` each.

    Streaming sinks and frequent small appends fragment a table into
    thousands of tiny files; at scale the metadata listing and
    per-file open cost then dominate scans (the classic small-file
    problem). Compaction sizes the rewrite from the data itself:
    ``ceil(input_bytes / target)`` output files via ``repartition`` —
    a single shuffle whose width is the file budget, not the input
    fragment count. Partitioned layouts compact within partitions
    (``partition_by`` re-applied on the rewrite), with a per-value
    salt sized from that value's share of the bytes: hashing on the
    partition columns alone would funnel each partition value into a
    single task and write ONE file per value no matter how skewed —
    a hot partition directory would still come out as one oversized
    file and the byte budget would only bind across values, not
    within them.

    Returns {"input_files", "output_files", "input_bytes"} for
    observability. Not in-place: writers rename directories
    atomically at the catalog layer (or use a table format) — an
    in-place rewrite that dies mid-job loses the table.
    """
    import math
    import os

    input_files = 0
    input_bytes = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                input_files += 1
                input_bytes += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(input_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    if partition_by:
        # Per-value row shares -> per-value salt fan-out. The share agg
        # is map-side combinable and its output is |partition values|
        # rows — bounded by the layout's design, never by data volume —
        # so the broadcast back is safe at any scale.
        from pyspark.sql import functions as F

        shares = df.groupBy(*partition_by).agg(
            F.count(F.lit(1)).alias("_rows")
        )
        total_rows = df.count()
        if total_rows == 0:
            out = df.repartition(1, *partition_by)
        else:
            bytes_per_row = input_bytes / total_rows
            salts = shares.withColumn(
                "_n_salt",
                F.greatest(
                    F.lit(1),
                    F.ceil(
                        F.col("_rows")
                        * F.lit(bytes_per_row)
                        / F.lit(float(target_file_bytes))
                    ),
                ).cast("int"),
            ).drop("_rows")
            non_part = [c for c in df.columns if c not in partition_by]
            spread = (
                F.pmod(F.hash(*non_part), F.col("_n_salt"))
                if non_part
                else F.lit(0)
            )
            out = (
                df.join(F.broadcast(salts), partition_by)
                .withColumn("_salt", spread)
                .repartition(n_out, *partition_by, "_salt")
                .drop("_n_salt", "_salt")
            )
    else:
        out = df.repartition(n_out)
    write_parquet(out, dst, partition_by=partition_by)
    output_files = sum(
        1
        for root, _d, files in os.walk(dst)
        for f in files
        if f.endswith(".parquet")
    )
    return {
        "input_files": input_files,
        "output_files": output_files,
        "input_bytes": input_bytes,
    }


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    *,
    n_files: int | None = None,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet with DATA CLUSTERING on ``cluster_by``: range-
    partition the rows across files by the cluster key, then sort
    within each file.

    Directory partitioning (``partition_by``) prunes at directory
    granularity and only works for low-cardinality columns; clustering
    is the complement for high-cardinality predicates (user_id,
    timestamp): each output file covers a NARROW range of the cluster
    key, so its parquet row-group min/max statistics let a selective
    scan skip all but a few files — the poor man's z-order, and for
    single-key predicates the optimal one. A scan with a point or
    range predicate on the cluster key then reads O(selectivity) bytes
    instead of O(table).

    ``repartitionByRange`` samples the key distribution, so skewed
    keys still yield balanced files (hash-repartition would balance
    too, but destroy the range locality that makes min/max skipping
    work).
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
        *cluster_by
    )
    write_parquet(
        out,
        path,
        partition_by=partition_by,
        max_records_per_file=max_records_per_file,
    )
