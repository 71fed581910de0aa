"""Bucketed-table co-located join: the shuffle-free join scale path (S5).

Writes lineitem and orders bucketed by the join key, then proves the
bucket join plans WITHOUT an Exchange on either side — at 100 TB this is
the difference between shuffling the fact table per join and reading
pre-co-located buckets.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sales_data_etl_pipeline_spark.sources.parquet import overwrite_table
from sales_data_etl_pipeline_spark.sources.tables import load_testdata

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    t = load_testdata(spark, SF_DIR, ("lineitem", "orders"))
    overwrite_table(t["lineitem"], "li_bucketed", bucket_by=(8, "l_orderkey"))
    overwrite_table(
        t["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed",
        bucket_by=(8, "l_orderkey"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucket_join_has_no_shuffle(spark, bucketed):
    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed")
    # disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert joins, "expected a shuffle-strategy join over bucketed tables"
        # no Exchange may feed the join inputs (buckets are co-located);
        # the only allowed Exchange is the one for the final groupBy
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_clustered_write_enables_rowgroup_skipping(spark, tmp_path):
    """write_clustered must produce files whose min/max ranges on the
    cluster key are disjoint-ish: a point predicate then touches ~1
    file. Verified from the parquet footers via pyarrow — the same
    statistics Spark's scan uses for row-group skipping."""
    import pyarrow.parquet as pq
    import os

    from pyspark.sql import functions as F

    from sales_data_etl_pipeline_spark.sources.parquet import write_clustered

    df = (
        spark.range(0, 50_000)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 997).alias("v"),
        )
        # pre-shuffle so clustering actually has to move rows
        .repartition(8, "v")
    )
    path = str(tmp_path / "clustered")
    write_clustered(df, path, ["user_id"], n_files=10)
    ranges = []
    for root, _d, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                assert col.path_in_schema == "user_id"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 8
    # disjoint file ranges: sort by min, assert no overlap
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping cluster ranges {hi1} > {lo2}"
    # a point lookup touches exactly one file
    probe = 31_337
    touched = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(touched) == 1


def _bucket_ids(loc):
    """bucket id per part-file, parsed from the bucketed-file naming
    scheme ``part-<task>-<uuid>_<bucket>.c000...``."""
    import os

    out = []
    for f in os.listdir(loc):
        if not f.startswith("part-"):
            continue
        m = re.search(r"_(\d{5})\.", f)
        assert m, f"unrecognized bucketed part-file name: {f}"
        out.append(int(m.group(1)))
    return out


def test_bucketed_write_emits_one_file_per_bucket(spark, bucketed):
    """The write path must align partitioning with the bucket function:
    without the pre-write repartition, bucketBy emits one file per
    (task, bucket) pair — tasks x buckets files (measured 1024 files for
    an 8.3 MB 32-bucket table; millions on a 1000-executor cluster).
    Aligned means each part-file carries a DISTINCT bucket id — an
    empty bucket legitimately writes no file, so the file count is
    bounded by, not equal to, the bucket count."""
    import os
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl, buckets in (("li_bucketed", 8), ("ord_bucketed", 8)):
        ids = _bucket_ids(os.path.join(wh, tbl))
        assert 0 < len(ids) <= buckets, (
            f"{tbl}: {len(ids)} files for {buckets} buckets"
        )
        assert len(set(ids)) == len(ids), (
            f"{tbl}: bucket written by more than one task: {sorted(ids)}"
        )
        assert all(0 <= b < buckets for b in ids)


def test_bucketed_write_files_per_bucket_multiple(spark):
    """files_per_bucket=k keeps bucket alignment at k·n write tasks:
    every part-file still holds exactly one bucket (≤ k files carry
    each bucket id), so a large table widens write parallelism without
    exploding into (task × bucket) files."""
    import os
    from urllib.parse import urlparse

    t = load_testdata(spark, SF_DIR, ("lineitem",))
    overwrite_table(
        t["lineitem"],
        "li_bucketed_k2",
        bucket_by=(4, "l_orderkey"),
        files_per_bucket=2,
    )
    try:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        ids = _bucket_ids(os.path.join(wh, "li_bucketed_k2"))
        assert 0 < len(ids) <= 8
        from collections import Counter

        assert all(c <= 2 for c in Counter(ids).values()), Counter(ids)
        assert all(0 <= b < 4 for b in ids)
        # the table itself is intact and bucket-join capable
        assert spark.table("li_bucketed_k2").count() == t["lineitem"].count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_k2")


def test_bucketed_write_rejects_bad_files_per_bucket(spark):
    t = load_testdata(spark, SF_DIR, ("lineitem",))
    with pytest.raises(ValueError, match="files_per_bucket"):
        overwrite_table(
            t["lineitem"],
            "li_bucketed_bad",
            bucket_by=(4, "l_orderkey"),
            files_per_bucket=0,
        )
