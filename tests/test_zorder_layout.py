"""Z-order layout: correctness of the Morton key and MEASURED pruning
locality — the z-clustered files must let a box predicate skip more files
(via parquet min/max footer stats) than a single-column sorted layout of
the same data ever can."""

from __future__ import annotations

import glob

import pytest


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bitwise_reference(spark):
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.layout import zorder_key2

    rows = spark.range(500).select(
        (F.col("id") * 7919 % 65536).alias("a"),
        (F.col("id") * 104729 % 65536).alias("b"),
    )
    got = rows.withColumn("z", zorder_key2(F.col("a"), F.col("b"))).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def _file_ranges(dest: str, col_a: str, col_b: str):
    """Per parquet file: ((min_a, max_a), (min_b, max_b)) from footer stats."""
    import pyarrow.parquet as pq

    out = []
    for path in sorted(glob.glob(f"{dest}/part-*.parquet")):
        f = pq.ParquetFile(path)
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(f.num_row_groups):
            meta = f.metadata.row_group(rg)
            for ci in range(meta.num_columns):
                cm = meta.column(ci)
                name = cm.path_in_schema
                if name in mins and cm.statistics is not None:
                    lo, hi = cm.statistics.min, cm.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append(((mins[col_a], maxs[col_a]), (mins[col_b], maxs[col_b])))
    return out


def test_zorder_box_prunes_more_files_than_single_sort(spark, sf_dir, tmp_path):
    """The measurement behind the PLANS.md claim: for a (custkey × date)
    box, count files whose footer stats OVERLAP the box (an engine must
    open those; it skips the rest). The date-sorted layout prunes the date
    dimension only — every file spans the full custkey range — while the
    z-order layout must overlap strictly fewer files."""
    import datetime

    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.operators.layout import write_zordered
    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read

    orders = read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    n_files = 8
    zdest = str(tmp_path / "z")
    sdest = str(tmp_path / "s")
    write_zordered(
        orders,
        zdest,
        F.col("o_custkey"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")),
        n_files=n_files,
    )
    # the comparison twin: same data, same file count, single-column sort
    (
        orders.repartitionByRange(n_files, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(sdest)
    )

    # box: ~1/8 of the custkey range × ~1/3 of the (1995-2001) date range
    lo_c, hi_c = orders.select(F.min("o_custkey"), F.max("o_custkey")).first()
    box_c = (lo_c, lo_c + max(1, (hi_c - lo_c) // 8))
    box_d = (
        datetime.datetime(1995, 1, 1),
        datetime.datetime(1997, 1, 1),
    )

    def overlapping(dest):
        n = 0
        for (ca, cb), (da, db) in _file_ranges(dest, "o_custkey", "o_orderdate"):
            c_hit = ca is not None and not (cb < box_c[0] or ca > box_c[1])
            d_hit = da is not None and not (db < box_d[0] or da > box_d[1])
            if c_hit and d_hit:
                n += 1
        return n

    z_hit, s_hit = overlapping(zdest), overlapping(sdest)
    total_z = len(_file_ranges(zdest, "o_custkey", "o_orderdate"))
    assert total_z == n_files, "z layout did not produce the expected files"
    # single-sort: every file spans all custkeys → hits = files in date range;
    # z-order: only the files whose box overlaps → strictly fewer
    assert z_hit < s_hit, (z_hit, s_hit)
    assert z_hit <= n_files // 2, (z_hit, s_hit)


def test_zorder_gate_query_matches_plain_filter(spark, sf_dir):
    from pyspark.sql import functions as F

    from pagopa_ecommerce_cdc_service_spark.plans.helpers import read
    from pagopa_ecommerce_cdc_service_spark.plans.tpch import q_zorder_box_scan

    got = q_zorder_box_scan(spark, sf_dir).collect()[0]
    plain = (
        read(spark, sf_dir, "orders")
        .filter(
            (F.col("o_custkey") < 200)
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .count()
    )
    assert got["n_orders"] == plain
