"""Z-order clustered-write layout: skipping quality is QUANTIFIED from
the written files' own zone maps (the stats the parquet reader prunes
with), compared against a linear single-column sort of the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from secure_agent_api_vector_search_spark.sources.layout import (
    files_touched,
    write_zordered,
    zone_map,
    zorder_key,
)

N_FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    # a 2-d uniform grid: the adversarial case for a linear sort (the
    # second column is uncorrelated with the first)
    return spark.range(0, 40_000).select(
        F.col("id").alias("row_id"),
        (F.xxhash64("id") % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("y"),
    )


def test_zorder_prunes_on_both_dimensions(spark, grid, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(grid, zpath, ["x", "y"], n_files=N_FILES)
    (
        grid.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zz = zone_map(zpath, ["x", "y"])
    zl = zone_map(lpath, ["x", "y"])
    assert len(zz) >= N_FILES - 1  # range partitioner may merge one

    # row identity: clustering is a layout change only
    assert (
        spark.read.parquet(zpath).agg(F.sum("row_id")).first()[0]
        == grid.agg(F.sum("row_id")).first()[0]
    )

    # a narrow range predicate on EITHER column must skip most files in
    # the z-layout; the linear layout only skips on its sort column
    lo, hi = -2_000, -1_000  # 1/10 of the hash range (negative half)
    zx, zy = files_touched(zz, "x", lo, hi), files_touched(zz, "y", lo, hi)
    lx, ly = files_touched(zl, "x", lo, hi), files_touched(zl, "y", lo, hi)
    assert lx <= 3  # linear sort: near-perfect on its own column
    assert ly >= len(zl) - 1  # ...and useless on the other
    # z-order: strictly better than full scan on BOTH columns. The d=2
    # ideal per-file span is ~1/sqrt(n_files) (~4/16 files), but file
    # boundaries come from range-partitioner SAMPLING and wobble with
    # session state (measured 6-9 of 16 across test orderings) — pin
    # the claim with sampling headroom, plus the strict comparatives
    assert zx <= len(zz) * 0.7 and zy <= len(zz) * 0.7
    assert zx + zy < lx + ly  # and better than linear on the sum


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    key = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=3).alias("k")
    ).first()["k"]
    # a=101, b=011 -> interleave (a_i at even positions, b_i at odd):
    # bit0=a0=1, bit1=b0=1, bit2=a1=0, bit3=b1=1, bit4=a2=1, bit5=b2=0
    assert key == 0b011011


def test_zorder_validation_and_string_buckets(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "id long, s string"
    )
    with pytest.raises(ValueError):
        write_zordered(df, str(tmp_path / "bad"), [])
    with pytest.raises(ValueError):
        zorder_key([F.col("id")] * 4, bits=16)
    # string clustering: hash buckets — write must round-trip rows
    p = str(tmp_path / "s")
    write_zordered(df, p, ["s", "id"], n_files=2)
    assert spark.read.parquet(p).count() == 3


def test_zorder_constant_and_null_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 7, None if i % 2 else i) for i in range(100)],
        "id long, c long, n long",
    )
    p = str(tmp_path / "const")
    write_zordered(df, p, ["c", "n"], n_files=4)
    got = spark.read.parquet(p)
    assert got.count() == 100
    assert got.filter(F.col("n").isNull()).count() == 50


def test_compact_parquet_bin_packs_and_roundtrips(spark, tmp_path):
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.sources.layout import compact_parquet

    p = str(tmp_path / "many")
    spark.range(0, 50_000).select(
        "id", F.md5(F.col("id").cast("string")).alias("s")
    ).repartition(64).write.parquet(p)
    before = spark.read.parquet(p)
    checksum = before.agg(F.sum(F.crc32("s")), F.count("*")).first()

    stats = compact_parquet(spark, p, target_file_bytes=1 << 20)
    assert stats["rewritten"] and stats["files_before"] == 64
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(p)
    assert after.agg(F.sum(F.crc32("s")), F.count("*")).first() == checksum

    # second run: already compact — a pure no-op, nothing rewritten
    again = compact_parquet(spark, p, target_file_bytes=1 << 20)
    assert not again["rewritten"]
    assert again["files_after"] == stats["files_after"]


def test_zorder_quantile_mode_beats_linear_on_skew(spark, tmp_path):
    """Heavy-tailed column: linear min/max scaling collapses most rows
    into a few buckets (outliers own the range), so a narrow predicate
    in the DENSE region touches almost every file; quantile ranks give
    equal rows per bucket and restore skipping."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.sources.layout import (
        files_touched,
        write_zordered,
        zone_map,
    )

    # x ~ lognormal-ish heavy tail (hash-derived, deterministic),
    # y uniform: 99%+ of x mass sits in a sliver of the full range
    df = spark.range(0, 40_000).select(
        F.col("id").alias("row_id"),
        F.exp((F.xxhash64("id") % 1000).cast("double") / F.lit(60.0)).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("y"),
    )
    lin, qnt = str(tmp_path / "lin"), str(tmp_path / "qnt")
    write_zordered(df, lin, ["x", "y"], n_files=16, rank="linear")
    write_zordered(df, qnt, ["x", "y"], n_files=16, rank="quantile")

    assert (
        spark.read.parquet(qnt).agg(F.sum("row_id")).first()[0]
        == df.agg(F.sum("row_id")).first()[0]
    )
    zl, zq = zone_map(lin, ["x"]), zone_map(qnt, ["x"])
    # dense-region range: the median +- a hair (x in [1, 500] covers
    # ~90% of rows but ~0% of the [1, e^16] value range)
    tl = files_touched(zl, "x", 1.0, 4.0)
    tq = files_touched(zq, "x", 1.0, 4.0)
    assert tq < tl  # quantile mode must strictly improve skipping
    # the exact margin wobbles with the GK sketch's partition-dependent
    # merge order (measured tq 11-13 of 16 across shuffle configs, vs
    # tl = 16): pin only the robust claims — strictly better than the
    # linear layout AND meaningfully below a full scan
    assert tq <= len(zq) - 2


def test_zorder_on_timestamp_column(spark, tmp_path):
    """The headline use case — clustering on a time column — must work
    in both rank modes (time types rank by epoch seconds)."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.sources.layout import (
        files_touched,
        write_zordered,
        zone_map,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("row_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        (F.xxhash64("id") % 1000).alias("k"),
    )
    for mode in ("linear", "quantile"):
        p = str(tmp_path / f"ts_{mode}")
        write_zordered(df, p, ["ts", "k"], n_files=8, rank=mode)
        got = spark.read.parquet(p)
        assert got.count() == 20_000
        zones = zone_map(p, ["row_id"])
        assert len(zones) >= 7


def test_zorder_lineitem_serves_q6_predicates(spark, sf_dir, tmp_path):
    """The Q6 narrative made concrete: lineitem z-ordered on
    (l_shipdate, l_discount) lets BOTH of Q6's range predicates skip
    files, where a shipdate-only sort serves only the date."""
    from secure_agent_api_vector_search_spark.sources.layout import (
        files_touched,
        write_zordered,
        zone_map,
    )
    from secure_agent_api_vector_search_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    zpath = str(tmp_path / "li_z")
    write_zordered(li, zpath, ["l_shipdate", "l_discount"], n_files=16)
    zones = zone_map(zpath, ["l_discount"])
    # Q6's discount band is ~1/5 of the domain; the z-layout must skip
    # a real share of files on the SECOND clustered column
    touched = files_touched(zones, "l_discount", 0.05, 0.07)
    assert touched <= len(zones) * 0.7
    assert spark.read.parquet(zpath).count() == li.count()


def test_compact_partitions_leaves_no_partition_lookalike_junk(spark, tmp_path):
    """The swap's tmp/backup siblings must be invisible to partition
    discovery: after compaction (and even with a crash-leftover backup
    dir present) a root read sees exactly the original rows with the
    original partition values."""
    from pyspark.sql import functions as F

    from secure_agent_api_vector_search_spark.sources.layout import (
        compact_partitions,
    )

    root = str(tmp_path / "sink")
    df = spark.range(0, 3000).select(
        "id", (F.col("id") % 3).alias("_epoch_id"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    df.repartition(8).write.partitionBy("_epoch_id").parquet(root)
    before = spark.read.parquet(root)
    sum_before = before.agg(F.sum("id")).first()[0]

    stats = compact_partitions(spark, root, target_file_bytes=1 << 20)
    assert stats["partitions"] == 3 and stats["rewritten"] == 3
    after = spark.read.parquet(root)
    assert after.count() == 3000
    assert after.agg(F.sum("id")).first()[0] == sum_before
    assert sorted(r[0] for r in after.select("_epoch_id").distinct().collect()) \
        == [0, 1, 2]

    # simulate a crash-leftover backup: a dot-prefixed, '='-free copy
    import shutil

    shutil.copytree(f"{root}/_epoch_id=1", f"{root}/._epoch_id-1_compact_bak")
    again = spark.read.parquet(root)
    assert again.count() == 3000  # leftover invisible to discovery
