"""Z-order clustering (operators/zorder.py): Morton-key unit fixture,
validation, and the real-footer skipping comparison against the
lexicographic layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.zorder import append_zordered, zorder_key
from etl_sber_spark.sinks.warehouse import Warehouse

from .conftest import parquet_col_ranges


def test_morton_interleave_fixture(spark):
    """bits=2 over two ints spanning exactly [0, 3]: rank == value, so
    the key is the textbook Morton number."""
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], "a int, b int"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(df, ["a", "b"], bits=2)).collect()
    }

    def morton(a, b):
        z = 0
        for j in range(2):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    assert got == {(a, b): morton(a, b) for a in range(4) for b in range(4)}


def test_validation_and_nulls(spark):
    df = spark.createDataFrame([(1, None)], "a int, b int")
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="> 63"):
        zorder_key(df, ["a", "b"], bits=32)
    # NULLs rank 0, never NULL keys
    assert df.withColumn("z", zorder_key(df, ["a", "b"])).collect()[0].z is not None


def test_zorder_prunes_both_columns(spark, tmp_path):
    """The point of the curve: on the lexicographic (x, y) layout a
    probe on y alone matches ~every file's footer range; on the
    z-ordered layout both x-probes and y-probes touch a small
    fraction. Asserted on real parquet footers."""
    n = 200_000
    # two independent uniform dimensions
    df = (
        spark.range(n)
        .withColumn("x", F.pmod(F.col("id") * 48271, F.lit(65_536)))
        .withColumn("y", F.pmod(F.col("id") * 16807 + 12345, F.lit(65_536)))
        .drop("id")
        .repartition(8)
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(df, "t_lex", cluster_by=["x", "y"])
    # n_files forced: AQE coalesces this byte-small append to ~2 files,
    # and 2 files cannot demonstrate pruning (each covers half the curve)
    append_zordered(wh, df, "t_z", ["x", "y"], n_files=64)

    def file_ranges(table, col):
        return parquet_col_ranges(
            str(tmp_path / "wh" / table / "*.parquet"), col
        )

    def hit_fraction(table, col, probe):
        rng = file_ranges(table, col)
        return sum(1 for lo, hi in rng if lo <= probe <= hi) / len(rng)

    assert len(file_ranges("t_z", "x")) >= 32

    # y-probes: lexicographic footers are blind (~every file matches);
    # the z-layout prunes most files
    assert hit_fraction("t_lex", "y", 33_000) > 0.9
    assert hit_fraction("t_z", "y", 33_000) < 0.4
    # and x-probes still prune on the z-layout (coarser than pure
    # x-clustering, but far from full scans)
    assert hit_fraction("t_z", "x", 33_000) < 0.4

    # row identity: the layout is a permutation, not a transformation
    assert wh.read("t_z").count() == n
    a = wh.read("t_z").agg(F.sum("x"), F.sum("y")).collect()[0]
    b = df.agg(F.sum("x"), F.sum("y")).collect()[0]
    assert (a[0], a[1]) == (b[0], b[1])


def test_ntz_timestamps_and_bad_bits(spark):
    """Review regressions: TimestampNTZ must rank like a timestamp
    (not crash in the numeric fallback); bits=0 would silently write
    an unclustered layout; unsupported types name themselves."""
    import datetime as dt

    ntz = spark.createDataFrame(
        [(dt.datetime(2021, 3, 1), 1), (dt.datetime(2021, 3, 5), 2)],
        "t timestamp_ntz, y int",
    )
    keys = [r.z for r in ntz.withColumn("z", zorder_key(ntz, ["t", "y"])).collect()]
    assert len(set(keys)) == 2
    with pytest.raises(ValueError, match="bits must be >= 1"):
        zorder_key(ntz, ["t"], bits=0)
    binry = spark.createDataFrame([(bytearray(b"x"),)], "b binary")
    with pytest.raises(ValueError, match="unsupported column type"):
        zorder_key(binry, ["b"])


def test_nan_inf_do_not_poison_the_dimension(spark):
    """Review regression: one NaN/inf row used to make the span NaN and
    zero EVERY rank of that column — the dimension silently lost all
    clustering. Non-finite rows now rank 0 (with the NULLs) and the
    finite rows keep their spread."""
    df = spark.createDataFrame(
        [(1.0, 1), (float("nan"), 2), (float("inf"), 3), (5.0, 4), (9.0, 5)],
        "x double, y int",
    )
    # isolate the x dimension: 1 column, so the key IS the x rank
    got = {r.y: r.z for r in df.withColumn(
        "z", zorder_key(df, ["x"], bits=4)
    ).collect()}
    assert got[2] == 0 and got[3] == 0  # NaN, inf at the low corner
    assert got[1] == 0  # x == min -> rank 0
    assert got[4] == 8 and got[5] == 15  # (5-1)/8*15=7.5 -> 8; max -> top


def test_zkey_name_collision_rejected(spark, tmp_path):
    df = spark.createDataFrame([(1, 2, 3)], "x int, y int, _zkey int")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="_zkey"):
        append_zordered(wh, df, "t", ["x", "y"])
