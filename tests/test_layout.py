"""Z-order layout: curve arithmetic and the data-skipping effect.

The payoff claim is physical: files written with ``zorder_write``
cover compact hyper-rectangles, so per-file min-max spans shrink on
EVERY clustered column — versus a single-key sort where the second
key's span per file stays ~full-range (no pruning possible).
"""

from __future__ import annotations

import glob
import tempfile

import pytest

from deftunes_spark.ext.layout import zorder_write, zvalue_col, zvalue_sql


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z += ((x >> j) & 1) << (2 * j)
        z += ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zvalue_col(["x", "y"], bits=6).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave_py(x & 63, y & 63, 6)


def test_zvalue_sql_runs_in_duckdb():
    duckdb = pytest.importorskip("duckdb")
    expr = zvalue_sql(["x", "y"], bits=6)
    con = duckdb.connect()
    val = con.execute(
        f"SELECT {expr} FROM (SELECT 13 AS x, 37 AS y)"
    ).fetchone()[0]
    assert val == _interleave_py(13, 37, 6)


def _file_spans(path: str, col_idx: dict[str, int]) -> dict[str, list[int]]:
    """Per-parquet-file (max - min) span for each column, from footer
    statistics — exactly what a scan's file-pruning consults."""
    import pyarrow.parquet as pq

    spans: dict[str, list[int]] = {c: [] for c in col_idx}
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, int] = {}
        maxs: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for c, i in col_idx.items():
                st = md.row_group(rg).column(i).statistics
                mins[c] = min(mins.get(c, st.min), st.min)
                maxs[c] = max(maxs.get(c, st.max), st.max)
        for c in col_idx:
            spans[c].append(maxs[c] - mins[c])
    return spans


def test_zorder_shrinks_both_key_spans(spark):
    # Uniform grid over two independent 0..255 keys: the worst case
    # for a single-key sort (second key spans the full range in every
    # file), the showcase for the curve.
    df = spark.range(256 * 256).selectExpr(
        "CAST(id % 256 AS INT) AS a",
        "CAST(CAST(id / 256 AS INT) AS INT) AS b",
    )
    zdir = tempfile.mkdtemp(prefix="deftunes_zord_")
    ldir = tempfile.mkdtemp(prefix="deftunes_lin_")
    zorder_write(df, ["a", "b"], zdir, n_files=16, bits=8)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    idx = {"a": 0, "b": 1}
    zspans = _file_spans(zdir, idx)
    lspans = _file_spans(ldir, idx)

    def avg(v: list[int]) -> float:
        return sum(v) / len(v)

    # Linear layout: 'a' is tight but 'b' spans ~the whole 0..255
    # range in every file. Z-order: both spans shrink to a fraction
    # of the range — every file is a compact rectangle.
    assert avg(lspans["b"]) > 200
    assert avg(zspans["a"]) < 128
    assert avg(zspans["b"]) < 128
    # And the curve keeps 'a' within the same budget it gives 'b' —
    # no dimension is sacrificed.
    assert max(zspans["a"]) <= 255 and max(zspans["b"]) <= 255


def test_zorder_roundtrip_preserves_rows(spark):
    df = spark.range(1000).selectExpr(
        "CAST(id % 32 AS INT) AS a", "CAST(id % 17 AS INT) AS b", "id"
    )
    out = tempfile.mkdtemp(prefix="deftunes_zrt_")
    zorder_write(df, ["a", "b"], out, n_files=4, bits=6)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert sorted(back.columns) == ["a", "b", "id"]
    assert back.selectExpr("sum(id)").collect()[0][0] == 499500


def test_compact_path_reduces_files_preserves_rows(spark):
    from deftunes_spark.ext.layout import compact_path, path_file_stats

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    base = tempfile.mkdtemp(prefix="compact_") + "/t"
    df.repartition(24).write.parquet(base)
    n0, bytes0 = path_file_stats(spark, base)
    assert n0 == 24
    stats = compact_path(spark, base, target_file_bytes=bytes0)
    assert stats["files_before"] == 24
    assert stats["files_after"] == 1
    back = spark.read.parquet(base)
    assert back.count() == 10_000
    assert back.agg({"k": "sum"}).first()[0] == 10_000 * 9_999 // 2
    # No staging/old residue left behind.
    assert not glob.glob(base + "__*")


def test_compact_path_targets_multiple_files(spark):
    from deftunes_spark.ext.layout import compact_path, path_file_stats

    df = spark.range(0, 50_000).withColumnRenamed("id", "k")
    base = tempfile.mkdtemp(prefix="compact_") + "/t"
    df.repartition(16).write.parquet(base)
    _, bytes0 = path_file_stats(spark, base)
    stats = compact_path(
        spark, base, target_file_bytes=max(1, bytes0 // 4 + 1)
    )
    assert 2 <= stats["files_after"] <= 8
    assert spark.read.parquet(base).count() == 50_000


def _simulate_crash_state(spark, tmp_path, *, after_first_rename: bool):
    """Build the on-disk state compact_path leaves if it dies between
    the staging write and the swap (or between the two renames)."""
    import os
    import shutil

    base = str(tmp_path / "t")
    df = spark.range(0, 1_000).withColumnRenamed("id", "k")
    df.repartition(4).write.parquet(base)
    # Complete staging write (has _SUCCESS), as before any rename.
    df.repartition(1).write.parquet(base + "__compact_staging")
    assert os.path.exists(base + "__compact_staging/_SUCCESS")
    if after_first_rename:
        # rename(path -> old) happened; crash before staging -> path.
        shutil.move(base, base + "__old")
        assert not os.path.exists(base)
    return base


def test_recover_rolls_forward_between_renames(spark, tmp_path):
    """The round-2 crash window: path renamed away, staging complete,
    swap unfinished — no live table. Recovery must finish the swap."""
    from deftunes_spark.ext.layout import recover_compact_path

    base = _simulate_crash_state(spark, tmp_path, after_first_rename=True)
    assert recover_compact_path(spark, base) == "rolled_forward"
    back = spark.read.parquet(base)
    assert back.count() == 1_000
    assert back.agg({"k": "sum"}).first()[0] == 1_000 * 999 // 2
    assert not glob.glob(base + "__*")
    # Idempotent: a second recovery is a no-op.
    assert recover_compact_path(spark, base) == "clean"


def test_recover_sweeps_residue_when_table_live(spark, tmp_path):
    """Crash BEFORE the first rename: original table still live,
    staging is residue — recovery must keep the original untouched."""
    from deftunes_spark.ext.layout import recover_compact_path

    base = _simulate_crash_state(spark, tmp_path, after_first_rename=False)
    assert recover_compact_path(spark, base) == "swept_residue"
    assert spark.read.parquet(base).count() == 1_000
    assert not glob.glob(base + "__*")


def test_recover_rolls_back_partial_staging(spark, tmp_path):
    """Staging without _SUCCESS (mid-write crash after the first
    rename cannot happen in compact_path's order, but a manually
    broken staging must not be rolled forward) → restore __old."""
    import os
    import shutil

    from deftunes_spark.ext.layout import recover_compact_path

    base = _simulate_crash_state(spark, tmp_path, after_first_rename=True)
    os.remove(base + "__compact_staging/_SUCCESS")
    assert recover_compact_path(spark, base) == "rolled_back"
    assert spark.read.parquet(base).count() == 1_000
    assert not glob.glob(base + "__*")
    shutil.rmtree(str(tmp_path), ignore_errors=True)
