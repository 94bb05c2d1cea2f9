"""Round-7 operator additions: unicode-script profiling, language
metadata audit, bucketed co-located join."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_script_profile_classifies_scripts(spark):
    from deftunes_spark.ext.text import with_script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "Привет мир"),
            (3, "你好 世界"),
            (4, "مرحبا بالعالم"),
            (5, "12345 67890"),
            (6, "   "),
            (7, None),
            (8, "abc Привет 123"),  # mixed: latin 3, cyr 6, digit 3
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r for r in with_script_profile(df).collect()
    }
    assert rows[1].dominant_script == "latin"
    assert rows[2].dominant_script == "cyrillic"
    assert rows[3].dominant_script == "han"
    assert rows[4].dominant_script == "arabic"
    assert rows[5].dominant_script == "digit"
    assert rows[6].dominant_script == "other"
    assert rows[7].dominant_script == "other"
    assert rows[8].dominant_script == "cyrillic"
    assert rows[1].ratio_latin == 1.0 and rows[1].n_latin == 10
    assert rows[6].ratio_latin is None  # all-whitespace: no ratios
    assert rows[3].n_han == 4
    # Ratios over NON-WHITESPACE chars sum to <= 1 + rounding slack.
    r8 = rows[8]
    assert r8.n_chars_nonspace == 12
    total = sum(
        r8[f"ratio_{s}"]
        for s in ("latin", "cyrillic", "han", "arabic", "digit")
    )
    assert abs(total - 1.0) < 1e-6


def test_script_profile_vertical_tab_matches_duckdb(spark):
    """Java \\s includes U+000B (vertical tab), RE2 \\s does not —
    the whitespace class is spelled out (text.WS_CLASS) so both
    engines count the same n_chars_nonspace on \\x0B-bearing docs."""
    import duckdb

    from deftunes_spark.ext.text import WS_CLASS, with_script_profile

    txt = "ab\x0bcd \x0b\t"
    r = with_script_profile(
        spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    ).first()
    want = duckdb.sql(
        "SELECT length(regexp_replace(?, '" + WS_CLASS + "', '', 'g'))"
        " AS ns",
        params=[txt],
    ).fetchone()[0]
    assert r.n_chars_nonspace == want == 4  # a b c d; \x0b is space


def test_script_profile_tie_prefers_declaration_order(spark):
    from deftunes_spark.ext.text import with_script_profile

    df = spark.createDataFrame([(1, "ab Пр")], ["doc_id", "text"])
    r = with_script_profile(df).first()
    assert r.n_latin == 2 and r.n_cyrillic == 2
    assert r.dominant_script == "latin"  # first in SCRIPT_CLASSES


def test_lang_mismatch_audit_counts(spark):
    from deftunes_spark.registry import QUERIES

    rows = QUERIES["lang_mismatch_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_mismatch <= r.n_docs
        assert abs(r.mismatch_rate - round(r.n_mismatch / r.n_docs, 6)) < 1e-9


def test_bucketed_join_matches_plain_join(spark):
    from deftunes_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r.c_mktsegment: (r.n_orders, round(r.total_price, 2))
        for r in QUERIES["bucketed_join_colocated"](spark, sf).collect()
    }
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    want = {
        r.c_mktsegment: (r.n, round(r.t, 2))
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("t"),
        )
        .collect()
    }
    assert got == want
