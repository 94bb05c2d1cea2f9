from deftunes_spark.ext.profile import profile_columns


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c"), (10, "b")], ["k", "s"]
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    assert prof["k"].n_rows == 4
    assert prof["k"].n_null == 0
    assert prof["k"].n_distinct == 3
    # numeric ordering, not lexicographic ("10" < "9" as strings)
    assert prof["k"].min_val == "1" and prof["k"].max_val == "10"
    assert prof["s"].n_null == 1
    assert prof["s"].n_distinct == 3
    assert prof["s"].min_val == "a" and prof["s"].max_val == "c"


def test_profile_approx(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(1000)], ["k"])
    row = profile_columns(df, approx=True).collect()[0]
    assert row.n_rows == 1000
    assert abs(row.n_distinct - 50) <= 5
