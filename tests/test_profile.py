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


def test_psi_drift_hand_computed(spark):
    """Identical distributions → every PSI term 0; a fully shifted
    one → large positive total. Bin clamping keeps outliers in the
    edge bins, and empty bins survive via the spine + smoothing."""
    import math

    from pyspark.sql import functions as F

    from deftunes_spark.ext.profile import psi_drift

    a = spark.createDataFrame([(float(v),) for v in
                               [5, 15, 15, 25, 999]], "x double")
    out = {r.bin: r for r in psi_drift(a, a, "x", 10.0, 4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(abs(r.psi_term) < 1e-12 for r in out.values())
    assert out[3].n_a == 1  # 999 clamped into the top bin
    assert out[1].n_a == 2

    b = spark.createDataFrame([(35.0,)] * 5, "x double")
    shifted = psi_drift(a, b, "x", 10.0, 4).collect()
    total = sum(r.psi_term for r in shifted)
    assert total > 0.25  # "investigate" territory by the rule of thumb
    # Hand-check one term: bin 0 has n_a=1, n_b=0, totals 5/5, smooth 2.
    t0 = [r for r in shifted if r.bin == 0][0]
    p, q = 1.5 / 7.0, 0.5 / 7.0
    assert abs(t0.psi_term - round((p - q) * math.log(p / q), 6)) < 1e-9
