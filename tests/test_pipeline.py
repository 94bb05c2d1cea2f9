import pytest

from pyspark.sql import functions as F

from deftunes_spark.io import write_table_append_or_create
from deftunes_spark.models import dim_artists, fact_session, sales_per_artist
from deftunes_spark.pipeline import (
    Pipeline,
    PipelineTask,
    TaskFailure,
    monthly_windows,
)
from deftunes_spark.quality import REFERENCE_RULESETS, evaluate_ruleset
from deftunes_spark.transforms import (
    add_lineage_columns,
    sessions_explode,
    songs_enforce_schema,
)


def test_monthly_windows_catchup():
    w = monthly_windows("2020-02-01", "2020-04-01")
    assert w == [
        ("2020-02-01", "2020-03-01"),
        ("2020-03-01", "2020-04-01"),
        ("2020-04-01", "2020-05-01"),
    ]


def test_window_param_contract():
    """script_args contract: start=ds, end=next_ds-1d, ingest=next_ds
    (deftunes_api_pipeline.py:63-65)."""
    p = Pipeline("t")
    seen = {}
    p.add(PipelineTask("probe", lambda ctx: seen.update(ctx)))
    p.run_window(("2020-02-01", "2020-03-01"))
    assert seen["window_start"] == "2020-02-01"
    assert seen["window_end"] == "2020-02-29"  # leap year
    assert seen["ingest_date"] == "2020-03-01"


def test_retry_once_then_fail():
    attempts = []

    def flaky(ctx):
        attempts.append(1)
        raise RuntimeError("boom")

    p = Pipeline("t")
    p.add(PipelineTask("flaky", flaky, retries=1))
    with pytest.raises(TaskFailure):
        p.run_window(("2020-02-01", "2020-03-01"))
    assert len(attempts) == 2  # original + one retry


def test_retry_succeeds_second_attempt():
    attempts = []

    def flaky(ctx):
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline("t")
    p.add(PipelineTask("flaky", flaky, retries=1))
    out = p.run_window(("2020-02-01", "2020-03-01"))
    assert out["flaky"] == "ok"


def test_gate_failure_skips_downstream():
    ran = []
    p = Pipeline("t")
    p.add(PipelineTask("extract", lambda c: ran.append("extract")))
    p.add(
        PipelineTask(
            "dq",
            lambda c: (_ for _ in ()).throw(RuntimeError("dq fail")),
            depends_on=("extract",),
            retries=0,
            is_gate=True,
        )
    )
    p.add(
        PipelineTask(
            "model", lambda c: ran.append("model"), depends_on=("dq",)
        )
    )
    with pytest.raises(TaskFailure):
        p.run_window(("2020-02-01", "2020-03-01"))
    assert ran == ["extract"]  # model skipped behind failed gate


def test_medallion_end_to_end(
    spark, sessions_landing, songs_landing, tmp_path
):
    """Full flow for two ingest windows: landing → silver append-or-
    create → DQ → gold views; re-run of a window is idempotent
    (SURVEY §5 end-to-end plan)."""
    spark.sql("DROP TABLE IF EXISTS silver_sessions_e2e")
    half = sessions_landing.limit(15)
    rest = sessions_landing.subtract(half)

    def run_window(landing, ingest_date):
        silver = add_lineage_columns(
            sessions_explode(landing), ingest_date=ingest_date
        )
        results = evaluate_ruleset(
            silver, REFERENCE_RULESETS["sessions"]
        )
        assert all(
            r.passed
            for r in results
            if r.rule_name
            in ('IsComplete "user_id"', 'IsComplete "session_id"')
        )
        write_table_append_or_create(
            spark,
            silver,
            "silver_sessions_e2e",
            overwrite_partitions=True,
        )

    run_window(half, "2020-02-01")
    n1 = spark.table("silver_sessions_e2e").count()
    run_window(rest, "2020-03-01")
    n2 = spark.table("silver_sessions_e2e").count()
    assert n2 > n1  # second window appended
    run_window(rest, "2020-03-01")  # re-run same window
    assert spark.table("silver_sessions_e2e").count() == n2  # idempotent

    silver = spark.table("silver_sessions_e2e")
    fact = fact_session(silver)
    artists = dim_artists(songs_enforce_schema(songs_landing))
    view = sales_per_artist(fact, artists)
    total = view.agg(F.sum("total_sales")).collect()[0][0]
    expected = silver.agg(F.sum("price")).collect()[0][0]
    assert abs(total - expected) < 1e-6
    spark.sql("DROP TABLE IF EXISTS silver_sessions_e2e")
