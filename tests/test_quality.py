import pytest

from deftunes_spark.quality import (
    ColumnLength,
    ColumnValues,
    IsComplete,
    REFERENCE_RULESETS,
    Uniqueness,
    Unique,
    evaluate_ruleset,
    parse_dqdl,
)
from deftunes_spark.quality.evaluator import QualityGateError, quality_gate
from deftunes_spark.transforms import sessions_explode, users_flatten


def test_parse_dqdl_verbatim_reference():
    rules = parse_dqdl(
        'Rules = [ IsComplete "track_id", ColumnLength "track_id" = 18, '
        'IsComplete "song_id", ColumnLength "song_id" = 18, '
        'IsComplete "artist_id" ]'
    )
    assert [type(r).__name__ for r in rules] == [
        "IsComplete",
        "ColumnLength",
        "IsComplete",
        "ColumnLength",
        "IsComplete",
    ]
    assert rules[1].length == 18


def test_parse_dqdl_rejects_garbage():
    with pytest.raises(ValueError):
        parse_dqdl('Rules = [ Frobnicate "x" ]')
    with pytest.raises(ValueError):
        parse_dqdl('IsComplete "a" = 3')


def test_reference_rulesets_loaded():
    assert set(REFERENCE_RULESETS) == {"songs", "sessions", "users"}
    assert len(REFERENCE_RULESETS["sessions"]) == 6


def test_songs_ruleset_verdicts(songs_landing):
    results = evaluate_ruleset(
        songs_landing, REFERENCE_RULESETS["songs"]
    )
    by_name = {r.rule_name: r for r in results}
    # Seeded: one short track_id, one NULL song_id, one NULL artist_id.
    assert not by_name['ColumnLength "track_id" = 18'].passed
    assert not by_name['IsComplete "song_id"'].passed
    assert not by_name['IsComplete "artist_id"'].passed
    assert by_name['IsComplete "track_id"'].passed
    assert by_name['ColumnLength "song_id" = 18'].metric == 0.0


def test_users_ruleset_uniqueness(users_landing):
    flat = users_flatten(users_landing)
    results = evaluate_ruleset(flat, REFERENCE_RULESETS["users"])
    by_name = {r.rule_name: r for r in results}
    # 96 distinct / 100 = 0.96 > 0.95.
    u = by_name['Uniqueness "user_id" > 0.95']
    assert u.passed and abs(u.metric - 0.96) < 1e-9
    assert not by_name['IsComplete "user_lastname"'].passed


def test_sessions_ruleset_price_bound(sessions_landing):
    exploded = sessions_explode(sessions_landing)
    results = evaluate_ruleset(
        exploded, REFERENCE_RULESETS["sessions"]
    )
    by_name = {r.rule_name: r for r in results}
    bound = by_name['ColumnValues "price" <= 2']
    assert not bound.passed and bound.metric == 1.0  # one seeded 9.99
    assert by_name['ColumnLength "user_id" = 36'].passed


def test_quality_gate_expected_failures(sessions_landing):
    exploded = sessions_explode(sessions_landing)
    rules = [Unique("session_id"), IsComplete("user_id")]
    # session_id uniqueness fails by construction after explode…
    with pytest.raises(QualityGateError):
        quality_gate(exploded, rules)
    # …but is tolerated when declared expected (SURVEY §2.5 note).
    results = quality_gate(
        exploded, rules, expected_failures=['Unique "session_id"']
    )
    assert {r.rule_name: r.passed for r in results} == {
        'Unique "session_id"': False,
        'IsComplete "user_id"': True,
    }


def test_single_pass_evaluation_plan(songs_landing):
    """All rules of a ruleset must collapse into ONE aggregate —
    no per-rule scans."""
    rules = [
        IsComplete("track_id"),
        ColumnLength("track_id", 18),
        ColumnValues("duration", 500.0),
        Uniqueness("song_id", 0.9),
    ]
    exprs = [e for r in rules for e in r.agg_exprs()]
    agg = songs_landing.agg(*exprs)
    # A single Aggregate node over one scan.
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_extended_rules(spark):
    from deftunes_spark.quality.rules import (
        CustomSql,
        MeanBetween,
        RowCount,
    )
    from deftunes_spark.quality.evaluator import evaluate_ruleset

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], ["v"]
    )
    res = {
        r.rule_name: r
        for r in evaluate_ruleset(
            df,
            [
                RowCount(5, op=">"),
                RowCount(10, op="="),
                RowCount(5, op="<"),
                MeanBetween("v", 5.0, 6.0),  # mean = 5.5
                MeanBetween("v", 0.0, 1.0),
                CustomSql("max_v", "max(v)", 10.0, op="="),
                CustomSql("neg", "count(case when v < 0 then 1 end)", 0.0),
            ],
        )
    }
    assert res["RowCount > 5"].passed
    assert res["RowCount = 10"].passed and res["RowCount = 10"].metric == 10.0
    assert not res["RowCount < 5"].passed
    assert res['Mean "v" between 5 and 6'].passed
    assert res['Mean "v" between 5 and 6'].metric == 5.5
    assert not res['Mean "v" between 0 and 1'].passed
    assert res["CustomSql [max_v] = 10"].passed
    assert res["CustomSql [neg] = 0"].passed


# ---------------------------------------------------------------------
# HTML stripping + readability (r6)
# ---------------------------------------------------------------------


def test_html_strip_removes_blocks_tags_entities(spark):
    from deftunes_spark.ext.text import with_html_stripped

    html = (
        '<html><head><style>p {color: red}</style>'
        '<script>if (1<2) { alert("x"); }</script></head>'
        '<body class="c"><!-- note --><p>Hello &amp; goodbye</p>'
        '<B>bold</B> &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end'
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "text"])
    r = with_html_stripped(df).collect()[0]
    assert r.text_clean == (
        "Hello & goodbye bold <tag> \"q\" 's' end"
    )
    assert r.n_tags > 0
    # Script/style CONTENT is gone, not just the tags.
    assert "alert" not in r.text_clean and "color" not in r.text_clean


def test_readability_known_values(spark):
    from deftunes_spark.ext.text import with_readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in with_readability(df).collect()}
    r = rows[1]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert r.flesch_score == pytest.approx(expected, abs=1e-6)
    assert rows[2].flesch_score is None and rows[3].flesch_score is None


def test_html_double_escaped_entities_not_double_decoded(spark):
    """'&amp;lt;b&amp;gt;' is the serialization of author-visible
    '&lt;b&gt;' — decoding &amp; FIRST would collapse it to '<b>'."""
    from deftunes_spark.ext.text import with_html_stripped

    df = spark.createDataFrame(
        [(1, "<p>&amp;lt;b&amp;gt; and &amp; alone</p>")],
        ["doc_id", "text"],
    )
    r = with_html_stripped(df).collect()[0]
    assert r.text_clean == "&lt;b&gt; and & alone"


def test_readability_oracle_handles_empty_docs(spark, tmp_path):
    """DuckDB list_sum over an empty token list is NULL; the oracle
    must coalesce to 0 to match Spark's fold — pinned by running both
    engines on a fixture WITH empty/null/whitespace docs."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from deftunes_spark.driver_queries_ext import q_text_readability

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["The cat sat.", "", "   ", None],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    got = sorted(
        map(tuple, q_text_readability(spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                entry.oracle_sql()["text_readability"]
            ).fetchall(),
        )
    )
    assert got == want
