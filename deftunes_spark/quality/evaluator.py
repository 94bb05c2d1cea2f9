"""Single-pass ruleset evaluation + gate (SURVEY §2.10).

Contract mirrors the Glue DQ evaluation task
(deftunes_api_pipeline.py:120-149): run a ruleset against a table,
produce per-rule PASS/FAIL, and let the pipeline gate downstream tasks
on the outcome.

Execution shape: ALL rules of a ruleset collapse into one
``df.agg(...)`` — a single scan with map-side partial aggregation, so
cost is one pass regardless of rule count. (Exact ``count_distinct``
rules add a shuffle per distinct column; pass ``approx=True`` rules at
100 TB to keep it shuffle-light.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from deftunes_spark.quality.rules import Rule, RuleResult


def evaluate_ruleset(df: DataFrame, rules: Sequence[Rule]) -> list[RuleResult]:
    exprs = [e for rule in rules for e in rule.agg_exprs()]
    row = df.agg(*exprs).collect()[0].asDict()
    return [rule.verdict(row) for rule in rules]


class QualityGateError(RuntimeError):
    def __init__(self, failures: list[RuleResult]):
        self.failures = failures
        names = ", ".join(r.rule_name for r in failures)
        super().__init__(f"quality gate failed: {names}")


def quality_gate(
    df: DataFrame,
    rules: Sequence[Rule],
    expected_failures: Sequence[str] = (),
) -> list[RuleResult]:
    """Evaluate and raise unless every rule passes.

    ``expected_failures`` lists rule names allowed to fail without
    tripping the gate — the declared-but-violated
    ``fact_session.session_id`` uniqueness test (SURVEY §2.5 note) is
    the motivating case: report it, don't crash the pipeline.
    """
    results = evaluate_ruleset(df, rules)
    hard_failures = [
        r
        for r in results
        if not r.passed and r.rule_name not in expected_failures
    ]
    if hard_failures:
        raise QualityGateError(hard_failures)
    return results
