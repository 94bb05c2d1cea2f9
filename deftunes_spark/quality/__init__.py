from deftunes_spark.quality.rules import (  # noqa: F401
    ColumnLength,
    ColumnValues,
    IsComplete,
    NotNull,
    Rule,
    RuleResult,
    Uniqueness,
    Unique,
)
from deftunes_spark.quality.dqdl import parse_dqdl  # noqa: F401
from deftunes_spark.quality.evaluator import evaluate_ruleset  # noqa: F401
from deftunes_spark.quality.rulesets import REFERENCE_RULESETS  # noqa: F401
