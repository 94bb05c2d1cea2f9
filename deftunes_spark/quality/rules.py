"""DQDL rule types (SURVEY §2.10) + dbt-style data tests (§2.5 A8).

The reference binds four DQDL rule kinds to its silver tables
(terraform/modules/data_quality/glue.tf:1-26):

    IsComplete "col"            — zero NULLs
    ColumnLength "col" = N      — every value exactly N chars
    Uniqueness "col" > r        — distinct/total ratio above r
    ColumnValues "col" <= b     — every value within bound

plus dbt ``unique`` / ``not_null`` data tests on the gold layer
(serving_layer/schema.yml:8-46). Each rule compiles to one or more
Spark aggregate Columns so a whole ruleset evaluates in a SINGLE pass
over the table (one scan, one map-side-combined aggregate — the shape
you want when the table is 100 TB). ``approx_uniqueness=True``
switches the Uniqueness rule to ``approx_count_distinct`` (HLL) for
scans where an exact distinct (which shuffles) is too expensive.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RuleResult:
    rule_name: str
    passed: bool
    metric: float


class Rule:
    """One quality rule compiled to aggregate expressions."""

    name: str = "rule"

    def agg_exprs(self) -> list[Column]:
        raise NotImplementedError

    def verdict(self, row: dict) -> RuleResult:
        raise NotImplementedError

    def _slot(self, i: int = 0) -> str:
        return f"{self.name}__{i}"


@dataclass(frozen=True)
class IsComplete(Rule):
    column: str

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'IsComplete "{self.column}"'

    def agg_exprs(self) -> list[Column]:
        # NULL count == 0. count(*) - count(col) is a cheap single agg.
        return [
            (F.count(F.lit(1)) - F.count(self.column)).alias(self._slot())
        ]

    def verdict(self, row: dict) -> RuleResult:
        nulls = row[self._slot()] or 0
        return RuleResult(self.name, nulls == 0, float(nulls))


@dataclass(frozen=True)
class ColumnLength(Rule):
    column: str
    length: int

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'ColumnLength "{self.column}" = {self.length}'

    def agg_exprs(self) -> list[Column]:
        # Count of non-null values whose length differs from the target.
        bad = F.when(F.length(self.column) != self.length, 1)
        return [F.count(bad).alias(self._slot())]

    def verdict(self, row: dict) -> RuleResult:
        bad = row[self._slot()] or 0
        return RuleResult(self.name, bad == 0, float(bad))


@dataclass(frozen=True)
class Uniqueness(Rule):
    column: str
    threshold: float
    approx: bool = False

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'Uniqueness "{self.column}" > {self.threshold}'

    def agg_exprs(self) -> list[Column]:
        distinct = (
            F.approx_count_distinct(self.column)
            if self.approx
            else F.count_distinct(self.column)
        )
        return [
            distinct.alias(self._slot(0)),
            F.count(self.column).alias(self._slot(1)),
        ]

    def verdict(self, row: dict) -> RuleResult:
        total = row[self._slot(1)] or 0
        ratio = (row[self._slot(0)] / total) if total else 1.0
        return RuleResult(self.name, ratio > self.threshold, ratio)


@dataclass(frozen=True)
class ColumnValues(Rule):
    """``ColumnValues "col" <= bound`` (glue.tf:12)."""

    column: str
    bound: float
    op: str = "<="

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'ColumnValues "{self.column}" {self.op} {self.bound:g}'

    _OPS = ("<=", "<", ">=", ">", "=", "!=")

    def __post_init__(self) -> None:
        # Validate at construction (parse_dqdl time), not first
        # evaluation — a bad op should fail at ruleset load.
        if self.op not in self._OPS:
            raise ValueError(
                f"ColumnValues op must be one of {self._OPS}: {self.op!r}"
            )

    def agg_exprs(self) -> list[Column]:
        col = F.col(self.column)
        table = {
            "<=": col <= self.bound,
            "<": col < self.bound,
            ">=": col >= self.bound,
            ">": col > self.bound,
            "=": col == self.bound,
            "!=": col != self.bound,
        }
        return [F.count(F.when(~table[self.op], 1)).alias(self._slot())]

    def verdict(self, row: dict) -> RuleResult:
        bad = row[self._slot()] or 0
        return RuleResult(self.name, bad == 0, float(bad))


@dataclass(frozen=True)
class NotNull(IsComplete):
    """dbt ``not_null`` data test — same semantics as IsComplete."""

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'NotNull "{self.column}"'


@dataclass(frozen=True)
class Unique(Rule):
    """dbt ``unique`` data test: no key occurs twice.

    Exactly unique (ratio 1.0) — count == count_distinct. The declared
    ``fact_session.session_id`` instance is expected to FAIL by
    construction (multi-item sessions after explode — SURVEY §2.5
    note); the evaluator reports it without raising.
    """

    column: str

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'Unique "{self.column}"'

    def agg_exprs(self) -> list[Column]:
        return [
            F.count_distinct(self.column).alias(self._slot(0)),
            F.count(self.column).alias(self._slot(1)),
        ]

    def verdict(self, row: dict) -> RuleResult:
        dupes = (row[self._slot(1)] or 0) - (row[self._slot(0)] or 0)
        return RuleResult(self.name, dupes == 0, float(dupes))


@dataclass(frozen=True)
class RowCount(Rule):
    """DQDL ``RowCount <op> N`` — table-level volume guard (the rule a
    backfill pipeline uses to catch an empty or truncated increment)."""

    threshold: int
    op: str = ">"

    def __post_init__(self) -> None:
        # A bad op must fail at ruleset LOAD, not with a KeyError
        # after the full table scan (same design rule as ColumnValues).
        if self.op not in (">", ">=", "<", "<=", "="):
            raise ValueError(f"RowCount: unknown op {self.op!r}")

    @property
    def name(self) -> str:  # type: ignore[override]
        return f"RowCount {self.op} {self.threshold}"

    def agg_exprs(self) -> list[Column]:
        return [F.count(F.lit(1)).alias(self._slot())]

    def verdict(self, row: dict) -> RuleResult:
        n = row[self._slot()] or 0
        ok = {
            ">": n > self.threshold,
            ">=": n >= self.threshold,
            "<": n < self.threshold,
            "<=": n <= self.threshold,
            "=": n == self.threshold,
        }[self.op]
        return RuleResult(self.name, ok, float(n))


@dataclass(frozen=True)
class MeanBetween(Rule):
    """DQDL ``Mean "col" between A and B`` — distribution-drift guard.

    The mean is computed as decimal-sum / count so the metric is
    independent of partition order (plain AVG(double) is not)."""

    column: str
    lo: float
    hi: float

    @property
    def name(self) -> str:  # type: ignore[override]
        return f'Mean "{self.column}" between {self.lo:g} and {self.hi:g}'

    def agg_exprs(self) -> list[Column]:
        return [
            F.sum(F.col(self.column).cast("decimal(28,6)")).alias(
                self._slot(0)
            ),
            F.count(self.column).alias(self._slot(1)),
        ]

    def verdict(self, row: dict) -> RuleResult:
        n = row[self._slot(1)] or 0
        # exact decimal sum → double, THEN divide — the same operation
        # order as the SQL oracle, so metrics agree bit-for-bit.
        mean = (float(row[self._slot(0)]) / n) if n else 0.0
        return RuleResult(self.name, self.lo <= mean <= self.hi, mean)


@dataclass(frozen=True)
class CustomSql(Rule):
    """DQDL ``CustomSql`` — an arbitrary scalar aggregate expression
    compared against a threshold; the extension point for rules the
    closed grammar can't express. The expression joins the same single
    aggregation pass as every other rule."""

    label: str
    agg_sql: str
    threshold: float
    op: str = "="

    def __post_init__(self) -> None:
        if self.op not in ("=", ">", ">=", "<", "<="):
            raise ValueError(f"CustomSql: unknown op {self.op!r}")

    @property
    def name(self) -> str:  # type: ignore[override]
        return f"CustomSql [{self.label}] {self.op} {self.threshold:g}"

    def agg_exprs(self) -> list[Column]:
        return [F.expr(self.agg_sql).cast("double").alias(self._slot())]

    def verdict(self, row: dict) -> RuleResult:
        v = float(row[self._slot()] or 0.0)
        ok = {
            "=": v == self.threshold,
            ">": v > self.threshold,
            ">=": v >= self.threshold,
            "<": v < self.threshold,
            "<=": v <= self.threshold,
        }[self.op]
        return RuleResult(self.name, ok, v)
