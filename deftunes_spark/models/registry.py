"""dbt-like model registry (SURVEY §3 E3, §2.2 K6/K7).

The reference's serving layer is dbt: models declared as SQL (Jinja
``{{ var(...) }}`` schema templating, ``dbt_project.yml:25-42``),
topologically ordered, materialized as TABLE (serving_layer) or VIEW
(bi_views), with declarative data tests. Here a model is a name + a
builder (SQL string with ``{var}`` templating, or a DataFrame
function) + a materialization + optional upstream refs; ``run()``
resolves dependency order and materializes each via Spark — Catalyst
replaces the Redshift planner.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


class ContractViolation(ValueError):
    """A model's built columns do not satisfy its declared contract."""


@dataclass
class Model:
    name: str
    # Either an SQL template (refs other models by name via {name}) or
    # a function (spark, {ref_name: DataFrame}) -> DataFrame.
    sql: str | None = None
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame] | None = None
    materialized: str = "table"  # "table" | "view"
    refs: tuple[str, ...] = ()
    schema: str = "serving"  # target namespace prefix, dbt +schema
    # Declarative column contract (dbt: serving_layer/schema.yml:5-51
    # names every column of every serving model). Empty = no contract;
    # non-empty = the built frame must expose EXACTLY these columns
    # (a missing or renamed column fails the build, and so does an
    # undeclared extra — the dbt-contract semantics).
    columns: tuple[str, ...] = ()

    @property
    def qualified_name(self) -> str:
        return f"{self.schema}_{self.name}" if self.schema else self.name


@dataclass
class ModelRegistry:
    """Holds models; runs them in dependency order (dbt `run` analog)."""

    variables: dict[str, str] = field(default_factory=dict)
    _models: dict[str, Model] = field(default_factory=dict)

    def add(self, model: Model) -> None:
        if model.name in self._models:
            raise ValueError(f"duplicate model {model.name!r}")
        self._models[model.name] = model

    def topo_order(self) -> list[str]:
        ts = TopologicalSorter(
            {name: set(m.refs) for name, m in self._models.items()}
        )
        return [n for n in ts.static_order() if n in self._models]

    def build_df(
        self,
        spark: SparkSession,
        name: str,
        _resolved: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Resolve one model to a DataFrame without materializing it.

        ``_resolved`` memoizes refs across the recursion (and, from
        ``run()``, holds already-materialized upstream models), so a
        shared ancestor is built once — not once per downstream path —
        and a persisted TABLE model is actually read from its table.
        """
        resolved = _resolved if _resolved is not None else {}
        if name in resolved:
            return resolved[name]
        model = self._models[name]
        if model.fn is not None:
            deps = {
                r: self.build_df(spark, r, resolved) for r in model.refs
            }
            out = model.fn(spark, deps)
        else:
            assert (
                model.sql is not None
            ), f"model {name} has neither sql nor fn"
            # Register upstream refs as temp views so the SQL can name
            # them.
            for r in model.refs:
                self.build_df(spark, r, resolved).createOrReplaceTempView(r)
            out = spark.sql(self._render(model.sql))
        self._check_contract(model, out)
        resolved[name] = out
        return out

    @staticmethod
    def _check_contract(model: Model, df: DataFrame) -> None:
        if not model.columns:
            return
        got, want = list(df.columns), list(model.columns)
        if sorted(got) != sorted(want):
            missing = sorted(set(want) - set(got))
            extra = sorted(set(got) - set(want))
            raise ContractViolation(
                f"model {model.name!r} violates its column contract: "
                f"missing={missing} undeclared={extra} (built={got})"
            )

    def _render(self, sql: str) -> str:
        """Substitute ``{var}`` placeholders for KNOWN variables only —
        unlike ``str.format``, literal braces in the SQL (regex
        quantifiers ``{3}``, struct literals) pass through untouched."""
        import re

        if not self.variables:
            return sql
        pattern = "|".join(re.escape(k) for k in self.variables)
        return re.sub(
            r"\{(" + pattern + r")\}",
            lambda m: str(self.variables[m.group(1)]),
            sql,
        )

    def run(self, spark: SparkSession, use_catalog: bool = False) -> list[str]:
        """Materialize every model in topological order.

        ``use_catalog=True`` persists TABLE models via ``saveAsTable``
        (K6, CTAS-per-run like dbt ``+materialized: table``); otherwise
        everything lands as temp views (fast path for tests). VIEW
        models (K7) are always views.
        """
        built: list[str] = []
        resolved: dict[str, DataFrame] = {}
        for name in self.topo_order():
            model = self._models[name]
            df = self.build_df(spark, name, resolved)
            if model.materialized == "table" and use_catalog:
                df.write.mode("overwrite").saveAsTable(model.qualified_name)
                # Downstream models must read the PERSISTED table, not
                # re-derive the lazy plan that produced it.
                persisted = spark.table(model.qualified_name)
                persisted.createOrReplaceTempView(name)
                resolved[name] = persisted
            else:
                df.createOrReplaceTempView(name)
            built.append(name)
        return built
