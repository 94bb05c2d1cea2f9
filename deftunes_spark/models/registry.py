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
    # "table" (CTAS per run), "view", or "versioned_table" — the
    # opt-in Iceberg-style materialization: every rebuild commits a new
    # immutable version under the registry's versioned_base_path
    # (io/versioned.py), so silver/gold models get time travel and
    # concurrent-rebuild safety end-to-end.
    materialized: str = "table"
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
    # Filesystem root for "versioned_table" models; each lands at
    # {versioned_base_path}/{qualified_name}.
    versioned_base_path: str | None = None
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
            if model.materialized == "versioned_table":
                from deftunes_spark.io.versioned import (
                    read_version,
                    write_versioned,
                )

                path = self._versioned_path(name)
                v = write_versioned(spark, df, path, mode="overwrite")
                # Downstream reads the COMMITTED snapshot — same
                # persisted-not-lazy rule as catalog tables, plus the
                # version pin means a concurrent rebuild publishing
                # v+1 mid-run cannot shift what this run's downstream
                # models see.
                persisted = read_version(spark, path, version=v)
                persisted.createOrReplaceTempView(name)
                resolved[name] = persisted
            elif model.materialized == "table" and use_catalog:
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

    def _versioned_path(self, name: str) -> str:
        if self.versioned_base_path is None:
            raise ValueError(
                f"model {name!r} is materialized='versioned_table' but "
                "the registry has no versioned_base_path"
            )
        model = self._models[name]
        return f"{self.versioned_base_path}/{model.qualified_name}"

    def read_model_version(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        as_of_ts_ms: int | None = None,
    ) -> DataFrame:
        """Time travel THROUGH the registry: read a committed snapshot
        of a versioned_table model (latest when neither selector is
        given). The dbt-has-no-answer feature the reference gets from
        Iceberg (transform-json-job.py:156-187): 'what did
        serving_sales look like before this morning's rebuild?'."""
        model = self._models[name]
        if model.materialized != "versioned_table":
            raise ValueError(
                f"model {name!r} is materialized={model.materialized!r}, "
                "not 'versioned_table'"
            )
        from deftunes_spark.io.versioned import read_version

        return read_version(
            spark,
            self._versioned_path(name),
            version=version,
            as_of_ts_ms=as_of_ts_ms,
        )
