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

    def build_df(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve one model to a DataFrame without materializing it."""
        model = self._models[name]
        if model.fn is not None:
            deps = {r: self.build_df(spark, r) for r in model.refs}
            return model.fn(spark, deps)
        assert model.sql is not None, f"model {name} has neither sql nor fn"
        # Register upstream refs as temp views so the SQL can name them.
        for r in model.refs:
            self.build_df(spark, r).createOrReplaceTempView(r)
        rendered = model.sql.format(**self.variables)
        return spark.sql(rendered)

    def run(self, spark: SparkSession, use_catalog: bool = False) -> list[str]:
        """Materialize every model in topological order.

        ``use_catalog=True`` persists TABLE models via ``saveAsTable``
        (K6, CTAS-per-run like dbt ``+materialized: table``); otherwise
        everything lands as temp views (fast path for tests). VIEW
        models (K7) are always views.
        """
        built: list[str] = []
        for name in self.topo_order():
            model = self._models[name]
            df = self.build_df(spark, name)
            if model.materialized == "table" and use_catalog:
                df.write.mode("overwrite").saveAsTable(model.qualified_name)
                spark.table(model.qualified_name).createOrReplaceTempView(name)
            else:
                df.createOrReplaceTempView(name)
            built.append(name)
        return built
