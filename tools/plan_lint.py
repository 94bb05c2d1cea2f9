"""Plan lint: scan EVERY registry query's physical plan for the
anti-patterns that kill 100 TB runs, and write PLANLINT.md.

Rules (each with an explicit, justified allowlist):

- ``CartesianProduct`` — unbounded row explosion.
- ``BroadcastNestedLoopJoin`` — O(n·m) comparisons; legitimate ONLY
  when the build side is a literal/scalar (1-row) frame.
- ``BatchEvalPython`` / ``PythonUDF`` row-at-a-time eval — the slow
  path; every Python boundary must be Arrow-batched
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``).
- ``Exchange SinglePartition`` feeding a Window/Sort — a global
  single-threaded window, the classic silent scale killer. (Scalar
  aggregates to one row are fine and excluded by construction: the
  rule only fires when a Window/Sort consumes the single partition.)

Usage: python tools/plan_lint.py  (sf0.001 inputs; plan-only for pure
queries, executes the few self-materializing ones the registry has).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# name -> justification. An entry here is an AUDITED exception, not a
# silencer: the justification is printed into PLANLINT.md.
ALLOW_BNLJ = {
    "subquery_decorrelate": (
        "scalar-subquery cross join: build side is the 1-row AVG "
        "aggregate, broadcast — O(n) not O(n·m)"
    ),
    "uniqueness_ratio": "1-row scalar-aggregate grid join",
    "completeness": "1-row scalar-aggregate grid join",
    "column_length": "1-row scalar-aggregate grid join",
    "column_values_bound": "1-row scalar-aggregate grid join",
    "unique_not_null": "1-row scalar-aggregate grid join",
    "approx_uniqueness": "1-row scalar-aggregate grid join",
    "bm25_rank": "broadcast of the 1-row corpus-stats aggregate",
    "unigram_kl_divergence": (
        "two 1-row scalar broadcasts (corpus totals + the ln-q sum) "
        "joined onto the observed-cells relation — the sparse-KL "
        "decomposition's whole point is that ONLY scalars cross "
        "group boundaries, never a groups × vocab grid"
    ),
    "lm_perplexity": "broadcast of the 1-row vocab-size aggregate",
    "tfidf_terms": "broadcast of the 1-row doc-count aggregate",
    "decontamination": (
        "broadcast semi-join against the benchmark shingle set "
        "(small by construction)"
    ),
    "gapfill_daily": "calendar spine × per-key 1-row bounds grid",
    "snapshot_drift_psi": (
        "1-row totals grid join onto the n_bins-row bin table"
    ),
    "embedding_drift_psi": (
        "1-row totals grid join onto the n_bins-row bin table"
    ),
    "dataset_card": "1-row corpus-total join for share computation",
    "mixture_sample_sources": "1-row total join for rate computation",
    "mixture_temperature_sample": "1-row total join for rate computation",
    "winsorized_stats": "1-row percentile-bounds broadcast",
    "embedding_quantization": "1-row per-dim min/max bounds broadcast",
    "quantile_profile": "1-row percentile-array broadcast",
    "profile_table": "1-row stats-struct broadcast",
    "dedup_substring": "1-row corpus gram-threshold scalar broadcast",
    "corpus_curation": "chains decontamination's broadcast semi-join",
    "negative_sampling": "1-row corpus-size scalar for modulo mining",
    "dsir_importance": (
        "1-row corpus-totals join onto the n_buckets-row model table"
    ),
    "zipf_rank_frequency": (
        "1-row regression-moments × 1-row corpus-totals join"
    ),
    "source_overlap_minhash": (
        "group-pair stage: build side is the G-row sketch table "
        "(one ~2 KB bottom-k array per group), broadcast — fan-out "
        "bounded by (groups choose 2), never corpus-sized"
    ),
    "source_overlap_kmv_md5": (
        "same group-pair stage as source_overlap_minhash (the md5 "
        "oracle twin, r11): G-row bottom-k sketch table broadcast, "
        "fan-out bounded by (groups choose 2)"
    ),
    "dedup_prefix_filter": (
        "1-row candidate-fan-out gate (assert_true filter over the "
        "Σc² estimate × 1-row doc-count) broadcast onto the prefix "
        "join's a-side — the stopword auto-guard, r8"
    ),
    "ann_incremental": (
        "1-row batch-total aggregate joined onto the ≤ n_lists-row "
        "occupancy table for the drift ratio — model-sized, never "
        "corpus-sized"
    ),
}
ALLOW_SINGLE_PARTITION_WINDOW = {
    "scd2_user_state": (
        "SCD2 change-ordinal window at sf fixture scale; production "
        "partitions by business key (documented in ext/warehouse)"
    ),
    "doc_length_histogram": (
        "cumulative distribution over the POST-AGGREGATION bin table "
        "— bounded by #bins (hundreds of rows at any corpus scale), "
        "never the corpus"
    ),
    "zipf_rank_frequency": (
        "rank window over the TakeOrdered top-max_rank head — bounded "
        "by the constant max_rank (10k), never vocabulary or corpus"
    ),
    "matryoshka_recall": (
        "two rank windows over TakeOrdered top-K heads — bounded by "
        "the constant K=20, never the corpus"
    ),
}


def lint_plan(name: str, plan: str) -> list[str]:
    findings = []
    if "CartesianProduct" in plan:
        findings.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_BNLJ:
        findings.append("BroadcastNestedLoopJoin (unaudited)")
    if "BatchEvalPython" in plan:
        findings.append("row-at-a-time Python UDF (BatchEvalPython)")
    # SinglePartition exchange feeding Window/Sort: look for the
    # pattern within the same plan segment (node ids adjacency in the
    # toString tree: Window/Sort node directly above the exchange).
    if name not in ALLOW_SINGLE_PARTITION_WINDOW:
        for m in re.finditer(r"(Window|WindowGroupLimit|Sort) .*\n"
                             r".*Exchange SinglePartition", plan):
            # Global sort feeding TakeOrdered is fine; a real global
            # Sort/Window over one partition is not.
            findings.append(
                f"single-partition {m.group(1)} (global, unparallel)"
            )
            break
    return findings


def main() -> None:
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    spark = get_spark("planlint")
    spark.sparkContext.setLogLevel("ERROR")
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    allowed_hits: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errs[name] = str(exc)[:160]
            continue
        f = lint_plan(name, plan)
        if f:
            bad[name] = f
        if "BroadcastNestedLoopJoin" in plan and name in ALLOW_BNLJ:
            allowed_hits[name] = ALLOW_BNLJ[name]

    lines = [
        "# PLANLINT — physical-plan anti-pattern scan",
        "",
        "Regenerate with `python tools/plan_lint.py` (sf0.001).",
        "Rules: no CartesianProduct; no un-audited "
        "BroadcastNestedLoopJoin; no row-at-a-time Python UDFs; no "
        "single-partition Window/Sort.",
        "",
        f"Queries scanned: {len(QUERIES) - len(errs)}  "
        f"(build errors: {len(errs)})",
        f"Violations: {sum(len(v) for v in bad.values())}",
        "",
    ]
    if bad:
        lines.append("## VIOLATIONS")
        for name, fs in sorted(bad.items()):
            for f in fs:
                lines.append(f"- `{name}`: {f}")
        lines.append("")
    lines.append("## Audited BroadcastNestedLoopJoin exceptions "
                 "(scalar/broadcast build sides)")
    for name, why in sorted(allowed_hits.items()):
        lines.append(f"- `{name}`: {why}")
    if errs:
        lines.append("")
        lines.append("## Build errors (queries that could not plan)")
        for name, e in sorted(errs.items()):
            lines.append(f"- `{name}`: {e}")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANLINT.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote PLANLINT.md: {len(bad)} violating queries, "
          f"{len(allowed_hits)} audited exceptions, {len(errs)} errors")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
