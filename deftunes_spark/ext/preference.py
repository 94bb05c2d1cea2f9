"""Preference / RLHF data operators: reward-model and DPO training
corpora are prompt-grouped (prompt, chosen, rejected) pairs, and the
two operations every preference pipeline needs before training are
(1) auditing pair structure — chosen ≠ rejected, both non-empty,
prompts consistent within a group, margin metadata sane — so
malformed pairs are quarantined, not trained on, and (2) near-dup
detection across PROMPTS, so evaluation prompts don't leak between
pairs (and between train/eval splits).

Reference shape parity: the pair relation is the same
flat-columns-off-a-struct shape as the reference's session_items
fan-out (terraform/assets/transform_jobs/de-c4w4a2-transform-json-job
.py:114-129); the audit mirrors the SFT role audit's quarantine
contract (``ext/sft.py``) on the pair axis.

Scale design: the audit is per-row column expressions plus ONE keyed
aggregate+join on the prompt-group id (the group-consistency check —
prompt groups are small and uniformly hashed, so the shuffle is flat);
prompt dedup reuses the shingle candidate machinery
(:func:`deftunes_spark.ext.dedup.ngram_jaccard_pairs`) over the
DISTINCT prompt relation — the prompt universe is orders of magnitude
smaller than the pair universe, and the candidate space stays the
banded/shared-shingle equi-join, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The repo-wide tokenization definition (explicit class, never \\s) —
# shared with ext.sft so pair token stats can never desync from the
# dialog token stats they are compared against.
from deftunes_spark.ext.sft import _WS_CLASS


def _tok_count(col: F.Column) -> F.Column:
    """Whitespace token count under the repo-wide explicit class;
    NULL content counts 0 (the SFT total_tokens rule)."""
    return F.size(
        F.filter(
            F.split(F.trim(F.coalesce(col, F.lit(""))), _WS_CLASS),
            lambda x: x != "",
        )
    ).cast("bigint")


def _ws_norm(col: F.Column) -> F.Column:
    """Whitespace-normalized text: runs of the explicit class collapse
    to one space, ends trimmed — so 'a  b' and 'a\\nb' compare equal
    in the degenerate-pair check, the same definition a tokenizer
    applies before the pair ever reaches a reward model."""
    return F.trim(F.regexp_replace(col, _WS_CLASS, " "))


def preference_pair_audit(
    df: DataFrame,
    pair_id_col: str = "pair_id",
    prompt_id_col: str = "prompt_id",
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    reward_chosen_col: str | None = None,
    reward_rejected_col: str | None = None,
) -> DataFrame:
    """Per-pair structural audit — the quarantine predicate before
    reward-model / DPO training:

    - ``prompt_empty`` / ``chosen_empty`` / ``rejected_empty`` — NULL
      or whitespace-only under the repo-wide explicit class (the
      ``ext.sft`` r8-advice rule: a zero-token side is ALWAYS flagged);
    - ``degenerate_pair`` — chosen and rejected are equal after
      whitespace normalization (a pair that teaches the model nothing
      and corrupts the margin);
    - ``prompt_mismatch`` — this pair's prompt differs from its
      prompt-group's canonical prompt (min over the group): grouped
      losses assume one prompt per group, and a drifted prompt
      silently breaks the within-group comparison;
    - ``nonpositive_margin`` — reward metadata present but
      ``reward_chosen − reward_rejected ≤ 0`` (or either reward NULL):
      the label contradicts the rewards that produced it;
    - token stats: ``n_tokens_chosen`` / ``n_tokens_rejected`` and the
      rounded ``len_ratio`` (chosen/rejected) — the length-bias
      diagnostic every RM evaluation wants;
    - ``margin`` — the reward delta (NULL when rewards are absent);
    - ``audit_ok`` — none of the five violation flags.

    One keyed aggregate + join on ``prompt_id_col`` (the group
    canonical); everything else is per-row codegen expressions riding
    the scan. Rewards are optional: omit the columns and the margin
    check is skipped (margin NULL, flag false)."""
    prompt = F.col(prompt_col)
    chosen = F.col(chosen_col)
    rejected = F.col(rejected_col)

    def _empty(c: F.Column) -> F.Column:
        return c.isNull() | (F.regexp_replace(c, _WS_CLASS, "") == "")

    canon = df.groupBy(prompt_id_col).agg(
        F.min(prompt_col).alias("_canon_prompt")
    )
    # LEFT join: an equi-join would silently DROP pairs whose
    # prompt_id is NULL (null keys never match) — exactly the
    # malformed rows an audit exists to surface. A NULL-group pair
    # keeps its row; its canonical is NULL, so a non-NULL prompt
    # there flags prompt_mismatch.
    out = df.join(canon, [prompt_id_col], "left")
    if reward_chosen_col is not None and reward_rejected_col is not None:
        margin = (
            F.col(reward_chosen_col).cast("double")
            - F.col(reward_rejected_col).cast("double")
        )
        bad_margin = margin.isNull() | (margin <= 0.0)
    else:
        margin = F.lit(None).cast("double")
        bad_margin = F.lit(False)
    n_c = _tok_count(chosen)
    n_r = _tok_count(rejected)
    flags = out.select(
        F.col(pair_id_col),
        F.col(prompt_id_col),
        _empty(prompt).alias("prompt_empty"),
        _empty(chosen).alias("chosen_empty"),
        _empty(rejected).alias("rejected_empty"),
        (
            chosen.isNotNull()
            & rejected.isNotNull()
            & (_ws_norm(chosen) == _ws_norm(rejected))
        ).alias("degenerate_pair"),
        # null-safe inequality: a NULL prompt in a group with a
        # non-NULL canonical IS a mismatch (and also prompt_empty).
        (~prompt.eqNullSafe(F.col("_canon_prompt"))).alias(
            "prompt_mismatch"
        ),
        bad_margin.alias("nonpositive_margin"),
        n_c.alias("n_tokens_chosen"),
        n_r.alias("n_tokens_rejected"),
        F.when(
            n_r > 0, F.round(n_c.cast("double") / n_r.cast("double"), 6)
        ).alias("len_ratio"),
        F.round(margin, 6).alias("margin"),
    )
    return flags.withColumn(
        "audit_ok",
        ~(
            F.col("prompt_empty")
            | F.col("chosen_empty")
            | F.col("rejected_empty")
            | F.col("degenerate_pair")
            | F.col("prompt_mismatch")
            | F.col("nonpositive_margin")
        ),
    )


def preference_prompt_dedup(
    df: DataFrame,
    prompt_id_col: str = "prompt_id",
    prompt_col: str = "prompt",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate PROMPTS across preference pairs: the leakage
    check before an RM/DPO train-eval split — two prompt groups whose
    prompts are n-gram-Jaccard near-dups must land on the same side of
    the split (and usually one of them should be dropped outright).

    Distinct (prompt_id, prompt) first — the pair relation repeats
    each prompt once per response pair, and deduplicating the text
    relation before shingling keeps the candidate join keyed on the
    (much smaller) prompt universe — then the exact shared-shingle
    candidate machinery of
    :func:`deftunes_spark.ext.dedup.ngram_jaccard_pairs` verbatim
    (``max_doc_freq`` passes through as the stopword-shingle skew
    guard for 100 TB prompt sets). Output: (id_a, id_b, jaccard) with
    id_a < id_b — prompt-GROUP ids, ready for the connected-components
    / canonical-survivor step the dedup family already ships."""
    from deftunes_spark.ext.dedup import ngram_jaccard_pairs

    prompts = (
        df.select(
            F.col(prompt_id_col).alias("prompt_id"),
            F.col(prompt_col).alias("prompt"),
        )
        .filter(F.col("prompt").isNotNull())
        .distinct()
    )
    return ngram_jaccard_pairs(
        prompts,
        "prompt_id",
        "prompt",
        n=n,
        threshold=threshold,
        max_doc_freq=max_doc_freq,
    )
