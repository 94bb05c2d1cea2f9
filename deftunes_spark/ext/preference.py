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


def best_of_n_selection(
    df: DataFrame,
    prompt_id_col: str = "prompt_id",
    sample_id_col: str = "sample_id",
    response_col: str = "response",
    reward_col: str = "reward",
) -> DataFrame:
    """Rejection sampling / best-of-n selection: per prompt group,
    keep the highest-reward sample — the data-prep step of BoN
    distillation and rejection-sampling fine-tuning (sample n
    completions, score with the reward model, train on the winner).

    Deterministic: ties break on the LOWEST sample id, NULL rewards
    sort last (a sample the RM failed to score must never win by
    NULL-ordering accident). Output one row per prompt:
    (prompt_id, sample_id, response, reward, n_samples, reward_gap)
    where ``reward_gap`` = winner − runner-up (NULL for single-sample
    groups) — the selection-confidence signal BoN curricula filter on.

    One window shuffle keyed on the prompt group (groups are n-sized
    by construction, so the partitioning is flat at any corpus size);
    everything else rides it — no second aggregate, the runner-up
    reward comes from ``lead`` over the same sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(prompt_id_col).orderBy(
        F.col(reward_col).desc_nulls_last(), F.col(sample_id_col)
    )
    wg = Window.partitionBy(prompt_id_col)
    ranked = df.select(
        F.col(prompt_id_col),
        F.col(sample_id_col),
        F.col(response_col),
        F.col(reward_col),
        F.row_number().over(w).alias("_rn"),
        F.lead(F.col(reward_col)).over(w).alias("_next_reward"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("n_samples"),
    )
    return ranked.filter(F.col("_rn") == 1).select(
        prompt_id_col,
        sample_id_col,
        response_col,
        reward_col,
        "n_samples",
        F.round(
            F.col(reward_col) - F.col("_next_reward"), 6
        ).alias("reward_gap"),
    )


def reward_margin_calibration(
    df: DataFrame,
    reward_chosen_col: str = "reward_chosen",
    reward_rejected_col: str = "reward_rejected",
    n_bins: int = 10,
) -> DataFrame:
    """Reward-model calibration curve over preference pairs: bucket
    pairs by |reward margin| (clipped to [0, 1], ``n_bins`` equal-width
    bins) and report how often the margin AGREES with the human label
    (margin > 0 — chosen scored higher). A healthy RM's agreement rate
    rises with |margin|; a flat or inverted curve says the margins are
    noise and BoN/DPO weighting on them would amplify it.

    Pure one-pass groupBy on a derived bin key (n_bins groups at any
    corpus size — map-side combined); pairs with a NULL reward on
    either side land in bin −1 so scoring gaps are COUNTED, not
    silently dropped. Output per bin: (margin_bin, bin_lo, n_pairs,
    n_agree, agree_rate, avg_abs_margin)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    margin = (
        F.col(reward_chosen_col).cast("double")
        - F.col(reward_rejected_col).cast("double")
    )
    absm = F.least(F.abs(margin), F.lit(1.0))
    bin_ = F.when(margin.isNull(), F.lit(-1)).otherwise(
        F.least(
            F.floor(absm * n_bins).cast("int"), F.lit(n_bins - 1)
        )
    )
    return (
        df.select(
            bin_.alias("margin_bin"),
            margin.alias("_m"),
            absm.alias("_am"),
        )
        .groupBy("margin_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(F.col("_m") > 0.0, 1).otherwise(0)
            ).cast("bigint").alias("n_agree"),
            F.round(
                F.sum(F.when(F.col("_m") > 0.0, 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("agree_rate"),
            F.round(
                F.avg(F.col("_am")), 6
            ).alias("avg_abs_margin"),
        )
        .withColumn(
            "bin_lo",
            F.when(F.col("margin_bin") < 0, F.lit(None)).otherwise(
                F.round(
                    F.col("margin_bin").cast("double") / n_bins, 6
                )
            ),
        )
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
