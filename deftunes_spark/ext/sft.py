"""SFT / conversation-data operators: instruction-tuning corpora are
dialogs — ``array<struct<role,content>>`` message lists — and the two
operations every SFT pipeline needs before tokenization are (1)
flattening dialogs to per-turn rows and (2) auditing role structure
(alternation, empty turns, misplaced system prompts) so malformed
dialogs are quarantined, not trained on.

Reference shape parity: the flatten is the exact explode +
field-access shape of the reference's ``session_items`` fan-out
(terraform/assets/transform_jobs/de-c4w4a2-transform-json-job.py:
114-129 — sessions array → one row per item with struct fields
projected); the audit is per-dialog HOF expressions over the SAME
messages array, so neither operator adds a shuffle beyond whatever
built the dialog relation.

Scale design: both operators are pure column expressions (explode /
filter / zip_with / aggregate) riding the dialog scan — zero
shuffles, whole-stage codegen, no UDFs. At 100 TB the only shuffle in
an SFT ingest is the one that ASSEMBLES dialogs (groupBy dialog key),
which callers own; everything here is embarrassingly parallel after
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One tokenization definition repo-wide (explicit class, never \s —
# Java and RE2 disagree on U+000B).
_WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"


def sft_turn_flatten(
    df: DataFrame,
    id_col: str = "dialog_id",
    messages_col: str = "messages",
) -> DataFrame:
    """Flatten dialogs to per-turn rows: one row per (dialog, turn)
    with 0-based ``turn_idx``, ``role``, ``content`` — the SFT twin of
    the reference's session_items explode (array of structs →
    posexplode → field access). Pure Generate + projection; dialogs
    with NULL/empty message arrays produce no rows (explode drops
    them)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(messages_col)).alias("turn_idx", "_m"),
    ).select(
        id_col,
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("_m.role").alias("role"),
        F.col("_m.content").alias("content"),
    )


def sft_loss_mask_spans(
    df: DataFrame,
    id_col: str = "dialog_id",
    messages_col: str = "messages",
    trainable_role: str = "assistant",
) -> DataFrame:
    """Per-turn TOKEN SPANS + loss-mask flags — the arithmetic an SFT
    tokenizer/collator needs before building label masks: for every
    turn, its token count, its [start_tok, end_tok) offset within the
    concatenated dialog, and ``trainable`` (assistant turns train;
    user/system turns are context and get loss-masked).

    Zero shuffle: the running offset is a prefix sum computed INSIDE
    the messages array with one ``aggregate`` fold (array-accumulator
    struct — O(turns²) array copies per dialog, negligible at dialog
    lengths), then one posexplode. A window-cumsum formulation would
    re-shuffle every dialog by id; the fold rides the scan. Token
    counts use the repo-wide explicit whitespace class.
    """
    # Token counts via the Column API so the module's ONE tokenization
    # definition (_WS_CLASS) is reused — a hand-inlined copy would
    # silently desync from sft_role_audit's total_tokens if the class
    # ever changes.
    counts = F.transform(
        F.col(messages_col),
        lambda m: F.size(
            F.filter(
                F.split(
                    F.trim(F.coalesce(m["content"], F.lit(""))),
                    _WS_CLASS,
                ),
                lambda x: x != "",
            )
        ).cast("bigint"),
    )
    stages = (
        df.select(
            F.col(id_col),
            F.col(messages_col).alias("_m"),
            counts.alias("_tk"),
        )
        .withColumn(
            "_offs",
            F.expr(
                "aggregate(_tk, "
                "named_struct('offs', cast(array() as array<bigint>), "
                "'tot', 0L), "
                "(acc, c) -> named_struct("
                "'offs', array_append(acc.offs, acc.tot), "
                "'tot', acc.tot + c)).offs"
            ),
        )
        .select(
            id_col,
            F.posexplode(F.arrays_zip("_m", "_tk", "_offs")).alias(
                "turn_idx", "_z"
            ),
        )
    )
    return stages.select(
        id_col,
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("_z._m.role").alias("role"),
        F.col("_z._tk").alias("n_tokens"),
        F.col("_z._offs").alias("start_tok"),
        (F.col("_z._offs") + F.col("_z._tk")).alias("end_tok"),
        (F.col("_z._m.role") == trainable_role).alias("trainable"),
    )


def sft_role_audit(
    df: DataFrame,
    id_col: str = "dialog_id",
    messages_col: str = "messages",
    user_role: str = "user",
    assistant_role: str = "assistant",
    system_role: str = "system",
) -> DataFrame:
    """Per-dialog structural audit, entirely as HOF expressions over
    the messages array (no explode, no shuffle, no UDF):

    - ``n_turns`` — message count;
    - ``n_alt_violations`` — adjacent same-role turn pairs (the
      user/assistant alternation check; a system turn breaks
      alternation like any repeated role would);
    - ``n_empty`` — turns whose content is NULL or whitespace-only
      (whitespace = the repo-wide explicit class, the same definition
      ``total_tokens`` splits on, so a zero-token turn is ALWAYS
      flagged empty);
    - ``n_system_misplaced`` — system turns anywhere past position 0
      (the convention: at most one leading system prompt);
    - ``n_unknown_role`` — roles outside {user, assistant, system};
    - ``total_tokens`` — whitespace token count summed over turns
      (the repo-wide explicit-class tokenizer; NULL content counts 0);
    - ``audit_ok`` — zero violations of all four kinds.

    Malformed dialogs surface as rows with ``audit_ok = false`` — the
    quarantine predicate an ingest filters on."""
    m = F.col(messages_col)
    n = F.size(m)
    adjacent_same = F.size(
        F.filter(
            F.zip_with(
                F.slice(m, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(m, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a["role"] == b["role"],
            ),
            lambda x: x,
        )
    )
    # Empty = NULL or WHITESPACE-ONLY under the same explicit class
    # total_tokens splits on (r8 advice: F.trim strips ASCII spaces
    # only, so a tab/newline-only turn passed n_empty while
    # contributing 0 tokens — a zero-token "trainable" turn could
    # carry audit_ok=true into training).
    empty = F.size(
        F.filter(
            m,
            lambda t: t["content"].isNull()
            | (F.regexp_replace(t["content"], _WS_CLASS, "") == ""),
        )
    )
    sys_misplaced = F.size(
        F.filter(
            m,
            lambda t, i: (t["role"] == system_role) & (i > 0),
        )
    )
    unknown = F.size(
        F.filter(
            m,
            lambda t: ~t["role"].isin(
                user_role, assistant_role, system_role
            ),
        )
    )
    tokens = F.aggregate(
        m,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc
        + F.size(
            F.filter(
                F.split(
                    F.trim(F.coalesce(t["content"], F.lit(""))),
                    _WS_CLASS,
                ),
                lambda x: x != "",
            )
        ).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_turns"),
        adjacent_same.cast("int").alias("n_alt_violations"),
        empty.cast("int").alias("n_empty"),
        sys_misplaced.cast("int").alias("n_system_misplaced"),
        unknown.cast("int").alias("n_unknown_role"),
        tokens.alias("total_tokens"),
    ).withColumn(
        "audit_ok",
        (F.col("n_alt_violations") == 0)
        & (F.col("n_empty") == 0)
        & (F.col("n_system_misplaced") == 0)
        & (F.col("n_unknown_role") == 0),
    )
