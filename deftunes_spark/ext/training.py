"""Training-data preparation operators: context-window chunking,
deterministic negative-pair sampling, outlier winsorization, and
linear int8 embedding quantization.

These extend the corpus-curation family (``ext.curation``) with the
ops an LLM pre-training pipeline runs AFTER dedup/filtering: splitting
long documents into model-context-sized chunks, mining contrastive
negatives, clipping metric outliers, and compressing embeddings for
storage/ANN. None of these exist in the reference (its transform
surface is the Glue jobs, ``terraform/assets/transform_jobs/*.py``) —
they are engine extensions per the north-star brief.

Scale notes (SCALE.md has the long-form versions):

- **chunking** explodes each document into ``ceil((n-c)/s)+1`` chunks
  — a flatMap-shaped, shuffle-free narrow transform. Output row count
  is bounded by ``tokens/stride``, so the op is linear in corpus size
  and embarrassingly parallel.
- **negative sampling** never enumerates the cross product: anchors
  and candidates meet on a BUCKET equi-join (hash-partitioned both
  sides), and the per-anchor top-k keeps the candidate fan-in at
  ``|bucket|``, tunable via ``n_buckets``. Selection is a
  content-derived md5 rank — deterministic under retries (same
  SPARK-23207 reasoning as ``ext.scale``'s salts).
- **winsorization** is two jobs: a tiny exact-percentile aggregate
  (broadcast back as a 1-row bound frame) and a narrow clip pass. At
  100 TB swap the exact percentile for ``percentile_approx`` — the
  clip pass is unchanged.
- **quantization** computes per-dimension min/max via posexplode +
  partial-aggregating groupBy (combiner keeps the shuffle at
  ``dim × partitions`` rows), broadcasts the kilobyte scale table,
  and quantizes in one narrow pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"


def fim_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate: float = 0.6,
    spm_rate: float = 0.5,
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022): rewrite a
    ``fim_rate`` fraction of documents as infilling examples — split
    the text at two cut points into (prefix, middle, suffix) and emit
    either PSM (``<|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M``) or
    SPM (``<|fim_prefix|><|fim_suffix|>S<|fim_middle|>PM`` — the
    joined variant) with probability ``spm_rate``; the rest pass
    through untouched. The standard data-side augmentation that
    teaches a causal LM to infill without changing the architecture.

    Everything is DETERMINISTIC content-derived arithmetic, not RNG:
    the gate, the format choice, and both cut points come from md5
    hex prefixes of (seed || role || id) — the ``ext.sampling``
    retry-deterministic discipline, replayable in any engine (the
    DuckDB oracle recomputes every byte). Character-level cuts
    (uniform over [0, len] via the md5 residue), the paper's
    context-level ablation; token-level FIM composes by running this
    AFTER ``bpe_encode`` on the unit strings. Pure codegen projection:
    one md5+substring pass, zero shuffle, zero UDF.

    Output: (id, fim_applied, fim_format ∈ {psm, spm, none},
    fim_text). NULL text passes through (format 'none', text NULL)."""
    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError("fim_rate must be in [0, 1]")
    if not 0.0 <= spm_rate <= 1.0:
        raise ValueError("spm_rate must be in [0, 1]")

    def _h(role: str) -> F.Column:
        # md5 hex prefix → int in [0, 16^6): the md5-bucket idiom.
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}|{role}|"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")

    n = F.length(F.col(text_col))
    gate = (_h("gate") % 1000) < int(round(fim_rate * 1000))
    spm = (_h("fmt") % 1000) < int(round(spm_rate * 1000))
    c1r = _h("cut1") % (n + 1)
    c2r = _h("cut2") % (n + 1)
    lo = F.least(c1r, c2r).cast("int")
    hi = F.greatest(c1r, c2r).cast("int")
    # substring is 1-based: prefix = [1, lo], middle = (lo, hi],
    # suffix = (hi, len] — a exact 3-way partition of the text.
    prefix = F.col(text_col).substr(F.lit(1), lo)
    middle = F.col(text_col).substr(lo + 1, hi - lo)
    suffix = F.col(text_col).substr(hi + 1, n - hi)
    psm_text = F.concat(
        F.lit(FIM_PRE), prefix, F.lit(FIM_SUF), suffix,
        F.lit(FIM_MID), middle,
    )
    spm_text = F.concat(
        F.lit(FIM_PRE), F.lit(FIM_SUF), suffix,
        F.lit(FIM_MID), prefix, middle,
    )
    applied = F.col(text_col).isNotNull() & gate
    return docs.select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(~applied, F.lit("none"))
        .when(spm, F.lit("spm"))
        .otherwise(F.lit("psm"))
        .alias("fim_format"),
        F.when(~applied, F.col(text_col))
        .when(spm, spm_text)
        .otherwise(psm_text)
        .alias("fim_text"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split each document into overlapping windows of ``chunk_tokens``
    whitespace tokens, advancing ``stride`` tokens per window — the
    standard context-window packing prep (stride < chunk_tokens gives
    token overlap for continuity across chunk boundaries).

    Output: one row per (document, chunk_index) with the chunk text
    and its token count. Every document yields >= 1 chunk (an empty
    text yields one empty chunk) so no row silently disappears.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    # NULL text folds to the empty-token case (coalesce BEFORE split:
    # size(NULL) is -1 under legacy sizeOfNull, which would otherwise
    # leak a -1 token count and NULL chunk_text into the output).
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != "",
    )
    n = F.size(toks)
    # ceil(max(n - chunk, 0) / stride) + 1 windows cover all tokens.
    n_chunks = (
        F.ceil(
            F.greatest(n - F.lit(chunk_tokens), F.lit(0))
            / F.lit(float(stride))
        ).cast("int")
        + F.lit(1)
    )
    exploded = (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
                "_pos", "chunk_id"
            ),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                F.col("_toks"),
                F.col("chunk_id") * stride + 1,
                F.lit(chunk_tokens),
            ).alias("_chunk_toks"),
        )
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join("_chunk_toks", " ").alias("chunk_text"),
        F.size("_chunk_toks").cast("long").alias("chunk_tokens"),
    )


def _counted_with_shard(
    docs: DataFrame, id_col: str, text_col: str, shards: int
) -> DataFrame:
    """(id, shard, token_count) — the shared front half of both
    packers. ONE definition so the whitespace-token rule and the
    md5-derived shard hash (engine-portable, mirrored in the SQL
    oracle) can never drift between the concat and best-fit paths."""
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda t: t != "",
    )
    shard = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % shards
    ).cast("int")
    return docs.select(
        F.col(id_col),
        shard.alias("shard"),
        F.size(toks).cast("long").alias("token_count"),
    )


def sequence_pack_concat(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 512,
    shards: int = 16,
    count_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents
    are laid end-to-end in id order and the token stream is cut into
    fixed-``capacity`` training sequences (documents straddle cuts —
    the GPT-2/Pile packing recipe, zero padding waste by construction).

    Returns one row per document: its shard, token count, starting
    offset in the shard's stream, the first sequence it lands in, and
    how many sequences it spans. Empty documents occupy no tokens but
    keep a deterministic (first_seq, n_seqs=1) slot so no row
    disappears.

    Shape at 100 TB: the only shuffle is the window over (shard,
    id) — shard count scales with the cluster, each shard's running
    sum is a partition-local scan. The shard hash is md5-derived (not
    xxhash64) so the SQL oracle mirrors it bit-for-bit.
    """
    if capacity < 1 or shards < 1:
        raise ValueError("capacity and shards must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(id_col)
    if count_col is not None:
        # Pack on a PRECOMPUTED token count (e.g. a tokenizer
        # stage's n_tokens) instead of re-counting whitespace words
        # from text — the e2e pipeline path, same shard hash.
        shard = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % shards
        ).cast("int")
        counted = docs.select(
            F.col(id_col),
            shard.alias("shard"),
            F.col(count_col).cast("long").alias("token_count"),
        )
    else:
        counted = _counted_with_shard(docs, id_col, text_col, shards)
    packed = counted.withColumn(
        "start_offset",
        F.coalesce(
            F.sum("token_count").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    )
    end_tok = F.col("start_offset") + F.greatest(
        F.col("token_count"), F.lit(1)
    )
    return packed.select(
        id_col,
        "shard",
        "token_count",
        "start_offset",
        F.floor(F.col("start_offset") / capacity).alias("first_seq"),
        (
            F.floor((end_tok - 1) / capacity)
            - F.floor(F.col("start_offset") / capacity)
            + 1
        ).cast("long").alias("n_seqs"),
    )


def sequence_pack_bestfit(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 512,
    shards: int = 16,
) -> DataFrame:
    """Best-fit-decreasing sequence packing: within each shard, whole
    documents are packed into bins of ``capacity`` tokens without
    splitting (the SFT/document-boundary-respecting recipe — no
    cross-document attention contamination). Documents longer than
    ``capacity`` get a singleton bin, flagged ``oversize``.

    Deterministic: per shard, docs are processed longest-first with id
    as tie-break, each placed into the fullest bin it fits (best-fit);
    bin ids are then renumbered by first-doc order. One
    ``applyInPandas`` per shard — the per-task state is the shard's
    (id, token_count) pairs, never the text, so a shard is bounded by
    docs/shards rows of two scalars. Padding waste is
    ``1 - sum(tokens)/(bins*capacity)``, pytest-asserted against the
    concat packer's zero-waste baseline.
    """
    if capacity < 1 or shards < 1:
        raise ValueError("capacity and shards must be >= 1")
    import pandas as pd

    counted = _counted_with_shard(docs, id_col, text_col, shards)
    id_type = dict(counted.dtypes)[id_col]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["token_count", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # bins: list of [remaining_capacity, [row_indices]]
        bins: list[list] = []
        assign = [0] * len(pdf)
        for i, tc in enumerate(pdf["token_count"]):
            tc = int(tc)
            if tc >= capacity:
                # rem = -1 marks the bin CLOSED: a zero-token doc
                # would otherwise best-fit into it (0 <= rem 0) and
                # break the oversize-docs-pack-alone invariant.
                bins.append([-1, [i]])
                assign[i] = len(bins) - 1
                continue
            # Best fit: the fullest bin that still takes tc (ties →
            # lowest bin index: deterministic).
            best, best_rem = -1, capacity + 1
            for b, (rem, _) in enumerate(bins):
                if tc <= rem < best_rem:
                    best, best_rem = b, rem
            if best < 0:
                bins.append([capacity - tc, [i]])
                assign[i] = len(bins) - 1
            else:
                bins[best][0] -= tc
                bins[best][1].append(i)
                assign[i] = best
        # Renumber bins by the minimum contained id — stable across
        # input partition order.
        key = {
            b: min(pdf[id_col].iloc[rows]) for b, (_, rows) in enumerate(bins)
        }
        order = {
            b: r for r, b in enumerate(sorted(key, key=lambda b: key[b]))
        }
        out = pdf[[id_col, "shard", "token_count"]].copy()
        out["bin_id"] = [order[b] for b in assign]
        out["oversize"] = out["token_count"] > capacity
        return out

    return counted.groupBy("shard").applyInPandas(
        pack,
        schema=(
            f"{id_col} {id_type}, shard int, token_count long, "
            "bin_id long, oversize boolean"
        ),
    )


def negative_pairs(
    docs: DataFrame,
    id_col: str,
    k: int = 2,
    n_buckets: int = 8,
    anchor_pred=None,
) -> DataFrame:
    """Mine ``k`` pseudo-random negative partners per anchor row for
    contrastive training, WITHOUT a cross join.

    Both sides are assigned to one of ``n_buckets`` buckets; anchors
    meet only the candidates in their bucket (hash-partitioned
    equi-join), and the k winners per anchor are picked by a
    content-derived md5 rank over the pair key — fully deterministic,
    so retried tasks reproduce identical pairs and the op is mirrorable
    in ANSI SQL. Candidate fan-in per anchor is ``|corpus|/n_buckets``;
    size ``n_buckets`` so a bucket fits comfortably in a task.

    ``anchor_pred``: optional Column filtering which rows are anchors
    (default: all rows). The candidate side is always the full corpus.
    """
    if k < 1 or n_buckets < 1:
        raise ValueError("k and n_buckets must be >= 1")
    id_type = docs.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # `%` on a string id casts to double -> NULL buckets -> the
        # join matches nothing and the op silently returns ZERO
        # negatives; fail loudly (string ids can pre-derive a numeric
        # key, e.g. ext.sampling's md5 bucket).
        raise TypeError(
            f"negative_pairs needs an integral id column for modulo "
            f"bucketing; {id_col} is {id_type}"
        )
    bucket = (F.col(id_col) % n_buckets).alias("_bucket")
    cand = docs.select(
        F.col(id_col).alias("neg_id"),
        (F.col(id_col) % n_buckets).alias("_bucket"),
    )
    anchors = docs if anchor_pred is None else docs.filter(anchor_pred)
    a = anchors.select(F.col(id_col).alias("anchor_id"), bucket)
    pair_rank = F.md5(
        F.concat_ws(":", F.col("anchor_id"), F.col("neg_id"))
    )
    joined = (
        a.join(cand, "_bucket")
        .filter(F.col("anchor_id") != F.col("neg_id"))
        .select("anchor_id", "neg_id", pair_rank.alias("_r"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy("_r", "neg_id")
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "neg_id",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lower_pct: float = 0.01,
    upper_pct: float = 0.99,
    keep_bounds: bool = False,
) -> DataFrame:
    """Clip ``value_col`` to its exact [lower_pct, upper_pct]
    percentile band (winsorization — the standard outlier treatment
    before computing susceptible statistics like means over
    heavy-tailed metrics).

    Adds ``<value_col>_w`` (clipped value); original column retained.
    ``keep_bounds=True`` also keeps the ``_lo_bound``/``_hi_bound``
    columns. The percentile aggregate is one tiny job whose 1-row
    result broadcast-joins back — the clip pass itself is narrow. At
    100 TB substitute ``percentile_approx`` for the exact percentile;
    the plan shape is identical.
    """
    if not (0.0 <= lower_pct < upper_pct <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    bounds = df.select(
        F.expr(
            f"percentile({value_col}, {lower_pct!r})"
        ).alias("_lo_bound"),
        F.expr(
            f"percentile({value_col}, {upper_pct!r})"
        ).alias("_hi_bound"),
    )
    clipped = df.join(F.broadcast(bounds)).withColumn(
        f"{value_col}_w",
        F.least(
            F.greatest(F.col(value_col), F.col("_lo_bound")),
            F.col("_hi_bound"),
        ),
    )
    if keep_bounds:
        return clipped
    return clipped.drop("_lo_bound", "_hi_bound")


def quantization_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension min/max/scale for linear int8 quantization of an
    ``array<float>`` embedding column.

    ``scale = (max - min) / 255`` maps each dimension onto [0, 255].
    The posexplode shuffles only (dim, partial-min, partial-max) pairs
    after map-side combine — never the vectors themselves.
    """
    per_dim = (
        emb.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "dim", "v"
            )
        )
        .groupBy("dim")
        .agg(F.min("v").alias("dim_min"), F.max("v").alias("dim_max"))
    )
    return per_dim.select(
        F.col("dim").cast("long").alias("dim"),
        "dim_min",
        "dim_max",
        ((F.col("dim_max") - F.col("dim_min")) / F.lit(255.0)).alias(
            "scale"
        ),
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Quantize each vector to int8 codes using per-dimension linear
    scales (from :func:`quantization_stats` unless supplied).

    The stats table (``dim`` rows — kilobytes) is collected to a
    literal array and applied in one narrow ``transform`` pass: no
    join, no shuffle, vectors never leave their partition. Codes are
    ``round((v - min) / scale)`` clamped to [0, 255]; zero-width
    dimensions map to 0.
    """
    if stats is None:
        stats = quantization_stats(emb, vec_col)
    rows = sorted(stats.collect(), key=lambda r: r["dim"])
    mins = F.array(*[F.lit(float(r["dim_min"])) for r in rows])
    scales = F.array(
        *[F.lit(float(r["scale"])) for r in rows]
    )
    dim = len(rows)

    def code(x, i):
        s = F.get(scales, i)
        m = F.get(mins, i)
        raw = F.when(s > 0, F.round((x - m) / s)).otherwise(F.lit(0.0))
        # x is NULL when the vector's length mismatches the stats
        # dimension (zip_with pads with NULL): surface a NULL code —
        # a silent 0 would be indistinguishable from a real value at
        # dim_min and corrupt the ANN code table.
        return F.when(
            x.isNotNull(),
            F.least(F.greatest(raw, F.lit(0.0)), F.lit(255.0)).cast(
                "int"
            ),
        )

    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        idx,
        lambda x, i: code(x, i),
    )
    return emb.select(
        F.col(id_col), codes.alias("codes")
    )


def dataset_card(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source datasheet row: document count, total whitespace
    tokens, mean document length — the summary table a dataset card /
    mixture designer reads. One partial-aggregating groupBy; token
    counting is a column expression (no UDF)."""
    # NULL text contributes 0 tokens / 0 chars (size(NULL) would add
    # -1 per null doc under legacy sizeOfNull and skew the card).
    toks = F.size(
        F.filter(
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+"
            ),
            lambda t: t != "",
        )
    )
    return (
        docs.select(
            F.col(source_col),
            toks.alias("_n_toks"),
            F.coalesce(F.length(text_col), F.lit(0)).alias("_n_chars"),
        )
        .groupBy(source_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_n_toks").cast("long").alias("total_tokens"),
            F.round(F.avg("_n_chars"), 6).alias("avg_chars"),
        )
    )
