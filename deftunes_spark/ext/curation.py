"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, segment-level (CCNet-style line) dedup,
embedding semantic dedup (SemDeDup-shaped), and target-mixture
reweighting.

These extend the reference's curation surface (the reference's own
scope is the DeFtunes ETL — SURVEY §2; this module is north-star
extension work per BASELINE "north_star").

Scale design per operator:

- **decontaminate**: the eval/benchmark side is small by construction
  (benchmarks are thousands of documents, not billions), so its
  distinct shingle set broadcasts; the train side streams through one
  explode → broadcast-semi-join → groupBy(doc). No shuffle of text
  payloads, one shuffle of (doc_id, matches).
- **segment_dedup**: the segment-frequency table groups by segment
  HASH (map-side combine), and only the *hot* segments (doc_freq >
  threshold — a tiny, boilerplate-shaped set by Zipf) are broadcast
  back for the anti-filter. The document payload is never shuffled:
  segments are re-assembled per-row from the filtered array, not via
  a groupBy reassembly.
- **semantic_dedup**: candidate pairs come from an equi-join on the
  coarse cluster id (IVF assignment), never a cross join; within a
  cluster the pair count is bounded by cluster size, which the
  quantizer's k controls at scale.
- **mixture_sample**: per-domain rates are computed from one
  aggregate (counts are a kilobyte driver table at any scale) and the
  selection itself is the deterministic md5-bucket filter of
  ``ext.sampling`` — re-runnable, partition-layout-independent, zero
  shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deftunes_spark.ext.dedup import shingles
from deftunes_spark.ext.lineage import cut_lineage
from deftunes_spark.ext.sampling import _BUCKETS, _hash_bucket


# ---------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap with an eval set)
# ---------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_matches: int = 1,
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_matches`` distinct word
    n-grams with any eval/benchmark document (the standard n-gram
    decontamination used for LLM training corpora; production runs use
    n≈13 — here ``n`` is a parameter because the fixture documents are
    short).

    Returns one row per train document: (id, matched_ngrams,
    contaminated). The eval shingle set is deduplicated and
    broadcast — train-side text never shuffles; the only exchange is
    the per-doc match count aggregate.
    """
    train_sh = shingles(train, id_col, text_col, n)
    # Blank/whitespace-only eval rows degenerate to the '' shingle,
    # which would cross-match every blank train document as
    # "contaminated" on zero shared content — drop it from the
    # broadcast set.
    eval_sh = (
        shingles(eval_df, id_col, text_col, n)
        .filter(F.col("shingle") != "")
        .select("shingle")
        .distinct()
    )
    matches = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("matched_ngrams"))
    )
    return (
        train.select(id_col)
        .join(matches, id_col, "left")
        .select(
            id_col,
            F.coalesce("matched_ngrams", F.lit(0).cast("bigint")).alias(
                "matched_ngrams"
            ),
            (
                F.coalesce("matched_ngrams", F.lit(0)) >= min_matches
            ).alias("contaminated"),
        )
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_matches: int = 1,
    m_bits: int = 1 << 17,
    k: int = 3,
    hash_fn: str = "xxhash64",
    literal_max_words: int = 4096,
) -> DataFrame:
    """Bloom-filter decontamination: the scale path of
    :func:`decontaminate` for benchmark sets too large to broadcast as
    an exact shingle set. Per-shingle state is ``k`` bits in an
    ``m_bits`` filter (~1.2 bytes/shingle at 1% FP with k=3 vs ~50+
    bytes of broadcast string) — one-sided error: every exact match is
    flagged (no false negatives); false positives OVER-flag at the
    classic ``(1 − e^{-kn/m})^k`` rate, the safe direction for
    decontamination.

    Build is distributed: eval shingles hash to ``k`` positions
    map-side, positions bit-pack into 64-bit words via a
    ``groupBy(word) ∘ bit_or`` (the only build shuffle carries (word,
    mask) pairs, ≤ m/64 rows), and the word table collects to the
    driver BOUNDED at m/64 longs. Probe is per-row over each train
    document's shingle array — the text never shuffles:

    - ≤ ``literal_max_words``: the filter rides the plan as one
      constant-folded array literal referenced through a temp column
      (the `ivf_assign` expression-tree discipline) — pure codegen.
    - above: a numpy uint64 bitset inside ``mapInPandas`` —
      Arrow-batched, O(1) per probe, no expression-tree blowup (the
      same auto-switch shape as ``segment_dedup``'s hot set).

    ``hash_fn="md5"`` mirrors bit-for-bit into ANSI SQL (15 hex chars
    → BIGINT), so even the false positives are value-hash-checkable
    cross-engine; xxhash64 is the production default. Output schema
    matches :func:`decontaminate`.
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash fn {hash_fn!r}")
    if m_bits < 64 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    from deftunes_spark.ext.dedup import shingles

    m_words = m_bits // 64

    def _pos_sql(seed: int, s: str) -> str:
        prefix = f"bl{seed}|"
        if hash_fn == "xxhash64":
            h = f"xxhash64(concat('{prefix}', {s}))"
        else:
            h = (
                f"cast(conv(substr(md5(concat('{prefix}', {s})), 1, 15),"
                " 16, 10) as bigint)"
            )
        return f"pmod({h}, {m_bits})"

    eval_sh = (
        shingles(eval_df, id_col, text_col, n)
        .filter(F.col("shingle") != "")
        .select("shingle")
        .distinct()
    )
    positions = eval_sh.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(_pos_sql(i, "shingle") for i in range(k))
                + ")"
            )
        ).alias("p")
    )
    words = (
        positions.select(
            F.expr("cast(p div 64 as int)").alias("w"),
            # F.shiftleft only takes a literal shift count — the
            # column-shift spelling must go through SQL.
            F.expr(
                "shiftleft(cast(1 as bigint), cast(p % 64 as int))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    masks = {r["w"]: r["mask"] for r in words}

    from deftunes_spark.ext.dedup import shingle_array_sql

    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+")
    sh_expr = f"array_distinct({shingle_array_sql(n)})"
    base = train.select(
        F.col(id_col), toks.alias("_toks")
    ).select(id_col, F.expr(sh_expr).alias("_sh"))

    if m_words <= literal_max_words:
        arr = "array(" + ", ".join(
            f"{masks.get(w, 0)}L" for w in range(m_words)
        ) + ")"
        # Bind the k positions once per shingle (hash computed once),
        # then test bits over the bound array.
        pos_arr = "array(" + ", ".join(
            _pos_sql(i, "s") for i in range(k)
        ) + ")"
        pred = " AND ".join(
            f"(element_at(_bl, cast(element_at(ps, {j + 1}) div 64 "
            f"as int) + 1) & shiftleft(cast(1 as bigint), "
            f"cast(element_at(ps, {j + 1}) % 64 as int))) != 0"
            for j in range(k)
        )
        flagged = (
            base.withColumn("_bl", F.expr(arr))
            .select(
                id_col,
                F.expr(
                    f"size(filter(transform(_sh, s -> {pos_arr}), "
                    f"ps -> {pred}))"
                ).cast("bigint").alias("matched_ngrams"),
            )
        )
    else:
        import numpy as np
        import pandas as pd

        bits = np.zeros(m_words, dtype=np.uint64)
        for w, mk in masks.items():
            bits[w] = np.uint64(mk & 0xFFFFFFFFFFFFFFFF)
        spark = train.sparkSession
        b_bits = spark.sparkContext.broadcast(bits)
        id_type = dict(base.dtypes)[id_col]
        # Positions are computed JVM-side (so xxhash64 — which Python
        # cannot reproduce — works identically on both paths); the
        # Arrow stage only tests bits against the broadcast bitset.
        pos_arr = (
            "transform(_sh, s -> array("
            + ", ".join(_pos_sql(i, "s") for i in range(k))
            + "))"
        )
        staged = base.select(id_col, F.expr(pos_arr).alias("_pos"))

        def probe(it):
            bl = b_bits.value
            for pdf in it:
                out_cnt = []
                for plist in pdf["_pos"]:
                    cnt = 0
                    for ps in plist:
                        if all(
                            (int(bl[int(p) // 64]) >> (int(p) % 64)) & 1
                            for p in ps
                        ):
                            cnt += 1
                    out_cnt.append(cnt)
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "matched_ngrams": out_cnt}
                )

        flagged = staged.mapInPandas(
            probe, schema=f"{id_col} {id_type}, matched_ngrams long"
        )
    return flagged.select(
        id_col,
        "matched_ngrams",
        (F.col("matched_ngrams") >= min_matches).alias("contaminated"),
    )


# ---------------------------------------------------------------------
# Segment-level dedup (CCNet line dedup, generalized segmenter)
# ---------------------------------------------------------------------


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
    max_doc_freq: int = 2,
    method: str = "broadcast",
    literal_max: int = 256,
) -> DataFrame:
    """Remove boilerplate SEGMENTS that repeat across many documents
    (CCNet-style line-level dedup; newline-free corpora segment into
    fixed ``seg_tokens``-token windows instead of lines).

    A segment whose normalized hash appears in more than
    ``max_doc_freq`` distinct documents is dropped from every
    document; surviving segments re-join in order. Returns (id,
    cleaned_text, n_segments, n_dropped).

    ``method="broadcast"`` (default): one explode → groupBy(segment
    md5) for document frequencies (map-side combine), then ONLY the
    hot segments come back to the driver and filter every row WITHOUT
    shuffling the document payload — the single shuffle carries
    (hash, count) pairs. Two physical shapes, auto-selected by hot-set
    size: at most ``literal_max`` hot hashes inline as a literal-array
    filter (codegen-friendly); above that, an Arrow-batched pandas UDF
    with an O(1) hash-set membership test — ``array_contains`` on a
    big literal is a LINEAR scan per segment (O(segments × hot), and a
    17k-element literal also blows the plan out of codegen; measured
    10× on the sf0.1 corpus), while the set UDF stays O(segments).

    ``method="shuffle"``: no driver materialization — posexplode,
    left-anti join against the hot-hash set, groupBy-reassemble in
    position order. Shuffles the payload twice; use when the hot set
    could outgrow the driver (adversarial corpora, tiny
    ``max_doc_freq`` over huge vocabularies).
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+"), lambda t: t != ""
    )
    n_segs = F.greatest(
        F.ceil(F.size("_toks") / F.lit(seg_tokens)).cast("int"), F.lit(1)
    )
    seg_array = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(
            F.slice(F.col("_toks"), i * seg_tokens + 1, seg_tokens), " "
        ),
    )
    base = df.select(F.col(id_col), toks.alias("_toks"))
    with_segs = base.select(F.col(id_col), seg_array.alias("_segs"))

    seg_hash = lambda c: F.md5(F.lower(F.trim(c)))  # noqa: E731
    # Explode the segment expression DIRECTLY off the tokenize select —
    # going through the ``with_segs`` projection defeats
    # project-collapse around Generate (same pathology as
    # ``substring_dedup``; measured ~3× on the frequency pass).
    seg_freq = (
        base.select(
            F.col(id_col), F.explode(seg_array).alias("_seg")
        )
        .groupBy(seg_hash(F.col("_seg")).alias("_h"))
        .agg(F.count_distinct(id_col).alias("doc_freq"))
    )
    hot_df = seg_freq.filter(F.col("doc_freq") > max_doc_freq)

    if method == "broadcast":
        hot = [r["_h"] for r in hot_df.collect()]
        if len(hot) <= literal_max:
            hot_lit = (
                F.array(*[F.lit(h) for h in hot])
                if hot
                else F.array().cast("array<string>")
            )
            kept = F.filter(
                F.col("_segs"),
                lambda s: ~F.array_contains(hot_lit, seg_hash(s)),
            )
            return with_segs.select(
                F.col(id_col),
                F.array_join(kept, " ").alias("cleaned_text"),
                F.size("_segs").cast("bigint").alias("n_segments"),
                (F.size("_segs") - F.size(kept))
                .cast("bigint")
                .alias("n_dropped"),
            )
        # Large hot set: frozenset membership in an Arrow-batched UDF.
        # Hashes still computed JVM-side (same md5(lower(trim))) so the
        # Python side does set lookups only; payload never shuffles.
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        hotset = frozenset(hot)

        def _drop_hot(segs, hashes):
            cleaned, dropped = [], []
            for sg, hs in zip(segs, hashes):
                # NULL text → NULL segment/hash entries. The literal-
                # array shape's filter predicate evaluates to NULL on
                # them → element dropped and counted in n_dropped
                # (size(_segs) - size(kept)); mirror that exactly so
                # the two physical shapes agree row-for-row.
                kept_segs = [
                    s
                    for s, h in zip(sg, hs)
                    if s is not None and h is not None and h not in hotset
                ]
                cleaned.append(" ".join(kept_segs))
                dropped.append(len(sg) - len(kept_segs))
            return pd.DataFrame(
                {"cleaned_text": cleaned, "n_dropped": dropped}
            )

        _drop_hot.__annotations__ = {
            "segs": pd.Series,
            "hashes": pd.Series,
            "return": pd.DataFrame,
        }
        fudf = pandas_udf(
            _drop_hot, "cleaned_text string, n_dropped bigint"
        )
        return with_segs.select(
            F.col(id_col),
            fudf(
                F.col("_segs"),
                F.transform(F.col("_segs"), seg_hash),
            ).alias("_r"),
            F.size("_segs").cast("bigint").alias("n_segments"),
        ).select(
            id_col,
            F.col("_r.cleaned_text").alias("cleaned_text"),
            "n_segments",
            F.col("_r.n_dropped").alias("n_dropped"),
        )
    if method == "shuffle":
        exploded = with_segs.select(
            F.col(id_col),
            F.size("_segs").cast("bigint").alias("n_segments"),
            F.posexplode("_segs").alias("_pos", "_seg"),
        )
        # NULL segments (NULL text rows) must DROP, as in both
        # broadcast shapes — the anti-join alone would KEEP them
        # (NULL == _h is never true), making the methods disagree on
        # n_dropped for NULL-text rows.
        surviving = exploded.filter(F.col("_seg").isNotNull()).join(
            hot_df.select(F.col("_h")),
            seg_hash(exploded["_seg"]) == F.col("_h"),
            "left_anti",
        )
        rebuilt = surviving.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_seg"))
                    ),
                    lambda s: s["_seg"],
                ),
                " ",
            ).alias("cleaned_text"),
            F.count(F.lit(1)).cast("bigint").alias("_n_kept"),
        )
        # Re-join on the doc list so fully-boilerplate documents come
        # back as empty text (matching the broadcast path) instead of
        # vanishing from the output.
        return (
            with_segs.select(
                F.col(id_col),
                F.size("_segs").cast("bigint").alias("n_segments"),
            )
            .join(rebuilt, id_col, "left")
            .select(
                id_col,
                F.coalesce("cleaned_text", F.lit("")).alias(
                    "cleaned_text"
                ),
                "n_segments",
                (
                    F.col("n_segments")
                    - F.coalesce("_n_kept", F.lit(0))
                ).cast("bigint").alias("n_dropped"),
            )
        )
    raise ValueError(f"unknown method {method!r}")


# ---------------------------------------------------------------------
# Semantic dedup (SemDeDup over a fixed coarse quantizer)
# ---------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]] | str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 8,
    method: str = "grouped",
    target_cluster_rows: int = 2_000,
    seed: int = 42,
    max_cluster_rows: int = 50_000,
    cache: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): assign embeddings to coarse
    clusters, then inside each cluster drop every vector that has a
    LOWER-id neighbor with cosine ≥ ``threshold`` (keep the min-id
    representative of each semantic duplicate set).

    Returns (id, cluster, kept). Pair generation never crosses
    clusters — quadratic work is bounded per cluster, and the
    statistical scaling rule is nlist ∝ corpus (Abbas et al. run 50k
    clusters for 100M points) so cluster size stays O(corpus/nlist).
    ``centroids="auto"`` ENGINEERS that rule instead of documenting
    it: the quantizer is trained here (``ivf_index(n_lists="auto")``,
    sample-fit k-means) with ``max(8, rows / target_cluster_rows)``
    clusters, so the expected within-cluster pair block stays O(1) as
    the corpus grows. Fixed literal centroids remain supported for
    oracle-mirrored runs.

    ``method`` picks the within-cluster pair engine:

    - ``"grouped"`` (default — the shape the reference SemDeDup
      implementation uses): one ``applyInPandas`` per cluster; the
      pair cosine matrix is a blocked BLAS matmul, then every pair
      whose |sim − threshold| falls inside a 1e-9 guard band is
      RE-EVALUATED with a strictly sequential left-to-right PYTHON
      fold (``_seq_cosine``; NOT a numpy reduction — those unroll
      accumulators) — the same op order as the SQL fold — so
      keep/drop DECISIONS are bit-identical to the
      expression engine and the cross-engine oracle even though the
      fast path's summation order is not. Measured 84× on an 81 M-pair
      cluster set (37 s → 0.44 s kernel time). Clusters over
      ``max_cluster_rows`` — the duplicate-mass shape k-means cannot
      split, where nlist ∝ corpus stops bounding the group — are
      salted into bounded pair blocks whose dominated sets union
      exactly (see ``_semantic_dominated_grouped``).
    - ``"expr"``: pure column expressions (HOF fold per pair). Exact
      sim VALUES, but higher-order lambdas are CodegenFallback —
      interpreted per element, ~15 µs per 64-dim pair dot; use only
      where Arrow is unavailable. ``salt_buckets`` parallelizes a hot
      cluster across s tasks by salting the self-join (identical pair
      set: b-side replicated s ways, pairs meet where b's replica
      equals a's ``hash(id) % s`` salt).
    """
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    if method not in ("grouped", "expr"):
        raise ValueError(f"unknown method {method!r}")
    from deftunes_spark.ext.similarity import (
        dot_expr,
        ivf_assign,
        ivf_index,
        norm_expr,
    )

    if isinstance(centroids, str):
        if centroids != "auto":
            raise ValueError(
                f"centroids must be a list or 'auto', got {centroids!r}"
            )
        _, centroids = ivf_index(
            df,
            n_lists="auto",
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            target_list_rows=target_cluster_rows,
        )

    if method == "grouped":
        from pyspark import StorageLevel

        # persist: the assignment feeds the hot-cluster guard probe,
        # the salted fan-out join, AND the final kept-flag join —
        # three consumers of the same scan + nlist×d distance
        # compute. NOTE the builder is EAGER since r8: the guard
        # probe runs a count job (and above the cap, the assignment)
        # at construction time; the persist spills, never recomputes. Default cache=False (r7 advice): long-lived
        # sessions stay out of the pin (CacheManager has no TTL); the
        # registry/bench builders opt in with cache=True.
        assigned = ivf_assign(df, centroids, vec_col, "cluster").select(
            F.col(id_col), F.col(vec_col), F.col("cluster")
        )
        if cache:
            assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        from deftunes_spark.ext.similarity import _cluster_guard_probe

        use_guard, probe_counts = _cluster_guard_probe(
            df, assigned, max_cluster_rows
        )
        dominated = _semantic_dominated_grouped(
            assigned,
            id_col,
            vec_col,
            float(threshold),
            max_cluster_rows=max_cluster_rows,
            use_guard=use_guard,
            counts=probe_counts,
        )
    else:
        # Norms once per ROW, not per pair: three HOF folds per pair
        # (dot + both norms) tripled interpreted-eval and allocation
        # cost (observed 14-47 s GC spikes at sf0.1 before the split).
        from pyspark import StorageLevel

        assigned = ivf_assign(df, centroids, vec_col, "cluster").select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cluster"),
            norm_expr(F.col(vec_col)).alias("_norm"),
        )
        # same three-consumer shape as the grouped branch: both
        # self-join sides plus the kept-flag join read this.
        if cache:
            assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        a = assigned.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast(
                "int"
            ),
        ).alias("a")
        b = assigned.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
        ).alias("b")
        # Zero-norm guard: cosine is undefined there; under Spark's
        # default ANSI mode the bare division would raise
        # DIVIDE_BY_ZERO mid-job. NULL sim → filter False → kept,
        # matching the grouped kernel's NaN policy.
        denom = F.col("a._norm") * F.col("b._norm")
        sim = F.when(
            denom != 0.0,
            dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            / denom,
        )
        dominated = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col("a._salt") == F.col("b._salt"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .filter(sim >= threshold)
            .select(F.col(f"b.{id_col}").alias(id_col))
            .distinct()
        )
    return (
        assigned.select(id_col, "cluster")
        .join(
            dominated.withColumn("_dup", F.lit(True)), id_col, "left"
        )
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"),
        )
    )


def _semantic_dominated_grouped(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block: int = 2048,
    max_cluster_rows: int = 50_000,
    use_guard: bool | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Dominated ids per cluster via a blocked vectorized kernel.

    For each cluster pair-block (one Arrow group — clusters over
    ``max_cluster_rows`` are salted into bounded LEFT×RIGHT blocks by
    :func:`deftunes_spark.ext.similarity._salted_pair_blocks`, the
    duplicate-mass hot-cluster guard; at ns == 1 a cluster is a
    single diagonal block, the pre-guard shape): sort each side by
    id, compute the id-ordered cosine matrix in column blocks with
    BLAS (``L @ R_blk.T``), mark any candidate with a LOWER-id
    dominator ≥ threshold. Domination is a pure pair predicate
    (∃ i: id_i < id_j ∧ sim ≥ t), so the union of per-block dominated
    sets IS the cluster's dominated set — merge is a ``distinct``.
    Pairs inside the ±1e-9 guard band around the threshold are
    re-evaluated with ``_seq_cosine`` — a PLAIN PYTHON left-to-right
    fold for the dot and both norms, the expression engine's exact op
    order (NOT ``np.add.reduce``, which unrolls multiple accumulators
    / pairwise-sums and differs from a sequential fold in the last
    ulps for most 64-dim inputs) — making the DECISION set independent
    of vectorized summation order. The fast path's error vs the
    sequential value is ~1e-12 relative, far inside the 1e-9 band, so
    every boundary-sensitive pair IS rechecked. Guard-band hits are
    O(pairs-on-the-boundary) — in practice a handful, worst case still
    exact.

    Memory per task: n·block doubles (the sim block) + the group's
    vectors — ~2·max_cluster_rows rows in expectation (hash-salt
    balance is statistical; the tested ceiling is 3× — see
    ``similarity._salted_pair_blocks``) even when the nlist ∝ corpus
    rule fails on duplicate mass. Ids must be integral (cast
    upstream)."""

    import math

    from deftunes_spark.ext.similarity import _salted_pair_blocks

    # NULL assignments (the arrow ivf path masks invalid/NULL-element
    # embeddings to a NULL cluster instead of crashing) have no
    # meaningful neighbors and must never reach the kernel: a NULL
    # cluster would group together and _mat's np.array over None
    # vectors builds a ragged matrix that makes einsum raise in the
    # executor (r9 advice). The expr path drops them implicitly via
    # its inner cluster self-join — same output semantics.
    assigned = assigned.filter(F.col("cluster").isNotNull())

    def _seq_cosine(x, y):
        """Cosine with strict left-to-right float summation — the
        exact op order of aggregate(zip_with(...)): ((0+t1)+t2)+…
        Zero-norm vectors have undefined cosine → NaN → never ≥
        threshold → kept (matching both engines' policy)."""
        d = 0.0
        nx = 0.0
        ny = 0.0
        for a, b in zip(x, y):
            d += a * b
            nx += a * a
            ny += b * b
        if nx == 0.0 or ny == 0.0:
            return float("nan")
        return d / (math.sqrt(nx) * math.sqrt(ny))

    def fold(pdf):
        roles = pdf["_role"].to_numpy()
        l_pdf = pdf[(roles == 0) | (roles == 2)]  # potential dominators
        r_pdf = pdf[(roles == 1) | (roles == 2)]  # candidates
        empty = pd.DataFrame({id_col: pdf[id_col].iloc[:0]})
        if len(l_pdf) == 0 or len(r_pdf) == 0:
            return empty

        def _mat(side):
            ids = side[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            V = np.array(
                [
                    np.asarray(v, dtype=np.float64)
                    for v in side[vec_col].iloc[order]
                ]
            )
            return ids, V

        l_ids, L = _mat(l_pdf)
        r_ids, R = _mat(r_pdf)
        # Fast-path norms (vectorized; ~1e-15 relative off the
        # sequential fold — absorbed by the guard band, whose members
        # recompute everything sequentially).
        l_norms = np.sqrt(np.einsum("ij,ij->i", L, L))
        r_norms = np.sqrt(np.einsum("ij,ij->i", R, R))
        nr = len(r_ids)
        dom = np.zeros(nr, dtype=bool)
        guard = 1e-9
        for j0 in range(0, nr, block):
            j1 = min(j0 + block, nr)
            # errstate: zero-norm rows produce NaN sims (undefined
            # cosine) — deliberately kept, never flagged dominated.
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (L @ R[j0:j1].T) / np.outer(
                    l_norms, r_norms[j0:j1]
                )
            # Strict id order, not index order: in a diagonal block
            # (role 2, L == R) this is exactly the old upper triangle;
            # in a cross block it sees every l<r pair once. Equal ids
            # compare False either way.
            lower = l_ids[:, None] < r_ids[None, j0:j1]
            # Certain hits decide vectorized; ONLY guard-band pairs
            # (and only for columns not already dominated) pay the
            # exact-order Python recheck.
            dom_blk = (lower & (sims >= threshold + guard)).any(axis=0)
            band = lower & (np.abs(sims - threshold) <= guard)
            band[:, dom_blk] = False
            for i, j in zip(*np.nonzero(band)):
                if _seq_cosine(L[i], R[j0 + j]) >= threshold:
                    dom_blk[j] = True
            dom[j0:j1] |= dom_blk
        return pd.DataFrame({id_col: r_ids[dom]})

    id_type = dict(assigned.dtypes)[id_col]
    # Short-circuit (r7 verdict #2): when NO cluster exceeds the cap,
    # every cluster is a single diagonal block — run the kernel
    # single-stage per cluster, skipping the fan-out join AND the
    # distinct (each dominated id is emitted by exactly one cluster
    # group; ids are unique per caller contract). ``use_guard`` lets
    # the caller decide from the raw input (cheap count) before the
    # assignment exists; ``None`` probes the assignment here.
    from deftunes_spark.ext.similarity import _max_cluster_count

    if use_guard is None:
        use_guard = _max_cluster_count(assigned) > max_cluster_rows
    if not use_guard:
        diag = assigned.withColumn(
            "_role", F.lit(2).cast("tinyint")
        )
        return diag.groupBy("cluster").applyInPandas(
            fold, schema=f"{id_col} {id_type}"
        )
    blocks = _salted_pair_blocks(
        assigned, id_col, vec_col, max_cluster_rows, counts=counts
    )
    # distinct: under a sub-split, a candidate can be dominated in
    # several blocks (its dominators are spread over salts); the
    # downstream kept-flag LEFT join must see each dominated id once.
    return (
        blocks.groupBy("cluster", "_gl", "_gr")
        .applyInPandas(fold, schema=f"{id_col} {id_type}")
        .distinct()
    )


# ---------------------------------------------------------------------
# Target-mixture reweighting
# ---------------------------------------------------------------------


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Pairwise shingle overlap between corpus groups (sources,
    snapshots, datasets): for every group pair, the shared distinct
    n-gram count plus containment (shared / smaller set) and Jaccard —
    the corpus-governance numbers that answer "is dataset B already
    inside A?" before anyone pays to train on both.

    Shape at 100 TB: distinct (group, shingle) via one
    explode+distinct shuffle; the pair join is per-SHINGLE and fans
    out at most (groups choose 2) rows per shingle — bounded by the
    group count, never by corpus size. The final aggregate is
    |group pairs| rows. No document payload ever joins.
    """
    from deftunes_spark.ext.dedup import shingles
    from deftunes_spark.ext.lineage import cut_lineage

    # Materialize the distinct (group, shingle) table ONCE: it feeds
    # three plan branches (sizes + both self-join sides) and without
    # the cut each branch recompiles the full split/explode/distinct
    # build — the r13 before-plan carried 8 parquet scans and 28
    # exchanges for what is one shingle table (same fix as the
    # triangle enumeration).
    sh = cut_lineage(
        shingles(
            df.filter(F.col(text_col).isNotNull()),
            group_col,
            text_col,
            n,
        )
    )
    sizes = sh.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    a = sh.select(
        F.col(group_col).alias("ga"), F.col("shingle").alias("sh")
    )
    b = sh.select(
        F.col(group_col).alias("gb"), F.col("shingle").alias("sh")
    )
    shared = (
        a.join(b, (a["sh"] == b["sh"]) & (a["ga"] < b["gb"]))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(
        F.col(group_col).alias("ga"), F.col("n_shingles").alias("n_a")
    )
    sb = sizes.select(
        F.col(group_col).alias("gb"), F.col("n_shingles").alias("n_b")
    )
    return (
        shared.join(F.broadcast(sa), "ga")
        .join(F.broadcast(sb), "gb")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def kmv_uniform(h):
    """Signed 64-bit hash → uniform double, clamped strictly positive.

    The raw map ``h/2^64 + 0.5`` is [0, 1): ``h == -2^63`` lands
    exactly on 0 and an estimator dividing by it — KMV's (k-1)/u_k —
    returns Infinity. Floor at 2^-64 so the range is (0, 1]."""
    return F.greatest(
        h.cast("double") / F.lit(float(2**64)) + F.lit(0.5),
        F.lit(2.0**-64),
    )


def source_overlap_minhash(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 3,
    k: int = 256,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sketch variant of :func:`source_overlap`: per-group KMV
    (bottom-k) sketches replace the exact distinct (group, shingle)
    table, which is CORPUS-SIZED at 100 TB — the one part of the exact
    operator that cannot shuffle at scale.

    Per group the state is the k smallest distinct shingle hashes
    (k·8 bytes, ~2 KB at k=256). Estimators (Bar-Yossef et al. KMV /
    Beyer et al.):

    - ``|A∪B|`` ≈ (k−1)/u_k over the merged sketch's k-th smallest
      normalized hash (exact when the union sketch is unsaturated);
    - ``J(A,B)`` ≈ fraction of the merged bottom-k present in BOTH
      input sketches (an unbiased Jaccard estimator, σ ≈ √(J(1−J)/k));
    - ``n_shared`` ≈ Ĵ·|A∪B|̂ and containment ≈ n_shared/min(n̂_a, n̂_b).

    Scale shape: per-document bottom-k rides the text scan (array
    expressions, no shuffle — same map-side discipline as
    ``minhash_signatures_mapside``); the only shuffled relation is
    (group, hash) rows capped at k per document and k per group after
    the rank — fixed-width longs, ~1000× under the shingle table. The
    pair stage joins G sketch rows on a constant key (broadcast hash
    join, never a CartesianProduct) and fans out (G choose 2) rows —
    bounded by the group count. Same output schema as the exact
    operator; values are estimates.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (KMV needs a k-th minimum)")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be xxhash64 or md5")
    from pyspark.sql import Window

    from deftunes_spark.ext.dedup import shingle_array_sql

    toks = F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+")
    sh_expr = shingle_array_sql(n)
    # One hash per DISTINCT shingle (unseeded — KMV wants one uniform
    # permutation, not the banded k-seed family), bottom-k per doc:
    # the group bottom-k is a subset of its docs' bottom-k unions, so
    # per-doc truncation loses nothing (standard KMV merge property).
    # hash_fn="md5" is the oracle-mirrorable family (15 hex digits →
    # a non-negative 60-bit bigint, the repo's established md5→int
    # convention); xxhash64 is the production path (~6× cheaper, no
    # string materialization per shingle).
    if hash_fn == "md5":
        h_sql = (
            "cast(conv(substring(md5(concat('kmv|', s)), 1, 15), "
            "16, 10) as bigint)"
        )
    else:
        h_sql = "xxhash64(concat('kmv|', s))"
    doc_bk = F.expr(
        f"slice(array_sort(array_distinct(transform({sh_expr}, "
        f"s -> {h_sql}))), 1, {k})"
    )
    per_doc = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(group_col).alias("g"), toks.alias("_toks"))
        .select("g", F.explode(doc_bk).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    sketches = (
        per_doc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("h")).alias("sk"))
    )
    if hash_fn == "md5":
        # 60-bit non-negative hash → (0, 1]: (h+1)/2^60. Plain
        # integer-shift arithmetic, mirrored verbatim in the DuckDB
        # oracle, so the estimator algebra value-hash-matches.
        def _u(h):
            return (h.cast("double") + F.lit(1.0)) / F.lit(
                float(2**60)
            )
    else:
        _u = kmv_uniform

    def _card(sk):
        sz = F.size(sk)
        return F.when(
            sz < k, sz.cast("double")
        ).otherwise(F.lit(float(k - 1)) / _u(F.element_at(sk, sz)))

    a = sketches.select(
        F.col("g").alias("ga"), F.col("sk").alias("ska"), F.lit(1).alias("_one")
    )
    b = sketches.select(
        F.col("g").alias("gb"), F.col("sk").alias("skb"), F.lit(1).alias("_one")
    )
    pairs = (
        a.join(F.broadcast(b), "_one")
        .filter(F.col("ga") < F.col("gb"))
        .withColumn(
            "mk",
            F.expr(f"slice(array_sort(array_union(ska, skb)), 1, {k})"),
        )
        .withColumn("kk", F.size("mk"))
        .withColumn(
            "m",
            F.size(
                F.array_intersect(
                    "mk", F.array_intersect("ska", "skb")
                )
            ),
        )
    )
    j_hat = F.col("m") / F.col("kk")
    union_hat = F.when(
        F.col("kk") < k, F.col("kk").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / _u(F.element_at("mk", F.col("kk")))
    )
    na_hat, nb_hat = _card(F.col("ska")), _card(F.col("skb"))
    shared_hat = j_hat * union_hat
    # Mirror the exact operator's contract: pairs with no observed
    # overlap (the inner shingle join emits nothing there) are absent,
    # not zero rows.
    pairs = pairs.filter(F.col("m") > 0)
    return pairs.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.round(shared_hat).cast("bigint").alias("n_shared"),
        F.round(na_hat).cast("bigint").alias("n_a"),
        F.round(nb_hat).cast("bigint").alias("n_b"),
        # Exact containment is ≤ 1 by construction; the ratio of two
        # independent estimates can overshoot, so clamp.
        F.round(
            F.least(F.lit(1.0), shared_hat / F.least(na_hat, nb_hat)), 6
        ).alias("containment"),
        F.round(j_hat, 6).alias("jaccard"),
    )


def dsir_logweights(
    df: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = 1024,
    cache: bool = False,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al., NeurIPS'23 — "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed-n-gram features
    are under the TARGET distribution (rows matching
    ``target_filter``) than under the raw corpus, as
    ``Σ_features log(p_target(bucket) / p_raw(bucket))`` with
    add-one-smoothed bucket unigram models. Feed the weights to
    ``weighted_sample`` to resample the raw corpus toward the target —
    the published recipe for "make CommonCrawl look like Wikipedia".

    Shape at 100 TB: features hash to ``n_buckets`` ids md5-derived
    (engine-portable, deterministic under retries); both models are
    ONE aggregate over (bucket) — n_buckets rows total — and the
    per-doc scoring joins the broadcast model onto per-(doc, bucket)
    counts, so nothing corpus-sized shuffles except the (doc, bucket)
    pre-aggregation. The corpus-total join is a 1-row broadcast.

    Cross-engine determinism: the log-ratio is rounded to 6 dp and
    cast DECIMAL(18,6) BEFORE the per-doc sum, so the sum is exact
    integer-scaled arithmetic — engine and partition-order
    independent (the repo-wide float-sum discipline)."""
    from deftunes_spark.ext.dedup import shingle_array_sql

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+")
    bucket = F.pmod(
        F.expr(
            "cast(conv(substr(md5(concat('dsir|', _sh)), 1, 15),"
            " 16, 10) as bigint)"
        ),
        F.lit(n_buckets),
    )
    bf = (
        df.select(
            F.col(id_col),
            target_filter.alias("_is_target"),
            toks.alias("_toks"),
        )
        .select(
            id_col,
            "_is_target",
            F.explode(F.expr(shingle_array_sql(n))).alias("_sh"),
        )
        .select(id_col, "_is_target", bucket.alias("_bkt"))
    )
    # The per-(doc, bucket) pre-aggregation is the ONE relation
    # everything else derives from: the bucket models are sums of its
    # _k (is_target is constant per doc, so grouping by it loses
    # nothing), and the final scoring joins onto it. Persisting it —
    # tiny: ≤ docs × min(doc_shingles, n_buckets) rows of four
    # scalars, no text — makes the corpus scan + explode + hash run
    # exactly once per action (unpersisted, Spark re-scans per
    # consumer: measured 6 parquet scans in the plan).
    docf = bf.groupBy(id_col, "_is_target", "_bkt").agg(
        F.count(F.lit(1)).alias("_k")
    )
    if cache:
        from pyspark import StorageLevel

        docf = docf.persist(StorageLevel.MEMORY_AND_DISK)
    model = docf.groupBy("_bkt").agg(
        F.sum("_k").alias("_cr"),
        F.sum(
            F.when(F.col("_is_target"), F.col("_k")).otherwise(0)
        ).alias("_ct"),
    )
    totals = model.agg(
        F.sum("_cr").alias("_r"), F.sum("_ct").alias("_t")
    )
    b = F.lit(n_buckets)
    # One multiply per side, one divide, then ln — the identical
    # expression tree mirrors into the SQL oracle, so the double is
    # bit-equal before the 6-dp round.
    lr = F.round(
        F.log(
            (
                (F.col("_ct") + 1).cast("double")
                * (F.col("_r") + b).cast("double")
            )
            / (
                (F.col("_cr") + 1).cast("double")
                * (F.col("_t") + b).cast("double")
            )
        ),
        6,
    ).cast("decimal(18,6)")
    ratios = model.join(F.broadcast(totals)).select(
        "_bkt", lr.alias("_lr")
    )
    return (
        docf.join(F.broadcast(ratios), "_bkt")
        .groupBy(id_col)
        .agg(
            F.sum("_k").cast("bigint").alias("n_feats"),
            F.sum(
                F.col("_k").cast("decimal(10,0)") * F.col("_lr")
            )
            .cast("double")
            .alias("dsir_logweight"),
        )
    )


def mixture_rates(
    counts: Mapping[str, int], target_weights: Mapping[str, float]
) -> dict[str, float]:
    """Per-domain keep-rates hitting ``target_weights`` proportions
    with the largest achievable output (downsample-only: the
    bottleneck domain — smallest count/weight ratio — keeps 100%).

    Driver-side arithmetic on the per-domain count table (kilobytes
    at any corpus scale)."""
    missing = [
        d for d, w in target_weights.items()
        if w > 0 and not counts.get(d)
    ]
    if missing:
        # A zero-count target domain makes scale 0 → every rate 0 →
        # the mixture silently empties; a one-character domain-name
        # typo must be an ERROR, not an empty corpus.
        raise ValueError(
            f"mixture_rates: target domains {sorted(missing)} have no "
            f"rows in the corpus (available: {sorted(counts)})"
        )
    scale = min(
        counts.get(d, 0) / w for d, w in target_weights.items() if w > 0
    )

    def _rate(w: float, n: int) -> float:
        r = w * scale / n
        # The bottleneck domain's rate is 1.0 by construction; float
        # association can deliver 0.999...9, whose bucket threshold
        # truncates one bucket short and drops a ~1/16M sliver of the
        # domain documented as "keeps 100%". Snap within epsilon.
        return 1.0 if r >= 1.0 - 1e-9 else r

    return {
        d: (_rate(w, counts[d]) if counts.get(d) else 0.0)
        for d, w in target_weights.items()
    }


def _domain_counts(
    df: DataFrame, domain_col: str
) -> dict[str, int]:
    return {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _sample_with_rates(
    df: DataFrame,
    domain_col: str,
    rates: Mapping[str, float],
    id_col: str,
    salt: str,
) -> DataFrame:
    thresh = None
    for d, rate in rates.items():
        t = F.lit(int(rate * _BUCKETS))
        cond = F.col(domain_col) == d
        thresh = (
            F.when(cond, t) if thresh is None else thresh.when(cond, t)
        )
    if thresh is None:
        return df.filter(F.lit(False))
    return df.filter(_hash_bucket(id_col, salt) < thresh.otherwise(F.lit(0)))


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: Mapping[str, float],
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample each domain so the output mixture
    matches ``target_weights`` (e.g. rebalance web/code/books for a
    training run). Domains absent from the weights are dropped.

    Selection reuses the md5-bucket predicate of ``ext.sampling`` —
    stable under re-runs, partition layout, and incremental appends;
    the only full-data pass is the count aggregate (map-side combined)
    plus the filter scan itself.
    """
    counts = _domain_counts(df, domain_col)
    rates = mixture_rates(counts, target_weights)
    return _sample_with_rates(df, domain_col, rates, id_col, salt)


def mixture_sample_temperature(
    df: DataFrame,
    domain_col: str,
    tau: float,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Temperature-flattened mixture sampling: target weight per
    domain ∝ p_domain^τ — the multilingual/multi-domain sampling rule
    (τ<1 upweights tail domains relative to their natural share;
    mBERT/XLM-R style). τ=1 keeps everything (natural mixture is
    already the target); τ=0 equalizes all domains.

    Implementation note: ``mixture_rates`` is scale-invariant in the
    weights, so the weights are the UNNORMALIZED ``count^τ`` — no
    normalization sum means no float-accumulation-order dependence,
    keeping the selection bit-reproducible (and exactly mirrorable in
    the SQL oracle: per-domain ``pow`` + an order-independent min).
    """
    counts = _domain_counts(df, domain_col)
    weights = {d: float(n) ** tau for d, n in counts.items() if n}
    rates = mixture_rates(counts, weights)
    return _sample_with_rates(df, domain_col, rates, id_col, salt)


# ---------------------------------------------------------------------
# Exact substring dedup (sliding k-gram repeats, arbitrary alignment)
# ---------------------------------------------------------------------


def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_repeat: int = 2,
    hash_fn: str = "xxhash64",
    reliable: bool = False,
) -> DataFrame:
    """Excise every token run covered by a k-token substring that
    occurs at least ``min_repeat`` times ANYWHERE in the corpus (any
    document, any alignment, including within one document).

    This is the sliding-window complement of ``segment_dedup``: fixed
    segments miss a repeated passage that straddles a window boundary
    or starts at a different offset in each document (the observation
    behind suffix-array substring dedup in Lee et al., "Deduplicating
    Training Data Makes Language Models Better", 2022). A k-gram at
    EVERY position catches repeats at any alignment; overlapping hits
    merge into intervals per document, and covered tokens are dropped
    (the drop-all boilerplate policy, matching ``segment_dedup``;
    keep-one-survivor selection is the cluster layer's job).

    Plan shape: one k-gram frequency aggregation (shuffle carries
    (gram hash, count) with map-side combine), one semi-join of gram
    positions against the repeated set, one groupBy(doc) collecting
    repeated start positions — the payload text itself never shuffles;
    interval merging and excision are per-row array folds on the
    original rows. Returns (id, cleaned_text, n_tokens, n_removed).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash fn {hash_fn!r}")
    h = "xxhash64" if hash_fn == "xxhash64" else "md5"
    elem_t = "bigint" if hash_fn == "xxhash64" else "string"
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col), toks.alias("_toks"))
    gram_expr = (
        f"IF(size(_toks) >= {k}, "
        f"transform(sequence(1, size(_toks) - {k - 1}), "
        f"i -> {h}(array_join(slice(_toks, i, {k}), ' '))), "
        f"cast(array() as array<{elem_t}>))"
    )
    # The gram-position table feeds TWO plan branches (the frequency
    # aggregate and the repeated-position semi-join); materialize it
    # once or the tokenize + k × hash work per gram runs per branch.
    # The gram transform is computed INSIDE the explode select (not
    # projected through an intermediate that also carries ``_toks``) —
    # the passenger column defeats project-collapse around Generate
    # and made this checkpoint ~20× slower (measured 7 s → 0.4 s at
    # sf0.1).
    hits = cut_lineage(
        base.select(
            F.col(id_col),
            F.posexplode(F.expr(gram_expr)).alias("_p0", "_g"),
        ),
        reliable,
    )
    freq = hits.groupBy("_g").agg(F.count(F.lit(1)).alias("_cnt"))
    rep_starts = (
        hits.join(
            freq.filter(F.col("_cnt") >= min_repeat).select("_g"),
            "_g",
            "left_semi",
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.col("_p0") + 1)
            ).alias("_starts")
        )
    )
    merged = (
        "aggregate(_starts, "
        "cast(array() as array<struct<lo:int,hi:int>>), "
        "(acc, s) -> IF(size(acc) > 0 "
        "AND s <= element_at(acc, -1).hi + 1, "
        "concat(slice(acc, 1, size(acc) - 1), "
        "array(named_struct('lo', element_at(acc, -1).lo, "
        f"'hi', greatest(element_at(acc, -1).hi, s + {k - 1})))), "
        f"concat(acc, array(named_struct('lo', s, 'hi', s + {k - 1})))))"
    )
    kept = (
        "filter(_toks, (x, i) -> "
        "NOT exists(_iv, v -> v.lo <= i + 1 AND i + 1 <= v.hi))"
    )
    return (
        base.join(rep_starts, id_col, "left")
        .select(
            F.col(id_col),
            "_toks",
            F.expr(merged).alias("_iv"),
        )
        .select(
            F.col(id_col),
            "_toks",
            F.coalesce(
                F.col("_iv"),
                F.expr("cast(array() as array<struct<lo:int,hi:int>>)"),
            ).alias("_iv"),
        )
        .select(
            F.col(id_col),
            F.array_join(F.expr(kept), " ").alias("cleaned_text"),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            (F.size("_toks") - F.size(F.expr(kept)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------
# Corpus divergence: per-group unigram KL vs the corpus mixture
# ---------------------------------------------------------------------


def unigram_kl_by_group(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Per-group unigram-distribution KL divergence against the corpus
    mixture — the lexical complement of ``embedding_drift_psi`` for
    mixture monitoring: KL(P_g || Q) over the full corpus vocabulary
    with additive (Laplace ``alpha``) smoothing, where P_g is group
    g's smoothed word distribution and Q the corpus-wide one.

    Scale design — the SPARSE DECOMPOSITION, never the dense grid.
    The textbook definition sums over |groups| x |vocab| cells; at a
    100 TB corpus vocabulary (1e8+ words) that grid is the cost. But
    every unobserved cell of group g shares one probability
    p0_g = alpha / (n_g + alpha*V), so

        KL_g = sum_observed [ p*ln(p/q) - p0_g*ln(p0_g/q) ]
               + p0_g * ( V*ln(p0_g) - sum_vocab ln(q) )

    needs only the OBSERVED (group, word) cells plus two corpus
    scalars (V and the ln-q sum). The plan is therefore: one
    tokenize + groupBy(group, word) corpus pass, a vocab-sized
    groupBy(word) rollup, one equi-join of observed cells to per-word
    q, and bounded-row broadcasts for the scalars — everything keyed,
    nothing quadratic, no S x V explosion. The driver oracle computes
    the DENSE definition in SQL, so the value-hash match proves the
    decomposition algebra itself every round.

    Output: (group_col, n_words, vocab_size, kl) with ``kl`` rounded
    to ``round_to`` (float-sum association noise is ~1e-12 at these
    magnitudes; the repo-wide rounding discipline)."""
    words = (
        df.filter(
            F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(
                    F.lower(F.trim(F.col(text_col))),
                    "[ \\t\\n\\x0B\\f\\r]+",
                )
            ).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    wc = words.groupBy("grp", "word").agg(
        F.count("*").cast("double").alias("c_gw")
    )
    word_tot = wc.groupBy("word").agg(F.sum("c_gw").alias("c_w"))
    grp_tot = wc.groupBy("grp").agg(F.sum("c_gw").alias("n_g"))
    totals = word_tot.agg(
        F.sum("c_w").alias("n_tot"),
        F.count("*").cast("double").alias("v"),
    )
    a = F.lit(float(alpha))
    word_q = word_tot.crossJoin(F.broadcast(totals)).select(
        "word",
        ((F.col("c_w") + a) / (F.col("n_tot") + a * F.col("v"))).alias(
            "q_w"
        ),
    )
    l_sum = word_q.agg(F.sum(F.log("q_w")).alias("l_sum"))
    p0 = a / (F.col("n_g") + a * F.col("v"))
    obs = (
        wc.join(word_q, "word")
        .join(F.broadcast(grp_tot), "grp")
        .crossJoin(F.broadcast(totals))
        .select(
            "grp",
            (
                ((F.col("c_gw") + a) / (F.col("n_g") + a * F.col("v")))
                * F.log(
                    ((F.col("c_gw") + a) / (F.col("n_g") + a * F.col("v")))
                    / F.col("q_w")
                )
                - p0 * F.log(p0 / F.col("q_w"))
            ).alias("term"),
        )
    )
    return (
        obs.groupBy("grp")
        .agg(F.sum("term").alias("s_obs"))
        .join(F.broadcast(grp_tot), "grp")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(l_sum))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_g").cast("bigint").alias("n_words"),
            F.col("v").cast("bigint").alias("vocab_size"),
            F.round(
                F.col("s_obs")
                + p0 * (F.col("v") * F.log(p0) - F.col("l_sum")),
                round_to,
            ).alias("kl"),
        )
    )


# ---------------------------------------------------------------------
# N-gram novelty (memorization / boilerplate signal)
# ---------------------------------------------------------------------


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word n-grams that occur in NO other document — high
    novelty marks original content, low novelty marks boilerplate /
    template families (the inverse of what ``segment_dedup`` excises)
    and is a standard pretraining-curation signal next to the Gopher
    rules.

    Shape: the canonical ``shingles_mapside`` explode (zero-exchange
    per-doc dedup), ONE map-side-combined groupBy(shingle) for the
    doc-frequency table, an equi-join back on shingle, and a
    groupBy(doc) rollup. The df-table join is deliberately
    aggregate-then-join rather than a count-over-window: partial
    aggregation collapses a hot shingle (a million-doc boilerplate
    line) to one row map-side, and AQE's skew-join handles the probe
    side, whereas a window partitioned by shingle would buffer the
    hot key's entire partition in one task. All joins keyed, nothing
    quadratic; doc text never shuffles (only (id, shingle) pairs)."""
    from deftunes_spark.ext.dedup import shingles_mapside

    sh = shingles_mapside(df, id_col, text_col, n)
    dfc = sh.groupBy("shingle").agg(
        F.count("*").alias("_doc_freq")
    )
    return (
        sh.join(dfc, "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                (F.col("_doc_freq") == 1).cast("bigint")
            ).alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_shingles"), round_to
            ).alias("novelty"),
        )
    )
