"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — one scan, JVM-side arithmetic via
higher-order array functions (zip_with/aggregate), TakeOrdered for the
top-k (no global sort).

Scale path: random-hyperplane LSH — each vector maps to an n-bit
bucket; a query probes its own bucket (+ optional multi-probe
neighbors) and reranks exactly. Bucketing is a narrow map; the only
shuffle is the final per-bucket candidate scan. For 100 TB, write the
bucketed table partitioned by bucket prefix so probes become partition-
pruned scans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sql_vec(vec: list[float]) -> str:
    """SQL text of a double-array literal. ``repr`` round-trips the
    exact IEEE value; the ``D`` suffix pins the literal type to DOUBLE
    (a bare ``0.5`` would parse as DECIMAL). Non-finite components
    would render as ``nanD``/``infD`` — unparseable deep inside
    Catalyst — so fail fast here with the actual cause."""
    vals = [float(x) for x in vec]
    if any(x != x or x in (float("inf"), float("-inf")) for x in vals):
        raise ValueError(
            "query/centroid vector contains NaN or infinity — "
            "sanitize embeddings before building literal expressions"
        )
    return "array(" + ",".join(f"{x!r}D" for x in vals) + ")"


def _vec_lit(vec: list[float]) -> Column:
    """Literal double array as ONE parsed expression. Building it from
    per-element ``F.lit`` calls costs a py4j round trip per element —
    at 64-dim × dozens of codewords/planes that is thousands of driver
    round trips (seconds of pure Python time) before Catalyst ever
    sees the plan; a single ``F.expr`` string is one."""
    return F.expr(_sql_vec(vec))


def _dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text of Σ aᵢbᵢ — same aggregate(zip_with(...)) expression
    tree ``dot_expr`` builds, but composed as text so loops over many
    literal vectors stay O(1) in py4j calls."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double, via zip_with + aggregate (no UDF).

    NOTE: higher-order functions are CodegenFallback — the lambda is
    INTERPRETED per element (~15 µs per 64-dim dot, measured), fine
    once per row but ruinous inside a pair join (and unrolling the
    sum per pair is no escape: past ~64 terms the generated join
    method blows the 64 KB codegen limit and the WHOLE stage falls
    back to interpreted eval — measured slower than the fold). Hot
    pair loops belong in a blocked vectorized kernel instead — see
    ``curation._semantic_dominated_grouped``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_to_query(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = _vec_lit(query_vec)
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype="float64")))
    denom = norm_expr(F.col(vec_col)) * F.lit(qn)
    # Zero-norm rows (padding / failed-encoder embeddings) would
    # raise DIVIDE_BY_ZERO under ANSI mode — NULL them instead, so
    # they sort last in top-k and drop out of threshold filters.
    sim = F.when(denom != 0.0, dot_expr(F.col(vec_col), q) / denom)
    return df.withColumn("cosine_sim", sim)


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity.

    orderBy+limit compiles to TakeOrderedAndProject: each partition
    keeps its local top-k, the driver merges — no global sort shuffle.
    Ties broken by id for determinism.
    """
    return (
        cosine_to_query(df, query_vec, vec_col)
        .select(id_col, "cosine_sim")
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------
# Random-hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------


def random_hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, shape (n_bits, dim)."""
    return np.random.RandomState(seed).randn(n_bits, dim)


def lsh_bucket_expr(
    vec_col: str, planes: np.ndarray
) -> Column:
    """Bucket id = sign-bit integer over the hyperplane projections.
    Composed as ONE SQL string (a py4j call per plane × dim would make
    DataFrame *construction* the bottleneck — see ``_vec_lit``)."""
    terms = []
    for i, plane in enumerate(planes):
        d = _dot_sql(vec_col, _sql_vec([float(x) for x in plane]))
        terms.append(
            f"CASE WHEN {d} >= 0.0D THEN shiftleft(1L, {i}) ELSE 0L END"
        )
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


# Above this many plane coefficients (n_bits × dim) the unrolled
# literal expression tree stops being free: Catalyst analysis cost and
# codegen method size grow linearly with it, and at realistic embedding
# dims (768–4096) × 12+ bits the DRIVER becomes the bottleneck before a
# single task runs. Past the cutoff, bucketing switches to one
# Arrow-batched vectorized stage (numpy matmul per batch).
LSH_EXPR_MAX_COEFFS = 2048


def lsh_bucket_pandas_udf(planes: np.ndarray):
    """Arrow-batched bucket computation: a (batch, dim) matmul against
    the (n_bits, dim) plane matrix per Arrow batch. The plane matrix
    ships once per executor inside the serialized UDF closure (it is
    n_bits × dim × 8 B — a few hundred KB at worst, far below
    broadcast-join territory)."""
    from pyspark.sql.functions import pandas_udf

    planes_t = np.ascontiguousarray(planes.T, dtype=np.float64)
    n_bits = planes.shape[0]
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        arr = np.array(v.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (arr @ planes_t) >= 0  # (batch, n_bits)
        return pd.Series((bits.astype(np.int64) * weights).sum(axis=1))

    return _bucket


def with_lsh_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    bucket_col: str = "lsh_bucket",
    method: str = "auto",
) -> DataFrame:
    """Attach the LSH bucket id.

    ``method``: ``"expr"`` unrolls the projections as literal column
    expressions (pure codegen, best for small n_bits × dim);
    ``"arrow"`` runs one vectorized Arrow-batched stage (best for
    high-dim embeddings); ``"auto"`` picks by ``LSH_EXPR_MAX_COEFFS``.
    Both produce identical buckets up to float summation order (the
    sign of a projection flips only within ~1 ulp of zero).
    """
    if method == "auto":
        method = "expr" if planes.size <= LSH_EXPR_MAX_COEFFS else "arrow"
    if method == "expr":
        return df.withColumn(bucket_col, lsh_bucket_expr(vec_col, planes))
    if method == "arrow":
        udf = lsh_bucket_pandas_udf(planes)
        return df.withColumn(bucket_col, udf(F.col(vec_col)))
    raise ValueError(f"unknown method {method!r}")


def _query_buckets(
    query_vec: list[float], planes: np.ndarray, n_probes: int
) -> list[int]:
    """Own bucket + multi-probe neighbors (flip the least-confident
    bits first — standard multi-probe LSH)."""
    proj = planes @ np.asarray(query_vec, dtype="float64")
    base = 0
    for i, p in enumerate(proj):
        if p >= 0:
            base |= 1 << i
    order = np.argsort(np.abs(proj))
    buckets = [base]
    for bit in order[: max(0, n_probes - 1)]:
        buckets.append(base ^ (1 << int(bit)))
    return buckets


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: np.ndarray | None = None,
    n_bits: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: probe LSH buckets, rerank exact cosine.

    If ``bucket_col`` is given, the DataFrame is already bucketed
    (precomputed/partitioned table — the 100 TB path where the bucket
    filter becomes partition pruning); otherwise buckets are computed
    on the fly.
    """
    if planes is None:
        planes = random_hyperplanes(len(query_vec), n_bits, seed)
    if bucket_col is None:
        bucket_col = "lsh_bucket"
        df = with_lsh_bucket(df, planes, vec_col, bucket_col)
    buckets = _query_buckets(query_vec, planes, n_probes)
    candidates = df.filter(F.col(bucket_col).isin(buckets))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer
# ---------------------------------------------------------------------


def ivf_index(
    df: DataFrame,
    n_lists: int | str = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    fit_max_rows: int | None = 1_000_000,
    target_list_rows: int = 2_000,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means (MLlib, JVM-side) coarse quantizer,
    every vector assigned to its nearest centroid's inverted list.

    ``n_lists="auto"`` sizes the quantizer to the corpus:
    ``max(8, ceil(rows / target_list_rows))`` (clamped to the row
    count). A FIXED n_lists makes the expected inverted-list size grow
    linearly with the corpus — the probed list is the unit of
    quadratic/scan work, so at 100 TB it must be held O(1) by scaling
    cluster count, not documented away. The default 2 000 rows/list
    matches SemDeDup's published operating point (Abbas et al. 2023:
    50 k clusters for 100 M points).

    The quantizer is FIT ON A SAMPLE (standard IVF practice — FAISS
    trains on ~1–10 M vectors): ``fit_max_rows`` caps the training set,
    so at 100 TB the k-means iterations touch a bounded sample while
    the single assignment pass still covers every vector. Pass
    ``fit_max_rows=None`` to fit on the full corpus.

    Returns (assigned_df with ``ivf_list`` column, centroids). At
    100 TB: persist ``assigned_df`` partitioned by ``ivf_list`` so a
    probe reads only n_probe/n_lists of the table (partition pruning);
    centroids are a driver-side kilobyte array."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn(
        "_ivf_feat", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    if isinstance(n_lists, str) and n_lists != "auto":
        raise ValueError(
            f"n_lists must be an int or 'auto', got {n_lists!r}"
        )
    if target_list_rows < 1:
        raise ValueError("target_list_rows must be >= 1")
    n: int | None = None
    if n_lists == "auto" or fit_max_rows is not None:
        n = with_vec.count()
    if isinstance(n_lists, str):
        n_lists = max(8, -(-n // target_list_rows))
        # k-means needs k <= TRAINING points — and the quantizer is
        # fit on a fit_max_rows-capped sample, so clamping against the
        # full row count is wrong at scale: past n ≈ fit_max_rows ×
        # target_list_rows the ask would exceed the sample and list
        # sizes would silently go linear again. Bound by the sample.
        fit_cap = n if fit_max_rows is None else min(n, fit_max_rows)
        if n_lists > fit_cap:
            if fit_cap < n:
                # Sample-bound, not corpus-bound: silently returning
                # fewer clusters would make list sizes linear again —
                # a config error, raised loudly.
                raise ValueError(
                    f"n_lists='auto' needs {n_lists} clusters for "
                    f"{n} rows at target_list_rows="
                    f"{target_list_rows}, but the k-means fit sample "
                    f"is capped at {fit_cap}; raise fit_max_rows or "
                    "target_list_rows"
                )
            n_lists = max(1, fit_cap)  # corpus smaller than the floor
    train = with_vec
    if fit_max_rows is not None:
        if n > fit_max_rows:
            # Oversample slightly so the sample rarely undershoots.
            frac = min(1.0, 1.1 * fit_max_rows / n)
            train = with_vec.sample(fraction=frac, seed=seed)
    model = KMeans(
        k=n_lists,
        seed=seed,
        maxIter=max_iter,
        featuresCol="_ivf_feat",
        predictionCol="ivf_list",
    ).fit(train)
    assigned = model.transform(with_vec).drop("_ivf_feat")
    centroids = [np.asarray(c).tolist() for c in model.clusterCenters()]
    return assigned, centroids


# Above this many centroid coefficients (n_lists × dim) the unrolled
# zip_with argmin stops being viable: higher-order lambdas are
# CodegenFallback, so assignment cost is INTERPRETED n_lists × dim
# work per row — measured 47.9 s for ONE pass over 200k rows at
# 400 × 64 (the 100× stress tier's auto-sized quantizer), the
# difference between semantic_dedup_auto scaling at 32×/decade and
# ~8×/decade. Past the cutoff assignment switches to one
# Arrow-batched numpy matmul per batch — same cutoff discipline as
# ``LSH_EXPR_MAX_COEFFS``. n_lists ∝ corpus makes crossing this
# threshold the NORM at scale, not the exception.
IVF_EXPR_MAX_COEFFS = 2048


def _ivf_assign_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    list_col: str,
) -> DataFrame:
    """Arrow-batched nearest-centroid assignment: per batch one
    (batch, dim) @ (dim, n_lists) matmul; ‖v‖² is constant per row so
    argmin over ``−2·(v·c) + ‖c‖²`` is the same argmin. Ties break to
    the LOWEST index (np.argmin first-occurrence — the expr path's
    array_position rule). Summation order differs from the
    sequential-fold expr path by ulps, so a near-exact tie can assign
    differently; the oracle-mirrored queries all use small literal
    quantizers and stay on the expr path.

    Degenerate-input parity (r8 advice): the expr path assigns NULL to
    a NULL embedding and to any vector whose length differs from the
    centroid dim (zip_with pads with NULLs → NULL distances → NULL
    argmin). A naive ``np.array(v.tolist())`` here would instead build
    an object/ragged array and crash the matmul — and under
    ``method='auto'`` that failure-mode switch happens silently once
    ``n_coeffs`` crosses ``IVF_EXPR_MAX_COEFFS``, i.e. exactly at
    scale. So invalid entries are masked out (assigned NULL, matching
    the expr path) and an all-invalid/empty batch short-circuits with
    a typed empty/all-NULL result instead of a 1-D matmul operand.

    NULL *elements* (r9 review): the Arrow list<double> boundary
    converts an element-level null to NaN, indistinguishable from a
    true NaN value inside the UDF — so the element-null mask is a
    codegen ``exists`` OUTSIDE the UDF (the expr path assigns NULL
    there), while true-NaN elements flow through to argmin's first
    index — exactly the expr path's behavior for NaN (NaN distances,
    array_position's NaN-equal ordering → index 0; verified)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Ct = np.ascontiguousarray(C.T)
    cn = np.einsum("ij,ij->i", C, C)
    dim = C.shape[1] if C.ndim == 2 else 0

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        valid = np.fromiter(
            (x is not None and len(x) == dim for x in v),
            dtype=bool,
            count=len(v),
        )
        out = pd.array([None] * len(v), dtype="Int32")
        if valid.any():
            V = np.array(
                [np.asarray(x, dtype=np.float64) for x in v[valid]]
            )
            d = -2.0 * (V @ Ct) + cn
            out[valid] = np.argmin(d, axis=1).astype(np.int32)
        return pd.Series(out, dtype="Int32")

    no_null_elem = F.col(vec_col).isNotNull() & ~F.exists(
        F.col(vec_col), lambda x: x.isNull()
    )
    return df.withColumn(
        list_col,
        F.when(no_null_elem, _assign(F.col(vec_col))),
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
    method: str = "auto",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2) with
    pure column expressions — the IVF assignment step decoupled from
    quantizer training, usable with ANY fixed centroid set (and
    mirrorable in ANSI SQL: the correctness oracle recomputes the same
    ``argmin`` over the same centroid literals).

    ``method``: ``"expr"`` (oracle-mirrored column expressions, best
    for small literal quantizers), ``"arrow"`` (one vectorized numpy
    matmul per Arrow batch — the scale path for corpus-proportional
    quantizers), or ``"auto"`` (by ``IVF_EXPR_MAX_COEFFS``; identical
    assignments up to float summation order on near-exact ties).

    ``d_c = ‖v‖² − 2·(v·c) + ‖c‖²`` with ``‖c‖²`` folded to a literal;
    argmin = first index attaining the minimum (ties break low).

    Expression-tree discipline (r5): the first version unrolled one
    full dot-product expression PER CENTROID and interpolated the
    whole distance array TWICE (once for ``array_position``, once for
    ``array_min``) — at 64 centroids that is a ~17k-node tree whose
    Catalyst analysis + codegen + JIT took 40–66 s per fresh
    DataFrame, dwarfing the actual execution (~0.3 s). Now the
    centroid matrix and the ‖c‖² vector are each ONE constant-folded
    literal, the per-centroid distance is a ``zip_with`` lambda over
    them, and the distance array + self-dot land in temp columns so
    each is built (and evaluated) once. Float ops and their order are
    IDENTICAL — ``sd − 2·(v·c) + ‖c‖²`` per centroid with
    left-to-right aggregate dots — so the cross-engine value-hash
    oracles are unaffected."""
    if method == "auto":
        n_coeffs = len(centroids) * (
            len(centroids[0]) if centroids else 0
        )
        method = "expr" if n_coeffs <= IVF_EXPR_MAX_COEFFS else "arrow"
    if method == "arrow":
        return _ivf_assign_arrow(df, centroids, vec_col, list_col)
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    mat = "array(" + ", ".join(_sql_vec(c) for c in centroids) + ")"
    norms = "array(" + ", ".join(
        f"{float(np.dot(c, c))!r}D" for c in centroids
    ) + ")"
    sd_col = f"_sd_{list_col}"
    dl_col = f"_dl_{list_col}"
    clash = {sd_col, dl_col} & set(df.columns)
    if clash:
        # withColumn would silently REPLACE (and drop then delete) a
        # user column of the same name — fail loudly instead.
        raise ValueError(
            f"ivf_assign staging columns clash with input: {clash}"
        )
    out = (
        df.withColumn(sd_col, F.expr(_dot_sql(vec_col, vec_col)))
        .withColumn(
            dl_col,
            F.expr(
                f"zip_with({mat}, {norms}, (c, n2) -> "
                f"{sd_col} - 2.0D * {_dot_sql(vec_col, 'c')} + n2)"
            ),
        )
        .withColumn(
            list_col,
            F.expr(
                f"CAST(array_position({dl_col}, array_min({dl_col}))"
                " - 1 AS INT)"
            ),
        )
    )
    return out.drop(sd_col, dl_col)


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: nearest ``n_probe`` centroids by L2 (the quantizer's
    metric, driver-side numpy over the kilobyte centroid table), then
    exact cosine rerank inside those lists only."""
    q = np.asarray(query_vec, dtype="float64")
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centroids]
    probe = sorted(range(len(dists)), key=lambda i: dists[i])[:n_probe]
    cands = assigned.filter(F.col("ivf_list").isin(probe))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN scan
# ---------------------------------------------------------------------
#
# A 100 TB embedding corpus (e.g. 26 B × 1 KB float32 vectors) cannot
# be exact-reranked per query; PQ stores each vector as m small codes
# (m bytes at k_sub=256) and scores candidates against a per-query
# lookup table — the scan reads the code column only (~1000× smaller
# than the embeddings), then exact-reranks the tiny candidate set.


def pq_codebooks_random(
    dim: int, m: int = 4, k_sub: int = 16, seed: int = 23
) -> np.ndarray:
    """Deterministic random codebooks, shape (m, k_sub, dim/m) — the
    untrained fallback (and the fixed-literal oracle fixture)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return np.random.RandomState(seed).randn(m, k_sub, dim // m) * 0.5


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 16,
    vec_col: str = "embedding",
    seed: int = 23,
    max_iter: int = 10,
    fit_max_rows: int | None = 1_000_000,
    reliable: bool = False,
) -> np.ndarray:
    """Train PQ codebooks: an independent k-means per subspace over a
    bounded sample (same sampled-fit discipline as ``ivf_index`` —
    training touches ≤ ``fit_max_rows`` vectors regardless of corpus
    size; only encoding is a full pass). Returns (m, k_sub, dim/m).
    ``reliable=True`` materializes the training sample to the
    configured checkpoint dir instead of executor-local blocks
    (``ext.lineage``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from deftunes_spark.ext.lineage import cut_lineage

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    train = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    if fit_max_rows is not None:
        n = train.count()
        if n > fit_max_rows:
            train = train.sample(
                fraction=min(1.0, 1.1 * fit_max_rows / n), seed=seed
            )
    # One cached pass feeds all m sub-fits.
    train = cut_lineage(train, reliable)
    books = []
    for j in range(m):
        sub = train.select(
            array_to_vector(F.slice("v", j * dsub + 1, dsub)).alias("f")
        )
        model = KMeans(
            k=k_sub, seed=seed + j, maxIter=max_iter, featuresCol="f"
        ).fit(sub)
        books.append([np.asarray(c).tolist() for c in model.clusterCenters()])
    return np.asarray(books)


# Above this many codebook coefficients (k_sub × dim) the unrolled
# literal encode expression hits the same driver-side analysis/codegen
# blow-up `with_lsh_bucket` hit (a 768-dim × k_sub=256 codebook is
# ~196k expression nodes). Past the cutoff, encoding switches to one
# Arrow-batched vectorized stage. 4× the LSH cutoff because the encode
# expression is flat literal arrays (cheap nodes), not nested CASEs.
PQ_EXPR_MAX_COEFFS = 4 * LSH_EXPR_MAX_COEFFS


def pq_encode_pandas_udf(codebooks: np.ndarray):
    """Arrow-batched PQ encode: per batch, one (batch, dsub) × (dsub,
    k_sub) matmul per subspace, then argmin. The codebook array ships
    once per executor in the UDF closure (m × k_sub × dsub × 8 B —
    ~1.5 MB for a 768-dim k_sub=256 book, far below broadcast-join
    territory). argmin ties break low, matching the expr path's
    array_position-of-array_min."""
    from pyspark.sql.functions import pandas_udf

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k_sub, dsub = books.shape
    # Precompute ‖c‖² per codeword and the transposed books for matmul.
    books_t = [np.ascontiguousarray(books[j].T) for j in range(m)]
    c_norms = [np.einsum("kd,kd->k", books[j], books[j]) for j in range(m)]

    @pandas_udf("array<int>")
    def _encode(v: pd.Series) -> pd.Series:
        arr = np.array(v.tolist(), dtype=np.float64)  # (batch, dim)
        codes = np.empty((arr.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = arr[:, j * dsub : (j + 1) * dsub]  # (batch, dsub)
            # argmin_c ‖s−c‖² = argmin_c (−2·s·c + ‖c‖²)
            dist = -2.0 * (sub @ books_t[j]) + c_norms[j]
            codes[:, j] = np.argmin(dist, axis=1)
        return pd.Series(list(codes))

    return _encode


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    method: str = "auto",
) -> DataFrame:
    """Attach the PQ code: for each subspace j, the index of the
    nearest codeword (squared L2, ties break low).

    ``method="expr"`` unrolls pure column expressions — mirrorable in
    ANSI SQL for the correctness oracle, best for small codebooks.
    ``method="arrow"`` runs one Arrow-batched numpy stage — the path
    for realistic dims (768+) × k_sub=256, where the literal expression
    tree would make the DRIVER the bottleneck before a task runs.
    ``"auto"`` picks by ``PQ_EXPR_MAX_COEFFS`` over k_sub × dim, the
    same auto-cutoff pattern as ``with_lsh_bucket``. Both paths agree
    exactly up to float summation order (an argmin flips only when two
    codewords are within ~1 ulp).

    Distances drop the codeword-independent ‖s‖² term:
    argmin_c ‖s−c‖² = argmin_c (−2·s·c + ‖c‖²), halving the
    expr-path expression count."""
    m, k_sub, dsub = codebooks.shape
    if method == "auto":
        method = "expr" if k_sub * m * dsub <= PQ_EXPR_MAX_COEFFS else "arrow"
    if method == "arrow":
        udf = pq_encode_pandas_udf(codebooks)
        return df.withColumn(code_col, udf(F.col(vec_col)))
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    # Same expression-tree discipline as ivf_assign (r5): per
    # subspace the codebook and its ‖c‖² vector are ONE constant-
    # folded literal each, the distance list is a zip_with lambda, and
    # both the subvector slice and the distance list land in temp
    # columns so each is built and evaluated once (the unrolled
    # version duplicated the whole distance array for array_position
    # + array_min and re-sliced the vector per codeword). Identical
    # float ops in identical order — the PQ oracles are unaffected.
    out = df
    tmp = []
    all_tmp = {
        f"_pq{k}{j}_{code_col}" for j in range(m) for k in ("s", "d")
    }
    clash = all_tmp & set(df.columns)
    if clash:
        raise ValueError(
            f"pq_encode staging columns clash with input: {clash}"
        )
    for j in range(m):
        s_col, d_col = f"_pqs{j}_{code_col}", f"_pqd{j}_{code_col}"
        tmp += [s_col, d_col]
        mat = "array(" + ", ".join(
            _sql_vec(list(c)) for c in codebooks[j]
        ) + ")"
        n2s = "array(" + ", ".join(
            f"{float(np.dot(c, c))!r}D" for c in codebooks[j]
        ) + ")"
        out = out.withColumn(
            s_col,
            F.expr(
                f"slice(CAST({vec_col} AS array<double>),"
                f" {j * dsub + 1}, {dsub})"
            ),
        ).withColumn(
            d_col,
            F.expr(
                f"zip_with({mat}, {n2s}, (c, n2) -> "
                f"-2.0D * {_dot_sql(s_col, 'c')} + n2)"
            ),
        )
    codes = ", ".join(
        f"CAST(array_position(_pqd{j}_{code_col},"
        f" array_min(_pqd{j}_{code_col})) - 1 AS INT)"
        for j in range(m)
    )
    return out.withColumn(code_col, F.expr(f"array({codes})")).drop(*tmp)


def pq_adc_scores(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    code_col: str = "pq_code",
    score_col: str = "pq_score",
) -> DataFrame:
    """Asymmetric-distance (ADC) inner-product score: the query is cut
    into the same m subvectors, lut[j][c] = q_j · codeword_{j,c} is a
    driver-side numpy table (m × k_sub doubles — kilobytes), and each
    row's score is m literal-array lookups summed — the scan never
    touches the embedding column."""
    m, k_sub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype="float64")
    terms = []
    for j in range(m):
        lut = [float(np.dot(q[j * dsub : (j + 1) * dsub], c))
               for c in codebooks[j]]
        # arr[j] is 0-based in Spark SQL; element_at is 1-based.
        terms.append(
            f"element_at({_sql_vec(lut)}, {code_col}[{j}] + 1)"
        )
    return encoded.withColumn(score_col, F.expr(" + ".join(terms)))


def pq_topk(
    df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str | None = None,
) -> DataFrame:
    """PQ ANN top-k: ADC-score every code, keep the ``refine × k``
    best candidates (TakeOrdered — no global sort), exact-cosine
    rerank only those. If ``code_col`` names a precomputed code column
    (the 100 TB path: codes persisted next to the ids, embeddings in a
    separate cold table), the wide vector column is only read for the
    candidate rows."""
    if code_col is None:
        code_col = "pq_code"
        df = pq_encode(df, codebooks, vec_col, code_col)
    scored = pq_adc_scores(df, codebooks, query_vec, code_col)
    cands = (
        scored
        .withColumn("pq_score", F.round("pq_score", 6))
        .orderBy(F.col("pq_score").desc(), F.col(id_col))
        .limit(refine * k)
    )
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    planes: np.ndarray | None = None,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket equi-join + exact cosine.

    Only vectors sharing an LSH bucket are compared (high-cosine pairs
    collide with high probability; raise n_bits to cut candidates,
    lower it to raise recall). Never a cross join.
    """
    if planes is None:
        probe = (
            df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        )
        if probe is None:  # empty/all-null corpus → zero pairs
            # Mirror the non-empty branch's schema exactly (the id
            # type follows the input), so a downstream union/append
            # can't hit a type mismatch only on empty input.
            id_type = df.schema[id_col].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [],
                f"id_a {id_type}, id_b {id_type}, cosine_sim double",
            )
        planes = random_hyperplanes(len(probe[0]), n_bits, seed)
    # Norm once per ROW (not per pair): HOF folds are interpreted, so
    # the pair loop should evaluate exactly one (the dot). Same float
    # ops in the same order — sim is unchanged (see semantic_dedup).
    bucketed = with_lsh_bucket(df, planes, vec_col).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("lsh_bucket"),
        norm_expr(F.col(vec_col)).alias("_norm"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    denom = F.col("a._norm") * F.col("b._norm")
    # NULL (not crash) on a zero-norm side under ANSI mode; the
    # threshold filter then drops the pair (NULL >= thr is NULL).
    sim = F.when(
        denom != 0.0,
        dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / denom,
    )
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def knn_join(
    df: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN self-join: each vector's top-k cosine neighbors among the
    vectors sharing its coarse IVF cluster — the retrieval-side join
    (link prediction, recommendation candidates, hard-negative mining)
    that complements the threshold-pair dedup shape.

    Never a cross join: the pair space is the cluster equi-join, so
    per-task work is O(cluster²) and the ``nlist ∝ corpus`` rule
    (``ivf_index(n_lists="auto")``) holds it O(1) in corpus size.
    Norms compute once per ROW; zero-norm vectors have undefined
    cosine and drop out of both sides' candidate lists. The top-k is
    a per-left-id window rank (sim rounded to 6 dp BEFORE ordering —
    the engine-portable tie discipline), partition-parallel by id.
    Boundary caveat shared with every single-probe IVF scheme: a true
    neighbor in an adjacent cluster is unseen; raise recall by
    multi-assigning probes upstream."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    assigned = ivf_assign(df, centroids, vec_col, "cluster").select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cluster"),
        norm_expr(F.col(vec_col)).alias("_norm"),
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    denom = F.col("a._norm") * F.col("b._norm")
    sim = F.round(
        F.when(
            denom != 0.0,
            dot_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            / denom,
        ),
        6,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(id_col),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine_sim").desc(), "neighbor_id"
    )
    return (
        pairs.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= k)
    )


def _cluster_guard_probe(
    raw: DataFrame,
    assigned: DataFrame,
    cap: int,
) -> tuple[bool, DataFrame | None]:
    """Two-tier probe deciding whether the hot-cluster guard must
    engage (r7 verdict #2: skip the fan-out + merge when no cluster
    exceeds the cap). Tier 1 is a plain ``count()`` on the RAW input —
    for parquet scans that is a footer-metadata aggregate, no
    assignment compute — and a corpus of ≤ cap rows cannot contain a
    cluster above the cap. Only past that does tier 2 pay the
    per-cluster counts aggregate over the assignment.

    Returns ``(needs_guard, over_counts)``. When the guard engages,
    ``over_counts`` is the OVER-CAP slice of the per-cluster counts,
    collected to the driver and rebuilt as a local relation — bounded
    by n_rows/cap rows, KBs even adversarially — so
    :func:`_salted_pair_blocks` broadcasts already-materialized
    counts instead of recomputing the aggregate (which would re-run
    the dominant nlist×d assignment pass a third time; r8 advice).
    A persisted relation would avoid the driver hop but leak one
    CacheManager pin per call with no caller able to unpersist after
    its terminal action (r9 review); under-cap clusters don't need a
    row at all (their salt count is 1 by construction)."""
    if raw.count() <= cap:
        return False, None
    over = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_crows"))
        .filter(F.col("_crows") > cap)
        .collect()
    )
    if not over:
        return False, None
    over_df = assigned.sparkSession.createDataFrame(
        [(r["cluster"], int(r["_crows"])) for r in over],
        "cluster int, _crows bigint",
    )
    return True, over_df


def _max_cluster_count(assigned: DataFrame) -> int:
    """Largest cluster size in a cluster-assigned relation — ONE
    scalar off the same counts aggregate the hot-cluster guard builds
    anyway. Callers use it to short-circuit the guard entirely when no
    cluster exceeds the cap (r7 verdict #2: the well-clustered common
    case was paying the fan-out + two-stage merge for nothing). This
    is an EAGER action: with ``cache=True`` it materializes the
    persisted assignment the downstream stages reuse; with
    ``cache=False`` it costs one extra assignment pass."""
    row = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("_crows"))
        .agg(F.max("_crows"))
        .first()
    )
    return int(row[0] or 0)


def _salted_pair_blocks(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    max_cluster_rows: int,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Fan a cluster-assigned relation out into bounded pair blocks.

    Guard for the duplicate-mass hot cluster: ``nlist ∝ corpus``
    bounds the EXPECTED cluster size, but k-means cannot split
    identical/near-identical points — a boilerplate-heavy corpus (the
    canonical dedup input) lands its whole duplicate mass in ONE
    cluster, and one ``applyInPandas`` worker would hold the entire
    (c × d) matrix no matter how nlist scales. So each cluster is
    sub-split by a salt ``hash(id) % ns`` with
    ``ns = ceil(cluster_rows / max_cluster_rows)`` (a LAZY per-cluster
    column off a broadcast count join — no driver action at build
    time), and the quadratic pair space becomes ns² ordered block
    pairs ``(cluster, _gl, _gr)``: LEFT rows (salt == _gl) × RIGHT
    rows (salt == _gr). Every cross-block pair is seen exactly once;
    per-task rows are ≤ 2·max_cluster_rows IN EXPECTATION — hash
    salting balances buckets statistically, not as a hard bound
    (measured 436 rows at cap 200 on the adversarial 50%-identical
    fixture; ``tests/test_hot_cluster.py`` asserts a 3× ceiling), and
    rows sharing an id always share a salt, so a flood of same-id
    rows is NOT sub-split (ids are primary keys in every caller;
    equal-id masking requires them co-located). Size executor memory
    off the tested 3× ceiling, not 2×. AQE
    cannot do this — it never splits ``applyInPandas`` groups.

    Each input row is emitted once per block it participates in, with
    ``_role``: 2 = both sides (the diagonal block — exactly one row
    per input when ns == 1, so the unsalted shape pays zero extra
    transfer), 0 = left only, 1 = right only. Equal-id rows share a
    salt, so equal-id masking inside the diagonal block still sees
    every equal-id pair.

    ``counts``: an optional pre-built (cluster, _crows) relation — the
    guard probe's OVER-CAP slice, driver-collected — so the broadcast
    side here reuses materialized counts instead of recomputing the
    assignment (r8 advice). It may be SPARSE (over-cap clusters only):
    the join is LEFT and a missing row means ns = 1 (greatest skips
    the NULL), which is exactly an under-cap cluster's salt count."""
    join_how = "inner"
    if counts is None:
        counts = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("_crows")
        )
    else:
        join_how = "left"
    ns = F.greatest(
        F.lit(1),
        F.ceil(F.col("_crows") / F.lit(float(max_cluster_rows))),
    ).cast("int")
    salted = (
        assigned.join(F.broadcast(counts), ["cluster"], join_how)
        .withColumn("_ns", ns)
        .withColumn(
            "_my",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_ns")).cast("int"),
        )
        .drop("_crows")
    )
    # ONE explode emits every (block, role) assignment for the row —
    # a two-branch union would re-scan the (fat) vector column twice;
    # this keeps the whole fan-out on a single pass.
    blocks_arr = F.expr(
        "concat("
        "transform(sequence(0, _ns - 1), o -> named_struct("
        "'gl', _my, 'gr', o,"
        " 'role', CAST(IF(o = _my, 2, 0) AS TINYINT))),"
        " filter(transform(sequence(0, _ns - 1), o -> named_struct("
        "'gl', o, 'gr', _my, 'role', CAST(1 AS TINYINT))),"
        " x -> x.gl != _my))"
    )
    return salted.withColumn("_b", F.explode(blocks_arr)).select(
        "cluster",
        F.col("_b.gl").alias("_gl"),
        F.col("_b.gr").alias("_gr"),
        F.col(id_col),
        F.col(vec_col),
        F.col("_b.role").alias("_role"),
    )


def knn_join_grouped(
    df: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int = 50_000,
    cache: bool = False,
) -> DataFrame:
    """Production kernel for :func:`knn_join`: ``applyInPandas`` over
    coarse clusters, the pair cosine matrix as a blocked BLAS matmul,
    per-row top-k via partial selection — the same grouped-vectorized
    substrate as SemDeDup's kernel (84× over per-pair interpreted HOF
    dots, measured there). Identical neighbor sets up to float
    summation order; the expr path stays the SQL-oracle mirror, ties
    broken by (rounded sim desc, id) on both. Zero-norm vectors drop
    from both sides.

    Hot-cluster guard: clusters over ``max_cluster_rows`` are salted
    into bounded pair blocks (:func:`_salted_pair_blocks`) and the
    per-block local top-k lists are merged by a global per-query
    window rank over the SAME (rounded sim desc, neighbor id) order —
    exact two-stage top-k, since each query's global top-k is a
    subset of the union of its per-block top-k and each (query,
    neighbor) pair occurs in exactly one block. Per-task memory is
    ~2·max_cluster_rows vectors in expectation (hash-salt balance is
    statistical; the tested ceiling is 3× — see
    :func:`_salted_pair_blocks`).
    Under ns == 1 every cluster is a single diagonal block — the
    exact pre-guard kernel shape and transfer volume. Better: when NO
    cluster exceeds the cap (one scalar probe off the counts aggregate,
    :func:`_max_cluster_count`), the guard is skipped entirely — the
    kernel runs single-stage per cluster with ranks computed in-kernel,
    no fan-out join, no merge window (r7 verdict #2: the well-clustered
    common case paid ~2× fixed stage overhead for nothing)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_cluster_rows < 2:
        raise ValueError("max_cluster_rows must be >= 2")
    import pandas as pd

    from pyspark.sql import Window

    from pyspark import StorageLevel

    # persist: the assignment (full scan + nlist×d distance flops per
    # row) feeds the guard probe, the salted fan-out join inside
    # _salted_pair_blocks, AND the kernel — without a cache the
    # dominant compute runs up to 3× per action. NOTE the builder is
    # EAGER since r8: the guard probe (_cluster_guard_probe) runs a
    # count job (and above the cap, the assignment itself) at
    # DataFrame-construction time; MEMORY_AND_DISK spills, never
    # evicts.
    # Default cache=False (r7 advice): CacheManager has no TTL, so
    # call-over-call pins accumulate in long-lived sessions until
    # spark.catalog.clearCache(); registry/bench builders opt in.
    assigned = (
        ivf_assign(df, centroids, vec_col, "cluster")
        .select(F.col(id_col), F.col(vec_col), F.col("cluster"))
        # NULL assignments (arrow ivf path: invalid/NULL-element
        # embeddings → NULL cluster) have no meaningful neighbors;
        # a NULL-cluster group would reach the kernel and _mat's
        # np.array over None vectors raises in einsum (r9 advice).
        # The expr path drops them implicitly via its inner
        # cluster self-join — same output semantics.
        .filter(F.col("cluster").isNotNull())
    )
    if cache:
        assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    id_type = dict(assigned.dtypes)[id_col]

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pdf[id_col].iloc[:0],
                "neighbor_id": pdf[id_col].iloc[:0],
                "cosine_sim": np.zeros(0),
                "rank": np.zeros(0, dtype=np.int64),
            }
        )
        roles = pdf["_role"].to_numpy()
        q_pdf = pdf[(roles == 0) | (roles == 2)]
        c_pdf = pdf[(roles == 1) | (roles == 2)]
        if len(q_pdf) == 0 or len(c_pdf) == 0:
            return empty

        def _mat(side: pd.DataFrame):
            ids = side[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            V = np.array(
                [
                    np.asarray(v, dtype=np.float64)
                    for v in side[vec_col].iloc[order]
                ]
            )
            norms = np.sqrt(np.einsum("ij,ij->i", V, V))
            valid = norms != 0.0
            return ids[valid], V[valid], norms[valid]

        q_ids, Q, q_norms = _mat(q_pdf)
        c_ids, C, c_norms = _mat(c_pdf)
        if len(q_ids) == 0 or len(c_ids) == 0:
            return empty
        nc = len(c_ids)
        out_i, out_j, out_s, out_r = [], [], [], []
        block = 2048
        for i0 in range(0, len(q_ids), block):
            i1 = min(i0 + block, len(q_ids))
            sims = (Q[i0:i1] @ C.T) / np.outer(
                q_norms[i0:i1], c_norms
            )
            # HALF-AWAY-FROM-ZERO to 6 dp — Spark's F.round / DuckDB
            # round semantics; np.round is half-to-even and would
            # disagree with the expr/oracle twin on exact .5 digits.
            sims = np.sign(sims) * np.floor(
                np.abs(sims) * 1e6 + 0.5
            ) / 1e6
            for r, i in enumerate(range(i0, i1)):
                row = sims[r].copy()
                # Exclude EVERY equal-id pair, not just this row's own
                # index — the expr path's a.id != b.id drops duplicate-
                # id cross-pairs too, and a doc must never be its own
                # neighbor. (Equal-id rows share a salt, so they are
                # all present in this block whenever any is.)
                row[c_ids == q_ids[i]] = -np.inf
                kk = min(k, nc)
                # Ties: (sim desc, neighbor id asc) — matches the
                # expr path's window ordering on rounded sims. The
                # candidate set is EVERY element ≥ the kk-th sim
                # (argpartition's tail ordering is arbitrary, so a
                # boundary tie with a smaller id could otherwise be
                # dropped).
                kth = np.partition(row, nc - kk)[nc - kk]
                cand = np.nonzero(row >= kth)[0]
                # Masked (equal-id) entries sit at -inf; when kk >= the
                # number of FINITE candidates the kth value itself is
                # -inf and they'd pass `row >= kth` — drop them so the
                # output never carries -inf/self rows (the expr path's
                # isNotNull + a.id != b.id drops them too).
                cand = [j for j in cand if np.isfinite(row[j])]
                cand = sorted(
                    cand, key=lambda j: (-row[j], c_ids[j])
                )[:kk]
                for rnk, j in enumerate(cand):
                    out_i.append(q_ids[i])
                    out_j.append(c_ids[j])
                    out_s.append(row[j])
                    out_r.append(rnk + 1)
        return pd.DataFrame(
            {
                id_col: out_i,
                "neighbor_id": out_j,
                "cosine_sim": out_s,
                "rank": np.asarray(out_r, dtype=np.int64),
            }
        )

    schema = (
        f"{id_col} {id_type}, neighbor_id {id_type}, "
        "cosine_sim double, rank bigint"
    )
    # Short-circuit: no cluster over the cap ⇒ every cluster is one
    # diagonal block and the kernel's in-block rank IS the global rank
    # (same (rounded sim desc, neighbor id) order) — skip the fan-out
    # join and the merge window entirely.
    needs_guard, probe_counts = _cluster_guard_probe(
        df, assigned, max_cluster_rows
    )
    if not needs_guard:
        diag = assigned.withColumn("_role", F.lit(2).cast("tinyint"))
        return diag.groupBy("cluster").applyInPandas(topk, schema)

    blocks = _salted_pair_blocks(
        assigned, id_col, vec_col, max_cluster_rows,
        counts=probe_counts,
    )
    partial = blocks.groupBy("cluster", "_gl", "_gr").applyInPandas(
        topk, schema
    )
    # Stage-2 merge: exact global top-k from the per-block lists.
    # Each (query, neighbor) pair occurs in exactly one block, so no
    # dedup is needed; the window re-ranks (discarding the in-block
    # local rank) with the kernel's own tie discipline. Input is
    # ≤ ns·k rows per query — bounded.
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine_sim").desc(), "neighbor_id"
    )
    return partial.drop("rank").withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------
# Incremental ANN index maintenance
# ---------------------------------------------------------------------


def incremental_ivf_assign(
    spark,
    batch: DataFrame,
    store_path: str,
    centroids: list[list[float]] | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_list_rows: int = 500,
    seed: int = 42,
    init_wait_sec: float = 120.0,
) -> DataFrame:
    """Incremental ANN index maintenance: assign a NEW embedding batch
    against the PERSISTED quantizer version — the embeddings twin of
    ``dedup.incremental_minhash_dedup`` (signatures there, centroids
    here). The query NEVER refits: a refit silently re-shuffles every
    previously assigned list, so it is an offline decision made on the
    drift signal this operator emits, committed as a NEW version of
    the store (``io/versioned.py`` — time-travelable: "which quantizer
    did Tuesday's ingest assign against?" is a version number).

    First run (store absent): fit the quantizer on the batch
    (``ivf_index``; or take the given literal ``centroids`` verbatim)
    and write version 1 of the store — guarded by an atomic O_EXCL
    init marker so concurrent first runs admit exactly one fitter
    (the losers wait for version 1 and assign against it) — one row
    per list:
    (ivf_list, centroid, fit_rows), where ``fit_rows`` is the batch's
    own occupancy (the fit-time distribution every later batch is
    compared against). Later runs: read the LATEST version (n_lists
    rows — a bounded driver pull, exactly like the literal-centroid
    queries), bake the stored centroids into the same constant-folded
    argmin expression ``ivf_assign`` uses — assignment is
    DETERMINISTIC given the stored version (doubles round-trip parquet
    exactly), so the whole chain value-hash-mirrors into SQL — and
    assign the batch.

    Output: one row per batch vector —
    (id, ivf_list, batch_list_rows, fit_list_rows, occupancy_ratio)
    where ``occupancy_ratio`` = (list's share of the batch) / (list's
    share at fit time), computed as one integer-product division
    ``(b·fit_total) / (f·batch_total)`` so both engines round the
    same single double. Ratio ≫ 1 means the data distribution drifted
    INTO the list (it will outgrow its siblings — the refit trigger);
    NULL means the list was empty at fit time (new-region drift, the
    strongest refit signal).

    Scale shape: the store is n_lists rows at ANY corpus size; the
    batch pays one scan + nlist×d distance flops per row; the drift
    join broadcasts the (≤ n_lists)-row occupancy relation; the only
    1-row relation is the batch-total aggregate (audited BNLJ, the
    DSIR/Zipf pattern)."""
    from deftunes_spark.io.versioned import (
        _excl_create,
        _fs,
        _p,
        list_versions,
        read_version,
        write_versioned,
    )

    # Precise existence check: list_versions returns [] for a missing
    # store. A blanket try/except around a probe read would treat ANY
    # transient read failure as "store absent" and APPEND a second
    # centroid set into an existing store — silent corruption of the
    # never-refit contract; a real read error must propagate.
    store_exists = bool(list_versions(spark, store_path))

    if not store_exists:
        # First-run initialization is check-then-act; two concurrent
        # first runs would BOTH observe an absent store and BOTH append
        # a version-1 centroid set (r8 advice — the exact silent
        # corruption the existence check above exists to prevent). An
        # atomic O_EXCL init marker admits exactly one fitter; losers
        # wait (bounded) for the winner's version 1 and proceed down
        # the normal assign-against-stored path. A winner that dies
        # between marker and manifest strands the marker — the loser's
        # timeout error names it so the recovery (delete the marker)
        # is explicit, never silent.
        jvm, fs = _fs(spark, store_path)
        fs.mkdirs(_p(jvm, store_path))
        marker = _p(jvm, f"{store_path}/_ivf_init.marker")
        if not _excl_create(spark, fs, marker):
            import time as _time

            # The loser's wait is a PARAMETER (r9 advice): a fixed
            # 120 s assumed the winner's first fit commits quickly,
            # but a legitimately slow fit (large batch,
            # centroids='auto') past the deadline would make losers
            # declare the winner dead while it is still fitting —
            # and acting on the old recovery text (delete the
            # marker) would re-admit a second fitter and recreate
            # the duplicate-version-1 corruption the marker exists
            # to prevent. Size init_wait_sec to the slowest
            # plausible first fit for the deployment.
            deadline = _time.time() + float(init_wait_sec)
            while not list_versions(spark, store_path):
                if _time.time() > deadline:
                    raise RuntimeError(
                        "incremental_ivf_assign: lost the init race "
                        f"for {store_path!r} but no version appeared "
                        f"within {init_wait_sec:g}s. Either the "
                        "winning initializer died between claiming "
                        "the marker and committing version 1, OR its "
                        "first fit is simply slower than "
                        "init_wait_sec (large batch, "
                        "centroids='auto'). Before deleting "
                        f"{store_path}/_ivf_init.marker, CONFIRM the "
                        "winner process is dead — not merely that no "
                        "version exists yet; deleting the marker "
                        "under a live fitter re-admits a second one "
                        "and appends a duplicate version-1 centroid "
                        "set. If the winner may still be running, "
                        "retry with a larger init_wait_sec instead."
                    )
                _time.sleep(0.2)
            store_exists = True

    if not store_exists:
        if isinstance(centroids, str):
            if centroids != "auto":
                raise ValueError(
                    "centroids must be a list or 'auto', got "
                    f"{centroids!r}"
                )
            _, cents = ivf_index(
                batch,
                n_lists="auto",
                id_col=id_col,
                vec_col=vec_col,
                seed=seed,
                target_list_rows=target_list_rows,
            )
        else:
            cents = [[float(x) for x in c] for c in centroids]
        fit_occ = (
            ivf_assign(batch, cents, vec_col, "ivf_list")
            .groupBy("ivf_list")
            .agg(F.count(F.lit(1)).cast("bigint").alias("fit_rows"))
            .collect()
        )
        occ = {r["ivf_list"]: r["fit_rows"] for r in fit_occ}
        store_rows = [
            (i, c, int(occ.get(i, 0))) for i, c in enumerate(cents)
        ]
        store_df = spark.createDataFrame(
            store_rows,
            "ivf_list int, centroid array<double>, fit_rows bigint",
        )
        write_versioned(spark, store_df, store_path, mode="append")

    stored = sorted(
        read_version(spark, store_path).collect(),
        key=lambda r: r["ivf_list"],
    )
    cents = [[float(x) for x in r["centroid"]] for r in stored]
    fit_total = sum(int(r["fit_rows"]) for r in stored)
    fit_occ_df = spark.createDataFrame(
        [(int(r["ivf_list"]), int(r["fit_rows"])) for r in stored],
        "ivf_list int, fit_rows bigint",
    )

    assigned = ivf_assign(
        batch.select(F.col(id_col), F.col(vec_col)),
        cents,
        vec_col,
        "ivf_list",
    ).select(id_col, "ivf_list")
    counts = assigned.groupBy("ivf_list").agg(
        F.count(F.lit(1)).cast("bigint").alias("batch_list_rows")
    )
    total = counts.agg(
        F.sum("batch_list_rows").alias("_bt")
    )  # 1 row — audited broadcast
    drift = (
        counts.join(F.broadcast(total))
        .join(F.broadcast(fit_occ_df), "ivf_list", "left")
        .select(
            "ivf_list",
            "batch_list_rows",
            F.coalesce(F.col("fit_rows"), F.lit(0))
            .cast("bigint")
            .alias("fit_list_rows"),
            F.when(
                F.coalesce(F.col("fit_rows"), F.lit(0)) > 0,
                F.round(
                    (
                        F.col("batch_list_rows") * F.lit(int(fit_total))
                    ).cast("double")
                    / (F.col("fit_rows") * F.col("_bt")).cast("double"),
                    6,
                ),
            ).alias("occupancy_ratio"),
        )
    )
    return assigned.join(F.broadcast(drift), "ivf_list").select(
        id_col,
        "ivf_list",
        "batch_list_rows",
        "fit_list_rows",
        "occupancy_ratio",
    )


# ---------------------------------------------------------------------
# Matryoshka (truncated-dimension) embeddings
# ---------------------------------------------------------------------


def matryoshka_truncate(
    df: DataFrame,
    dims: int,
    vec_col: str = "embedding",
    out_col: str | None = None,
    renormalize: bool = True,
) -> DataFrame:
    """Truncate embeddings to their first ``dims`` coordinates
    (Matryoshka Representation Learning, Kusupati et al. 2022: MRL
    models pack coarse-to-fine structure into prefixes, so the first
    d' dims are a usable d'-dim embedding). The storage/transfer
    lever at 100 TB: a 64→16 truncation quarters every ANN scan,
    shuffle, and cache byte. Pure codegen (slice + fold), no shuffle.

    ``renormalize=True`` rescales to unit norm (cosine retrieval
    convention); zero-norm prefixes stay NULL rather than dividing by
    zero. Rankings by cosine are normalization-invariant, so the
    recall evaluation (``matryoshka_recall`` driver query) slices
    without renormalizing."""
    if dims < 1:
        raise ValueError("dims must be >= 1")
    out = out_col or vec_col
    trunc = F.slice(F.col(vec_col), 1, dims)
    if not renormalize:
        return df.withColumn(out, trunc)
    tn = F.sqrt(dot_expr(trunc, trunc))
    return df.withColumn(
        out,
        F.when(
            tn != 0.0,
            F.transform(trunc, lambda x: x / tn),
        ),
    )
