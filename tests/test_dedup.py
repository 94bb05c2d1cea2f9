import pytest
from pyspark.sql import functions as F

from deftunes_spark.ext import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "sleeps on the warm windowsill in the afternoon sun light"
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 distinct docs + planted near-dup pairs + one exact dup."""
    rows = []
    for i in range(60):
        rows.append(
            (i, f"document number {i} " + " ".join(f"tok{i}_{j}" for j in range(30)))
        )
    rows.append((100, BASE))
    rows.append((101, BASE))  # exact dup of 100
    rows.append((102, BASE.replace("lazy", "sleepy")))  # near dup
    rows.append((103, BASE + " extra trailing words here"))  # near dup
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(corpus):
    groups = D.exact_dedup(corpus, ["text"], "doc_id")
    dup = groups.filter("dup_count > 1").collect()
    assert len(dup) == 1
    assert dup[0].keep_id == 100 and dup[0].dup_count == 2
    assert groups.count() == 63  # 64 docs, one merged pair


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    sh = D.shingles(df, "doc_id", "text", n=3).collect()
    assert [r.shingle for r in sh] == ["only two"]


def test_minhash_finds_planted_neardups(corpus):
    pairs = D.minhash_dedup_pairs(
        corpus, "doc_id", "text", n=2, num_hashes=32, bands=8,
        threshold=0.4,
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (100, 101) in found  # exact dup → est_jaccard 1.0
    assert (100, 102) in found or (101, 102) in found
    # No false positives among the unrelated docs.
    assert not any(a < 100 and b < 100 for a, b in found)


def test_minhash_estimate_close_to_true_jaccard(corpus):
    pairs = D.minhash_dedup_pairs(
        corpus, "doc_id", "text", n=2, num_hashes=64, bands=16,
        threshold=0.3,
    )
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            corpus, "doc_id", "text", n=2, threshold=0.0
        ).collect()
    }
    for r in pairs.collect():
        true_j = exact.get((r.id_a, r.id_b), 0.0)
        assert abs(r.est_jaccard - true_j) < 0.35


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    # 2-shingles: {ab,bc,cd} vs {ab,bc,ce} → J = 2/4 = 0.5
    out = D.ngram_jaccard_pairs(
        df, "doc_id", "text", n=2, threshold=0.0
    ).collect()
    assert len(out) == 1
    assert abs(out[0].jaccard - 0.5) < 1e-9


def test_simhash_near_pairs(corpus):
    sims = D.simhash64(corpus, "doc_id", "text")
    # Exact dup → identical fingerprint (hamming 0).
    fp = {r.doc_id: r.simhash for r in sims.collect()}
    assert fp[100] == fp[101]
    pairs = D.simhash_near_pairs(sims, "doc_id", max_hamming=10)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (100, 101) in found
    # One changed token in a ~22-token doc shifts each bit's vote by
    # ±2, so hamming lands well under random (≈32) but above the
    # near-dup cutoff; appended-words doc stays under it.
    assert (100, 103) in found
    assert bin(fp[100] ^ fp[102]).count("1") < 24
    # Unrelated docs never pair up.
    assert not any(a < 100 and b < 100 for a, b in found)


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter forces multiple rounds), clique 10-11-12,
    # isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    comp = {
        r.node: r.comp
        for r in D.connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                    10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20}


def test_mapside_signatures_equal_shuffle_signatures(spark):
    """The zero-shuffle array-expression signature path must produce
    BIT-IDENTICAL signatures to the explode->groupBy path for both
    hash families (min over a multiset == min over its distinct set),
    including the edge docs: empty text, whitespace-only, shorter than
    n tokens, repeated shingles."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "one two"),          # shorter than n=3 -> single shingle
        (4, ""),                  # empty -> single '' shingle
        (5, "   "),               # whitespace-only -> same as empty
        (6, "rep rep rep rep rep rep"),  # heavy shingle repetition
        (7, None),  # NULL text -> one NULL shingle on both paths
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for hash_fn in ("xxhash64", "md5"):
        mapside = {
            r.doc_id: tuple(r[f"mh_{i}"] for i in range(8))
            for r in D.minhash_signatures_mapside(
                df, "doc_id", "text", n=3, num_hashes=8, hash_fn=hash_fn
            ).collect()
        }
        sh = D.shingles(df, "doc_id", "text", n=3)
        shuffled = {
            r.doc_id: tuple(r[f"mh_{i}"] for i in range(8))
            for r in D.minhash_signatures(
                sh, "doc_id", num_hashes=8, hash_fn=hash_fn
            ).collect()
        }
        assert mapside == shuffled, hash_fn
        # NULL text degenerates identically on both paths: xxhash64 of
        # a NULL shingle is the seed constant; md5 propagates NULL.
        assert 7 in mapside


def test_minhash_pairs_same_across_signature_strategies(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    kw = dict(n=2, num_hashes=16, bands=4, threshold=0.2)
    out = {}
    for strat in ("mapside", "shuffle"):
        out[strat] = sorted(
            (r.id_a, r.id_b, round(r.est_jaccard, 9))
            for r in D.minhash_dedup_pairs(
                docs, "doc_id", "text",
                signature_strategy=strat, **kw
            ).collect()
        )
    assert out["mapside"] == out["shuffle"]
    assert any(p[:2] == (1, 2) for p in out["mapside"])


def test_mapside_simhash_equals_shuffle_simhash(spark):
    """Zero-shuffle SimHash must be bit-identical to the exploded
    bit-vote path: occurrence-weighted votes, tie -> 0 bit, NULL text
    dropped by both."""
    rows = [
        (1, "the quick brown fox the quick"),  # repeated tokens vote 2x
        (2, "completely different content here"),
        (3, "single"),
        (4, ""),      # '' token still votes on both paths
        (5, None),    # dropped on both paths
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mapside = {
        r.doc_id: r.simhash
        for r in D.simhash64_mapside(df, "doc_id", "text").collect()
    }
    shuffled = {
        r.doc_id: r.simhash
        for r in D.simhash64(
            df, "doc_id", "text", hash_fn="xxhash64", strategy="shuffle"
        ).collect()
    }
    assert mapside == shuffled
    assert 5 not in mapside and 1 in mapside
    # And the plan really is shuffle-free.
    plan = (
        D.simhash64_mapside(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan


def test_incremental_minhash_lifetime_union(spark, tmp_path):
    """Incremental runs over successive batches emit, in lifetime
    union, exactly the full-corpus LSH pair set — no old-vs-old
    recompute, no lost cross-batch pair. Also: the signature store
    versions grow one append per run."""
    from deftunes_spark.ext.dedup import (
        incremental_minhash_dedup,
        minhash_dedup_pairs,
    )
    from deftunes_spark.io.versioned import list_versions, read_version

    texts = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark and parquet files"),
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "totally unrelated content concerning minhash signatures"),
        (6, "completely different text about spark and parquet files"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    kw = dict(n=2, num_hashes=32, bands=8, threshold=0.3)

    full = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", **kw
        ).collect()
    }

    store = str(tmp_path / "sigstore")
    got = set()
    versions = []
    for batch_ids in ((1, 2, 3), (4, 5, 6)):
        batch = docs.filter(F.col("doc_id").isin(*batch_ids))
        pairs, v = incremental_minhash_dedup(
            spark, batch, store, "doc_id", "text", **kw
        )
        got |= {
            tuple(sorted((r.id_a, r.id_b))) for r in pairs.collect()
        }
        versions.append(v)
    assert got == full and full  # non-trivial and exactly equal
    assert versions == [0, 1]
    assert read_version(spark, store).count() == len(texts)
    assert len(list_versions(spark, store)) == 2


def test_incremental_minhash_dry_run_commits_nothing(spark, tmp_path):
    from deftunes_spark.ext.dedup import incremental_minhash_dedup
    from deftunes_spark.io.versioned import list_versions

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    store = str(tmp_path / "sigstore")
    pairs, v = incremental_minhash_dedup(
        spark, docs, store, "doc_id", "text", commit=False
    )
    assert v is None
    assert pairs.count() == 1
    assert list_versions(spark, store) == []


def test_blocked_fuzzy_pairs_planted(spark):
    from deftunes_spark.ext.dedup import blocked_fuzzy_pairs

    rows = [
        (1, "acme corp"),
        (2, "acme corp."),   # distance 1 — same block (len differs!)
        (3, "acme clrp"),    # distance 1 from 1, same length/prefix
        (4, "globex inc"),
        (5, "very different name"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    import pyspark.sql.functions as F

    blk = F.substring(F.col("name"), 1, 6)
    out = {
        (r.id_a, r.id_b): r.distance
        for r in blocked_fuzzy_pairs(
            df, "id", "name", block_expr=blk, max_distance=2
        ).collect()
    }
    # (1,3): same prefix block, 1 substitution apart.
    assert out[(1, 3)] == 1
    # (1,2): one INSERTION (trailing dot) — lengths differ by 1, the
    # length BAND keeps the pair matchable (a length-exact block key
    # would have silently excluded every insert/delete edit).
    assert out[(1, 2)] == 1
    assert all(k != (4, 5) for k in out)


def test_incremental_racing_batches_union_complete(spark, tmp_path):
    """Two batches ingested from the same base must not lose
    cross-batch pairs: commit-then-dedup means the later run's
    snapshot contains the earlier batch (regression — the old
    dedup-then-commit flow dropped (a∈A, b∈B) pairs forever)."""
    from deftunes_spark.ext.dedup import (
        incremental_minhash_dedup,
        minhash_dedup_pairs,
    )

    base_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base_text + f" tail{i}") for i in range(6)]
    # Near-dup pair split ACROSS the two racing batches:
    rows += [(100, base_text), (200, base_text + " x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    batch_a = df.filter("doc_id < 100 OR doc_id = 100")
    batch_b = df.filter("doc_id >= 200 OR doc_id < 100").filter(
        "doc_id >= 3 OR doc_id = 200"
    )
    store = str(tmp_path / "store")
    kw = dict(n=2, num_hashes=32, bands=8, threshold=0.3)
    pairs_a, va = incremental_minhash_dedup(
        spark, batch_a, store, "doc_id", "text", **kw
    )
    got_a = {(r.id_a, r.id_b) for r in pairs_a.collect()}
    pairs_b, vb = incremental_minhash_dedup(
        spark, batch_b, store, "doc_id", "text", **kw
    )
    got_b = {(r.id_a, r.id_b) for r in pairs_b.collect()}
    assert vb == va + 1
    # The cross-batch near-dup pair (100 in A, 200 in B) must be in
    # run B's output (B committed later, so its snapshot contains A).
    assert any({a, b} == {100, 200} for a, b in got_b)
    # Lifetime union covers the full-corpus pair set over all docs
    # ingested so far (batches overlap on ids 3..5 — union semantics).
    full = {
        frozenset((r.id_a, r.id_b))
        for r in minhash_dedup_pairs(
            df, "doc_id", "text", **kw
        ).collect()
    }
    lifetime = {frozenset(p) for p in got_a | got_b}
    assert full <= lifetime
