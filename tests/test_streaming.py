import datetime as dt

import pytest

from deftunes_spark.streaming import (
    run_stream_once,
    sessionize_batch,
    tumbling_agg_batch,
    tumbling_agg_stream,
)
from deftunes_spark.streaming.windows import session_stats_batch


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=7 * i),
                i % 5,
                ["view", "click"][i % 2],
                float(i % 13),
            )
        )
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


def test_tumbling_batch(events):
    out = tumbling_agg_batch(events, "1 hour")
    rows = {(r.window_start, r.event_type): r for r in out.collect()}
    # 200 events * 7min ≈ 23.3h → 24 hourly windows × 2 types
    assert len(rows) >= 46
    total = sum(r.n for r in rows.values())
    assert total == 200


def test_streaming_equals_batch(spark, events, tmp_path):
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)
    result = run_stream_once(
        spark,
        src,
        events.schema,
        lambda s: tumbling_agg_stream(s, "1 hour", watermark="2 hours"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = tumbling_agg_batch(events, "1 hour")
    got = {
        (r.window_start, r.event_type): (r.n, r.value_sum)
        for r in result.collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.value_sum)
        for r in batch.collect()
    }
    assert got == want


def test_sessionize_gap_splits(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 7),
        (2, base + dt.timedelta(minutes=10), 7),
        (3, base + dt.timedelta(minutes=50), 7),  # 40min gap → new session
        (4, base + dt.timedelta(minutes=55), 7),
        (5, base, 8),  # other user independent
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = sessionize_batch(df, gap_minutes=30)
    seqs = {r.event_id: r.session_seq for r in out.collect()}
    assert seqs[1] == seqs[2] == 1
    assert seqs[3] == seqs[4] == 2
    assert seqs[5] == 1

    stats = session_stats_batch(df, gap_minutes=30)
    by_key = {
        (r.user_id, r.session_seq): r.n_events for r in stats.collect()
    }
    assert by_key == {(7, 1): 2, (7, 2): 2, (8, 1): 1}


def test_sliding_batch_covers_each_event_twice(events):
    from deftunes_spark.streaming import sliding_agg_batch

    out = sliding_agg_batch(events, "1 hour", "30 minutes")
    total = sum(r.n for r in out.collect())
    # width/slide = 2 covering windows per event
    assert total == 400


def test_stateful_sessions_match_batch(spark, tmp_path):
    """applyInPandasWithState sessionization == batch lag/cumsum twin,
    including sessions spanning micro-batch boundaries (two source
    files, maxFilesPerTrigger=1 forces two batches)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from deftunes_spark.streaming import session_stats_stateful

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(4):
        for s in range(3):  # 3 sessions per user
            for j in range(1 + (u + s) % 3):
                rows.append(
                    (
                        eid,
                        base
                        + dt.timedelta(hours=2 * s, minutes=5 * j + u),
                        u,
                    )
                )
                eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    # Split mid-session: first file holds the earlier half of events,
    # so several sessions straddle the batch boundary.
    ordered = df.orderBy("ts")
    half = df.count() // 2
    src = str(tmp_path / "stateful_src")
    head = ordered.limit(half)
    tail = ordered.subtract(head)
    sentinel = df.select("user_id").distinct().withColumn(
        "ts", F.lit("2100-01-01 00:00:00").cast("timestamp")
    ).withColumn("event_id", F.lit(-1))
    # One part-file per half: maxFilesPerTrigger=1 replays them in
    # modification-time order, so batch 1 = head, batch 2 = tail (the
    # operator's contract is in-order arrival ACROSS batches; within a
    # batch it sorts).
    head.coalesce(1).write.parquet(f"{src}/f0")
    tail.unionByName(sentinel.select(*tail.columns)).coalesce(1).write.parquet(
        f"{src}/f1"
    )

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, user_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    q = (
        session_stats_stateful(
            stream.select("user_id", "ts"), gap_minutes=30
        )
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in spark.table("stateful_test")
        .filter(F.col("session_start") < F.lit("2100-01-01").cast("timestamp"))
        .collect()
    }
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in session_stats_batch(df, gap_minutes=30).collect()
    }
    assert got == want


def test_available_now_exactly_once(spark, tmp_path):
    """Re-running an availableNow stream over the same checkpoint must
    be a no-op (exactly-once): files already committed to the
    checkpoint are not reprocessed, so a parquet sink holds each input
    row exactly once even after 3 runs + a late-arriving file."""
    import datetime as dt

    src = str(tmp_path / "eo_src")
    sink = str(tmp_path / "eo_sink")
    ckpt = str(tmp_path / "eo_ckpt")
    base = dt.datetime(2024, 1, 1)
    df1 = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i)) for i in range(10)],
        ["event_id", "ts"],
    )
    df1.coalesce(1).write.mode("append").parquet(src)

    def run():
        q = (
            spark.readStream.schema("event_id bigint, ts timestamp")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    run()  # same data, same checkpoint → nothing reprocessed
    assert spark.read.parquet(sink).count() == 10
    # late batch arrives, only IT is processed on the next run
    df2 = spark.createDataFrame(
        [(100 + i, base + dt.timedelta(hours=1, minutes=i)) for i in range(5)],
        ["event_id", "ts"],
    )
    df2.coalesce(1).write.mode("append").parquet(src)
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 15
    assert out.select("event_id").distinct().count() == 15


def test_foreach_batch_dq_gate(spark, tmp_path):
    """Streaming DQ gate: every micro-batch passes the DQDL engine in
    foreachBatch; a violating batch is quarantined, clean batches flow
    to the sink — the quality/ engine composes with streaming as-is."""
    import datetime as dt

    from deftunes_spark.quality.evaluator import evaluate_ruleset
    from deftunes_spark.quality.rules import ColumnValues, IsComplete

    src = str(tmp_path / "dq_src")
    base = dt.datetime(2024, 1, 1)
    good = [(i, base + dt.timedelta(minutes=i), 1.0) for i in range(8)]
    bad = [(100, base, 99.0), (101, base, None)]  # price>2 + NULL value
    spark.createDataFrame(good, ["event_id", "ts", "price"]).coalesce(
        1
    ).write.parquet(f"{src}/f0")
    spark.createDataFrame(bad, ["event_id", "ts", "price"]).coalesce(
        1
    ).write.parquet(f"{src}/f1")

    passed_rows, quarantined_rows = [], []
    rules = [IsComplete("price"), ColumnValues("price", 2.0, op="<=")]

    def gate(batch_df, batch_id):
        results = evaluate_ruleset(batch_df, rules)
        if all(r.passed for r in results):
            passed_rows.extend(batch_df.collect())
        else:
            quarantined_rows.extend(batch_df.collect())

    q = (
        spark.readStream.schema("event_id bigint, ts timestamp, price double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "dq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(passed_rows) == 8
    assert {r.event_id for r in quarantined_rows} == {100, 101}


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving after the watermark has passed its window is
    DROPPED (bounded state). Two availableNow runs over one checkpoint:
    run 1 commits watermark 10:00 (max 12:00 − 2h); run 2 then sees a
    05:30 straggler (dropped) and a 12:30 on-time event (counted).
    In batch mode the straggler IS counted — the delta is the price of
    finite state at scale."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    base = dt.datetime(2024, 1, 1, 6, 0, 0)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    from deftunes_spark.streaming import (
        tumbling_agg_batch,
        tumbling_agg_stream,
    )

    emitted = []

    def run():
        stream = spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        ).parquet(f"{src}/f*")
        q = (
            tumbling_agg_stream(stream, "1 hour", watermark="2 hours")
            .writeStream.foreachBatch(
                lambda df, _id: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i), 1, "view", 1.0) for i in range(7)],
        cols,
    ).coalesce(1).write.parquet(f"{src}/f0")
    run()  # commits watermark = 12:00 − 2h = 10:00 to the checkpoint

    spark.createDataFrame(
        [
            (100, base - dt.timedelta(minutes=30), 1, "view", 1.0),
            (101, base + dt.timedelta(hours=6, minutes=30), 1, "view", 1.0),
        ],
        cols,
    ).coalesce(1).write.parquet(f"{src}/f1")
    emitted.clear()
    run()  # straggler 05:30 < watermark → dropped; 12:30 counted

    got = {r.window_start: r.n for r in emitted}
    assert base - dt.timedelta(hours=1) not in got  # straggler dropped
    assert got.get(base + dt.timedelta(hours=6)) == 2  # 12:00 + 12:30

    batch = {
        r.window_start: r.n
        for r in tumbling_agg_batch(
            spark.read.parquet(f"{src}/f0", f"{src}/f1"), "1 hour"
        ).collect()
    }
    assert batch[base - dt.timedelta(hours=1)] == 1  # batch counts it


# ---------------------------------------------------------------------
# Exactly-once streaming sink into versioned tables (streaming/sinks.py)
# ---------------------------------------------------------------------


def test_versioned_sink_multi_batch_and_replay(spark, tmp_path):
    """The backlog splits into multiple microbatches, each committing
    one table version tagged with its batch id; replaying an
    already-committed batch (the foreachBatch at-least-once anomaly)
    is a no-op."""
    from pyspark.sql import functions as F

    from deftunes_spark.io import versioned as V
    from deftunes_spark.streaming.sinks import (
        stream_to_versioned_table,
        versioned_batch_writer,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("k")
    )
    df.repartition(4).write.mode("overwrite").parquet(src)

    snap = stream_to_versioned_table(
        spark,
        src,
        "id long, k long",
        table,
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert snap.count() == 100
    versions = V.list_versions(spark, table)
    assert len(versions) >= 2  # backlog really split into microbatches
    batch_ids = [m["stream_batch_id"] for m in versions]
    assert sorted(batch_ids) == batch_ids
    assert len(set(batch_ids)) == len(batch_ids)

    # Replay: re-invoking THIS stream's writer with an
    # ALREADY-COMMITTED batch id must change nothing.
    from deftunes_spark.streaming.sinks import stream_id_for_checkpoint

    sid = stream_id_for_checkpoint(str(tmp_path / "ckpt"))
    writer = versioned_batch_writer(table, stream_id=sid)
    writer(spark.range(5).select(F.col("id"), F.col("id").alias("k")),
           batch_ids[-1])
    after = V.list_versions(spark, table)
    assert [m["version"] for m in after] == [
        m["version"] for m in versions
    ]
    assert V.read_version(spark, table).count() == 100

    # A genuinely NEW batch id still appends.
    writer(spark.range(7).select(F.col("id"), F.col("id").alias("k")),
           max(batch_ids) + 1)
    assert V.read_version(spark, table).count() == 107


def test_versioned_sink_restart_consumes_nothing_new(spark, tmp_path):
    """A second availableNow run over the same checkpoint sees no new
    files and commits no new versions — the batch face of 'restart is
    safe'."""
    from pyspark.sql import functions as F

    from deftunes_spark.io import versioned as V
    from deftunes_spark.streaming.sinks import stream_to_versioned_table

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).select(F.col("id")).write.mode("overwrite").parquet(src)

    for _ in range(2):
        snap = stream_to_versioned_table(
            spark, src, "id long", table, checkpoint_dir=ckpt
        )
        assert snap.count() == 10
    assert len(V.list_versions(spark, table)) == 1


def test_versioned_sink_fresh_checkpoint_is_new_stream(spark, tmp_path):
    """Batch ids are only unique per checkpoint: a SECOND stream with
    a fresh checkpoint writing the same table must not be skipped by
    the first stream's batch 0 — replay detection keys on
    (stream_id, batch_id), not the bare batch id."""
    from pyspark.sql import functions as F

    from deftunes_spark.io import versioned as V
    from deftunes_spark.streaming.sinks import stream_to_versioned_table

    src1 = str(tmp_path / "s1")
    src2 = str(tmp_path / "s2")
    table = str(tmp_path / "tbl")
    spark.range(10).select(F.col("id")).write.parquet(src1)
    spark.range(10, 15).select(F.col("id")).write.parquet(src2)

    stream_to_versioned_table(
        spark, src1, "id long", table,
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    # Different source, different checkpoint, SAME table: its batch 0
    # must append, not silently no-op against stream 1's batch 0.
    snap = stream_to_versioned_table(
        spark, src2, "id long", table,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    assert snap.count() == 15
    ids = {
        (m.get("stream_id"), m.get("stream_batch_id"))
        for m in V.list_versions(spark, table)
    }
    assert len({s for s, _ in ids}) == 2  # two distinct streams recorded


def test_versioned_sink_mid_batch_crash_recovery(spark, tmp_path):
    """THE at-least-once anomaly, end to end: the stream dies AFTER a
    microbatch's table-version commit but BEFORE Spark records the
    batch in the checkpoint commit log (injected by raising inside
    foreachBatch right after the inner writer returns). On restart
    Spark replays that batch id; the sink's manifest-based skip must
    turn the replay into a no-op — no duplicated rows — while the
    remaining backlog still lands — no missing batch."""
    from pyspark.sql import functions as F

    from deftunes_spark.io import versioned as V
    from deftunes_spark.streaming.sinks import (
        stream_id_for_checkpoint,
        versioned_batch_writer,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    spark.range(40).select(
        F.col("id"), (F.col("id") % 4).alias("k")
    ).repartition(4).write.mode("overwrite").parquet(src)

    sid = stream_id_for_checkpoint(ckpt)
    inner = versioned_batch_writer(table, stream_id=sid)
    crashed = {"done": False}

    def crashing(batch_df, batch_id):
        inner(batch_df, batch_id)  # the table version COMMITS...
        if not crashed["done"]:
            crashed["done"] = True
            # ...then the process "dies" before the checkpoint commit.
            raise RuntimeError("injected crash after table commit")

    def run(writer_fn):
        return (
            spark.readStream.schema("id long, k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(writer_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = run(crashing)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    assert crashed["done"]
    committed_before = V.list_versions(spark, table)
    assert len(committed_before) >= 1  # the crashed batch DID commit

    # Restart on the same checkpoint with the normal writer: the
    # replayed batch no-ops, the rest of the backlog lands.
    q2 = run(inner)
    q2.awaitTermination()

    final = V.read_version(spark, table)
    assert sorted(r.id for r in final.collect()) == list(range(40))
    manifests = V.list_versions(spark, table)
    pairs = [
        (m.get("stream_id"), m.get("stream_batch_id")) for m in manifests
    ]
    assert len(pairs) == len(set(pairs))  # every batch exactly once
    assert {b for _, b in pairs} == set(range(4))  # none missing
