import pytest

from pyspark.sql import functions as F

from deftunes_spark.ext import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc")], ["doc_id", "text"]
    )
    return M.attach_media_columns(
        M.text_as_fake_payload(df), "payload", modality="text", fmt="utf8"
    )


def test_metadata_struct(media):
    row = media.filter("doc_id = 1").first()
    meta = row.media_meta
    assert meta.modality == "text" and meta.format == "utf8"
    assert meta.byte_size == len(b"hello world")
    import hashlib

    assert meta.content_sha256 == hashlib.sha256(b"hello world").hexdigest()
    assert meta.width is None  # decode-dependent fields stay NULL


def test_feature_extraction_deterministic(spark, media):
    out1 = M.extract_image_features(media, dim=8).collect()
    out2 = M.extract_image_features(media, dim=8).collect()
    assert sorted(r.doc_id for r in out1) == [1, 2]
    by_id1 = {r.doc_id: r.feature for r in out1}
    by_id2 = {r.doc_id: r.feature for r in out2}
    assert by_id1 == by_id2  # stable across runs
    assert all(len(v) == 8 for v in by_id1.values())
    assert all(-1.0 <= x <= 1.0 for v in by_id1.values() for x in v)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M._decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, None)], ["doc_id", "duration_ms"]
    ).select(
        "doc_id",
        F.struct(F.col("duration_ms").cast("long").alias("duration_ms")).alias(
            "media_meta"
        ),
    )
    plan = M.frame_sample_plan(df, every_ms=1000).collect()
    frames = sorted(
        (r.doc_id, r.frame_ts_ms) for r in plan
    )
    assert frames == [(1, 0), (1, 1000), (1, 2000), (1, 3000)]


def test_resize_images_plumbing(spark):
    """Arrow-batched resize: output payloads exactly target-sized,
    deterministic across re-runs, ids preserved."""
    from deftunes_spark.ext.multimodal import (
        resize_images,
        text_as_fake_payload,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    media = text_as_fake_payload(docs)
    out = resize_images(media, width=8, height=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(len(r.payload_resized) == 32 for r in rows.values())
    assert all(
        (r.out_width, r.out_height, r.out_byte_size) == (8, 4, 32)
        for r in rows.values()
    )
    again = {r.doc_id: bytes(r.payload_resized) for r in out.collect()}
    assert again == {k: bytes(v.payload_resized) for k, v in rows.items()}


def test_real_codec_paths_raise_clearly_without_pil(spark):
    """Without Pillow the real-codec paths must fail with the marked
    NotImplementedError, not an obscure import traceback."""
    import pytest

    from deftunes_spark.ext import multimodal as M

    if M.codec_available():
        pytest.skip("Pillow installed — covered by the real-codec test")
    with pytest.raises(NotImplementedError, match="image codec"):
        M._decode_image(b"\x89PNG")


def test_real_codec_decode_resize_features(spark):
    """Real-codec path (runs only where Pillow is installed): a tiny
    generated PNG goes through decode, feature extraction, and resize;
    the output re-opens as an image of the target size."""
    import pytest

    from deftunes_spark.ext import multimodal as M

    if not M.codec_available():
        pytest.skip("Pillow not installed in this environment")
    from PIL import Image
    import io as _io

    def png(w, h, color):
        img = Image.new("RGB", (w, h), color)
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(16, 16, (255, 0, 0))), (2, png(32, 8, (0, 0, 255)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = {
        r.doc_id: r.feature
        for r in M.extract_image_features(
            df, dim=8, fake_features=False
        ).collect()
    }
    assert set(feats) == {1, 2}
    assert all(len(v) == 8 for v in feats.values())
    assert all(-1.0 <= x <= 1.0 for v in feats.values() for x in v)

    resized = {
        r.doc_id: r for r in M.resize_images(
            df, width=4, height=4, fake_resize=False
        ).collect()
    }
    for r in resized.values():
        img = Image.open(_io.BytesIO(bytes(r.payload_resized)))
        assert img.size == (4, 4)
        assert (r.out_width, r.out_height) == (4, 4)


def test_codec_mode_recorded_in_artifacts():
    """The bench artifact must carry which codec the multimodal ops ran
    with, so exactly-one of the PIL-present/PIL-absent test pair
    skipping is auditable per round (VERDICT r3 directive 7)."""
    import importlib.util

    import bench

    mode = bench._codec_mode()
    pil_present = importlib.util.find_spec("PIL") is not None
    assert mode == ("pillow" if pil_present else "deterministic-fake")
