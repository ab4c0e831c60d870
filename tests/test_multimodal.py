"""Multimodal plumbing tests: schema, batching, determinism, stub gating."""

from __future__ import annotations

import pytest

from mapreduce_simple_go_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample,
    synth_media,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, SF_DIR)


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["media"] == "binary"
    assert fields["media_meta"].startswith("struct<format:string,n_bytes:int")


def test_extract_features_shape_and_determinism(media, spark):
    feats = extract_features(media)
    rows1 = {r.doc_id: (r.n_bytes, tuple(r.feature)) for r in feats.collect()}
    rows2 = {r.doc_id: (r.n_bytes, tuple(r.feature)) for r in feats.collect()}
    assert rows1 == rows2, "feature extraction must be deterministic"
    assert len(rows1) == media.count()
    some = next(iter(rows1.values()))
    assert len(some[1]) == FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in some[1])


def test_feature_n_bytes_matches_meta(media):
    feats = extract_features(media).select("doc_id", "n_bytes")
    meta = media.select("doc_id", "media_meta.n_bytes")
    assert sorted(map(tuple, feats.collect())) == sorted(map(tuple, meta.collect()))


def test_frame_sample_is_one_to_n(media):
    frames = frame_sample(media, n_frames=4)
    assert frames.count() == media.count() * 4
    per_doc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]


def test_frame_features_one_to_n_and_deterministic(spark):
    from mapreduce_simple_go_spark.operators.multimodal import (
        N_FRAMES,
        multimodal_frame_features,
    )

    f1 = sorted(map(tuple, multimodal_frame_features(spark, SF_DIR).collect()))
    f2 = sorted(map(tuple, multimodal_frame_features(spark, SF_DIR).collect()))
    assert f1 == f2
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(f1) == n_docs * N_FRAMES


def test_resize_thumbnail_is_fixed_size(spark):
    from mapreduce_simple_go_spark.operators.multimodal import (
        THUMB_K,
        multimodal_resize,
    )

    rows = multimodal_resize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_bytes > 0:
            parts = r.thumb_sig.split("-")
            assert len(parts) == THUMB_K
            assert all(0 <= int(p) <= 255 for p in parts)


def test_audio_stats_bounds(spark):
    from mapreduce_simple_go_spark.operators.multimodal import (
        multimodal_audio_stats,
    )

    rows = multimodal_audio_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_amp <= 255.0
        # RMS >= mean for non-negative samples (Jensen), both within range
        assert r.mean_amp <= r.rms_amp <= 255.0


def test_decode_media_stub_gates_real_formats():
    assert decode_media(b"abc", "fake/raw") == b"abc"
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")

def test_decoder_injection_reaches_executors(spark):
    """The codec seam: a custom decoder passed to extract_features must run
    inside the Arrow-batched executors and change the features — proving a
    real codec plugs in with zero framework changes the day one exists."""
    from pyspark.sql import functions as F

    from mapreduce_simple_go_spark.operators.multimodal import _feature_vector

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(8)
    media = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("custom/rev").alias("format"),
            F.octet_length("text").alias("n_bytes"),
            F.lit(0).cast("int").alias("channel"),
        ).alias("media_meta"),
    )
    # default table has no custom/rev codec -> loud NotImplementedError
    with pytest.raises(Exception, match="no codec"):
        extract_features(media).collect()
    # injected codec: decode = reverse the payload bytes
    got = {
        r.doc_id: tuple(r.feature)
        for r in extract_features(
            media, decoders={"custom/rev": lambda b: b[::-1]}
        ).collect()
    }
    want = {
        r.doc_id: tuple(
            __import__("numpy").float32(x)
            for x in _feature_vector(r.text.encode()[::-1])
        )
        for r in docs.collect()
    }
    assert got == want


def test_register_decoder_process_wide(spark):
    """register_decoder() makes a format decodable by default everywhere."""
    import mapreduce_simple_go_spark.operators.multimodal as mm

    fmt = "custom/upper"
    mm.register_decoder(fmt, lambda b: b.upper())
    try:
        assert decode_media(b"abc", fmt) == b"ABC"
    finally:
        del mm.DECODERS[fmt]
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", fmt)


def test_real_image_codec_if_available(spark):
    """Skipped unless a real codec lib exists in the environment: decode a
    1x1 PNG through the injected PIL decoder and feature-extract it. The
    day the image ships with PIL, multimodal decode runs for real with no
    code change."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from pyspark.sql import functions as F

    img = PIL_Image.new("RGB", (1, 1), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    png = buf.getvalue()

    def decode_png(b: bytes) -> bytes:
        return PIL_Image.open(io.BytesIO(b)).tobytes()

    media = spark.createDataFrame(
        [(1, png)], "doc_id long, media binary"
    ).select(
        "doc_id",
        "media",
        F.struct(
            F.lit("image/png").alias("format"),
            F.lit(len(png)).alias("n_bytes"),
            F.lit(0).cast("int").alias("channel"),
        ).alias("media_meta"),
    )
    rows = extract_features(media, decoders={"image/png": decode_png}).collect()
    assert rows[0].n_bytes == 3  # 1x1 RGB = 3 raw bytes


def test_wav_roundtrip_is_exact():
    """wave_encode -> wave_decoder must return the original sample bytes
    for arbitrary payloads (including empty) — the codec really parses the
    RIFF container it wrote."""
    from mapreduce_simple_go_spark.operators.multimodal import (
        wave_decoder,
        wave_encode,
    )

    for payload in [b"", b"\x00", b"hello world", bytes(range(256)) * 7]:
        wav = wave_encode(payload)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        assert len(wav) > len(payload)  # a real container, not identity
        assert wave_decoder(wav) == payload


def test_audio_wav_entry_matches_fake_codec_entry(spark):
    """The real-WAV registry entry must produce exactly the fake-codec
    entry's stats (same underlying samples, real container in between)."""
    from mapreduce_simple_go_spark.operators.multimodal import (
        multimodal_audio_stats,
        multimodal_audio_wav,
    )

    want = sorted(map(tuple, multimodal_audio_stats(spark, SF_DIR).collect()))
    got = sorted(map(tuple, multimodal_audio_wav(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0
