"""Multimodal-column tests: schema/plumbing real, decode stubbed
(operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.operators import multimodal as MM


def _docs(spark, sf_dir):
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_synth_media_schema_and_determinism(spark, sf_dir):
    media = MM.synth_media(_docs(spark, sf_dir))
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<width:int")
    r1 = media.orderBy("media_id").first()
    r2 = MM.synth_media(_docs(spark, sf_dir)).orderBy("media_id").first()
    assert bytes(r1["payload"]) == bytes(r2["payload"])
    assert r1["kind"] in MM.MEDIA_KINDS


def test_media_metadata_matches_payload(spark, sf_dir):
    media = MM.synth_media(_docs(spark, sf_dir))
    row = MM.media_metadata(media).join(media, "media_id").first()
    blob = bytes(row["payload"])
    assert row["payload_bytes"] == len(blob)
    assert row["payload_md5"] == hashlib.md5(blob).hexdigest()


def test_decode_features_fake_byte_stats(spark, sf_dir):
    media = MM.synth_media(_docs(spark, sf_dir))
    feats = MM.decode_features(media, fake=True)
    row = feats.join(media, "media_id").first()
    arr = bytes(row["payload"])
    assert row["n_bytes"] == len(arr)
    assert row["byte_min"] == min(arr)
    assert row["byte_max"] == max(arr)
    assert abs(row["byte_mean"] - sum(arr) / len(arr)) < 1e-9
    assert row["distinct_bytes"] == len(set(arr))


def test_decode_real_path_feature_detects_pillow(spark, sf_dir):
    # no Pillow in this container: the default decoder must fail with a
    # clear NotImplementedError, not an opaque ImportError
    media = MM.synth_media(_docs(spark, sf_dir)).where("kind = 'image'")
    with pytest.raises(Exception) as exc_info:
        MM.decode_features(media.limit(1), fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_image_with_injected_decoder(spark, sf_dir):
    # the decoder is injectable (serialized into the worker closure), so
    # the full mapInPandas plumbing — schema, batching, image filter —
    # runs without Pillow; the fake decoder is deterministic on payload
    def fake_decoder(blob: bytes):
        return len(blob) % 1024, len(blob) // 1024 + 1, "L", float(
            blob[0] if blob else 0
        )

    media = MM.synth_media(_docs(spark, sf_dir))
    out = MM.decode_image(media, decoder=fake_decoder)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "mode", "pixel_mean",
    ]
    rows = {r.media_id: r for r in out.collect()}
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images > 0
    # spot-check determinism against the payload itself
    one = media.where("kind = 'image'").select(
        "media_id", "payload"
    ).first()
    got = rows[one.media_id]
    w, h, m, p = fake_decoder(bytes(one.payload))
    assert (got.width, got.height, got.mode, got.pixel_mean) == (w, h, m, p)


def test_frame_sample_chunks_and_stride(spark, sf_dir):
    media = MM.synth_media(_docs(spark, sf_dir))
    video = media.where(F.col("kind") == "video")
    frames = MM.frame_sample(media, frame_bytes=100, every_n=2)
    vrow = video.first()
    blob = bytes(vrow["payload"])
    n_frames = (len(blob) + 99) // 100
    expected_idxs = list(range(0, n_frames, 2))
    got = (
        frames.where(F.col("media_id") == vrow["media_id"])
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in got] == expected_idxs
    assert bytes(got[0]["frame"]) == blob[:100]
    # non-video kinds never emit frames
    kinds = frames.join(media, "media_id").select("kind").distinct().collect()
    assert {r["kind"] for r in kinds} == {"video"}


def test_resize_updates_meta_only(spark, sf_dir):
    media = MM.synth_media(_docs(spark, sf_dir))
    resized = MM.resize_stub(media, 64, 32)
    row = resized.first()
    assert row["meta"]["width"] == 64 and row["meta"]["height"] == 32
    assert resized.count() == media.count()


def test_real_decode_bmp_through_mapinpandas(spark):
    # a REAL generated 24-bit BMP decoded through decode_image's
    # default (non-injected) decoder path: Pillow is absent here, so
    # this exercises the pure-NumPy BMP fallback end-to-end, including
    # the 4-byte row padding (w=5 -> stride 16) and bottom-up rows
    import numpy as np

    rng = np.random.default_rng(7)
    imgs = {1: rng.integers(0, 256, (4, 5, 3), dtype=np.uint8),
            2: rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)}
    rows = [
        (int(mid), "image", bytearray(MM.encode_bmp(arr)))
        for mid, arr in imgs.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {r.media_id: r for r in MM.decode_image(media).collect()}
    assert len(got) == 2
    for mid, arr in imgs.items():
        luma = (
            arr[..., 0].astype(np.int64) * 299
            + arr[..., 1].astype(np.int64) * 587
            + arr[..., 2].astype(np.int64) * 114
        ) // 1000
        r = got[mid]
        assert (r.width, r.height, r.mode) == (
            arr.shape[1], arr.shape[0], "RGB"
        )
        assert abs(r.pixel_mean - float(luma.mean())) < 1e-12


def test_real_decode_ppm_roundtrip():
    # P6 with a comment line and a non-trivial maxval token split
    import numpy as np

    from streamevmon_spark.operators.multimodal import numpy_decode

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6\n# synthetic\n3 2\n255\n" + arr.tobytes()
    w, h, mode, mean = numpy_decode(blob)
    luma = (
        arr[..., 0].astype(np.int64) * 299
        + arr[..., 1].astype(np.int64) * 587
        + arr[..., 2].astype(np.int64) * 114
    ) // 1000
    assert (w, h, mode) == (3, 2, "RGB")
    assert abs(mean - float(luma.mean())) < 1e-12


def test_synth_bmp_media_decodes_identically_both_paths(spark, sf_dir):
    """The generated-BMP corpus decodes to the closed-form pixel stats
    through BOTH real decoder paths: the feature-detected default
    (Pillow or NumPy fallback) and the explicit numpy_decode — the
    drop-in-comparable contract of _pil_decode."""
    from streamevmon_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = MM.synth_bmp_media(docs).localCheckpoint()
    default = {r.media_id: r for r in MM.decode_image(media).collect()}

    def numpy_only(blob):
        return MM.numpy_decode(blob)

    explicit = {r.media_id: r
                for r in MM.decode_image(media, decoder=numpy_only).collect()}
    assert default.keys() == explicit.keys() and len(default) == 20
    for mid, r in default.items():
        did = mid
        assert r.width == 13 + did % 7 and r.height == 5 + did % 6
        assert r.mode == "RGB"
        e = explicit[mid]
        assert (r.width, r.height, r.mode, r.pixel_mean) == (
            e.width, e.height, e.mode, e.pixel_mean)
