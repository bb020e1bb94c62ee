"""Multimodal (image / audio / video) columns for the training-data
pipeline: opaque ``binary`` payloads + typed metadata, with decode /
feature-extraction / resize / frame-sampling as Arrow-batched pandas
UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the decode step is a
STUB: ``decode_features(..., fake=True)`` runs a deterministic
byte-level fake decoder (real Arrow batch shapes, real schema, real
partitioning); ``fake=False`` raises NotImplementedError where a real
decoder (PIL / libav) would plug in. Everything around the stub — the
media table schema, the per-kind dispatch, the UDF signatures and the
frame-chunk explode — is real and tested.

There is no reference analogue (streamevmon is numeric-telemetry only);
this family exists for the 100 TB training-data use case. Scale notes:
payloads stay executor-side end-to-end (no driver collect); frame
sampling emits one row per sampled frame via mapInPandas so a skewed
giant video fans out across Arrow batches; feature extraction is one
NumPy pass per batch, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

# deterministic fake media geometry (per doc_id) — stands in for the real
# container metadata a demuxer would report
_WIDTHS = (320, 640, 1280)
_RATES = (8000, 16000, 44100)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents table: one opaque
    binary payload per doc (the UTF-8 bytes of its text, repeated to
    media-ish size) plus typed metadata. Pure built-in expressions."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    width = F.element_at(
        F.array(*[F.lit(w) for w in _WIDTHS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    rate = F.element_at(
        F.array(*[F.lit(r) for r in _RATES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    n_frames = (F.col("doc_id") % 7 + 1).cast("int")
    payload = F.encode(F.repeat(F.col("text"), 4), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            width.alias("width"),
            (width / 2).cast("int").alias("height"),
            n_frames.alias("n_frames"),
            rate.alias("sample_rate"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection over opaque payloads — JVM-side only
    (length / md5 of the binary), no decode."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-media decoded feature vector via mapInPandas.

    fake=True: deterministic byte-level features (mean/min/max byte,
    entropy proxy) — one vectorized NumPy pass per Arrow batch.
    fake=False: delegates to ``decode_image`` (feature-detected Pillow,
    or an injected decoder callable)."""

    if not fake:
        return decode_image(media)

    def run(pdf_iter):
        import numpy as np
        import pandas as pd

        for pdf in pdf_iter:
            feats = {"media_id": pdf["media_id"], "kind": pdf["kind"],
                     "n_bytes": [], "byte_mean": [], "byte_min": [],
                     "byte_max": [], "distinct_bytes": []}
            for blob in pdf["payload"]:
                arr = np.frombuffer(blob, dtype=np.uint8)
                feats["n_bytes"].append(len(arr))
                feats["byte_mean"].append(float(arr.mean()))
                feats["byte_min"].append(int(arr.min()))
                feats["byte_max"].append(int(arr.max()))
                feats["distinct_bytes"].append(int(len(np.unique(arr))))
            yield pd.DataFrame(feats)

    return media.mapInPandas(
        run,
        "media_id long, kind string, n_bytes long, byte_mean double, "
        "byte_min int, byte_max int, distinct_bytes int",
    )


def encode_bmp(rgb) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — the
    fixture generator for the pure-NumPy real-decode CI path."""
    import struct

    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up, BGR byte order
        body += arr[y, :, ::-1].tobytes() + b"\x00" * pad
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + info + bytes(body)


def numpy_decode(blob: bytes) -> tuple:
    """Pure-NumPy real decoder for uncompressed 24-bit BMP and binary
    PPM (P6) payloads: (width, height, mode, pixel_mean) with
    pixel_mean over Rec.601 integer luma, the same L = (299R + 587G +
    114B) / 1000 formula Pillow's convert("L") uses — so the fallback
    is drop-in-comparable with the Pillow path on the same image.

    This keeps ``decode_image``'s non-fake path runnable in
    environments without Pillow (like this sandbox's CI); anything
    that isn't BMP/P6 still raises NotImplementedError."""
    import struct

    import numpy as np

    if blob[:2] == b"BM":
        off = struct.unpack_from("<I", blob, 10)[0]
        size, w, h, _planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", blob, 14
        )
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"numpy BMP decoder handles 24-bit uncompressed only "
                f"(got bpp={bpp}, compression={comp})"
            )
        flipped = h > 0  # positive height = bottom-up rows
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            blob, dtype=np.uint8, count=h * stride, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[::-1, :, ::-1] if flipped else rows[:, :, ::-1]
        mode = "RGB"
    elif blob[:2] == b"P6":
        # header: magic, width, height, maxval, single whitespace, raster
        parts, i = [], 2
        while len(parts) < 3:
            while blob[i : i + 1].isspace():
                i += 1
            if blob[i : i + 1] == b"#":  # comment line
                i = blob.index(b"\n", i) + 1
                continue
            j = i
            while not blob[j : j + 1].isspace():
                j += 1
            parts.append(int(blob[i:j]))
            i = j
        i += 1
        w, h, maxval = parts
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        rgb = np.frombuffer(
            blob, dtype=np.uint8, count=w * h * 3, offset=i
        ).reshape(h, w, 3)
        mode = "RGB"
    else:
        raise NotImplementedError(
            "real image decode without Pillow handles BMP/P6 payloads "
            "only; pass decode_image(..., decoder=...) or use "
            "decode_features(..., fake=True) for the deterministic "
            "byte-level stand-in"
        )
    luma = (
        rgb[..., 0].astype(np.int64) * 299
        + rgb[..., 1].astype(np.int64) * 587
        + rgb[..., 2].astype(np.int64) * 114
    ) // 1000
    return int(w), int(h), mode, float(luma.mean())


def _pil_decode(blob: bytes) -> tuple:
    """Default real decoder: feature-detected Pillow, falling back to
    the pure-NumPy BMP/P6 decoder when Pillow is absent (as in this
    sandbox). Returns (width, height, mode, pixel_mean)."""
    try:
        from PIL import Image
    except ImportError:  # no Pillow here -> NumPy fallback formats
        return numpy_decode(blob)
    import io

    import numpy as np

    img = Image.open(io.BytesIO(blob))
    arr = np.asarray(img.convert("L"), dtype=np.uint8)
    return img.width, img.height, img.mode, float(arr.mean())


def decode_image(media: DataFrame, decoder=None) -> DataFrame:
    """Real image decode over the opaque payload column: one mapInPandas
    pass emitting (media_id, width, height, mode, pixel_mean) per image
    row. ``decoder`` is a callable blob -> (width, height, mode,
    pixel_mean); it defaults to the feature-detected Pillow path
    (``_pil_decode``) and is serialized into the worker closure, so a
    deployment can drop in any decoder (or a test a deterministic fake)
    without touching the Spark plumbing. Blobs stream through Arrow
    batches; nothing ever collects to the driver."""
    dec = decoder or _pil_decode

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            out = {"media_id": pdf["media_id"], "width": [],
                   "height": [], "mode": [], "pixel_mean": []}
            for blob in pdf["payload"]:
                w, h, m, p = dec(bytes(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(m)
                out["pixel_mean"].append(p)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").mapInPandas(
        run,
        "media_id long, width int, height int, mode string, "
        "pixel_mean double",
    )


def frame_sample(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame chunk from video
    payloads: one output row per sampled frame (media_id, frame_idx,
    frame). mapInPandas so one giant video fans out over batches instead
    of materialising all frames in one row."""

    def run(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                n = (len(blob) + frame_bytes - 1) // frame_bytes
                for f in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(
                        bytes(blob[f * frame_bytes:(f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    video = media.where(F.col("kind") == "video")
    return video.mapInPandas(
        run, "media_id long, frame_idx int, frame binary"
    )


def synth_bmp_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL 24-bit BMP corpus from the documents table:
    per doc, w = 13 + doc_id % 7 (odd widths exercise BMP row
    padding), h = 5 + doc_id % 6, and every pixel's three channels all
    carry v(x, y) = (doc_id*3 + y*7 + x*11) % 256 — channel-equal, so
    the Rec.601 integer luma equals v exactly and the decoded
    pixel_mean has a closed-form SQL mirror
    (docs_oracles.media_decode_real_oracle). Built with the same
    ``encode_bmp`` the real-decoder tests round-trip; decoding goes
    through the full feature-detected path (Pillow when importable,
    pure-NumPy BMP fallback otherwise) with identical results."""

    def run(pdf_iter):
        import numpy as np
        import pandas as pd

        for pdf in pdf_iter:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 13 + did % 7
                h = 5 + did % 6
                y, x = np.mgrid[0:h, 0:w]
                v = ((did * 3 + y * 7 + x * 11) % 256).astype(np.uint8)
                blobs.append(encode_bmp(np.stack([v, v, v], axis=-1)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "payload": blobs,
                }
            )

    return docs.select("doc_id").mapInPandas(
        run, "media_id long, kind string, payload binary"
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize hook: updates the typed metadata (real) and would re-encode
    the payload (stubbed — payload passes through untouched; a real
    deployment swaps the identity for its resampler inside the same
    column contract)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )
