"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata (schemas.MEDIA), processed through Arrow-batched
``mapInPandas`` stages.

This is an LLM-data-pipeline extension (no reference counterpart). The
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
is real and tested; the actual codec work is pluggable because media
libraries (PIL/ffmpeg/librosa) are not available in this environment:

- ``decoder=None`` → a DETERMINISTIC FAKE decode derived from the payload
  bytes (stable across runs/partitions, good for plumbing tests and
  benchmarks);
- pass a real ``decoder(payload: bytes, mime_type: str) -> dict`` to run an
  actual codec;
- ``strict=True`` raises NotImplementedError instead of faking, making the
  stub boundary explicit in production pipelines.

One REAL codec ships built-in with zero dependencies: NetPBM (PPM/PGM)
decode, feature extraction, and resize (:func:`netpbm_decoder`,
:func:`netpbm_resizer`) — the end-to-end non-fake exercise of the same
mapInPandas plumbing, pinned by test against numpy ground truth.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Decoder = Callable[[bytes, str | None], dict]

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, mime_type: str | None) -> dict:
    """Deterministic fake: dimensions and a FEATURE_DIM-float signature
    derived from the payload digest. Stable wherever the row is processed."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    feats = [b / 255.0 for b in digest[:FEATURE_DIM]]
    return {"width": width, "height": height, "features": feats}


def _parse_netpbm(payload: bytes) -> tuple[str, int, int, int, "object"]:
    """Parse a binary NetPBM image (P6 = RGB ``.ppm``, P5 = gray ``.pgm``)
    into (magic, width, height, maxval, HxWxC uint8 array). Pure
    numpy — a REAL image decode with zero optional dependencies, used to
    exercise the multimodal pipeline end-to-end where PIL/ffmpeg are not
    installable. Handles '#' comments and arbitrary header whitespace per
    the NetPBM spec; only 8-bit maxval is supported (raises otherwise)."""
    import numpy as np

    if not payload or payload[:1] != b"P":
        raise ValueError("not a NetPBM payload")
    magic = payload[:2].decode("ascii")
    if magic not in ("P5", "P6"):
        raise ValueError(f"unsupported NetPBM magic {magic!r}")
    # header tokenizer: magic, width, height, maxval — comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated NetPBM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            nl = payload.index(b"\n", pos)
            pos = nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("only 8-bit NetPBM supported")
    pos += 1  # single whitespace after maxval, then raster
    channels = 3 if magic == "P6" else 1
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return magic, width, height, maxval, raster.reshape(height, width, channels)


def netpbm_decoder(payload: bytes, mime_type: str | None) -> dict:
    """Real image decoder for :func:`extract_media_features`: decodes
    PPM/PGM payloads and extracts FEATURE_DIM features = mean luminance of
    a 4×4 grid over the image (row-major), scaled to [0, 1] — an actual
    content-derived signature (near-identical images get near-identical
    features), unlike the digest-based plumbing fake."""
    import numpy as np

    _, width, height, maxval, px = _parse_netpbm(payload)
    lum = px.mean(axis=2, dtype=np.float64)
    g = 4  # FEATURE_DIM == g*g
    # floor-bound grid cells, clamped to at least one pixel: images smaller
    # than the grid repeat rows/columns instead of producing empty (NaN)
    # cells; for dimensions divisible by g this equals an even split
    feats = []
    for i in range(g):
        y0 = min((i * height) // g, height - 1)
        y1 = min(max(((i + 1) * height) // g, y0 + 1), height)
        for j in range(g):
            x0 = min((j * width) // g, width - 1)
            x1 = min(max(((j + 1) * width) // g, x0 + 1), width)
            feats.append(float(lum[y0:y1, x0:x1].mean() / maxval))
    return {"width": width, "height": height, "features": feats}


def netpbm_resizer(payload: bytes, mime_type: str | None, w: int, h: int) -> dict:
    """Real resizer for :func:`resize_media`: nearest-neighbor resample of
    a PPM/PGM payload to (w, h), re-encoded in the same format."""
    import numpy as np

    magic, src_w, src_h, maxval, px = _parse_netpbm(payload)
    yi = np.minimum((np.arange(h) * src_h) // h, src_h - 1)
    xi = np.minimum((np.arange(w) * src_w) // w, src_w - 1)
    out = px[yi][:, xi]
    header = f"{magic}\n{w} {h}\n{maxval}\n".encode("ascii")
    return {
        "payload": header + out.tobytes(),
        "src_width": src_w,
        "src_height": src_h,
    }


def extract_media_features(
    media: DataFrame,
    decoder: Decoder | None = None,
    strict: bool = False,
    batch_hint: int | None = None,
) -> DataFrame:
    """schemas.MEDIA rows → per-item features via ``mapInPandas``:
    Arrow-batched binary transfer, one Python worker call per batch (never
    per row). ``repartition`` upstream if media blobs are large enough that
    a batch would not fit executor memory.

    With no real ``decoder``: deterministic fake (or NotImplementedError
    when ``strict`` — the clearly-marked stub boundary)."""
    import pandas as pd

    use: Decoder
    if decoder is not None:
        use = decoder
    elif strict:
        def use(payload: bytes, mime_type: str | None) -> dict:  # type: ignore[misc]
            raise NotImplementedError(
                "real media decoding requires a codec library; pass decoder="
            )
    else:
        use = _fake_decode

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # column-zip iteration, not iterrows(): per-item codec calls are
        # inherent, but Series-per-row materialization is pandas' slowest
        # access path (~5-10× the per-row Python overhead of zipping the
        # column arrays). The codec still dominates with real decoders.
        for pdf in batches:
            out = []
            for media_id, modality, mime_type, raw in zip(
                pdf["media_id"], pdf["modality"], pdf["mime_type"], pdf["payload"]
            ):
                payload = bytes(raw) if raw is not None else b""
                d = use(payload, mime_type)
                out.append(
                    {
                        "media_id": media_id,
                        "modality": modality,
                        "width": d.get("width"),
                        "height": d.get("height"),
                        "n_bytes": len(payload),
                        "features": d.get("features"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    cols = media.select("media_id", "modality", "mime_type", "payload")
    if batch_hint:
        cols = cols.repartition(batch_hint)
    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (duration-driven sequence expansion, JVM-side). The actual frame
    decode is the pluggable stage above."""
    n = F.greatest((F.col("duration_ms") / every_ms).cast("long"), F.lit(0))
    return media.where(F.col("modality") == "video").select(
        "media_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n), lambda i: i * every_ms)
        ).alias("frame_idx", "frame_ts_ms"),
    )


def media_from_binary_files(spark_df: DataFrame, modality: str) -> DataFrame:
    """binaryFile rows (path, content, length, ...) → schemas.MEDIA rows;
    mime type guessed from the extension, metadata left for decode."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return spark_df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.concat(F.lit(f"{modality}/"), ext).alias("mime_type"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


Resizer = Callable[[bytes, str | None, int, int], dict]

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
    ]
)


def _fake_resize(payload: bytes, mime_type: str | None, w: int, h: int) -> dict:
    """Deterministic fake resize: source dims from the payload digest (as
    in _fake_decode), output payload truncated/padded to w*h bytes so the
    size contract of a real resampler holds."""
    digest = hashlib.sha256(payload or b"").digest()
    src_w, src_h = 16 + digest[0], 16 + digest[1]
    size = w * h
    body = (payload or b"") * (size // max(len(payload or b" "), 1) + 1)
    return {
        "payload": body[:size],
        "src_width": src_w,
        "src_height": src_h,
    }


def resize_media(
    media: DataFrame,
    target_width: int,
    target_height: int,
    resizer: Resizer | None = None,
    strict: bool = False,
) -> DataFrame:
    """Resize stage: schemas.MEDIA rows → rows with payloads resampled to
    (target_width, target_height), via the same Arrow-batched
    ``mapInPandas`` shape as :func:`extract_media_features`. Pass a real
    ``resizer(payload, mime_type, w, h) -> {payload, src_width,
    src_height}`` (PIL/ffmpeg) in production; the default is the
    deterministic fake, and ``strict=True`` raises at the stub boundary
    instead. Output keeps source dimensions so downstream stages can
    compute scale factors for span/bbox arithmetic."""
    import pandas as pd

    use: Resizer
    if resizer is not None:
        use = resizer
    elif strict:
        def use(payload, mime_type, w, h):  # type: ignore[misc]
            raise NotImplementedError(
                "real media resizing requires a codec library; pass resizer="
            )
    else:
        use = _fake_resize

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # column-zip, not iterrows() — see extract_media_features
        for pdf in batches:
            out = []
            for media_id, modality, mime_type, raw in zip(
                pdf["media_id"], pdf["modality"], pdf["mime_type"], pdf["payload"]
            ):
                payload = bytes(raw) if raw is not None else b""
                d = use(payload, mime_type, target_width, target_height)
                out.append(
                    {
                        "media_id": media_id,
                        "modality": modality,
                        "mime_type": mime_type,
                        "payload": d.get("payload"),
                        "width": target_width,
                        "height": target_height,
                        "src_width": d.get("src_width"),
                        "src_height": d.get("src_height"),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    cols = media.select("media_id", "modality", "mime_type", "payload")
    return cols.mapInPandas(run, schema=RESIZED_SCHEMA)
