"""Multimodal columns: opaque binary blobs + typed metadata.

The Spark-side plumbing is REAL — schemas, Arrow batch shapes,
partition-friendly mapInPandas decode stages; only the codec itself is
a deterministic fake (image/audio libs aren't in this container), marked
clearly. Mirrors the reference's treatment of payloads as opaque bytes
until check time (`/root/reference/doc/data_flow.md:48-52` — lazy
deserialization; payload stays raw through dispatch).

Blob table schema:
    media_id: string, mtype: string (image|audio|video),
    data: binary, meta: struct<width:int, height:int, sample_rate:int,
                               duration_ms:int>
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mtype", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this container
try:  # pragma: no cover - environment-dependent
    import PIL.Image  # noqa: F401

    REAL_CODECS_AVAILABLE = True
except ImportError:
    pass


def synth_blobs(spark: SparkSession, n: int = 64, blob_bytes: int = 256) -> DataFrame:
    """Deterministic fake blobs: media m{i} with payload derived from i.

    Header layout (the fake "codec" reads it): 4 bytes magic 'FPSK',
    2 bytes width, 2 bytes height — so decode exercises real byte
    slicing over the binary column.
    """
    body = (
        "concat(unhex('4650534B'), "  # magic FPSK
        "unhex(lpad(hex(pmod(id * 7 + 16, 4096)), 4, '0')), "
        "unhex(lpad(hex(pmod(id * 13 + 9, 4096)), 4, '0')), "
        f"cast(repeat(chr(65 + pmod(id, 26)), {blob_bytes}) AS BINARY))"
    )
    mtypes = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.element_at(mtypes, (F.col("id") % 3 + 1).cast("int")).alias("mtype"),
        F.expr(body).alias("data"),
        F.expr(
            "named_struct('width', CAST(pmod(id * 7 + 16, 4096) AS INT), "
            "'height', CAST(pmod(id * 13 + 9, 4096) AS INT), "
            "'sample_rate', CAST(IF(pmod(id, 3) = 1, 16000, NULL) AS INT), "
            "'duration_ms', CAST(IF(pmod(id, 3) <> 0, 1000 + id, NULL) AS INT))"
        ).alias("meta"),
    )


def _pil_dims(data: bytes) -> tuple[int, int] | None:
    """REAL-codec dimension probe (PIL when REAL_CODECS_AVAILABLE);
    None when unavailable or not a decodable image."""
    if not REAL_CODECS_AVAILABLE:
        return None
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(data)) as img:
            return img.size
    except Exception:
        return None


def _fake_decode(data: bytes) -> tuple[int, int]:
    """STUB CODEC: parses the synthetic FPSK header. A real deployment
    swaps this for PIL/ffmpeg; everything around it (Arrow batching,
    schema, partitioning) is production-shaped."""
    if data is None or len(data) < 8 or data[:4] != b"FPSK":
        raise ValueError("not a FPSK blob")
    width = int.from_bytes(data[4:6], "big")
    height = int.from_bytes(data[6:8], "big")
    return width, height


def extract_features(blobs: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract over binary columns via mapInPandas.

    Arrow-batched; per-batch vectorized numpy for the feature math.
    The 'features' are a deterministic byte-histogram projection —
    a stand-in with the same shape/flow as a CNN embedding stage.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, data in zip(pdf["media_id"], pdf["mtype"], pdf["data"]):
                if data is None:
                    out.append((mid, mtype, 0, 0, None))
                    continue
                buf = np.frombuffer(bytes(data), dtype=np.uint8)
                try:
                    w, h = _fake_decode(bytes(data))
                    seed_vec = buf[8:]
                except ValueError:
                    w, h, seed_vec = 0, 0, buf
                    dims = _pil_dims(bytes(data))
                    if dims is not None:
                        w, h = dims
                hist = np.bincount(seed_vec % feat_dim, minlength=feat_dim)
                denom = max(len(seed_vec), 1)
                feats = (hist / denom).astype(np.float32)
                feats[0] += np.float32(w % 97) / np.float32(100.0)
                feats[-1] += np.float32(h % 97) / np.float32(100.0)
                out.append(
                    (mid, mtype, int(len(buf)), int(buf.sum()), feats.tolist())
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mtype", "n_bytes", "checksum", "features"]
            )

    return blobs.select("media_id", "mtype", "data").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def _pil_resize(data: bytes, width: int, height: int) -> bytes | None:
    """REAL-codec body (used only when REAL_CODECS_AVAILABLE): decode
    with PIL, resize, re-encode in the source format. None when the
    bytes are not a decodable image — callers pass the blob through
    untouched then, same as the stub path."""
    if not REAL_CODECS_AVAILABLE:
        return None
    import io

    import PIL.Image

    try:
        img = PIL.Image.open(io.BytesIO(data))
        fmt = img.format or "PNG"
        out = io.BytesIO()
        img.resize((width, height)).save(out, format=fmt)
        return out.getvalue()
    except Exception:
        return None


def resize_images(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage for image blobs — mapInPandas over the binary column,
    returning the same BLOB_SCHEMA with updated payload + meta.

    Codec selection per blob: synthetic FPSK blobs go through the STUB
    codec (rewrites the FPSK header to the target dims and
    nearest-neighbor subsamples the payload bytes — the same batch
    shape and memory behavior as a real resample); non-FPSK image bytes
    go through PIL.Image.resize when REAL_CODECS_AVAILABLE (guard-skip
    tested, so the branch is live on hosts that have PIL). Non-image
    rows and undecodable blobs pass through untouched.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, data, meta in zip(
                    pdf["media_id"], pdf["mtype"], pdf["data"], pdf["meta"]):
                if mtype != "image" or data is None:
                    rows.append((mid, mtype, data, meta))
                    continue
                try:
                    old_w, old_h = _fake_decode(bytes(data))
                except ValueError:
                    resized = _pil_resize(bytes(data), width, height)
                    if resized is not None:
                        new_meta = dict(meta) if meta is not None else {}
                        new_meta.update({"width": width, "height": height})
                        rows.append((mid, mtype, resized, new_meta))
                    else:
                        rows.append((mid, mtype, data, meta))
                    continue
                body = np.frombuffer(bytes(data), dtype=np.uint8)[8:]
                scale = (width * height) / max(old_w * old_h, 1)
                n_out = max(int(len(body) * min(scale, 1.0)), 1)
                idx = np.linspace(0, len(body) - 1, n_out).astype(np.int64)
                new_body = body[idx] if len(body) else body
                new_data = (b"FPSK" + width.to_bytes(2, "big")
                            + height.to_bytes(2, "big") + new_body.tobytes())
                new_meta = dict(meta) if meta is not None else {}
                new_meta.update({"width": width, "height": height})
                rows.append((mid, mtype, new_data, new_meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "mtype", "data", "meta"])

    return blobs.select("media_id", "mtype", "data", "meta").mapInPandas(
        run, schema=BLOB_SCHEMA)


def frame_sample(blobs: DataFrame, every: int = 32, frame_bytes: int = 16) -> DataFrame:
    """Frame/chunk sampling over video/audio blobs — pure Column exprs:
    slice the binary every `every` bytes into frame_bytes chunks.
    Returns (media_id, frame_idx, frame binary)."""
    n_frames = F.expr(f"int(floor(length(data) / {every}))")
    frames = F.expr(
        f"transform(sequence(0, greatest(int(floor(length(data) / {every})) - 1, 0)), "
        f"i -> named_struct('frame_idx', i, "
        f"'frame', substring(data, i * {every} + 1, {frame_bytes})))"
    )
    return (
        blobs.filter(F.col("mtype").isin("video", "audio"))
        .filter(n_frames > 0)
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_idx").alias("frame_idx"),
                F.col("f.frame").alias("frame"))
    )


def blob_stats(blobs: DataFrame) -> DataFrame:
    """Typed-metadata profile per mtype — JVM-side only."""
    return (
        blobs.groupBy("mtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("data")).alias("total_bytes"),
            F.min("meta.width").alias("min_width"),
            F.max("meta.height").alias("max_height"),
            F.sum(F.col("meta.sample_rate").isNull().cast("long")).alias(
                "null_sample_rate"
            ),
        )
        .orderBy("mtype")
    )
