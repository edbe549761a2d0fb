"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the DataFrame carries either
the bytes themselves (small assets) or a pointer struct (uri, offset,
length) into blob storage; decode / feature-extraction runs as
Arrow-batched pandas functions over ``mapInPandas`` so each task touches
one batch of payloads at a time and nothing ever lands on the driver.

One real codec IS implemented dependency-free: 24-bit uncompressed BMP
(encode + decode in pure numpy/struct — BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up BGR rows, 4-byte row padding), so the
``use_codec=True`` path runs a genuine bytes -> pixels decode
end-to-end. Formats that need external libraries (PNG/JPEG/audio)
still raise NotImplementedError behind the clearly-marked seam;
swapping in PIL / torchaudio later changes only ``_decode_pixels``'s
dispatch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every binary payload
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a binary asset column + typed metadata from text (stand-in
    for real image bytes; the schema/partitioning is what matters).
    Deterministic fake dims derived from the id."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col(id_col) % 64 + 16).cast("int").alias("width"),
            (F.col(id_col) % 48 + 16).cast("int").alias("height"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows padded to
    4 bytes). Pure struct/numpy — no image library."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_size = row_size * h
    padded = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up row order, RGB -> BGR channel order
    padded[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + padded.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Raises ValueError on malformed input."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _hdr, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    if h < 0:  # negative height = top-down rows (rare but legal)
        h, top_down = -h, True
    else:
        top_down = False
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, row_size * h, offset).reshape(h, row_size)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def _decode_pixels(payload: bytes) -> np.ndarray:
    """Decode dispatch: BMP is handled natively; every other format is
    the SEAM where a real codec (PIL.Image.open(io.BytesIO(payload)),
    torchaudio, ...) plugs in — those libs are not in this container."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "pixel decode for non-BMP payloads requires an image codec "
        "(PIL/opencv) not present in this environment"
    )


def _fake_pixels(doc_id: int) -> np.ndarray:
    """Deterministic test image for doc_id: dims (doc_id%6+4,
    doc_id%8+4), pixel[y,x,c] = (doc_id*31 + y*17 + x*7 + c*5) % 256.
    Closed-form, so an SQL oracle can compute expected pixel stats
    without running the codec — which is exactly what lets the decode
    path be hash-checked cross-engine."""
    w = int(doc_id) % 8 + 4
    h = int(doc_id) % 6 + 4
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((int(doc_id) * 31 + y * 17 + x * 7 + c * 5) % 256).astype(np.uint8)


def attach_bmp_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Generate a real 24-bit BMP payload per row (deterministic pixels
    from the id) + typed metadata — the asset frame for exercising the
    actual decode path. Arrow-batched via mapInPandas; payload bytes
    never touch the driver."""

    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [encode_bmp(_fake_pixels(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "image/bmp",
                    "width": [i % 8 + 4 for i in ids],
                    "height": [i % 6 + 4 for i in ids],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = df.select(id_col).mapInPandas(gen, gen_schema)
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            "media_type", "width", "height", "n_bytes"
        ).alias("meta"),
    )


PIXEL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("mean_lum", T.DoubleType()),
        T.StructField("media_type", T.StringType()),
    ]
)


def extract_pixel_features(assets: DataFrame) -> DataFrame:
    """The ``use_codec`` path made real: decode each payload
    (:func:`_decode_pixels` — native BMP here, PIL/torchaudio at the
    seam for other formats) and compute features from the DECODED
    pixel array, not the container bytes. Same mapInPandas shape as
    :func:`extract_features`."""

    def batch_pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_pixels(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [px.shape[1] for px in decoded],
                    "height": [px.shape[0] for px in decoded],
                    "px_sum": [int(px.sum(dtype=np.int64)) for px in decoded],
                    # plain IEEE division (no rounding): int/int division
                    # is bit-identical across engines, while Python
                    # banker's-rounds and SQL rounds half-away
                    "mean_lum": [
                        float(px.sum(dtype=np.int64)) / px.size for px in decoded
                    ],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return assets.mapInPandas(batch_pixels, PIXEL_FEATURE_SCHEMA)


def extract_features(assets: DataFrame, use_codec: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each task receives pandas batches of (doc_id, payload,
    meta); features are computed vectorized per batch. With
    ``use_codec=True`` every payload is run through the real decoder
    (validating decodability; BMP natively, other formats raise at the
    codec seam) — use :func:`extract_pixel_features` for features over
    the decoded pixels themselves.
    """

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_codec:
                for p in payloads:
                    _decode_pixels(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 1_000_003
                    ).astype("int64"),
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )

    return assets.mapInPandas(batch_features, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape for video-like payloads: slice each payload
    at a fixed stride into frame offsets (binary slicing stays JVM-side
    via substring on binary)."""
    return assets.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest((F.octet_length("payload") / every_n_bytes), F.lit(1)).cast("int"),
                ),
                lambda i: F.substring(
                    F.col("payload"), (i - 1) * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
