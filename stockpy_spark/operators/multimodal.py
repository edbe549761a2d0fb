"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the DataFrame carries either
the bytes themselves (small assets) or a pointer struct (uri, offset,
length) into blob storage; decode / feature-extraction runs as
Arrow-batched pandas functions over ``mapInPandas`` so each task touches
one batch of payloads at a time and nothing ever lands on the driver.

The actual image/audio codecs are NOT in this container, so
``decode_image_batch``'s pixel path raises NotImplementedError behind a
clearly-marked seam; the deterministic fallback ("header sniff" +
byte-stats features) keeps the Spark-side plumbing — schema, batching,
partitioning, UDF signature — real and fully tested. Swapping in PIL /
torchaudio later changes only the marked function body.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _decode_pixels(payload: bytes) -> object:
    """SEAM: real decoder goes here (PIL.Image.open(io.BytesIO(payload))).
    Image/audio libs are not in this container."""
    raise NotImplementedError(
        "pixel decode requires an image codec (PIL/opencv) not present in "
        "this environment; byte-level features are computed instead"
    )


def extract_features(assets: DataFrame, use_codec: bool = False) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each task receives pandas batches of (doc_id, payload,
    meta); features are computed vectorized per batch. With
    ``use_codec=True`` the (stubbed) real decoder is invoked.
    """

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_codec:
                payloads.map(_decode_pixels)  # raises: codec not available
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
