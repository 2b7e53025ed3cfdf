"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``BinaryType`` columns
with a typed metadata struct alongside — the layout that keeps Spark's
columnar machinery effective (metadata predicates prune without touching
payload bytes; parquet stores the blobs contiguously).

The decode / feature-extract stage is the one place Python is unavoidable
(codec libraries), so it is an Arrow-batched ``mapInPandas`` with an
explicit output schema — the real plumbing (schema, batching, partition
shape) with the codec call stubbed: the decode backends (PIL / torchcodec /
ffmpeg) are not in this container, so ``decode_fn=None`` uses a
deterministic fake that derives "dimensions" from the payload bytes, and
wiring a real codec is a one-argument change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata carried next to every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "text/plain"
) -> DataFrame:
    """``multimodal_cols`` — attach an opaque binary payload + typed
    metadata struct. (The driver tables carry no real media, so the demo
    payload is the utf-8 encoding of ``text`` — the column shapes,
    metadata derivation, and downstream plumbing are exactly what a real
    image/audio column uses.)

    Pure Catalyst: ``encode``/``length``/``sha2`` never leave the JVM.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from payload bytes. Replace with PIL/ffmpeg in production —
    see :func:`decode_media`."""
    n = len(payload)
    width = 16 + (payload[0] if n else 0) % 64
    height = 16 + (payload[-1] if n else 0) % 64
    return width, height, 1 + n % 8


def decode_media(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """``multimodal_decode`` — Arrow-batched decode / feature extraction.

    ``mapInPandas`` processes whole Arrow record batches per call (the
    ~10-100× win over row-at-a-time UDFs); decode CPU parallelizes with
    the partition count, so at 100 TB this stage scales linearly with
    executors and the payload bytes are read exactly once.

    ``decode_fn`` maps payload bytes → (width, height, n_frames). Default
    is the deterministic fake; a real backend would be e.g.
    ``lambda b: PIL.Image.open(io.BytesIO(b)).size + (1,)``. Import-gate
    real codecs at call time:

    >>> try:
    ...     from PIL import Image  # doctest: +SKIP
    ... except ImportError:
    ...     decode_fn = None  # fall back to the stub
    """
    fn = decode_fn or _fake_decode

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            decoded = [fn(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(
    df: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "doc_id",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """``multimodal_resize`` — batch resize via ``mapInPandas``.

    Same plumbing contract as :func:`decode_media`: Arrow batches of
    binary payloads in, transformed payloads out, decode CPU scaling with
    partitions. ``resize_fn(payload, w, h) -> bytes`` is the codec hook
    (PIL ``Image.resize`` in production); the container-safe default is a
    deterministic fake that truncates/pads the payload to ``w·h`` bytes so
    output sizes are exactly what a real raster resize would pin.
    """

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        target = w * h
        return payload[:target].ljust(target, b"\0")

    fn = resize_fn or _fake_resize

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [fn(bytes(p), width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        resize_batches, RESIZED_SCHEMA
    )


def frame_sample(
    df: DataFrame, *, stride: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame/segment sampling over a binary payload: every ``stride``-th
    byte as a "frame" (the real operator samples video frames; the Spark
    shape — explode a bounded slice index, slice bytes JVM-side — is
    identical). Demonstrates payload slicing without Python."""
    n_frames = F.least(
        F.floor(F.octet_length("payload") / stride).cast("int"), F.lit(16)
    )
    idx = F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.select(id_col, "payload", F.explode(idx).alias("frame_idx"))
        .select(
            id_col,
            "frame_idx",
            F.substring(F.col("payload"), F.col("frame_idx") * stride + 1, stride)
            .alias("frame_bytes"),
        )
    )
