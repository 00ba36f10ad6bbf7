"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not available in
this container): ``decode_stub`` produces a deterministic fake feature
vector from the bytes so the Spark-side plumbing — schema, batch shape,
partitioning — is fully real and testable. Swap ``_fake_decode`` for a
PIL/torchaudio call in production; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter for tests/bench: wrap the documents table's text bytes as
    opaque media payloads with plausible metadata. Dims derive from the
    portable md5 hex-slice hash so every downstream multimodal query
    has an exact DuckDB oracle twin."""

    def dim(seed: str, mod: int):
        h = F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(seed)))
        return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(mod)).cast(
            "int"
        )

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        dim("w", 1920).alias("width"),
        dim("h", 1080).alias("height"),
        dim("d", 60_000).alias("duration_ms"),
    )


def _fake_decode(payload: pd.Series, dim: int) -> pd.Series:
    """Deterministic stand-in for a real decoder: a dim-length float
    vector derived from byte statistics. Vectorized numpy, no loops."""
    import numpy as np

    lengths = payload.map(lambda b: 0 if b is None else len(b)).to_numpy(dtype=np.int64)
    first = payload.map(lambda b: (b[0] if b else 0)).to_numpy(dtype=np.int64)
    base = (lengths[:, None] * 31 + first[:, None] * 17 + np.arange(dim)[None, :]) % 1000
    feats = (base / 500.0 - 1.0).astype(np.float32)
    return pd.Series(list(feats))


def extract_features(media: DataFrame, dim: int = 16, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    Real pipelines put the decode (PIL / ffmpeg frame-sample / resample)
    inside ``process``; each Arrow batch arrives as one pandas frame so
    the decoder amortizes model/codec setup per batch, not per row.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": _fake_decode(pdf["payload"], dim),
                }
            )
            yield out

    return media.mapInPandas(process, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 256, batch_hint: int | None = None
) -> DataFrame:
    """Image resize plumbing over ``mapInPandas``: aspect-preserving
    downscale to ``max_side``. The pixel work is STUBBED (no PIL in
    this container — production swaps the payload line for
    ``Image.open(io.BytesIO(b)).thumbnail(...)``); the Spark-side
    contract — Arrow batch shape, dimension arithmetic, binary
    passthrough, schema — is real and oracle-tested. Dimension math is
    vectorized numpy, not per-row Python."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            scale = np.minimum(1.0, max_side / np.maximum(np.maximum(w, h), 1.0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_width": np.floor(w * scale).astype(np.int32),
                    "out_height": np.floor(h * scale).astype(np.int32),
                    # stub: real decoder would re-encode resized pixels
                    "payload": pdf["payload"],
                }
            )

    return media.mapInPandas(process, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
    ]
)


def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    at ``fps`` over the clip's ``duration_ms`` — the 1->N row expansion
    a real ffmpeg frame extractor produces, expressed as a codegen'd
    ``sequence``+``explode`` (the frame DECODE itself would join in a
    ``mapInPandas`` stage like :func:`extract_features`; no Python is
    needed for the sampling grid itself).

    Frames land strictly inside ``[0, duration_ms)`` — ceil semantics,
    so an exact-multiple duration does NOT emit a frame at/after clip
    end — with one frame at t=0 always (zero/null durations included).
    ``fps`` above 1000 would make the integer step 0 (ANSI division
    error downstream), so it's rejected up front."""
    step_ms = int(1000 / fps)
    if step_ms <= 0:
        raise ValueError(f"fps={fps} yields a sub-millisecond step; fps must be <= 1000")
    last = F.greatest(
        F.ceil(F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(step_ms)).cast("int")
        - F.lit(1),
        F.lit(0),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), last)).alias("frame_idx", "_i"),
        )
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            (F.col("_i") * step_ms).cast("int").alias("frame_ts_ms"),
        )
    )


def decode_real(media: DataFrame):  # pragma: no cover - documented stub
    """Real decoder entry point — requires PIL/torchaudio/ffmpeg, which
    this container does not ship."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "use extract_features (deterministic fake) for plumbing tests"
    )
