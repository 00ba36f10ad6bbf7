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
    opaque media payloads with plausible metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.pmod(F.xxhash64("doc_id"), F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1080)).cast("int").alias("height"),
        F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(60_000)).cast("int").alias("duration_ms"),
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


def decode_real(media: DataFrame):  # pragma: no cover - documented stub
    """Real decoder entry point — requires PIL/torchaudio/ffmpeg, which
    this container does not ship."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "use extract_features (deterministic fake) for plumbing tests"
    )
