"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (driver brief).

The decode step is STUBBED — image/audio libs are not available in this
container — but everything Spark-side is real and tested: schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partitioning by media
type, and a deterministic fake feature extractor so the pipeline can be
verified end to end.  Swapping ``_decode_stub`` for a real Pillow/ffmpeg
call changes no Spark code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image/audio/video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),        # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURES_SCHEMA = ("media_id long, media_type string, feature_dim int, "
                   "features array<float>, decode_ok boolean, error string")


def _decode_stub(payload: bytes, media_type: str, dim: int = 16) -> np.ndarray:
    """Deterministic fake decode/feature-extract.

    REAL IMPLEMENTATION WOULD: decode with Pillow (image) / soundfile
    (audio) / pyav frame-sampling (video) and run a feature model.  The
    stub derives ``dim`` floats from a sha256 of the payload so results
    are stable for tests.  Raise NotImplementedError here to make the
    stub boundary explicit when real decode is required:

        raise NotImplementedError("media decode requires Pillow/ffmpeg")
    """
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas over media batches → feature vectors.

    Arrow moves the binary payloads in columnar batches; the per-batch
    loop is the decode boundary (the only place Python touches bytes).
    Partitioning: repartition by media_type so one slow codec does not
    skew every partition.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"],
                                           pdf["media_type"], pdf["payload"]):
                try:
                    feats = _decode_stub(bytes(payload) if payload is not None
                                         else b"", mtype, dim)
                    out.append((mid, mtype, dim, feats.tolist(), True, None))
                except NotImplementedError as e:
                    out.append((mid, mtype, dim, None, False, str(e)))
            yield pd.DataFrame(out, columns=["media_id", "media_type",
                                             "feature_dim", "features",
                                             "decode_ok", "error"])

    return (media.repartition("media_type")
            .select("media_id", "media_type", "payload")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    the decoder should extract — pure Column math (sequence over
    duration), so the expensive decode fan-out is planned JVM-side and
    the stubbed decoder only materializes requested frames."""
    return (media.filter(F.col("media_type") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0))
                                   - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
