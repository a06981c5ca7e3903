"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode step is STUBBED (no image/audio libraries in this
container): `decode_image` raises NotImplementedError unless
`fake=True`, which produces a deterministic fake decode so the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partitioning — is real and tested end-to-end. Swap `_decode_bytes`
for PIL/librosa in a real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_bytes(payload: bytes, kind: str, fake: bool):
    """The real decoder would go through PIL / soundfile / pyav here."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "container — pass fake=True for the deterministic stub"
        )
    # deterministic fake: dimensions + an 8-dim feature derived from bytes
    h = payload if payload is not None else b""
    w = 16 + (len(h) % 64)
    ht = 16 + ((len(h) * 7) % 64)
    frames = 1 if kind == "image" else 1 + (len(h) % 30)
    feat = [float((sum(h[i::8]) % 1000) / 1000.0) if h else 0.0 for i in range(8)]
    return w, ht, frames, feat


def extract_features(df: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    The UDF signature/batching is production-shaped: iterator of
    pandas DataFrames in, iterator out, so one Python worker streams
    whole Arrow batches (never per-row Python)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_frames": [],
                "feature": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                w, h, nf, feat = _decode_bytes(
                    bytes(payload) if payload is not None else b"", kind, fake
                )
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 5, fake: bool = True) -> DataFrame:
    """Video frame sampling: 1→N rows (media_id, frame_idx). The decode
    is the same stub; the explode shape matches a real frame extractor."""
    feats = extract_features(df, fake=fake)
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return feats.select("media_id", "kind", F.explode(idx).alias("frame_idx"))


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payload from sha2)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unhex(F.sha2(F.concat(F.lit(seed), F.col("id")), 256))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        payload.alias("payload"),
        F.create_map(F.lit("seed"), F.lit(str(seed))).alias("meta"),
    )
