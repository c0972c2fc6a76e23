"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the decode step is STUBBED:
``decode_image_stub`` raises NotImplementedError by design, and
``fake_decode_features`` is the deterministic stand-in used by tests and the
driver queries.  What IS real — and what matters at 100 TB — is the Spark
plumbing: the binary schema, the Arrow-batched mapInPandas signature, batch
shapes bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and a
partitioning that keeps each Python worker's batch under memory limits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata schema for a multimodal asset column.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("header_hex", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
    ]
)


def docs_as_assets(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque binary payload
    (the driver's tables have no real media; the engine-side schema and
    partitioning are identical either way)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


def decode_image_stub(payload: bytes) -> "object":
    """Real decode would use PIL/libvips — not present in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_decode_features for the plumbing path"
    )


def _fake_features(payload: bytes | None) -> tuple[int | None, str | None, int | None, int | None, int | None]:
    """Deterministic stand-in for decode/feature-extract: byte length, 8-byte
    header hex, fake width/height derived from the payload, additive checksum.
    Mirrors exactly what a real decoder's metadata pass would emit."""
    if payload is None:
        return None, None, None, None, None
    n = len(payload)
    header = payload[:8].hex()
    width = (n % 640) + 1
    height = ((n * 7) % 480) + 1
    checksum = sum(payload) % (1 << 31)
    return n, header, width, height, checksum


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas streams RecordBatches through one Python worker per core;
    batch size is bounded by arrow.maxRecordsPerBatch so a batch of large
    payloads cannot blow worker memory.  At 100 TB you'd repartition by a
    size-aware key first so no single partition carries the long tail of
    giant assets."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "header_hex": feats.map(lambda t: t[1]),
                    "width": feats.map(lambda t: t[2]),
                    "height": feats.map(lambda t: t[3]),
                    "checksum": feats.map(lambda t: t[4]),
                }
            )
            yield out

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* (decode stubbed): emits one row per
    would-be-sampled frame index based on fake duration metadata.  Shows the
    explode/flatMap shape a real sampler uses."""
    with_frames = assets.withColumn(
        "n_frames", (F.octet_length("payload") % 300 + 1).cast("int")
    )
    # explode_outer: a NULL-payload asset keeps one row (frame_idx NULL),
    # matching extract_features' all-NULL-feature-row contract
    return with_frames.select(
        "asset_id",
        F.explode_outer(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("thumb", T.BinaryType(), True),
        T.StructField("t_width", T.IntegerType(), True),
        T.StructField("t_height", T.IntegerType(), True),
    ]
)


def thumbnails(assets: DataFrame, max_dim: int = 64) -> DataFrame:
    """Binary-in/binary-out resize stage (decode/resample stubbed: the
    "thumbnail" is a deterministic prefix of the payload; a real impl swaps
    _fake_features + the slice for PIL/libvips calls — the Spark shape is
    identical).  This is the one multimodal stage whose OUTPUT is also large
    binary, so at 100 TB it writes straight to partitioned parquet rather
    than flowing into an aggregate; mapInPandas keeps each Arrow batch's
    payload bytes bounded."""

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, t = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    w.append(None), h.append(None), t.append(None)
                    continue
                n, _hdr, width, height, _ck = _fake_features(payload)
                scale = max(width, height) / max_dim
                tw = max(1, int(width / scale)) if scale > 1 else width
                th = max(1, int(height / scale)) if scale > 1 else height
                t.append(bytes(payload)[: tw * th // 8 + 1])
                w.append(tw), h.append(th)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "thumb": t, "t_width": w, "t_height": h}
            )

    return assets.mapInPandas(_thumb, THUMB_SCHEMA)
