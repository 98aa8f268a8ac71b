"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio libraries, so the decode step is STUBBED —
``decode_image`` raises NotImplementedError unless ``fake=True`` selects the
deterministic fake decoder. Everything Spark-side is real and tested: the
schema, the Arrow batch shape through ``mapInPandas``, the partition-size
control (media blobs dominate partition bytes — repartition by blob size
budget before the UDF), and the metadata projection that lets Catalyst
prune the binary column when only metadata is queried.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("content", T.BinaryType()),     # opaque payload
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synth_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the docs table's media
    spans (the <img src=...> refs) — payload bytes are a reproducible
    function of the ref string."""
    refs = (docs.select("doc_id", F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select("doc_id", F.col("s.media_ref").alias("media_ref")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                seed = hashlib.sha256(ref.encode()).digest()
                payload = (seed * 64)[:2048]
                rows.append({
                    "media_ref": ref, "doc_id": doc_id, "kind": "image",
                    "content": payload,
                    "meta": {"width": 64 + seed[0], "height": 64 + seed[1],
                             "n_bytes": len(payload), "mime": "image/bmp"},
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


try:  # optional: the operator upgrades itself the moment PIL lands
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - sandbox has no image library
    _PILImage = None


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    """Image decode -> 8-dim feature vector.

    Real path (when PIL is importable): decode, resize to 2x2 grayscale
    via a box filter (deterministic within one Pillow release — resampling
    internals may differ across releases, so these features must not feed
    a hash-gated oracle across environments), emit the 4 pixel intensities
    plus
    normalized width/height/aspect/fill — 8 floats, same shape as the
    stub. Without an image library, ``fake=True`` selects the
    deterministic byte-hash stub (keeps the Spark plumbing testable
    end-to-end); ``fake=False`` raises so a silent no-op can never pose
    as a decode."""
    if fake:
        digest = hashlib.sha256(content or b"").digest()
        return [b / 255.0 for b in digest[:8]]
    if _PILImage is None:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic stub")
    import io

    img = _PILImage.open(io.BytesIO(content)).convert("L")
    w, h = img.size
    # Resampling enum on Pillow >= 9.1, module constant before that
    small = img.resize(
        (2, 2), getattr(_PILImage, "Resampling", _PILImage).BOX)
    px = [p / 255.0 for p in small.getdata()]
    return px + [min(w, 4096) / 4096.0, min(h, 4096) / 4096.0,
                 w / max(h, 1) / 8.0, len(content or b"") / 1_048_576.0]


def extract_features(media: DataFrame, fake: bool = True,
                     partition_mb: int = 128,
                     total_bytes: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. Real
    decode plugs into ``decode_image``; batch shape and schema are the
    production contract.

    Partitioning: media blobs dominate partition bytes, so the width is
    derived from the byte volume over a ``partition_mb`` budget. Pass
    ``total_bytes`` (e.g. from table stats / a prior metadata agg) to keep
    the operator fully lazy; when omitted, a metadata aggregation (prunes
    the binary column at the scan) sizes it — one extra cheap job. No RDD
    API involved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, doc_id, content in zip(pdf["media_ref"], pdf["doc_id"],
                                            pdf["content"]):
                blob = bytes(content) if content is not None else b""
                rows.append({
                    "media_ref": ref, "doc_id": doc_id,
                    "sha256": hashlib.sha256(blob).hexdigest(),
                    "n_bytes": len(blob),
                    "features": decode_image(blob, fake=fake),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    if total_bytes is None:
        total_bytes = (media.agg(F.sum("meta.n_bytes")).first()[0] or 0)
    width = max(4, int(total_bytes // (partition_mb * 1024 * 1024)) + 1)
    return media.repartition(width).mapInPandas(run, FEATURE_SCHEMA)


def metadata_only(media: DataFrame) -> DataFrame:
    """Metadata projection — selecting only ``meta``/ids lets Catalyst prune
    the binary column at the scan (verify via .explain ReadSchema)."""
    return media.select("doc_id", "media_ref", "kind", "meta.width",
                        "meta.height", "meta.n_bytes", "meta.mime")
