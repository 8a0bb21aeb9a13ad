"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` — the Spark-side architecture for decode /
feature-extract / resize / frame-sample stages in a training-data
pipeline.

The container has no image/audio libraries, so the actual codecs are
STUBBED (clearly marked): ``decode_media(real_decoder=True)`` raises
``NotImplementedError`` unless PIL/av are importable, and the default
is a DETERMINISTIC FAKE decoder that derives metadata from the payload
bytes. The Spark-side contract — schema, Arrow batch shape, partition
behaviour — is real and tested; swapping in a real codec changes only
the per-batch numpy section.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_ref string, kind string, payload binary, n_bytes long, "
    "width int, height int, n_frames int, sha string"
)

FEATURE_SCHEMA = "media_ref string, feature array<float>, n_bytes long"


def attach_fake_payload(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Deterministic stand-in for a blob-store fetch: payload bytes
    derived from the ref (JVM-side: repeated md5). In production this
    is a binaryFile / blob-store join keyed by media_ref."""
    return df.withColumn(
        "payload",
        F.unhex(F.repeat(F.md5(F.col(ref_col)), 8)),
    ).withColumn("kind", _kind_from_ref(ref_col))


def _kind_from_ref(ref_col: str):
    ext = F.lower(F.substring_index(F.substring_index(F.col(ref_col), "?", 1), ".", -1))
    return (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("mp3", "wav", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mov", "webm"), "video")
        .otherwise("other")
    )


def _have_real_codecs() -> bool:
    try:  # pragma: no cover - not present in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(
    df: DataFrame,
    ref_col: str = "media_ref",
    real_decoder: bool = False,
) -> DataFrame:
    """Decode stage over ``(media_ref, kind, payload)`` rows via
    ``mapInPandas`` (Arrow batches, zero per-row Python overhead
    beyond the batch loop). Fake decoder: width/height/n_frames are
    pure functions of the payload hash — deterministic and
    schema-identical to what a real codec stage returns."""
    if real_decoder and not _have_real_codecs():
        raise NotImplementedError(
            "real media decoding needs PIL/av, not available in this "
            "container; run with real_decoder=False for the "
            "deterministic fake decoder (same schema, same plumbing)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            digests = payloads.map(
                lambda b: hashlib.blake2b(bytes(b), digest_size=8).digest()
            )
            d0 = digests.map(lambda d: d[0]).astype("int32")
            d1 = digests.map(lambda d: d[1]).astype("int32")
            d2 = digests.map(lambda d: d[2]).astype("int32")
            is_video = pdf["kind"] == "video"
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "n_bytes": n_bytes,
                    "width": 16 * (1 + d0 % 64),
                    "height": 16 * (1 + d1 % 64),
                    "n_frames": np.where(is_video, 1 + d2 % 120, 1).astype("int32"),
                    "sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(decode, MEDIA_META_SCHEMA)


def extract_features(decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stage (fake embedding: seeded from the
    payload hash — deterministic; a real model swap changes only the
    numpy line). Demonstrates the vectorized batch contract."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                seed = int.from_bytes(
                    hashlib.blake2b(bytes(b), digest_size=4).digest(), "little"
                )
                rng = np.random.RandomState(seed)
                out.append(rng.standard_normal(dim).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "feature": out,
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return decoded.mapInPandas(feats, FEATURE_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stage for video rows: explode sampled frame
    indices (JVM sequence; the actual frame decode would live in the
    decode stage's codec)."""
    return (
        decoded.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("media_ref", "frame_idx", "width", "height")
    )


def media_refs_from_documents(documents: DataFrame) -> DataFrame:
    """Pull the media side of the interleaved corpus: distinct
    media_ref spans (the crawl engine's media payload table)."""
    return (
        documents.select(F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
