"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` — the Spark-side architecture for decode /
feature-extract / resize / frame-sample stages in a training-data
pipeline.

Codec status (the container has no PIL/av):

* netpbm **P6/P5 (PPM/PGM) decode is REAL** — pure-numpy header+raster
  parsing (``parse_ppm``/``encode_ppm``), round-trip-exact and
  exercised end to end by ``attach_media_payload`` → ``decode_media``
  → ``extract_features`` (pixel-exact mean/std/histogram features);
* BMP **24-bit BI_RGB decode is REAL** — pure-numpy
  (``parse_bmp``/``encode_bmp``: BGR order, padded rows, bottom-up and
  top-down rasters), served for ``.bmp`` refs; features are
  codec-invariant (same raster → same features as netpbm);
* WAV **RIFF PCM16 decode is REAL** — pure-numpy chunk-walking parser
  (``parse_wav``/``encode_wav``), sample-exact round trip, real
  waveform features (level/RMS/zero-cross/magnitude histogram);
* compressed formats (jpg/png/mp3/video) stay STUBBED behind a
  deterministic fake (clearly marked; ``decode_media(
  real_decoder=True)`` raises ``NotImplementedError`` until PIL/av are
  importable). The Spark-side contract — schema, Arrow batch shape,
  partition behaviour — is identical on both paths.
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
            widths, heights = [], []
            for b in payloads:
                bb = bytes(b)
                if bb[:2] in (b"P6", b"P5"):
                    # REAL decode: netpbm payloads parse header-exact
                    w, h, _, _ = parse_ppm(bb)
                elif bb[:2] == b"BM":
                    # REAL decode: uncompressed 24-bit BMP
                    w, h, _, _ = parse_bmp(bb)
                elif bb[:4] == b"RIFF":
                    # REAL decode: PCM WAV — for audio rows width
                    # carries samples-per-channel, height the channel
                    # count (documented overload of the image dims)
                    _, ch, samples = parse_wav(bb)
                    w, h = int(samples.shape[0]), int(ch)
                else:
                    # stub path for formats whose codecs aren't in the
                    # container: hash-derived deterministic dims
                    d = hashlib.blake2b(bb, digest_size=8).digest()
                    w, h = 16 * (1 + d[0] % 64), 16 * (1 + d[1] % 64)
                widths.append(w)
                heights.append(h)
            d2 = payloads.map(
                lambda b: hashlib.blake2b(bytes(b), digest_size=8).digest()[2]
            ).astype("int32")
            is_video = pdf["kind"] == "video"
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "n_bytes": n_bytes,
                    "width": pd.Series(widths, index=pdf.index, dtype="int32"),
                    "height": pd.Series(heights, index=pdf.index, dtype="int32"),
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
                bb = bytes(b)
                if (bb[:2] in (b"P6", b"P5", b"BM")) and dim >= 6:
                    # REAL pixel features: per-channel mean/std + a
                    # luma histogram filling the remaining dims —
                    # codec-independent (same array -> same features
                    # whether it arrived as netpbm or BMP)
                    _, _, c, arr = (
                        parse_bmp(bb) if bb[:2] == b"BM" else parse_ppm(bb)
                    )
                    px = arr.reshape(-1, 3) if c == 3 else np.repeat(
                        arr.reshape(-1, 1), 3, axis=1
                    )
                    px = px.astype(np.float32)
                    luma = px.mean(axis=1)
                    hist, _ = np.histogram(luma, bins=dim - 6, range=(0, 255))
                    v = np.concatenate(
                        [
                            px.mean(axis=0) / 255.0,
                            px.std(axis=0) / 255.0,
                            hist.astype(np.float32) / max(len(luma), 1),
                        ]
                    ).astype(np.float32)
                    out.append(v)
                elif bb[:4] == b"RIFF" and dim >= 4:
                    # REAL waveform features: level stats + zero-cross
                    # rate + a coarse magnitude histogram
                    _, _, samples = parse_wav(bb)
                    x = samples.astype(np.float32).mean(axis=1) / 32768.0
                    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    hist, _ = np.histogram(np.abs(x), bins=dim - 3, range=(0, 1))
                    v = np.concatenate(
                        [
                            [x.mean(), float(np.sqrt(np.mean(x * x))), zcr],
                            hist.astype(np.float32) / max(len(x), 1),
                        ]
                    ).astype(np.float32)
                    out.append(v)
                else:
                    seed = int.from_bytes(
                        hashlib.blake2b(bb, digest_size=4).digest(), "little"
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


# ---------------------------------------------------------------------------
# REAL codec: PPM (P6) / PGM (P5) — pure numpy, no external libraries.
# The container lacks PIL/av, but the netpbm raster formats need only
# byte parsing, so this path is a fully real decode: header-exact
# dimensions and pixel-exact rasters (round-trip pinned by tests).


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Encode HxW (PGM, P5) or HxWx3 (PPM, P6) uint8 array."""
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected HxW or HxWx3 uint8, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def parse_ppm(b: bytes):
    """Decode P5/P6 bytes -> (width, height, channels, HxW[x3] uint8).
    Handles netpbm comment lines and arbitrary header whitespace."""
    if not (b.startswith(b"P6") or b.startswith(b"P5")):
        raise ValueError("not a P5/P6 netpbm payload")
    channels = 3 if b.startswith(b"P6") else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * channels, offset=pos)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return w, h, channels, raster.reshape(shape)


def attach_media_payload(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Blob-store stand-in that serves REAL media: each ref gets a
    deterministic hash-seeded P6 image (image refs) or PCM16 WAV clip
    (audio refs); video refs get md5-derived opaque bytes (those
    codecs stay stubbed). The decode stage then exercises the real
    parsers end to end."""
    from collections.abc import Iterator as _It

    kinded = df.withColumn("kind", _kind_from_ref(ref_col))

    def gen(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            payloads = []
            for ref, kind in zip(pdf[ref_col], pdf["kind"]):
                seed = int.from_bytes(
                    hashlib.blake2b(str(ref).encode(), digest_size=4).digest(),
                    "little",
                )
                rng = np.random.RandomState(seed)
                if kind == "image":
                    w, h = 8 + seed % 25, 8 + (seed >> 8) % 17
                    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                    # format follows the ref's extension: .bmp refs get
                    # real BMP bytes, every other image ref netpbm
                    is_bmp = str(ref).split("?")[0].lower().endswith(".bmp")
                    payloads.append(encode_bmp(img) if is_bmp else encode_ppm(img))
                elif kind == "audio":
                    n = 256 + seed % 512
                    ch = 1 + (seed >> 16) % 2
                    rate = 8000 * (1 + seed % 3)
                    payloads.append(
                        encode_wav(
                            rng.randint(-(2**15), 2**15, (n, ch), dtype=np.int16),
                            sample_rate=rate,
                        )
                    )
                else:
                    payloads.append(
                        hashlib.md5(str(ref).encode()).digest() * 8
                    )
            out = pdf.copy()
            out["payload"] = payloads
            yield out

    return kinded.mapInPandas(
        gen, f"{ref_col} string, kind string, payload binary"
    )


# backwards-compatible name from when only the netpbm path was real
attach_ppm_payload = attach_media_payload


# ---------------------------------------------------------------------------
# REAL codec: BMP (24-bit uncompressed BI_RGB) — pure numpy. Like
# netpbm, uncompressed BMP needs only byte parsing: BGR pixel order,
# 4-byte-padded rows, bottom-up storage (top-down when height < 0).
# Round-trip and cross-codec feature equality pinned by tests.


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Encode HxW (gray, replicated to channels) or HxWx3 RGB uint8 as
    a 24-bit BI_RGB bottom-up BMP."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxW or HxWx3 uint8, got {arr.shape}")
    h, w = a.shape[:2]
    bgr = a[:, :, ::-1]
    pad = (-(w * 3)) % 4
    data = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    return head + info + data


def parse_bmp(b: bytes):
    """Decode 24-bit BI_RGB BMP bytes -> (width, height, 3, HxWx3 RGB
    uint8). Honors the pixel-data offset, row padding, and top-down
    (negative-height) rasters."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", b[10:14])[0]
    _, w, h, _, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    topdown, hh = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    buf = np.frombuffer(b, np.uint8, count=stride * hh, offset=offset)
    px = buf.reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)[:, :, ::-1]
    if not topdown:
        px = px[::-1]
    return w, hh, 3, np.ascontiguousarray(px)


# ---------------------------------------------------------------------------
# REAL codec: WAV (RIFF PCM16) — pure numpy, no external libraries.
# Like netpbm for images, uncompressed PCM needs only byte parsing, so
# the audio decode path is fully real: header-exact sample rate /
# channel count and sample-exact waveforms (round-trip pinned by
# tests). Compressed audio (mp3/ogg) stays honestly stubbed.


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM — shape (n,) mono or (n, channels) — as a
    canonical RIFF/WAVE file (fmt + data chunks)."""
    import struct

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, ch = arr.shape
    data = arr.tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes):
    """Decode RIFF/WAVE PCM16 bytes -> (sample_rate, n_channels,
    (n, channels) int16 array). Walks the chunk list (skipping unknown
    chunks, honoring the odd-size pad byte), PCM16 only."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, data = 12, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, ch, samples.reshape(-1, ch)


# ---------------------------------------------------------------------------
# Perceptual image dedupe over the REAL decoders: aHash on the decoded
# luma raster (block-mean 8x8 -> threshold at the mean -> 64 bits),
# paired with the generic bounded-hamming chunk join. Exact payload
# dedupe rides the sha already computed by decode_media.


AHASH_SCHEMA = "media_ref string, ahash long"


def ahash_images(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash each decodable image row (netpbm/BMP payloads):
    luma -> grid x grid cell means (np.add.reduceat, codec-independent
    because both parsers return the same raster) -> bit = cell >= mean
    -> packed signed 64-bit. Non-image / stub-codec rows are dropped.
    Arrow-batched; per image the work is one vectorized reduction."""

    def ah(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, hashes = [], []
            for ref, b in zip(pdf["media_ref"], pdf["payload"]):
                bb = bytes(b)
                if bb[:2] == b"BM":
                    _, _, c, arr = parse_bmp(bb)
                elif bb[:2] in (b"P6", b"P5"):
                    _, _, c, arr = parse_ppm(bb)
                else:
                    continue
                px = arr.astype(np.float32)
                luma = px.mean(axis=2) if px.ndim == 3 else px
                h, w = luma.shape
                yb = np.linspace(0, h, grid + 1).astype(np.int64)[:-1]
                xb = np.linspace(0, w, grid + 1).astype(np.int64)[:-1]
                cells = np.add.reduceat(
                    np.add.reduceat(luma, yb, axis=0), xb, axis=1
                )
                ylen = np.diff(np.append(yb, h)).astype(np.float32)
                xlen = np.diff(np.append(xb, w)).astype(np.float32)
                cells = cells / np.outer(ylen, xlen)
                bits = (cells >= cells.mean()).flatten()
                v = int.from_bytes(np.packbits(bits).tobytes(), "big")
                refs.append(ref)
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": refs, "ahash": hashes})

    return decoded.select("media_ref", "payload").mapInPandas(ah, AHASH_SCHEMA)


def resize_images(
    decoded: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Resize stage over decoded rows: decodable image payloads
    (netpbm/BMP) are REALLY resized by exact box averaging — each
    output pixel is the mean of its source box, the same reduceat
    reduction :func:`ahash_images` uses per cell, applied per channel
    and rounded half-up — and re-encoded as P6 PPM (the canonical
    post-resize codec, so downstream stages see one format).
    Non-image and stub-codec rows pass through UNCHANGED, schema
    stable, so the stage drops into a mixed-media pipeline between
    decode and feature extraction. n_bytes/width/height/sha are
    recomputed for resized rows. Arrow-batched ``mapInPandas``; per
    image the work is two vectorized reductions."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for idx, b in zip(pdf.index, pdf["payload"]):
                bb = bytes(b)
                if bb[:2] == b"BM":
                    _, _, _, arr = parse_bmp(bb)
                elif bb[:2] in (b"P6", b"P5"):
                    _, _, _, arr = parse_ppm(bb)
                else:
                    continue
                px = arr.astype(np.float64)
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, c = px.shape
                yb = np.linspace(0, h, out_h + 1).astype(np.int64)[:-1]
                xb = np.linspace(0, w, out_w + 1).astype(np.int64)[:-1]
                cells = np.add.reduceat(
                    np.add.reduceat(px, yb, axis=0), xb, axis=1
                )
                ylen = np.diff(np.append(yb, h)).astype(np.float64)
                xlen = np.diff(np.append(xb, w)).astype(np.float64)
                cells = cells / np.outer(ylen, xlen)[:, :, None]
                small = np.clip(np.floor(cells + 0.5), 0, 255).astype(
                    np.uint8
                )
                if c == 1:
                    small = np.repeat(small, 3, axis=2)
                nb = encode_ppm(small)
                out.at[idx, "payload"] = nb
                out.at[idx, "n_bytes"] = len(nb)
                out.at[idx, "width"] = out_w
                out.at[idx, "height"] = out_h
                out.at[idx, "sha"] = hashlib.sha256(nb).hexdigest()
            yield out

    return decoded.mapInPandas(rs, MEDIA_META_SCHEMA)


def image_near_dups(decoded: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash signatures paired
    by the pigeonhole chunk join (max_hamming+1 slices), exact JVM
    popcount verify — same scale shape as the text simhash path."""
    from tspider_spark.operators.textdedup import hamming_pairs

    return hamming_pairs(
        ahash_images(decoded), sig_col="ahash", id_col="media_ref",
        bits=64, max_hamming=max_hamming,
    )


DHASH_SCHEMA = "media_ref string, dhash long"


def dhash_images(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Difference-hash (dHash) each decodable image row: luma ->
    grid x (grid+1) cell means -> bit = right cell > left cell ->
    packed signed 64-bit. The GRADIENT-sign complement of
    :func:`ahash_images`'s global-mean threshold: aHash is blind to
    brightness/contrast shifts but confused by vignettes; dHash keys
    on local structure, so the pair covers each other's failure
    modes — the standard perceptual-hash family pairing. Same Arrow
    batch shape and codec handling as aHash; non-image rows drop."""

    def dh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, hashes = [], []
            for ref, b in zip(pdf["media_ref"], pdf["payload"]):
                bb = bytes(b)
                if bb[:2] == b"BM":
                    _, _, c, arr = parse_bmp(bb)
                elif bb[:2] in (b"P6", b"P5"):
                    _, _, c, arr = parse_ppm(bb)
                else:
                    continue
                px = arr.astype(np.float32)
                luma = px.mean(axis=2) if px.ndim == 3 else px
                h, w = luma.shape
                yb = np.linspace(0, h, grid + 1).astype(np.int64)[:-1]
                xb = np.linspace(0, w, grid + 2).astype(np.int64)[:-1]
                cells = np.add.reduceat(
                    np.add.reduceat(luma, yb, axis=0), xb, axis=1
                )
                ylen = np.diff(np.append(yb, h)).astype(np.float32)
                xlen = np.diff(np.append(xb, w)).astype(np.float32)
                cells = cells / np.outer(ylen, xlen)
                bits = (cells[:, 1:] > cells[:, :-1]).flatten()
                v = int.from_bytes(np.packbits(bits).tobytes(), "big")
                refs.append(ref)
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": refs, "dhash": hashes})

    return decoded.select("media_ref", "payload").mapInPandas(dh, DHASH_SCHEMA)


def image_dhash_dups(decoded: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Gradient-hash near-duplicate image pairs: dHash signatures
    through the same pigeonhole chunk join + exact JVM popcount
    verify as :func:`image_near_dups`."""
    from tspider_spark.operators.textdedup import hamming_pairs

    return hamming_pairs(
        dhash_images(decoded), sig_col="dhash", id_col="media_ref",
        bits=64, max_hamming=max_hamming,
    )


def media_dedup_exact(decoded: DataFrame) -> DataFrame:
    """Exact payload dedupe across the media table: group on the
    decode stage's sha256, keep the lexicographically-first ref
    (deterministic), report the copy count. min/count partial-aggs —
    one shuffle on sha, map-side combined."""
    return (
        decoded.groupBy("sha")
        .agg(
            F.min("media_ref").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def perturb_images(decoded: DataFrame, n_flips: int = 3, suffix: str = "#v") -> DataFrame:
    """Near-duplicate test doubles: re-emit each decodable image with
    ``n_flips`` deterministic pixel inversions (ref-seeded positions)
    re-encoded in the SAME codec, ref suffixed. Ground truth for the
    perceptual pipeline: each (ref, ref+suffix) pair is a near-dup."""

    def pert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, kinds, payloads = [], [], []
            for ref, kind, b in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                bb = bytes(b)
                if bb[:2] == b"BM":
                    _, _, c, arr = parse_bmp(bb)
                elif bb[:2] in (b"P6", b"P5"):
                    _, _, c, arr = parse_ppm(bb)
                else:
                    continue
                seed = int.from_bytes(
                    hashlib.blake2b(str(ref).encode(), digest_size=4).digest(),
                    "little",
                )
                rng = np.random.RandomState(seed ^ 0x5EED)
                out = arr.copy()
                h, w = out.shape[0], out.shape[1]
                ys = rng.randint(0, h, n_flips)
                xs = rng.randint(0, w, n_flips)
                out[ys, xs] = 255 - out[ys, xs]
                refs.append(str(ref) + suffix)
                kinds.append(kind)
                payloads.append(
                    encode_bmp(out) if bb[:2] == b"BM" else encode_ppm(out)
                )
            yield pd.DataFrame(
                {"media_ref": refs, "kind": kinds, "payload": payloads}
            )

    return decoded.select("media_ref", "kind", "payload").mapInPandas(
        pert, f"media_ref string, kind string, payload binary"
    )


# ---------------------------------------------------------------------------
# Perceptual audio fingerprints over the REAL WAV decoder: mean-|x|
# energy per time window -> threshold at the clip mean -> 64 bits.
# Same pairing machinery as images (generic bounded-hamming join).


AUDIO_FP_SCHEMA = "media_ref string, afp long"


def audio_fingerprints(decoded: DataFrame, n_windows: int = 64) -> DataFrame:
    """Energy-profile fingerprint of each decodable audio row (RIFF
    PCM16): mono mixdown -> ``n_windows`` window mean-|amplitude|s
    (np.add.reduceat) -> bit = window energy >= clip mean -> packed
    signed 64-bit. Robust to low-amplitude noise (the near-dup
    invariance the pairing relies on); non-audio rows dropped."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, fps = [], []
            for ref, b in zip(pdf["media_ref"], pdf["payload"]):
                bb = bytes(b)
                if bb[:4] != b"RIFF":
                    continue
                try:
                    _, _, samples = parse_wav(bb)
                except ValueError:
                    continue
                x = np.abs(samples.astype(np.float32)).mean(axis=1)
                wb = np.linspace(0, len(x), n_windows + 1).astype(np.int64)[:-1]
                e = np.add.reduceat(x, wb)
                e = e / np.diff(np.append(wb, len(x))).astype(np.float32)
                bits = e >= e.mean()
                v = int.from_bytes(np.packbits(bits).tobytes(), "big")
                refs.append(ref)
                fps.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": refs, "afp": fps})

    return decoded.select("media_ref", "payload").mapInPandas(fp, AUDIO_FP_SCHEMA)


def audio_near_dups(decoded: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate audio pairs by bounded hamming distance over the
    energy fingerprints — pigeonhole chunk join + popcount verify."""
    from tspider_spark.operators.textdedup import hamming_pairs

    return hamming_pairs(
        audio_fingerprints(decoded), sig_col="afp", id_col="media_ref",
        bits=64, max_hamming=max_hamming,
    )


def perturb_audio(
    decoded: DataFrame, amp: int = 32, suffix: str = "#v"
) -> DataFrame:
    """Near-duplicate audio test doubles: each decodable clip re-
    emitted with ref-seeded uniform noise in [-amp, amp] (~0.1% of
    int16 range by default) added to every sample, re-encoded at the
    same rate/channel count, ref suffixed."""

    def pert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, kinds, payloads = [], [], []
            for ref, kind, b in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                bb = bytes(b)
                if bb[:4] != b"RIFF":
                    continue
                rate, _, samples = parse_wav(bb)
                seed = int.from_bytes(
                    hashlib.blake2b(str(ref).encode(), digest_size=4).digest(),
                    "little",
                )
                rng = np.random.RandomState(seed ^ 0xA0D10)
                noise = rng.randint(-amp, amp + 1, samples.shape)
                out = np.clip(
                    samples.astype(np.int32) + noise, -(2**15), 2**15 - 1
                ).astype(np.int16)
                refs.append(str(ref) + suffix)
                kinds.append(kind)
                payloads.append(encode_wav(out, sample_rate=rate))
            yield pd.DataFrame(
                {"media_ref": refs, "kind": kinds, "payload": payloads}
            )

    return decoded.select("media_ref", "kind", "payload").mapInPandas(
        pert, "media_ref string, kind string, payload binary"
    )


def sniff_media_format(
    decoded: DataFrame, ref_col: str = "media_ref"
) -> DataFrame:
    """Decode-free container sniffing over the payload's MAGIC BYTES —
    the crawl-side data-quality gate that catches extension lies
    (.png serving HTML, .jpg serving an executable) without ever
    decoding: pure JVM ``substring`` over the binary column, so at
    100 TB it runs at scan speed with zero Python and zero codec
    work. The sniffed container vs the ref-declared kind is the
    mismatch signal downstream filters act on.

    Recognized magics (the repo's real codecs): ``BM`` -> bmp,
    ``P6``/``P5`` -> netpbm, ``RIFF`` -> wav; everything else ->
    opaque. Binary-to-string casts are UTF-8; all magic literals are
    ASCII, and invalid-UTF-8 prefixes simply compare unequal.

    Returns (ref_col, kind, sniffed_format) — kind is the
    ref-extension declaration carried by the decode stage.
    """
    h2 = F.expr("cast(substring(payload, 1, 2) as string)")
    h4 = F.expr("cast(substring(payload, 1, 4) as string)")
    sniff = (
        F.when(h2 == "BM", "bmp")
        .when(h2.isin("P6", "P5"), "netpbm")
        .when(h4 == "RIFF", "wav")
        .otherwise("opaque")
    )
    return decoded.select(
        F.col(ref_col), F.col("kind"), sniff.alias("sniffed_format")
    )
