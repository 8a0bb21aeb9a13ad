"""Multimodal plumbing: binary payload columns, mapInPandas decode /
feature / frame-sample stages (stubbed codecs, real Spark contract)."""

from __future__ import annotations

import pytest

from tspider_spark.operators.multimodal import (
    attach_fake_payload,
    decode_media,
    extract_features,
    frame_sample,
    media_refs_from_documents,
)
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


@pytest.fixture(scope="module")
def media_df(spark):
    refs = [
        ("http://cdn.a.com/img/1.jpg",),
        ("http://cdn.a.com/img/2.png",),
        ("http://cdn.a.com/vid/1.mp4",),
        ("http://cdn.a.com/snd/1.mp3",),
        ("http://cdn.a.com/other/file.bin",),
    ]
    return attach_fake_payload(
        spark.createDataFrame(refs, "media_ref string")
    )


def test_payload_and_kind(media_df):
    rows = {r["media_ref"]: r for r in media_df.collect()}
    assert rows["http://cdn.a.com/img/1.jpg"]["kind"] == "image"
    assert rows["http://cdn.a.com/vid/1.mp4"]["kind"] == "video"
    assert rows["http://cdn.a.com/snd/1.mp3"]["kind"] == "audio"
    assert rows["http://cdn.a.com/other/file.bin"]["kind"] == "other"
    assert all(len(r["payload"]) == 128 for r in rows.values())


def test_decode_schema_and_determinism(spark, media_df):
    a = {r["media_ref"]: r for r in decode_media(media_df).collect()}
    b = {r["media_ref"]: r for r in decode_media(media_df).collect()}
    for k in a:
        assert (a[k]["width"], a[k]["height"], a[k]["n_frames"], a[k]["sha"]) == (
            b[k]["width"], b[k]["height"], b[k]["n_frames"], b[k]["sha"]
        )
        assert a[k]["width"] % 16 == 0 and a[k]["n_bytes"] == 128
    video = a["http://cdn.a.com/vid/1.mp4"]
    image = a["http://cdn.a.com/img/1.jpg"]
    assert video["n_frames"] >= 1 and image["n_frames"] == 1


def test_real_decoder_is_gated(media_df):
    with pytest.raises(NotImplementedError):
        decode_media(media_df, real_decoder=True).collect()


def test_features_and_frames(spark, media_df):
    decoded = decode_media(media_df)
    feats = extract_features(decoded, dim=8).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    frames = frame_sample(decoded, every_n=16).collect()
    assert all(r["frame_idx"] % 16 == 0 for r in frames)


def test_media_refs_from_corpus(spark):
    docs, _ = generate_corpus(CorpusSpec(seed=3, n_domains=2))
    refs = media_refs_from_documents(corpus_to_spark(spark, docs))
    assert refs.count() > 0
    assert all(".jpg" in r["media_ref"] for r in refs.collect())


def test_ppm_roundtrip_exact():
    import numpy as np

    from tspider_spark.operators.multimodal import encode_ppm, parse_ppm

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 21, 3), dtype=np.uint8)
    w, h, c, back = parse_ppm(encode_ppm(img))
    assert (w, h, c) == (21, 13, 3)
    assert (back == img).all()
    gray = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    w, h, c, back = parse_ppm(encode_ppm(gray))
    assert (w, h, c) == (9, 5, 1)
    assert (back == gray).all()
    # netpbm comments + arbitrary header whitespace
    hdr = b"P6\n# a comment\n 4\t2 # inline-ish\n255\n" + bytes(range(24))
    w, h, c, arr = parse_ppm(hdr)
    assert (w, h, c) == (4, 2, 3) and arr.shape == (2, 4, 3)


def test_real_ppm_decode_through_spark(spark):
    import numpy as np

    from tspider_spark.operators.multimodal import (
        attach_ppm_payload,
        decode_media,
        encode_ppm,
        extract_features,
        parse_ppm,
    )

    refs = spark.createDataFrame(
        [("http://img0.com/a.png",), ("http://img1.com/b.jpg",),
         ("http://v.com/c.mp4",)],
        "media_ref string",
    )
    decoded = decode_media(attach_ppm_payload(refs))
    rows = {r["media_ref"]: r for r in decoded.collect()}
    for ref in ("http://img0.com/a.png", "http://img1.com/b.jpg"):
        r = rows[ref]
        w, h, c, arr = parse_ppm(bytes(r["payload"]))
        assert (r["width"], r["height"]) == (w, h)  # header-exact
        assert r["n_bytes"] == len(bytes(r["payload"]))
    assert rows["http://v.com/c.mp4"]["kind"] == "video"

    feats = {r["media_ref"]: r["feature"] for r in extract_features(decoded).collect()}
    for ref in ("http://img0.com/a.png",):
        _, _, _, arr = parse_ppm(bytes(rows[ref]["payload"]))
        expected_mean = arr.reshape(-1, 3).astype(np.float32).mean(axis=0) / 255.0
        got = np.array(feats[ref][:3])
        assert np.allclose(got, expected_mean, atol=1e-5)  # pixel-exact features


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from tspider_spark.operators.multimodal import encode_wav, parse_wav

    mono = np.arange(-500, 500, dtype=np.int16)
    rate, ch, back = parse_wav(encode_wav(mono, 22050))
    assert (rate, ch) == (22050, 1)
    assert np.array_equal(back[:, 0], mono)

    stereo = np.stack([mono, mono[::-1]], axis=1)
    rate, ch, back = parse_wav(encode_wav(stereo, 8000))
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(back, stereo)

    # unknown odd-sized chunk between fmt and data is skipped, padded
    b = encode_wav(mono[:8], 16000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    patched = b[:fmt_end] + extra + b[fmt_end:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, ch, back = parse_wav(patched)
    assert rate == 16000 and np.array_equal(back[:, 0], mono[:8])


def test_real_wav_decode_through_spark(spark):
    import numpy as np

    from tspider_spark.operators.multimodal import (
        attach_media_payload,
        decode_media,
        extract_features,
        parse_wav,
    )

    refs = spark.createDataFrame(
        [("http://a.com/x.wav",), ("http://a.com/y.mp3",),
         ("http://img0.com/a.png",)],
        "media_ref string",
    )
    decoded = decode_media(attach_media_payload(refs))
    rows = {r["media_ref"]: r for r in decoded.collect()}
    for ref in ("http://a.com/x.wav", "http://a.com/y.mp3"):
        r = rows[ref]
        assert r["kind"] == "audio"
        rate, ch, samples = parse_wav(bytes(r["payload"]))
        # width/height carry samples-per-channel / channel count
        assert r["width"] == samples.shape[0] and r["height"] == ch
        assert ch in (1, 2) and rate in (8000, 16000, 24000)

    feats = {r["media_ref"]: np.array(r["feature"])
             for r in extract_features(decoded).collect()}
    for ref in ("http://a.com/x.wav",):
        _, _, samples = parse_wav(bytes(rows[ref]["payload"]))
        x = samples.astype(np.float32).mean(axis=1) / 32768.0
        assert np.allclose(feats[ref][1], np.sqrt(np.mean(x * x)), atol=1e-5)
        assert np.isfinite(feats[ref]).all()


def test_bmp_roundtrip_padding_and_topdown():
    import struct

    import numpy as np

    from tspider_spark.operators.multimodal import encode_bmp, parse_bmp

    rng = np.random.RandomState(3)
    # w=3 -> 9-byte rows padded to 12: exercises the stride math
    img = rng.randint(0, 256, (5, 3, 3), dtype=np.uint8)
    w, h, c, back = parse_bmp(encode_bmp(img))
    assert (w, h, c) == (3, 5, 3) and (back == img).all()
    # gray input replicates channels
    gray = rng.randint(0, 256, (4, 6), dtype=np.uint8)
    w, h, c, back = parse_bmp(encode_bmp(gray))
    assert (back[:, :, 0] == gray).all() and (back[:, :, 1] == gray).all()
    # top-down variant (negative height) parses to the same raster
    b = bytearray(encode_bmp(img))
    rows = bytes(b[54:])
    stride = 12
    flipped = b"".join(
        rows[i * stride:(i + 1) * stride] for i in range(4, -1, -1)
    )
    b[18:26] = struct.pack("<ii", 3, -5)
    td = bytes(b[:54]) + flipped
    w, h, c, back = parse_bmp(td)
    assert (back == img).all()


def test_bmp_decode_and_codec_invariant_features(spark):
    import numpy as np

    from tspider_spark.operators.multimodal import (
        attach_media_payload,
        decode_media,
        extract_features,
        parse_bmp,
    )

    refs = spark.createDataFrame(
        [("http://img0.com/pic.bmp",), ("http://img0.com/pic.png",)],
        "media_ref string",
    )
    decoded = decode_media(attach_media_payload(refs))
    rows = {r["media_ref"]: r for r in decoded.collect()}
    r = rows["http://img0.com/pic.bmp"]
    w, h, _, _ = parse_bmp(bytes(r["payload"]))
    assert (r["width"], r["height"]) == (w, h)
    # features must come off the REAL raster: check the bmp features
    # against a direct recompute from the parsed pixels
    feats = {r["media_ref"]: np.array(r["feature"])
             for r in extract_features(decoded).collect()}
    _, _, _, arr = parse_bmp(bytes(r["payload"]))
    expected_mean = arr.reshape(-1, 3).astype(np.float32).mean(axis=0) / 255.0
    assert np.allclose(feats["http://img0.com/pic.bmp"][:3], expected_mean,
                       atol=1e-5)


def test_ahash_codec_independent(spark):
    """The same raster encoded as netpbm and as BMP must produce the
    SAME perceptual hash — aHash is a function of decoded pixels, not
    container bytes."""
    import numpy as np

    from tspider_spark.operators.multimodal import (
        ahash_images, encode_bmp, encode_ppm,
    )

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (19, 13, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("a.ppm", bytearray(encode_ppm(arr))),
         ("a.bmp", bytearray(encode_bmp(arr)))],
        "media_ref string, payload binary",
    )
    got = {r["media_ref"]: r["ahash"] for r in ahash_images(df).collect()}
    assert got["a.ppm"] == got["a.bmp"]


def test_image_near_dups_recovers_variants(spark):
    """End to end over REAL decode: every image pairs with its
    3-pixel-flip re-encoded variant within hamming 8, and no pair
    forms between distinct random images; exact dedupe collapses
    byte-identical copies to the lexicographic keeper."""
    from pyspark.sql import functions as F
    from tspider_spark.operators.multimodal import (
        attach_media_payload, decode_media, image_near_dups,
        media_dedup_exact, perturb_images,
    )

    refs = [(f"http://img.site/{i}.png",) for i in range(8)] + \
           [(f"http://img.site/{i}.bmp",) for i in range(8, 16)]
    dec = decode_media(
        attach_media_payload(spark.createDataFrame(refs, "media_ref string"))
    )
    alld = dec.unionByName(decode_media(perturb_images(dec)))
    got = {(r["ia"], r["ib"]) for r in image_near_dups(alld, 8).collect()}
    assert got == {(r[0], r[0] + "#v") for r in refs}

    copies = dec.withColumn("media_ref", F.concat("media_ref", F.lit("#c")))
    groups = media_dedup_exact(dec.unionByName(copies)).collect()
    assert len(groups) == 16
    assert all(r["n_copies"] == 2 and "#c" not in r["keeper"] for r in groups)


def test_audio_near_dups_recovers_variants(spark):
    """Energy fingerprints over REAL WAV decode: every clip pairs with
    its noise-added re-encoded variant, no cross pairs; the
    fingerprint is a pure function of decoded samples."""
    from tspider_spark.operators.multimodal import (
        attach_media_payload, audio_fingerprints, audio_near_dups,
        decode_media, perturb_audio,
    )

    refs = [(f"http://aud.site/{i}.wav",) for i in range(12)]
    dec = decode_media(
        attach_media_payload(spark.createDataFrame(refs, "media_ref string"))
    )
    alld = dec.unionByName(decode_media(perturb_audio(dec)))
    got = {(r["ia"], r["ib"]) for r in audio_near_dups(alld, 8).collect()}
    assert got == {(r[0], r[0] + "#v") for r in refs}
    # image/stub rows are dropped, audio rows all fingerprinted
    assert audio_fingerprints(alld).count() == 24


def test_resize_images_box_average_exact(spark):
    import numpy as np

    from tspider_spark.operators.multimodal import (
        decode_media,
        encode_ppm,
        encode_wav,
        parse_ppm,
        resize_images,
    )

    # 4x4 image with constant 2x2 quadrants -> 2x2 box average is the
    # quadrant values verbatim
    q = np.zeros((4, 4, 3), np.uint8)
    q[:2, :2] = (10, 20, 30)
    q[:2, 2:] = (40, 50, 60)
    q[2:, :2] = (70, 80, 90)
    q[2:, 2:] = (200, 210, 220)
    wav = encode_wav(np.zeros((8, 1), np.int16))
    df = spark.createDataFrame(
        [("http://i.com/a.png", "image", bytearray(encode_ppm(q))),
         ("http://a.com/s.wav", "audio", bytearray(wav))],
        "media_ref string, kind string, payload binary",
    )
    out = {r["media_ref"]: r
           for r in resize_images(decode_media(df), 2, 2).collect()}
    r = out["http://i.com/a.png"]
    assert (r["width"], r["height"]) == (2, 2)
    w, h, c, arr = parse_ppm(bytes(r["payload"]))
    assert (w, h) == (2, 2)
    assert arr[0, 0].tolist() == [10, 20, 30]
    assert arr[0, 1].tolist() == [40, 50, 60]
    assert arr[1, 0].tolist() == [70, 80, 90]
    assert arr[1, 1].tolist() == [200, 210, 220]
    assert r["n_bytes"] == len(bytes(r["payload"]))
    # non-image rows pass through untouched
    a = out["http://a.com/s.wav"]
    assert bytes(a["payload"]) == wav and a["width"] == 8


def test_resize_feeds_feature_stage(spark):
    import numpy as np

    from tspider_spark.operators.multimodal import (
        attach_media_payload,
        decode_media,
        extract_features,
        media_refs_from_documents,
        resize_images,
    )

    refs = spark.createDataFrame(
        [("http://img0.com/a.png",), ("http://img1.com/b.bmp",)],
        "media_ref string",
    )
    decoded = decode_media(attach_media_payload(refs))
    small = resize_images(decoded, 8, 8)
    rows = {r["media_ref"]: r for r in small.collect()}
    assert all((r["width"], r["height"]) == (8, 8) for r in rows.values())
    feats = extract_features(small).collect()
    assert len(feats) == 2 and all(len(r["feature"]) == 16 for r in feats)


def test_dhash_brightness_invariant_ahash_is_not(spark):
    """dHash keys on local gradients, so a uniform brightness shift
    leaves it bit-identical — the failure mode it covers for aHash."""
    import numpy as np

    from tspider_spark.operators.multimodal import (
        ahash_images, dhash_images, encode_ppm,
    )

    rng = np.random.RandomState(11)
    arr = rng.randint(40, 180, (24, 17, 3), dtype=np.uint8)
    brighter = (arr.astype(np.int64) + 60).clip(0, 255).astype(np.uint8)
    df = spark.createDataFrame(
        [("x.ppm", bytearray(encode_ppm(arr))),
         ("y.ppm", bytearray(encode_ppm(brighter)))],
        "media_ref string, payload binary",
    )
    dh = {r["media_ref"]: r["dhash"] for r in dhash_images(df).collect()}
    assert dh["x.ppm"] == dh["y.ppm"]
    # sanity: the codec-independence property holds for dHash too
    from tspider_spark.operators.multimodal import encode_bmp

    df2 = spark.createDataFrame(
        [("a.ppm", bytearray(encode_ppm(arr))),
         ("a.bmp", bytearray(encode_bmp(arr)))],
        "media_ref string, payload binary",
    )
    got = {r["media_ref"]: r["dhash"] for r in dhash_images(df2).collect()}
    assert got["a.ppm"] == got["a.bmp"]


def test_image_dhash_dups_recovers_variants(spark):
    from tspider_spark.operators.multimodal import (
        attach_media_payload, decode_media, image_dhash_dups,
        perturb_images,
    )

    refs = [(f"http://img.site/{i}.png",) for i in range(6)] + \
           [(f"http://img.site/{i}.bmp",) for i in range(6, 12)]
    dec = decode_media(
        attach_media_payload(spark.createDataFrame(refs, "media_ref string"))
    )
    alld = dec.unionByName(decode_media(perturb_images(dec)))
    got = {(r["ia"], r["ib"]) for r in image_dhash_dups(alld, 8).collect()}
    assert got == {(r[0], r[0] + "#v") for r in refs}


def test_sniff_media_format_catches_extension_lies(spark):
    """A .png ref served BMP bytes sniffs as bmp; an .mp3 ref served
    WAV sniffs as wav; opaque bytes sniff as opaque — the magic wins
    over the extension every time."""
    import numpy as np

    from tspider_spark.operators.multimodal import (
        encode_bmp, encode_ppm, encode_wav, sniff_media_format,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    wav = encode_wav(rng.randint(-100, 100, (64, 1), dtype=np.int16))
    rows = [
        ("a.png", "image", bytearray(encode_bmp(img))),   # lie: bmp as png
        ("b.png", "image", bytearray(encode_ppm(img))),
        ("c.mp3", "audio", bytearray(wav)),
        ("d.mp4", "video", bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, kind string, payload binary"
    )
    got = {r["media_ref"]: r["sniffed_format"]
           for r in sniff_media_format(df).collect()}
    assert got == {"a.png": "bmp", "b.png": "netpbm",
                   "c.mp3": "wav", "d.mp4": "opaque"}
