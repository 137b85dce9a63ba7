"""Multimodal column plumbing: pack, fake-decode, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    pack_media,
)
from tinyerp_etl_spark.sources.catalog import load_table


@pytest.fixture
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return pack_media(docs, "doc_id", "text", "text/plain")


def test_pack_media_schema_and_metadata(spark, media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["content"])
    assert len(row["meta"]["checksum"]) == 32  # md5 hex
    assert isinstance(row["content"], (bytes, bytearray))


def test_fake_decode_deterministic_and_shaped(spark, media):
    out1 = {r["media_id"]: r for r in decode_media(media, mode="fake").collect()}
    out2 = {r["media_id"]: r for r in decode_media(media, mode="fake").collect()}
    assert out1.keys() == out2.keys()
    for mid, r in out1.items():
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert r["n_channels"] in (1, 2, 3)
        assert len(r["feature"]) == 8
        # determinism across runs (same bytes → same pseudo-decode)
        assert r == out2[mid]


def _make_wav(freq_frames: int = 800, rate: int = 8000, channels: int = 1) -> bytes:
    """A real 16-bit PCM WAV via the stdlib wave module: silence in the
    first half, a full-scale square wave in the second."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        half = freq_frames // 2
        frames = b"".join(
            struct.pack("<h", 0) * channels for _ in range(half)
        ) + b"".join(
            struct.pack("<h", 16384 if i % 2 else -16384) * channels
            for i in range(freq_frames - half)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_ppm(width: int = 12, height: int = 8) -> bytes:
    """A real binary PPM: top half black, bottom half white."""
    raster = bytearray()
    for y in range(height):
        v = 0 if y < height // 2 else 255
        raster += bytes([v, v, v]) * width
    return b"P6\n# test image\n%d %d\n255\n" % (width, height) + bytes(raster)


def test_real_decode_wav_and_ppm(spark):
    wav, ppm = _make_wav(), _make_ppm()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(ppm))], "media_id long, content binary"
    )
    got = {r["media_id"]: r for r in decode_media(df, mode="real").collect()}
    # WAV: 800 frames @ 8000 Hz mono; silent first half, loud second
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (800, 8000, 1)
    feat = got[1]["feature"]
    assert all(abs(v) < 1e-6 for v in feat[:4]), feat
    assert all(v > 0.4 for v in feat[4:]), feat
    # PPM: 12x8 RGB; dark top bands, bright bottom bands
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (12, 8, 3)
    feat = got[2]["feature"]
    assert all(v < 0.01 for v in feat[:4]), feat
    assert all(v > 0.99 for v in feat[4:]), feat


def test_real_decode_rejects_unknown_magic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n"))], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="unsupported media magic"):
        decode_media(df, mode="real").collect()


def test_frame_sample_plan_counts(spark, media):
    plan = frame_sample_plan(media, every_nth=10)
    joined = (
        plan.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.max("frame_index").alias("max_idx"))
        .join(
            media.select("media_id", (F.col("meta.n_bytes") / 1024).cast("int").alias("kb")),
            "media_id",
        )
    )
    for r in joined.collect():
        expected = (r["kb"] + 1 + 9) // 10  # ceil((kb+1)/10)
        assert r["n_sampled"] == expected
        assert r["max_idx"] % 10 == 0


def test_resize_media_dims_and_payload(spark, media):
    from tinyerp_etl_spark.operators.multimodal import resize_media

    decoded = decode_media(media)
    staged = decoded.join(media.select("media_id", "content"), "media_id")
    out = resize_media(staged, max_side=16).collect()
    assert len(out) == staged.count()
    for r in out:
        # aspect-preserving fit: bounded, never upscaled, ratio kept
        assert 1 <= r["out_width"] <= max(16, 1)
        assert 1 <= r["out_height"] <= 16
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        if max(r["width"], r["height"]) > 16:
            assert max(r["out_width"], r["out_height"]) == 16
        assert len(r["content"]) >= 1
    # deterministic across runs
    again = resize_media(staged, max_side=16).collect()
    assert sorted((r["media_id"], bytes(r["content"])) for r in out) == sorted(
        (r["media_id"], bytes(r["content"])) for r in again
    )


def test_resize_media_real_pnm_kernel(spark):
    from tinyerp_etl_spark.operators.multimodal import resize_media

    ppm = _make_ppm(width=32, height=16)
    df = spark.createDataFrame(
        [(1, 32, 16, bytearray(ppm))],
        "media_id long, width int, height int, content binary",
    )
    (r,) = resize_media(df, max_side=8, mode="real").collect()
    assert (r["out_width"], r["out_height"]) == (8, 4)
    out = bytes(r["content"])
    # output is a VALID PPM of the new dims with the same structure:
    # dark top half, bright bottom half
    assert out.startswith(b"P6\n8 4\n255\n")
    raster = out[len(b"P6\n8 4\n255\n"):]
    assert len(raster) == 8 * 4 * 3
    top, bottom = raster[: 8 * 2 * 3], raster[8 * 2 * 3 :]
    assert set(top) == {0} and set(bottom) == {255}


def test_extract_frames_real_pnm_video(spark):
    """A 'video' of 12 concatenated PPM frames, sampled every 5th:
    frames 0, 5, 10 come back as standalone valid PPM payloads with
    per-frame content intact (frame i is solid gray level i*20)."""
    from tinyerp_etl_spark.operators.multimodal import extract_frames

    frames = []
    for i in range(12):
        v = i * 20
        raster = bytes([v, v, v]) * (4 * 3)
        frames.append(b"P6\n4 3\n255\n" + raster)
    video = b"".join(frames)
    df = spark.createDataFrame(
        [(7, bytearray(video))], "media_id long, content binary"
    )
    got = {
        r["frame_index"]: r for r in extract_frames(df, every_nth=5).collect()
    }
    assert set(got) == {0, 5, 10}
    for idx, r in got.items():
        assert (r["width"], r["height"]) == (4, 3)
        body = bytes(r["content"])
        assert body == frames[idx]
        level = idx * 20
        assert set(body[len(b"P6\n4 3\n255\n"):]) == {level}


def test_extract_frames_drops_truncated_tail(spark):
    # a payload ending mid-raster must not emit a short final frame
    from tinyerp_etl_spark.operators.multimodal import extract_frames

    full = b"P6\n4 3\n255\n" + bytes([9, 9, 9]) * (4 * 3)
    video = full + full[: len(full) - 7]  # second frame cut mid-raster
    df = spark.createDataFrame(
        [(1, bytearray(video))], "media_id long, content binary"
    )
    rows = extract_frames(df, every_nth=1).collect()
    assert [r["frame_index"] for r in rows] == [0]
    assert bytes(rows[0]["content"]) == full


def test_pil_seam_decodes_png_or_raises_cleanly(spark):
    # compressed formats dispatch to the Pillow seam: real decode when
    # the lib is present, a clear NotImplementedError when it isn't —
    # never a silent wrong answer
    import pytest

    from tinyerp_etl_spark.operators.multimodal import _real_decode

    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        img = Image.new("RGB", (8, 8))
        for y in range(8):
            for x in range(8):
                img.putpixel((x, y), (0, 0, 0) if y < 4 else (255, 255, 255))
        img.save(buf, format="PNG")
        w, h, ch, feat = _real_decode(buf.getvalue())
        assert (w, h, ch) == (8, 8, 3)
        assert feat[0] == 0.0 and feat[7] == 1.0
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            _real_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_extract_frames_drops_mid_header_truncation(spark):
    # a payload cut mid-HEADER must drop the tail, not kill the task
    from tinyerp_etl_spark.operators.multimodal import extract_frames

    full = b"P6\n4 3\n255\n" + bytes([7, 7, 7]) * (4 * 3)
    video = full + b"P6\n4 "  # header write interrupted
    df = spark.createDataFrame(
        [(1, bytearray(video))], "media_id long, content binary"
    )
    rows = extract_frames(df, every_nth=1).collect()
    assert [r["frame_index"] for r in rows] == [0]


def _gradient_ppm(width=36, height=24, flip=False, tweak=()):
    """Deterministic horizontal-gradient P6 image; ``tweak`` is a set
    of pixel indices whose bytes get nudged (small perceptual edit)."""
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (255 * x) // (width - 1)
            if flip:
                v = 255 - v
            raster += bytes([v, v, v])
    for i in tweak:
        for c in range(3):
            raster[i * 3 + c] = min(255, raster[i * 3 + c] + 40)
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(raster)


def test_dhash_stable_under_resize_far_under_inversion(spark):
    from tinyerp_etl_spark.operators.multimodal import (
        _dhash64,
        _resize_pnm,
    )

    base = _gradient_ppm()
    small = _resize_pnm(base, 18, 12)  # same image, half resolution
    inverted = _gradient_ppm(flip=True)

    h_base, h_small, h_inv = _dhash64(base), _dhash64(small), _dhash64(inverted)
    assert bin(h_base ^ h_small).count("1") <= 4  # resize-stable
    assert bin(h_base ^ h_inv).count("1") >= 32  # inversion is far


def test_dhash_neardup_pairs_banded_join(spark):
    from tinyerp_etl_spark.operators.multimodal import (
        dhash_media,
        dhash_neardup_pairs,
        pack_media,
    )

    imgs = [
        (1, _gradient_ppm()),
        (2, _gradient_ppm(tweak={5, 40, 100})),  # tiny edit of 1
        (3, _gradient_ppm(flip=True)),  # perceptually different
        (4, b"RIFFnotanimage!!"),  # non-PNM payload drops out
    ]
    media = pack_media(
        spark.createDataFrame(imgs, "media_id long, content binary"),
        id_col="media_id",
        payload_col="content",
        mime="image/x-portable-pixmap",
    )
    hashes = dhash_media(media)
    got = {r["media_id"] for r in hashes.collect()}
    assert got == {1, 2, 3}

    pairs = dhash_neardup_pairs(hashes, max_hamming=6).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["hamming"] <= 6 for r in pairs)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dhash_neardup_pairs(hashes, max_hamming=8)


def _square_wav(frames=1300, rate=8000, period=20, amp=16000, silence_front=True):
    """16-bit PCM WAV: silence then a square wave (or the reverse)."""
    import io
    import struct as _struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        half = frames // 2
        quiet = b"".join(_struct.pack("<h", 0) for _ in range(half))
        loud = b"".join(
            _struct.pack("<h", amp if (i // (period // 2)) % 2 else -amp)
            for i in range(frames - half)
        )
        w.writeframes(quiet + loud if silence_front else loud + quiet)
    return buf.getvalue()


def test_audio_fingerprint_volume_invariant_and_contour_sensitive(spark):
    from tinyerp_etl_spark.operators.multimodal import _audio_fingerprint64

    a = _square_wav(amp=16000)
    a_quiet = _square_wav(amp=4000)  # same contour, 1/4 volume
    b = _square_wav(silence_front=False)  # mirrored energy contour

    fa, faq, fb = (
        _audio_fingerprint64(a),
        _audio_fingerprint64(a_quiet),
        _audio_fingerprint64(b),
    )
    assert fa == faq  # uniform scaling preserves every comparison
    assert bin(fa ^ fb).count("1") >= 16  # mirrored contour lands far


def test_audio_neardup_pairs_via_generic_banded_join(spark):
    from tinyerp_etl_spark.operators.multimodal import (
        audio_fingerprint_media,
        hash_neardup_pairs,
        pack_media,
    )

    rows = [
        (1, _square_wav(amp=16000)),
        (2, _square_wav(amp=8000)),  # volume-scaled twin of 1
        (3, _square_wav(silence_front=False)),  # different contour
        (4, b"P6\n1 1\n255\nxxx"),  # image payload drops out
    ]
    media = pack_media(
        spark.createDataFrame(rows, "media_id long, content binary"),
        id_col="media_id",
        payload_col="content",
        mime="audio/wav",
    )
    fps = audio_fingerprint_media(media)
    assert {r["media_id"] for r in fps.collect()} == {1, 2, 3}
    pairs = hash_neardup_pairs(fps, "afp", max_hamming=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_video_neardup_pairs_shared_frames(spark):
    from tinyerp_etl_spark.operators.multimodal import video_neardup_pairs

    def frame(seed):
        # 18x8 PGM with a seed-dependent gradient direction per row
        raster = bytearray()
        for y in range(8):
            for x in range(18):
                v = (255 * x) // 17 if (seed >> y) & 1 else 255 - (255 * x) // 17
                raster.append(v)
        return b"P5\n18 8\n255\n" + bytes(raster)

    distinct = [frame(s) for s in (3, 12, 48, 77, 129, 200, 211, 250)]
    vid_a = b"".join(distinct[:6])  # frames 0-5
    vid_b = b"".join(distinct[2:8])  # shares frames 2-5 with A
    vid_c = b"".join(frame(s) for s in (5, 9, 17, 33, 65, 130))  # disjoint
    df = spark.createDataFrame(
        [(1, bytearray(vid_a)), (2, bytearray(vid_b)), (3, bytearray(vid_c))],
        "media_id long, content binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_neardup_pairs(df, every_nth=1, min_shared_frames=2).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 4


def test_hash_neardup_bucket_cap_routes_flood_to_quarantine(spark):
    """A duplicate flood (many identical hashes) must never expand into
    k^2/2 pairs: over-cap buckets quarantine, outputs stay disjoint,
    and distinct near-dups elsewhere are unaffected."""
    from tinyerp_etl_spark.operators.multimodal import hash_neardup_pairs

    flood = [(i, 0x1234567812345678) for i in range(100)]  # identical
    near = [(1000, 0x00FF00FF00FF00FF), (1001, 0x00FF00FF00FF00FE)]  # d=1
    df = spark.createDataFrame(flood + near, "media_id long, h long")

    pairs, quarantined = hash_neardup_pairs(
        df, "h", max_hamming=2, bucket_cap=8, with_quarantine=True
    )
    assert {r["media_id"] for r in quarantined.collect()} == set(range(100))
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1000, 1001)}

    # without the flag: best-effort pairs, still no flood expansion
    best_effort = hash_neardup_pairs(df, "h", max_hamming=2, bucket_cap=8)
    assert {(r["id_a"], r["id_b"]) for r in best_effort.collect()} == {(1000, 1001)}


def test_dhash_rejects_truncated_raster(spark):
    """A truncated payload must raise, not hash to a mostly-zero value
    that clusters every corrupt file as a false near-duplicate."""
    import pytest as _pytest

    from tinyerp_etl_spark.operators.multimodal import _dhash64, dhash_media

    full = _gradient_ppm()
    truncated = full[: len(full) // 2]
    with _pytest.raises(ValueError, match="truncated"):
        _dhash64(truncated)

    # the mapInPandas kernel routes the row through the drop path
    df = spark.createDataFrame(
        [(1, bytearray(full)), (2, bytearray(truncated))],
        "media_id long, content binary",
    )
    assert {r["media_id"] for r in dhash_media(df).collect()} == {1}


def test_wav_zero_channels_routes_to_drop_path(spark):
    """channels=0 in the fmt chunk must raise ValueError (the handled
    drop-path class), not ZeroDivisionError (which would fail the job)."""
    import struct as _struct

    import pytest as _pytest

    from tinyerp_etl_spark.operators.multimodal import (
        _audio_fingerprint64,
        _decode_wav,
        audio_fingerprint_media,
    )

    fmt = _struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)  # channels=0, bits=16
    data = b"\x00\x00" * 200
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body

    with _pytest.raises(ValueError):
        _audio_fingerprint64(wav)
    with _pytest.raises(ValueError):
        _decode_wav(wav)

    good = _square_wav()
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(wav))],
        "media_id long, content binary",
    )
    assert {r["media_id"] for r in audio_fingerprint_media(df).collect()} == {1}


def test_dhash_neardup_pairs_cap_passthrough(spark):
    """The image-level API exposes bucket_cap/with_quarantine: an
    exact-duplicate flood of images quarantines instead of silently
    returning zero pairs with no signal."""
    from tinyerp_etl_spark.operators.multimodal import (
        dhash_media,
        dhash_neardup_pairs,
    )

    flood_img = _gradient_ppm()
    near = _gradient_ppm(tweak={5, 40, 100})
    rows = [(i, bytearray(flood_img)) for i in range(30)]
    rows += [(1000, bytearray(_gradient_ppm(flip=True))), (1001, bytearray(near))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = dhash_media(df)

    pairs, quarantined = dhash_neardup_pairs(
        hashes, max_hamming=6, bucket_cap=8, with_quarantine=True
    )
    q = {r["media_id"] for r in quarantined.collect()}
    assert set(range(30)) <= q
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert all(a not in q and b not in q for a, b in got)


def test_video_neardup_viral_frame_quarantines(spark):
    """A frame hash shared by many videos (the black/blank-frame case)
    must not expand k(k-1)/2 join rows: over-cap hashes quarantine and
    disjoint outputs withhold the quarantined videos' pairs."""
    from tinyerp_etl_spark.operators.multimodal import video_neardup_pairs

    def frame(seed):
        raster = bytearray()
        for y in range(8):
            for x in range(18):
                v = (255 * x) // 17 if (seed >> y) & 1 else 255 - (255 * x) // 17
                raster.append(v)
        return b"P5\n18 8\n255\n" + bytes(raster)

    viral = frame(0)  # shared by every flood video
    distinct = [frame(s) for s in (3, 12, 48, 77, 129, 200, 211, 250)]
    rows = []
    # 20 videos all containing the viral frame + one unique frame
    for i in range(20):
        rows.append((i, bytearray(viral + frame(60 + i))))
    # a genuine near-dup pair sharing two non-viral frames
    rows.append((1000, bytearray(b"".join(distinct[:4]))))
    rows.append((1001, bytearray(b"".join(distinct[2:6]))))
    df = spark.createDataFrame(rows, "media_id long, content binary")

    pairs, quarantined = video_neardup_pairs(
        df, every_nth=1, min_shared_frames=2, bucket_cap=8, with_quarantine=True
    )
    q = {r["media_id"] for r in quarantined.collect()}
    assert q == set(range(20))
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1000, 1001)}

    # without the flag: best-effort, the flood still never expands
    best_effort = video_neardup_pairs(
        df, every_nth=1, min_shared_frames=2, bucket_cap=8
    )
    assert {(r["id_a"], r["id_b"]) for r in best_effort.collect()} == {(1000, 1001)}


def test_jpeg_reencode_preserves_dhash_through_pil_seam(spark):
    """The actual cross-codec dedup claim: a PNM image and its JPEG
    re-encode land within a few Hamming bits of each other, so the
    banded join pairs them. Runs only where Pillow exists (cluster
    images); the gate container skips."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from tinyerp_etl_spark.operators.multimodal import _dhash64

    src = _gradient_ppm(width=36, height=24)
    # PNM -> PIL -> JPEG bytes -> PIL -> PNM bytes (the seam round-trip)
    img = Image.open(io.BytesIO(src))
    buf = io.BytesIO()
    img.convert("RGB").save(buf, format="JPEG", quality=90)
    back = Image.open(io.BytesIO(buf.getvalue())).convert("RGB")
    w, h = back.size
    pnm = b"P6\n%d %d\n255\n" % (w, h) + bytes(
        v for px in back.getdata() for v in px
    )
    assert bin(_dhash64(src) ^ _dhash64(pnm)).count("1") <= 4
