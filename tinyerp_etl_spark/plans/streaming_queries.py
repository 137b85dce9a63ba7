"""Batch twins of the streaming windowed aggregations + multimodal.

Every streaming aggregation in streaming/stream_pipeline.py has a
batch-mode twin here (same expressions, same results on the same data)
so the windowed semantics are under the DuckDB differential gate; the
streaming tests then assert stream-vs-batch equivalence, closing the
loop stream ≡ batch ≡ oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.multimodal import pack_media
from tinyerp_etl_spark.sources.catalog import load_table
from tinyerp_etl_spark.streaming.stream_pipeline import tumbling_counts
from tinyerp_etl_spark.functions.localdf import local_df
from tinyerp_etl_spark.functions.materialize import sort_after_pin


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts (batch twin of the stream agg)."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev, "1 hour").orderBy("window_start", "event_type")


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows advancing every 30 minutes."""
    ev = load_table(spark, sf_dir, "events")
    value_cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(value_cents) / 100.0).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute-gap session windows per user (gaps-and-islands twin).

    Sessions only make sense per user at low volume, so restrict to
    user_id < 50 to keep sessions non-trivial at every SF.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        ev.groupBy(
            F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def events_time_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup in ONE pass.

    GROUPING SETS over (hour), (day), (month) buckets — the continuous-
    aggregate ladder a time-series store maintains, computed with one
    scan + one expanded aggregation instead of three queries. gid
    encodes the grain (0=hour, 1=day, 2=month) engine-portably.
    """
    from tinyerp_etl_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH e AS (
          SELECT date_trunc('hour', ts)  AS bucket_hour,
                 date_trunc('day', ts)   AS bucket_day,
                 date_trunc('month', ts) AS bucket_month,
                 CAST(round(value * 100) AS BIGINT) AS value_cents
          FROM events
        )
        SELECT bucket_hour, bucket_day, bucket_month,
               CASE WHEN bucket_hour IS NOT NULL THEN 0
                    WHEN bucket_day IS NOT NULL THEN 1
                    ELSE 2 END AS gid,
               count(*) AS n_events,
               CAST(sum(value_cents) / 100.0 AS DOUBLE) AS sum_value
        FROM e
        GROUP BY GROUPING SETS ((bucket_hour), (bucket_day), (bucket_month))
        ORDER BY gid, bucket_hour, bucket_day, bucket_month
        """
    )


def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media manifest over documents-as-payloads.

    The multimodal ingest path: payload → opaque binary + typed
    metadata, with all manifest fields computed without parsing the
    payload (operators/multimodal.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    media = pack_media(docs, "doc_id", "text", "text/plain")
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("media_id")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan per media payload (every 10th frame).

    Metadata-only arithmetic — frame counts derive from payload size,
    no decode. The mapInPandas decode stage itself is covered by
    tests/test_multimodal.py (its fake-codec output isn't
    SQL-expressible; the PLAN is).
    """
    from tinyerp_etl_spark.operators.multimodal import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    media = pack_media(docs, "doc_id", "text", "text/plain")
    return (
        frame_sample_plan(media, every_nth=10)
        .groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled_frames"),
            F.max("frame_index").alias("last_frame_index"),
        )
        .orderBy("media_id")
    )


STREAMING_ORACLES: dict[str, str] = {
    # stream and batch faces must agree pair-for-pair: the oracle is
    # the batch interval join with both membership flags TRUE
    "attribution_lambda_parity": """
        WITH v AS (
          SELECT user_id AS v_user, event_id AS view_id, ts AS view_ts
          FROM events WHERE event_type = 'view'
        ),
        p AS (
          SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'
        )
        SELECT v_user AS user_id, view_id, purchase_id,
               CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT)
                 AS latency_us,
               TRUE AS in_batch, TRUE AS in_stream
        FROM v JOIN p
          ON v_user = p_user
         AND purchase_ts > view_ts
         AND purchase_ts <= view_ts + INTERVAL 1 HOUR
        ORDER BY view_id, purchase_id
    """,
    "events_time_grain_rollup": """
        WITH e AS (
          SELECT date_trunc('hour', ts)  AS bucket_hour,
                 date_trunc('day', ts)   AS bucket_day,
                 date_trunc('month', ts) AS bucket_month,
                 CAST(round(value * 100) AS BIGINT) AS value_cents
          FROM events
        )
        SELECT bucket_hour, bucket_day, bucket_month,
               CAST(CASE WHEN bucket_hour IS NOT NULL THEN 0
                         WHEN bucket_day IS NOT NULL THEN 1
                         ELSE 2 END AS INT) AS gid,
               count(*) AS n_events,
               CAST(sum(value_cents) / 100.0 AS DOUBLE) AS sum_value
        FROM e
        GROUP BY GROUPING SETS ((bucket_hour), (bucket_day), (bucket_month))
        ORDER BY gid, bucket_hour, bucket_day, bucket_month
    """,
    # n_frames = floor(bytes/1024)+1; sampled = indices 0,10,... < n_frames
    "multimodal_frame_sample": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CAST(octet_length(encode(text)) // 1024 AS INT) + 1 AS n_frames
          FROM documents
        )
        SELECT media_id,
               CAST((n_frames - 1) // 10 + 1 AS BIGINT) AS n_sampled_frames,
               CAST(((n_frames - 1) // 10) * 10 AS INT) AS last_frame_index
        FROM m
        ORDER BY media_id
    """,
    "events_tumbling_hourly": """
        SELECT
          date_trunc('hour', ts) AS window_start,
          event_type,
          count(*) AS n_events,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    # each event belongs to exactly two 1h/30m sliding windows: the one
    # starting at its 30-minute bucket and the one 30 minutes earlier
    "events_sliding_windows": """
        WITH starts AS (
          SELECT event_type, value,
                 unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                         time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
                        ]) AS window_start
          FROM events
        )
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_value
        FROM starts
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    # gaps-and-islands: a new session starts when the gap from the
    # previous event of the same user is > 5 minutes
    "events_session_windows": """
        WITH seq AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 5 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WHERE user_id < 50
        ),
        tagged AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM seq
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM tagged
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "image_dhash_parity": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE -1 END AS BIGINT)
                 AS dhash
        FROM documents
        WHERE doc_id < 64
        ORDER BY media_id
    """,
    "audio_fingerprint_parity": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(CASE WHEN doc_id % 2 = 0
                         THEN 4294967295 ELSE -4294967296 END AS BIGINT)
                 AS afp
        FROM documents
        WHERE doc_id < 64
        ORDER BY media_id
    """,
    # sample k of doc d is bright-first iff (d+k) even -> alternating
    # closed-form dHash per (doc_id + frame_index) parity; 3 samples
    # per container (see mp4_container_parity)
    "mp4_container_parity": """
        WITH k AS (SELECT unnest([0, 1, 2]) AS frame_index)
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(frame_index AS BIGINT) AS frame_index,
               CAST(CASE WHEN (doc_id + frame_index) % 2 = 0
                         THEN -6148914691236517206
                         ELSE 6148914691236517205 END AS BIGINT) AS dhash
        FROM documents CROSS JOIN k
        WHERE doc_id < 24
        ORDER BY media_id, frame_index
    """,
    # keyframe stride: sync candidates are samples {0,2,3,5} (stss
    # [1,3,4,6] 1-based); every_nth=2 over CANDIDATES picks original
    # samples 0 and 3; dHash closed form by (doc_id + k) parity
    "mp4_keyframe_parity": """
        WITH k AS (SELECT unnest([0, 3]) AS frame_index)
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(frame_index AS BIGINT) AS frame_index,
               CAST(CASE WHEN (doc_id + frame_index) % 2 = 0
                         THEN -6148914691236517206
                         ELSE 6148914691236517205 END AS BIGINT) AS dhash
        FROM documents CROSS JOIN k
        WHERE doc_id < 24
        ORDER BY media_id, frame_index
    """,
    # alternating-bits closed forms: 0xAAAA...AA wraps to
    # -6148914691236517206 signed; 0x5555...55 = 6148914691236517205
    "perceptual_checker_parity": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(CASE WHEN doc_id % 2 = 0 THEN -6148914691236517206
                         ELSE 6148914691236517205 END AS BIGINT) AS dhash,
               CAST(CASE WHEN doc_id % 2 = 0 THEN -6148914691236517206
                         ELSE 6148914691236517205 END AS BIGINT) AS afp
        FROM documents
        WHERE doc_id < 64
        ORDER BY media_id
    """,
    # the construction overlaps member frame-sets by id arithmetic
    # (see video_neardup_parity): within each group of 4,
    # (m0,m1)->4 shared, (m0,m2)->2, (m1,m2)->4, m3 disjoint
    "video_neardup_parity": """
        WITH ids AS (
          SELECT CAST(doc_id AS BIGINT) AS id FROM documents WHERE doc_id < 12
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(CASE WHEN a.id % 4 = 0 AND b.id % 4 = 1 THEN 4
                         WHEN a.id % 4 = 0 AND b.id % 4 = 2 THEN 2
                         WHEN a.id % 4 = 1 AND b.id % 4 = 2 THEN 4
                    END AS BIGINT) AS shared_frames
        FROM ids a JOIN ids b
          ON a.id < b.id AND a.id // 4 = b.id // 4
        WHERE (a.id % 4, b.id % 4) IN ((0, 1), (0, 2), (1, 2))
        ORDER BY id_a, id_b
    """,
    "multimodal_manifest": """
        SELECT
          doc_id AS media_id,
          'text/plain' AS mime,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          md5(text) AS checksum
        FROM documents
        ORDER BY media_id
    """,
}


def image_dhash_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing (dHash) under the hash gate.

    Stages one real binary PPM per document (doc_id < 64): even ids
    get a left-to-right brightness gradient, odd ids the reverse.
    dHash compares horizontal neighbors on a 9x8 grid, so the
    increasing image hashes to exactly 0 (no pixel brighter than its
    right neighbor) and the decreasing one to all-ones (-1 as a
    signed long) — closed-form values the DuckDB oracle derives from
    id parity alone. That pins the REAL codec path end-to-end under
    the differential gate: PNM header parse, raster sampling, bit
    packing, two's-complement emission (operators/multimodal.py:
    _dhash64, dhash_media). The banded Hamming near-dup join over
    these hashes is covered by tests/test_multimodal.py.
    """
    from tinyerp_etl_spark.operators.multimodal import dhash_media

    w, h = 18, 8
    inc = bytes([255 * x // (w - 1) for x in range(w)]) * h
    dec = bytes([255 - 255 * x // (w - 1) for x in range(w)]) * h
    head = b"P5\n%d %d\n255\n" % (w, h)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(head + inc))
        .otherwise(F.lit(head + dec))
        .alias("content"),
    )
    return sort_after_pin(dhash_media(media), "media_id")


def audio_fingerprint_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio energy fingerprint under the hash gate (WAV codec twin of
    image_dhash_parity).

    Even doc ids get a WAV whose first half is silence and second half
    a square wave; odd ids the mirror. With 1280 frames the
    half-boundary falls exactly on a window edge, so the 64-bit
    energy-vs-mean fingerprint is closed-form: silence-first =
    0x00000000FFFFFFFF (4294967295), loud-first = 0xFFFFFFFF00000000
    (-4294967296 as a signed long). The oracle derives both from id
    parity, pinning the RIFF chunk walk, integer energy windows, and
    exact cross-multiplied mean comparison end-to-end
    (operators/multimodal.py: _audio_fingerprint64).
    """
    import io
    import struct as _struct
    import wave

    from tinyerp_etl_spark.operators.multimodal import audio_fingerprint_media

    def wav(silence_first: bool) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            quiet = _struct.pack("<h", 0) * 640
            loud = b"".join(
                _struct.pack("<h", 16000 if (i // 10) % 2 else -16000)
                for i in range(640)
            )
            w.writeframes(quiet + loud if silence_first else loud + quiet)
        return buf.getvalue()

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(wav(True)))
        .otherwise(F.lit(wav(False)))
        .alias("content"),
    )
    return sort_after_pin(audio_fingerprint_media(media), "media_id")


def perceptual_checker_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second closed-form pattern for BOTH perceptual codecs (the
    round-4 parity queries pin only the degenerate 0 / all-ones
    hashes; this one pins the alternating-bits values and stresses
    codec edges the first pattern can't reach).

    Image: an odd-width (19x8) PGM checkerboard whose brightness
    alternates per SAMPLED column (period 2 in col//2), with a '#'
    comment line and multi-whitespace in the header — so the dHash's
    neighbor comparisons alternate exactly: even doc ids hash to
    0xAAAA...AA (-6148914691236517206 signed), odd ids to the
    complement 0x5555...55 (6148914691236517205). Pins comment
    parsing, odd-width nearest-neighbor sampling, and full-width bit
    alternation.

    Audio: a 1280-frame WAV (64 windows x 20 frames exactly) whose
    windows alternate square-wave-loud / silent per window: a window
    is louder than the track mean iff it is a loud one, so even doc
    ids fingerprint to the same 0xAAAA...AA and odd ids to
    0x5555...55. Pins the exact window-boundary arithmetic
    (w*n//64 with n a multiple of 64) and per-window alternation.

    One row per doc_id < 64 with BOTH hashes, derived by the DuckDB
    oracle from id parity alone. Reference n/a — beyond-reference.
    """
    import io
    import struct as _struct
    import wave

    from tinyerp_etl_spark.operators.multimodal import (
        audio_fingerprint_media,
        dhash_media,
    )

    w, h = 19, 8
    def checker(bright_first: bool) -> bytes:
        head = b"P5\n# checkerboard parity probe\n%d  %d\n255\n" % (w, h)
        row = bytes(
            255 if ((col // 2) % 2 == 0) == bright_first else 0 for col in range(w)
        )
        return head + row * h

    def altwav(loud_even: bool) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            frames = bytearray()
            for win in range(64):
                loud = (win % 2 == 0) == loud_even
                for i in range(20):
                    v = (16000 if i % 2 else -16000) if loud else 0
                    frames += _struct.pack("<h", v)
            wv.writeframes(bytes(frames))
        return buf.getvalue()

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(checker(True)))
        .otherwise(F.lit(checker(False)))
        .alias("content"),
    )
    audio = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(altwav(True)))
        .otherwise(F.lit(altwav(False)))
        .alias("content"),
    )
    return sort_after_pin(
        dhash_media(media).join(audio_fingerprint_media(audio), "media_id"),
        "media_id",
    )


def mp4_container_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF container sampling under the hash gate.

    Stages one MP4 per document (doc_id < 24), each wrapping three
    checkerboard PGM samples in an UNEVEN chunk layout ([2, 1] — two
    stsc runs, two stco offsets), so the full container walk is load-
    bearing: box nesting, hdlr track selection, stsz sizes, stsc runs,
    stco offsets, byte-range slicing, then the real PNM dHash on each
    sliced sample. Sample k of document d is bright-first iff
    (d + k) is even, so its dHash is the closed-form alternating-bits
    value: 0xAAAA...AA (-6148914691236517206) when (d + k) % 2 == 0,
    else 0x5555...55 (6148914691236517205) — the oracle derives every
    row from (doc_id + frame_index) parity alone. Container walk is
    operators/mp4.py (public ISO/IEC 14496-12 layout); decode of real
    codec bitstreams stays behind the documented seam. Reference n/a.
    """
    from tinyerp_etl_spark.operators.mp4 import build_minimal_mp4, mp4_frame_hashes

    w, h = 19, 8

    def checker(bright_first: bool) -> bytes:
        head = b"P5\n%d %d\n255\n" % (w, h)
        row = bytes(
            255 if ((col // 2) % 2 == 0) == bright_first else 0 for col in range(w)
        )
        return head + row * h

    def mp4_for(parity: int) -> bytes:
        frames = [checker((parity + k) % 2 == 0) for k in range(3)]
        return build_minimal_mp4(frames, chunking=[2, 1])

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 24)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(mp4_for(0)))
        .otherwise(F.lit(mp4_for(1)))
        .alias("content"),
    )
    return sort_after_pin(
        mp4_frame_hashes(media, every_nth=1), "media_id", "frame_index"
    )


def mp4_keyframe_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stss-aware (keyframe) MP4 sampling under the hash gate.

    Stages one MP4 per document (doc_id < 24) wrapping SIX checker
    PGM samples in an uneven [2, 1, 3] chunk layout, with an stss
    sync-sample table marking samples {1, 3, 4, 6} (1-based) as
    keyframes. ``mp4_frame_hashes(every_nth=2)`` must stride over the
    SYNC CANDIDATES — picking original samples 0 and 3 — so the
    closed-form oracle derives exactly two rows per container from
    (doc_id + frame_index) parity. The construction distinguishes all
    three failure modes: striding original indices over sync would
    pick {0, 2}; ignoring stss entirely would pick {0, 2, 4}; and a
    prefix-biased stss parse would mis-slice sample 3 out of the
    middle chunk. Sample k of document d is bright-first iff (d + k)
    is even (same closed form as mp4_container_parity).
    operators/mp4.py stss walk; ISO/IEC 14496-12 public spec.
    Reference n/a.
    """
    from tinyerp_etl_spark.operators.mp4 import build_minimal_mp4, mp4_frame_hashes

    w, h = 19, 8

    def checker(bright_first: bool) -> bytes:
        head = b"P5\n%d %d\n255\n" % (w, h)
        row = bytes(
            255 if ((col // 2) % 2 == 0) == bright_first else 0 for col in range(w)
        )
        return head + row * h

    def mp4_for(parity: int) -> bytes:
        frames = [checker((parity + k) % 2 == 0) for k in range(6)]
        return build_minimal_mp4(
            frames, chunking=[2, 1, 3], sync_samples=[1, 3, 4, 6]
        )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 24)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(mp4_for(0)))
        .otherwise(F.lit(mp4_for(1)))
        .alias("content"),
    )
    return sort_after_pin(
        mp4_frame_hashes(media, every_nth=2), "media_id", "frame_index"
    )


def video_neardup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate detection under the hash gate (the video
    sibling of image_dhash_parity / audio_fingerprint_parity).

    Stages one concatenated-PNM video per document (doc_id < 12) from
    a seed-parameterized frame family: frame(seed) is an 18x8 PGM
    whose row y runs left-to-right increasing iff bit y of the seed is
    set, so its dHash is the closed-form 64-bit value with byte y =
    0x00 (increasing: no pixel brighter than its right neighbor) or
    0xFF — injective in the seed, no two frames collide. Videos are
    grouped in fours (g = doc_id // 4) over disjoint per-group seed
    ranges; within a group the member frame-sets overlap by
    construction: |S0 ∩ S1| = 4, |S0 ∩ S2| = 2, |S1 ∩ S2| = 4, S3
    disjoint. The DuckDB oracle therefore derives every
    (id_a, id_b, shared_frames) row ≥ the threshold from id
    arithmetic alone, pinning the REAL path end-to-end: multi-frame
    PNM header walk, per-frame dHash, per-video distinct, the CAPPED
    frame-hash equi-join, and the shared-frame count
    (operators/multimodal.py: extract_frames, video_frame_hashes,
    video_neardup_pairs). Reference n/a — beyond-reference scope.
    """
    from tinyerp_etl_spark.operators.multimodal import video_neardup_pairs

    def frame(seed: int) -> bytes:
        raster = bytearray()
        for y in range(8):
            inc = (seed >> y) & 1
            for x in range(18):
                v = (255 * x) // 17 if inc else 255 - (255 * x) // 17
                raster.append(v)
        return b"P5\n18 8\n255\n" + bytes(raster)

    member_seeds = {
        0: (0, 1, 2, 3, 4, 5),
        1: (2, 3, 4, 5, 6, 7),
        2: (4, 5, 6, 7, 8, 9),
        3: (10, 11, 12, 13, 14, 15),
    }

    def video(doc_id: int) -> bytes:
        g, m = doc_id // 4, doc_id % 4
        return b"".join(frame(16 * g + s) for s in member_seeds[m])

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 12)
    content = F.lit(video(0))
    for i in range(1, 12):
        content = F.when(F.col("doc_id") == i, F.lit(video(i))).otherwise(content)
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"), content.alias("content")
    )
    return video_neardup_pairs(media, every_nth=1, min_shared_frames=2).orderBy(
        "id_a", "id_b"
    )


def attribution_lambda_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda-architecture collapse, under one gate: the REAL
    watermarked stream-stream attribution join (streaming/
    stream_pipeline.py:attribution_stream_stream_join, drained with
    an availableNow trigger over the staged events parquet) and the
    batch face (plans/etl_queries.py:attribution_interval_join's
    predicate) run over the SAME input, full-outer-compared per
    (user, view, purchase) pair. The oracle is the batch join with
    in_batch = in_stream = true — any divergence (a pair only one
    face produced, or a latency disagreement routing a row into a
    one-sided bucket) breaks the row hash. COVERAGE's stream ≡ batch
    promise, driver-proven rather than pytest-only.
    """
    import shutil
    import tempfile

    from tinyerp_etl_spark.plans.etl_queries import attribution_interval_join
    from tinyerp_etl_spark.streaming.stream_pipeline import (
        attribution_stream_stream_join,
        read_events_stream,
    )

    scratch = tempfile.mkdtemp(prefix="attr_parity_")
    try:
        src = os.path.join(scratch, "in")
        os.makedirs(src)
        shutil.copy(
            f"{sf_dir}/events.parquet", os.path.join(src, "batch0.parquet")
        )
        stream = read_events_stream(spark, src)
        joined = attribution_stream_stream_join(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            horizon="1 hour",
            lateness="30 minutes",
        )
        out = os.path.join(scratch, "out")
        (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        # explicit schema: a zero-pair drain writes metadata but no
        # data files, and a schema-less read would crash rather than
        # yield the empty (but valid) comparison
        streamed_rows = (
            spark.read.schema(joined.schema)
            .parquet(out)
            .select(
                "user_id",
                "view_id",
                "purchase_id",
                (
                    F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
                ).alias("latency_us"),
            )
            .collect()
        )
    finally:
        # the stream result is collected (pair-scale by the horizon
        # bound); nothing lazy reads the scratch sink after this
        shutil.rmtree(scratch, ignore_errors=True)
    streamed = local_df(
        spark,
        streamed_rows,
        "user_id long, view_id long, purchase_id long, latency_us long",
    )

    # the batch face IS the gated batch query — one definition, so the
    # parity gate can never drift against a stale copy of the predicate
    batch = attribution_interval_join(spark, sf_dir)
    keys = ["user_id", "view_id", "purchase_id", "latency_us"]
    return (
        batch.withColumn("in_batch", F.lit(True))
        .join(
            streamed.withColumn("in_stream", F.lit(True)),
            keys,
            "full_outer",
        )
        .select(
            *keys,
            F.coalesce("in_batch", F.lit(False)).alias("in_batch"),
            F.coalesce("in_stream", F.lit(False)).alias("in_stream"),
        )
        .orderBy("view_id", "purchase_id")
    )


STREAMING_QUERIES = {
    "events_time_grain_rollup": events_time_grain_rollup,
    "attribution_lambda_parity": attribution_lambda_parity,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_sliding_windows": events_sliding_windows,
    "events_session_windows": events_session_windows,
    "multimodal_manifest": multimodal_manifest,
    "multimodal_frame_sample": multimodal_frame_sample,
    "image_dhash_parity": image_dhash_parity,
    "audio_fingerprint_parity": audio_fingerprint_parity,
    "video_neardup_parity": video_neardup_parity,
    "perceptual_checker_parity": perceptual_checker_parity,
    "mp4_container_parity": mp4_container_parity,
    "mp4_keyframe_parity": mp4_keyframe_parity,
}
