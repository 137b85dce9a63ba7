"""Multimodal column plumbing: binary payloads + typed metadata.

Policy for image/audio/video at 100 TB: the *bytes* are an opaque
``binary`` column (parquet stores them page-compressed; Spark never
interprets them JVM-side), and every derived signal lives in typed
metadata columns so filters/joins prune without touching payloads.
Decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
stages — the only place Python touches data, in columnar batches.

Two decode kernels share one seam:

- ``mode='real'`` — pure-Python codecs for the self-describing
  formats a header parse can handle without native libs: WAV
  (RIFF/fmt/data chunk walk + 16-bit PCM segment RMS) and binary
  PPM/PGM (P6/P5 header + per-band pixel means), dispatched on magic
  bytes. Heavier formats (JPEG/MP4) would plug into the same dispatch
  with PIL/ffmpeg on a real cluster image.
- ``mode='fake'`` — deterministic byte-derived pseudo-decode for any
  payload, used by the correctness-gate queries so their oracles stay
  engine-independent.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def pack_media(
    df: DataFrame, id_col: str, payload_col: str, mime: str
) -> DataFrame:
    """Wrap a binary/string payload column into the media schema.

    Metadata (size, checksum) is computed JVM-side — payload bytes are
    only ever *carried*, never parsed, until an explicit decode stage.
    """
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("checksum"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic pseudo-decode: dims + an 8-dim feature from bytes.

    Stands in for PIL.Image.open / cv2.imdecode so the surrounding
    Spark plumbing is real and testable in this container.
    """
    h = hashlib.sha256(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    feature = [round(b / 255.0, 6) for b in h[3:11]]
    return width, height, channels, feature


def _parse_pnm_header(payload: bytes, start: int = 0) -> tuple[int, int, int, int]:
    """Parse a binary PPM (P6) / PGM (P5) header at offset ``start``.

    Returns (width, height, channels, data_offset) with data_offset
    relative to the payload start. Handles the full format: '#'
    comments and arbitrary whitespace between tokens. The offset form
    lets multi-frame walkers avoid copying the remaining payload per
    frame (an O(n²) trap on long videos).
    """
    if payload[start : start + 2] == b"P6":
        channels = 3
    elif payload[start : start + 2] == b"P5":
        channels = 1
    else:
        raise ValueError("not a binary PPM/PGM payload")
    tokens: list[int] = []
    i = start + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster starts
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return width, height, channels, i


def _decode_pnm(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real PNM decode: dims from the header, feature = mean intensity
    of 8 horizontal bands (a tiny real 'embedding' of the image)."""
    width, height, channels, off = _parse_pnm_header(payload)
    raster = payload[off : off + width * height * channels]
    row_bytes = width * channels
    feature = []
    # proportional band boundaries (floor(b·h/8)) so every row lands in
    # exactly one band — height // 8 sizing would silently drop the
    # trailing rows of any height not divisible by 8
    for b in range(8):
        lo = (b * height // 8) * row_bytes
        hi = ((b + 1) * height // 8) * row_bytes
        seg = raster[lo:hi]
        feature.append(round(sum(seg) / (255.0 * len(seg)), 6) if seg else 0.0)
    return width, height, channels, feature


def _decode_wav(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real WAV decode via a RIFF chunk walk (no native libs).

    Schema mapping for audio: width = frames per channel, height =
    sample rate, n_channels = channels; feature = RMS of 8 equal time
    segments of the first channel, normalized to [0, 1].
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, channels, rate, bits, data = 12, None, None, None, b""
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            channels, rate = struct.unpack_from("<HI", body, 2)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    # `not channels` also rejects channels=0, which would otherwise
    # divide by frame_bytes=0 below — ZeroDivisionError is not in the
    # callers' drop-path handlers, so one corrupt WAV would fail the job
    if not channels or bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    frame_bytes = channels * 2
    n_frames = len(data) // frame_bytes
    feature = []
    # proportional segment boundaries — n_frames // 8 sizing would drop
    # the trailing frames of any length not divisible by 8
    for s in range(8):
        lo, hi = s * n_frames // 8, (s + 1) * n_frames // 8
        if lo >= hi:
            feature.append(0.0)
            continue
        acc = 0
        for f in range(lo, hi):
            (v,) = struct.unpack_from("<h", data, f * frame_bytes)
            acc += v * v
        feature.append(round((acc / (hi - lo)) ** 0.5 / 32768.0, 6))
    return n_frames, rate, channels, feature


def _decode_pil(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Compressed-image decode (JPEG/PNG) through the Pillow seam.

    Import-guarded: the container images that run the gate don't ship
    Pillow, so the guard raises a clear NotImplementedError there while
    the PNM/WAV codecs and the fake kernel keep working. On a cluster
    image with Pillow, this emits the same contract as ``_decode_pnm``:
    dims + mean intensity of 8 horizontal bands.
    """
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "JPEG/PNG decode requires Pillow on the executor image; "
            "PNM/WAV decode and mode='fake' run without it"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    channels = len(img.getbands())
    data = list(img.convert("L").getdata())
    feature = []
    for b in range(8):
        lo = (b * height // 8) * width
        hi = ((b + 1) * height // 8) * width
        seg = data[lo:hi]
        feature.append(round(sum(seg) / (255.0 * len(seg)), 6) if seg else 0.0)
    return width, height, channels, feature


def _real_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Dispatch on magic bytes; extend here for further formats."""
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    if payload[:2] == b"\xff\xd8" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_pil(payload)
    raise ValueError(f"unsupported media magic: {payload[:4]!r}")


def decode_media(df: DataFrame, mode: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """Decode stage: mapInPandas over Arrow batches of media rows.

    ``mode='real'`` runs the pure-Python WAV/PNM codecs; ``'fake'``
    the deterministic pseudo-decoder (used by the gate queries).
    """
    kernel = _real_decode if mode == "real" else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, *kernel(bytes(content) if content is not None else b""))
                for mid, content in zip(pdf["media_id"], pdf["content"])
            ]
            out = pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "feature"]
            )
            yield out

    return df.select("media_id", "content").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: which frames to keep.

    Pure metadata arithmetic (no decode): given frame counts derived
    from payload size, emit (media_id, frame_index) rows. The actual
    frame extraction would be a mapInPandas kernel like decode_media.
    """
    n_frames = (F.col("meta.n_bytes") / 1024).cast("int") + 1
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
        ).alias("frame_index"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _resize_pnm(payload: bytes, ow: int, oh: int) -> bytes:
    """Real nearest-neighbor resize of a binary PPM/PGM payload,
    emitting a valid PNM of the new dimensions (pure Python)."""
    w, h, ch, off = _parse_pnm_header(payload)
    raster = payload[off : off + w * h * ch]
    out = bytearray()
    for y in range(oh):
        sy = min(h - 1, (y * h) // oh)
        row_base = sy * w * ch
        for x in range(ow):
            sx = min(w - 1, (x * w) // ow)
            px = row_base + sx * ch
            out += raster[px : px + ch]
    magic = b"P6" if ch == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (ow, oh) + bytes(out)


def resize_media(
    df: DataFrame, max_side: int = 256, mode: str = "fake"
) -> DataFrame:
    """Resize stage: aspect-preserving fit into a max_side box.

    ``mode='real'`` runs a real nearest-neighbor pixel kernel on
    PPM/PGM payloads and emits valid resized PNM bytes (PIL/ffmpeg
    would slot into the same kernel for compressed formats on a real
    cluster image). ``mode='fake'`` truncates the payload
    proportionally to the area ratio so downstream size accounting
    behaves like a real resize without parsing pixels.

    Input: decoded dims joined back onto payloads —
    (media_id, width, height, content).
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, content in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["content"]
            ):
                w, h = int(w), int(h)
                scale = min(1.0, max_side / max(w, h, 1))
                # round, not truncate: int(w * (max_side/w)) can land on
                # max_side−1 through float error
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                payload = bytes(content) if content is not None else b""
                if mode == "real":
                    resized = _resize_pnm(payload, ow, oh)
                else:
                    keep = max(1, int(len(payload) * (ow * oh) / max(w * h, 1)))
                    resized = payload[:keep]
                rows.append((mid, w, h, ow, oh, resized))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "out_width", "out_height", "content",
                ],
            )

    return df.select("media_id", "width", "height", "content").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def extract_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """REAL frame extraction over concatenated-PNM video payloads.

    The container-native stand-in for an ffmpeg demux: a 'video' is a
    concatenation of binary PPM/PGM frames (each self-describing via
    its header), walked frame-by-frame in pure Python; every
    ``every_nth``-th frame is emitted as its own valid PNM payload.
    One Arrow-batched mapInPandas pass, one output row per kept frame
    — the same schema/batch shape an ffmpeg-backed kernel would have,
    so swapping the codec touches nothing upstream.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                data = bytes(payload) if payload is not None else b""
                pos, idx = 0, 0
                while pos + 2 <= len(data) and data[pos : pos + 2] in (b"P6", b"P5"):
                    # offset parse — no per-frame copy of the remaining
                    # payload (that walk is O(n²) in frame count)
                    try:
                        w, h, ch, off = _parse_pnm_header(data, pos)
                    except ValueError:
                        # payload ends mid-HEADER (write interrupted):
                        # drop the tail like the mid-raster case below
                        break
                    frame_end = off + w * h * ch
                    if frame_end > len(data):
                        # payload ends mid-raster: drop the truncated
                        # tail instead of emitting a short frame
                        break
                    if idx % every_nth == 0:
                        out.append((mid, idx, w, h, data[pos:frame_end]))
                    pos = frame_end
                    idx += 1
            yield pd.DataFrame(
                out, columns=["media_id", "frame_index", "width", "height", "content"]
            )

    return df.select("media_id", "content").mapInPandas(gen, FRAMES_SCHEMA)


def _dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash) of a binary PNM image.

    Downsample to a 9x8 grayscale grid with the same nearest-neighbor
    sampling as _resize_pnm, then set one bit per horizontal neighbor
    pair: bit = 1 iff left pixel is brighter. Pure integer arithmetic
    over the REAL raster — no float, no library — so the hash is
    deterministic everywhere. Robust to resizing and brightness-
    preserving re-encodes (the classic perceptual-dedup property);
    a flipped/inverted image lands far away in Hamming space.
    """
    w, h, ch, off = _parse_pnm_header(payload)
    if len(payload) < off + w * h * ch:
        # a truncated raster would sample empty slices (sum() == 0) and
        # hash to a valid-looking mostly-zero value, clustering every
        # corrupt file as a false near-duplicate — reject instead so
        # callers route the row through their documented drop path
        raise ValueError("truncated PNM raster")
    raster = payload[off : off + w * h * ch]
    bits = 0
    for y in range(8):
        sy = min(h - 1, (y * h) // 8)
        row = sy * w * ch
        vals = []
        for x in range(9):
            sx = min(w - 1, (x * w) // 9)
            px = row + sx * ch
            vals.append(sum(raster[px : px + ch]))
        for x in range(8):
            bits = (bits << 1) | (1 if vals[x] > vals[x + 1] else 0)
    return bits


def dhash_media(df: DataFrame) -> DataFrame:
    """Perceptual hash column for an image payload table.

    Input: MEDIA_SCHEMA-shaped (media_id, content, meta). Output:
    (media_id, dhash long). One Arrow-batched pass; payload bytes
    never leave the executor. Non-PNM payloads (audio, video
    containers) hash to NULL and drop out — at 100 TB you'd partition
    the media table by kind and scan only images.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_hashes = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content)
                try:
                    hsh = _dhash64(payload)
                except (ValueError, IndexError):
                    continue
                out_ids.append(int(mid))
                # two's-complement into a signed 64-bit long
                out_hashes.append(hsh - (1 << 64) if hsh >= (1 << 63) else hsh)
            yield pd.DataFrame({"media_id": out_ids, "dhash": out_hashes})

    return df.select("media_id", "content").mapInPandas(
        gen, schema="media_id long, dhash long"
    )


def dhash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    bucket_cap: int = 64,
    with_quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-duplicate image pairs by banded Hamming join on dHashes.

    Thin wrapper over hash_neardup_pairs (the generic 64-bit banded
    join shared with the audio fingerprint path): candidate
    generation is an equi-join on (band_index, band_value) — never an
    all-pairs product — with recall guaranteed for Hamming <= 7 by
    pigeonhole, and the exact check one codegen bit_count(xor).
    ``bucket_cap``/``with_quarantine`` pass straight through: on
    exact-duplicate-heavy image sets (millions of near-black
    thumbnails share every band) the over-cap buckets are quarantined
    for exact-hash dedup first instead of silently dropping out.
    """
    return hash_neardup_pairs(
        hashes,
        "dhash",
        "media_id",
        max_hamming,
        bucket_cap=bucket_cap,
        with_quarantine=with_quarantine,
    )


def _audio_fingerprint64(payload: bytes) -> int:
    """64-bit energy-contour fingerprint of a 16-bit PCM WAV.

    Split the audio into 64 equal time windows, total the absolute
    sample amplitudes per window (pure integers), and set bit w iff
    window w is louder than the track's mean window (compared
    cross-multiplied in exact integers, so uniform volume scaling
    preserves every bit). Global-mean comparison — unlike the image
    dHash's neighbor comparison — keeps step-shaped signals apart:
    silence-then-loud and loud-then-silence land ~64 bits from each
    other instead of 2. The audio analog of dHash; same banded-join
    dedup path (hash_neardup_pairs).
    """
    # inline RIFF walk (not via _decode_wav) to keep the sums in exact
    # integer space end-to-end — the float RMS there would reintroduce
    # rounding into an order comparison
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, channels, bits, data = 12, None, None, b""
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            channels = struct.unpack_from("<H", body, 2)[0]
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    # `not channels` rejects channels=0 too (frame_bytes=0 division)
    if not channels or bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    frame_bytes = channels * 2
    n = len(data) // frame_bytes
    if n < 64:
        raise ValueError("payload too short to fingerprint (needs >= 64 frames)")
    energies = []
    counts = []
    for w in range(64):
        lo, hi = w * n // 64, (w + 1) * n // 64
        acc = 0
        for f in range(lo, hi):
            (v,) = struct.unpack_from("<h", data, f * frame_bytes)
            acc += v if v >= 0 else -v
        energies.append(acc)
        counts.append(hi - lo)
    total_energy = sum(energies)
    total_frames = sum(counts)
    bits_out = 0
    for w in range(64):
        # per-frame energy[w] > per-frame mean, cross-multiplied exact:
        # (e_w / c_w) > (E / N)  <=>  e_w * N > E * c_w
        louder = energies[w] * total_frames > total_energy * counts[w]
        bits_out = (bits_out << 1) | (1 if louder else 0)
    return bits_out


def audio_fingerprint_media(df: DataFrame) -> DataFrame:
    """(media_id, afp long) for WAV payloads; non-WAV rows drop out.
    One Arrow-batched pass, same shape as dhash_media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    fp = _audio_fingerprint64(bytes(content))
                except (ValueError, IndexError, struct.error):
                    continue
                ids.append(int(mid))
                fps.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
            yield pd.DataFrame({"media_id": ids, "afp": fps})

    return df.select("media_id", "content").mapInPandas(
        gen, schema="media_id long, afp long"
    )


def hash_neardup_pairs(
    hashes: DataFrame,
    hash_col: str,
    id_col: str = "media_id",
    max_hamming: int = 6,
    bucket_cap: int = 64,
    with_quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Banded Hamming near-dup join over ANY 64-bit hash column —
    the generic engine behind dhash_neardup_pairs (images) and the
    audio fingerprint path. 8 bands x 8 bits: recall is guaranteed
    for Hamming distance <= 7 by pigeonhole; the exact distance check
    is codegen bit_count(xor).

    Band buckets are CAPPED, same doctrine and mechanics as the
    MinHash LSH path (operators/dedup.py): a (band, value) bucket of
    k members expands into k(k-1)/2 join rows, the executor-OOM shape
    on duplicate-heavy media (millions of near-black thumbnails share
    every band). A window COUNT over the band partitioning tags
    bucket sizes first — no aggregation buffer grows with the bucket —
    and over-cap buckets never reach the self-join; their member ids
    are returned as a second (disjoint) quarantine DataFrame when
    ``with_quarantine`` is set, to be routed through exact dedup on
    the raw hash (identical hashes need no Hamming join) before
    re-running the banded pass on what remains.
    """
    if not 0 <= max_hamming <= 7:
        raise ValueError("banded recall guarantee requires max_hamming in [0, 7]")
    bands = hashes.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), i * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("bv"),
    ).select("__id", "__h", "bv.band", "bv.val")
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band", "val")
    tagged = bands.withColumn("__n", F.count(F.lit(1)).over(wb))
    ok = tagged.filter(F.col("__n") <= bucket_cap).drop("__n")
    quarantined = (
        tagged.filter(F.col("__n") > bucket_cap)
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__h").alias("ha"),
            F.col("b.__h").alias("hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if not with_quarantine:
        return pairs
    # disjoint outputs, mirroring lsh_candidate_pairs: a quarantined
    # id's under-cap pairs are withheld so the two-phase pipeline
    # never double-processes a medium
    q_a = quarantined.select(F.col(id_col).alias("id_a"))
    q_b = quarantined.select(F.col(id_col).alias("id_b"))
    disjoint = pairs.join(q_a, "id_a", "left_anti").join(q_b, "id_b", "left_anti")
    return disjoint, quarantined


def video_frame_hashes(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """(media_id, frame_index, dhash) for concatenated-PNM video
    payloads: sample every Nth frame (extract_frames walks headers
    without per-frame payload copies), dHash each sampled frame. One
    Arrow pass for extraction, one for hashing — both columnar."""
    frames = extract_frames(df, every_nth=every_nth)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, idx, content in zip(
                pdf["media_id"], pdf["frame_index"], pdf["content"]
            ):
                try:
                    hsh = _dhash64(bytes(content))
                except (ValueError, IndexError):
                    continue
                ids.append(int(mid))
                idxs.append(int(idx))
                hashes.append(hsh - (1 << 64) if hsh >= (1 << 63) else hsh)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "dhash": hashes}
            )

    return frames.select("media_id", "frame_index", "content").mapInPandas(
        gen, schema="media_id long, frame_index long, dhash long"
    )


def video_neardup_pairs(
    df: DataFrame,
    every_nth: int = 10,
    min_shared_frames: int = 2,
    bucket_cap: int = 64,
    with_quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-duplicate videos = videos sharing >= k sampled-frame
    dHashes (re-encoded, trimmed, or re-ordered copies keep most frame
    hashes; unrelated footage shares none).

    Scale shape: candidate pairs come from an equi-join on the frame
    hash itself (distinct per video first, so a still scene can't
    multiply pairs), then one count-per-pair aggregate — never an
    all-pairs product over videos. A viral frame hash (black/blank
    frames across k videos) still expands k·(k-1)/2 join rows, so the
    LSH bucket-cap doctrine applies HERE too: a window COUNT over the
    hash tags bucket sizes on the same shuffle, over-cap hashes never
    reach the self-join, and with ``with_quarantine`` their video ids
    come back as a second (disjoint) DataFrame — route those through
    exact full-payload dedup (a blank-heavy video is usually an exact
    copy anyway) before re-running on what remains.
    """
    fh = (
        video_frame_hashes(df, every_nth=every_nth)
        .select("media_id", "dhash")
        .distinct()
    )
    from pyspark.sql.window import Window

    wb = Window.partitionBy("dhash")
    tagged = fh.withColumn("__n", F.count(F.lit(1)).over(wb))
    ok = tagged.filter(F.col("__n") <= bucket_cap).drop("__n")
    quarantined = (
        tagged.filter(F.col("__n") > bucket_cap).select("media_id").distinct()
    )
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.dhash") == F.col("b.dhash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared_frames)
    )
    if not with_quarantine:
        return pairs
    # disjoint outputs, mirroring hash_neardup_pairs: a quarantined
    # video's under-cap pairs are withheld so the two-phase pipeline
    # never double-processes a video
    q_a = quarantined.select(F.col("media_id").alias("id_a"))
    q_b = quarantined.select(F.col("media_id").alias("id_b"))
    disjoint = pairs.join(q_a, "id_a", "left_anti").join(q_b, "id_b", "left_anti")
    return disjoint, quarantined
