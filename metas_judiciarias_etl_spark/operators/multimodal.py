"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` pipelines.

The audio path is REAL: payloads are packaged as 8-bit PCM mono WAV
containers and the feature extractor parses the RIFF container with the
stdlib ``wave`` codec — header fields, fmt chunk, and frame extraction are
genuine decode work, and the decoded PCM frames are the original bytes, so
the byte-statistics oracle verifies the decode end to end. The *image*
codec path is still import-gated (no Pillow in this container) and falls
back to the same byte statistics, so the Spark-side plumbing — schema
declaration, binary handling, Arrow batch iteration, UDF signatures, frame
explosion — is exercised either way.

The fixture corpus has no binary table, so payloads are manufactured
deterministically from ``documents.text`` (utf-8 encode). The texts are pure
ASCII, which is what lets the DuckDB oracle replicate byte-level arithmetic
with character functions.

Scale notes (100 TB of images/video):
* payloads ride in parquet binary columns; `spark.sql.execution.arrow
  .maxRecordsPerBatch` bounds Arrow batch memory (set ~64 for MB-scale
  payloads);
* decode/resize is embarrassingly parallel map-only work — no shuffle;
  frame sampling explodes rows but stays within the partition;
* metadata (format/bytes/checksum) lives in plain columns so filters prune
  *before* any payload is decoded (lazy column access in parquet means a
  metadata-only query never reads the bytes).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.parquet import load_table

FRAME_BYTES = 32  # fake "frame" size when chunking a payload
FRAME_STRIDE = 4  # keep every 4th frame


def _payloads(docs: DataFrame) -> DataFrame:
    """Manufacture the opaque binary column + typed metadata from text."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("checksum"),
    )


def _try_real_decode() -> Any | None:
    """Gate for the real IMAGE codec path. Returns the module or None."""
    try:  # pragma: no cover - the container has no codec libs
        import PIL.Image  # type: ignore[import-not-found]

        return PIL.Image
    except ImportError:
        return None


def encode_wav_pcm8(payload: bytes, framerate: int = 8000) -> bytes:
    """Package raw bytes as a real WAV container: 8-bit PCM, mono. The
    sample bytes pass through verbatim (8-bit WAV is unsigned PCM), so the
    container round-trips arbitrary binary exactly."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(framerate)
        w.writeframes(payload)
    return buf.getvalue()


def decode_wav_pcm8(wav_bytes: bytes) -> tuple[bytes, int, int]:
    """Parse a WAV container with the stdlib codec; return (pcm_frames,
    framerate, nchannels). Raises ``wave.Error`` on a malformed container —
    real decode, not byte slicing."""
    import io
    import wave

    with wave.open(io.BytesIO(wav_bytes), "rb") as w:
        if w.getsampwidth() != 1:
            raise ValueError(f"expected 8-bit PCM, got sampwidth={w.getsampwidth()}")
        return w.readframes(w.getnframes()), w.getframerate(), w.getnchannels()


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — the columns scale-time
    filters prune on so payload bytes are never decoded for metadata-only
    queries."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select(
        "doc_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "checksum",
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _decode_features_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: Arrow batches in, feature rows out.

    Each payload is packaged as a WAV container and then GENUINELY decoded
    with the stdlib ``wave`` codec (RIFF/fmt parse + frame extraction); the
    features are computed from the decoded PCM frames. A decode bug —
    wrong header math, truncated frames — breaks the oracle match."""
    import pandas as pd

    def features(payload: bytes) -> tuple[int, float | None, int, str]:
        pcm, _rate, _ch = decode_wav_pcm8(encode_wav_pcm8(payload))
        # raw IEEE division of exact integers — bit-identical on both
        # engines; rounding at 6 decimals would hit exact half-way values
        # for power-of-two byte counts (Python half-even vs SQL half-up)
        mean = sum(pcm) / len(pcm) if pcm else None
        return len(pcm), mean, max(pcm) if pcm else 0, "wav-pcm8"

    for pdf in batches:
        rows = [features(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.Series([r[0] for r in rows], dtype="int64"),
                "mean_byte": [r[1] for r in rows],
                "max_byte": pd.Series([r[2] for r in rows], dtype="int64"),
                "decoder": [r[3] for r in rows],
            }
        )


@query(
    "mm_decode_features",
    oracle="""
    WITH bytes AS (
        SELECT doc_id, strlen(text) AS n_bytes,
               list_transform(generate_series(1, strlen(text)),
                              __i -> ascii(substr(text, __i, 1))) AS bs
        FROM documents
    )
    SELECT doc_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           list_sum(bs) / CAST(n_bytes AS DOUBLE) AS mean_byte,
           CAST(list_max(bs) AS BIGINT) AS max_byte,
           'wav-pcm8' AS decoder
    FROM bytes
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas, through a REAL codec: each payload is packaged as an
    8-bit-PCM WAV and decoded with the stdlib ``wave`` parser; features
    come from the decoded frames (byte-identical to the source, which is
    what lets the byte-statistics oracle verify the decode)."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select("doc_id", "payload").mapInPandas(
        _decode_features_batches, schema=_FEATURES_SCHEMA
    )


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def _frame_sample_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Chunk each payload into FRAME_BYTES 'frames', keep every
    FRAME_STRIDE-th, emit (doc_id, frame_idx, md5). Row-exploding map —
    output rows stay in the input partition (no shuffle)."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        digests: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [
                payload[off : off + FRAME_BYTES]
                for off in range(0, len(payload), FRAME_BYTES)
            ]
            for i in range(0, len(frames), FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                digests.append(hashlib.md5(frames[i]).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_md5": pd.Series(digests, dtype="object"),
            }
        )


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id,
               unnest(generate_series(0,
                   CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT) - 1,
                   {FRAME_STRIDE})) AS frame_idx,
               text
        FROM documents
    )
    SELECT doc_id,
           frame_idx,
           md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                      {FRAME_BYTES})) AS frame_md5
    FROM frames
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a chunked binary payload (the video-keyframe
    shape): mapInPandas explodes each payload into every 4th 32-byte frame
    with a content digest."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select("doc_id", "payload").mapInPandas(
        _frame_sample_batches, schema=_FRAMES_SCHEMA
    )


# Computed once at import: the oracle must agree with whatever decoder this
# environment resolves to, so the marker is interpolated, not hardcoded —
# installing PIL must not break parity.
_RESIZE_STATUS = "pil" if _try_real_decode() is not None else "ppm-nn-builtin"


@query(
    "mm_resize_status",
    oracle=f"""
    SELECT doc_id, '{_RESIZE_STATUS}' AS resize_status
    FROM documents
    """,
)
def mm_resize_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoder-selection gate: reports per-row which image path serves
    resizes — PIL when installed, else the built-in PPM nearest-neighbor
    codec (mm_image_resize). The oracle interpolates the same import-time
    gate, so parity holds in either environment."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.lit(_RESIZE_STATUS).alias("resize_status"))


# --------------------------------------------------------------------------
# Real image path: PPM (P6) container codec + nearest-neighbor resize.
# --------------------------------------------------------------------------
IMG_W = 16  # synthetic source image width (pixels)
OUT_W = 8
OUT_H = 4


def encode_ppm(payload: bytes, width: int = IMG_W) -> bytes:
    """Package raw bytes as a real binary PPM (P6) image: rows of
    ``width`` RGB pixels, zero-padded to a whole pixel grid. PPM is the
    simplest real raster container — a text header + raw pixel bytes —
    so the encode is lossless and the decode is a genuine parse."""
    row_bytes = width * 3
    height = max(1, -(-len(payload) // row_bytes))
    padded = payload + b"\x00" * (height * row_bytes - len(payload))
    return f"P6\n{width} {height}\n255\n".encode("ascii") + padded


def decode_ppm(data: bytes) -> "np.ndarray":  # noqa: F821
    """Parse a P6 container: validate magic, read dimensions/maxval from
    the header, reshape the pixel payload to (H, W, 3). Raises ValueError
    on malformed input — a real decode, not byte slicing."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pixels = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pixels.reshape(h, w, 3)


def resize_nn(img: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":  # noqa: F821
    """Nearest-neighbor resize via integer index maps (floor sampling):
    out[r, c] = src[(r*H)//out_h, (c*W)//out_w]."""
    import numpy as np

    h, w, _ = img.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols, :]


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized_mean", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _image_resize_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: payload → P6 encode → REAL P6 parse → NN resize
    → stats of the resized pixels. A bug anywhere in the header math, the
    padding, or the index maps breaks the byte-level oracle."""
    import pandas as pd

    def one(payload: bytes) -> tuple[int, int, int, int, float]:
        img = decode_ppm(encode_ppm(payload))
        h, w, _ = img.shape
        small = resize_nn(img, OUT_H, OUT_W)
        # Raw IEEE ratio, no rounding: the pixel sum is an exact integer and
        # the size a constant, so the single division is bit-identical to the
        # oracle's list_sum(bs) / 96.0 — Python round(...) is half-even while
        # DuckDB round() is half-away, and a payload landing on a half would
        # split the engines (same class as the mm_decode_features fix).
        mean = float(small.sum()) / small.size
        return w, h, OUT_W, OUT_H, mean

    for pdf in batches:
        rows = [one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": pd.Series([r[0] for r in rows], dtype="int32"),
                "src_h": pd.Series([r[1] for r in rows], dtype="int64"),
                "out_w": pd.Series([r[2] for r in rows], dtype="int32"),
                "out_h": pd.Series([r[3] for r in rows], dtype="int32"),
                "resized_mean": [r[4] for r in rows],
                "decoder": ["ppm-nn"] * len(rows),
            }
        )


@query(
    "mm_image_resize",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, strlen(text) AS n,
               greatest(CAST(ceil(strlen(text) / {IMG_W * 3}.0) AS BIGINT),
                        1) AS h, text
        FROM documents
    ), sampled AS (
        SELECT doc_id, h,
               list_transform(generate_series(0, {OUT_H * OUT_W * 3 - 1}),
                   __p -> CASE WHEN
                       ((((__p // {OUT_W * 3}) * h // {OUT_H}) * {IMG_W}
                         + ((__p % {OUT_W * 3}) // 3) * {IMG_W // OUT_W}) * 3
                        + (__p % 3)) < n
                   THEN ascii(substr(text,
                       ((((__p // {OUT_W * 3}) * h // {OUT_H}) * {IMG_W}
                         + ((__p % {OUT_W * 3}) // 3) * {IMG_W // OUT_W}) * 3
                        + (__p % 3)) + 1, 1))
                   ELSE 0 END) AS bs
        FROM sized
    )
    SELECT doc_id,
           {IMG_W} AS src_w,
           h AS src_h,
           {OUT_W} AS out_w,
           {OUT_H} AS out_h,
           CAST(list_sum(bs) AS DOUBLE) / {OUT_H * OUT_W * 3}.0 AS resized_mean,
           'ppm-nn' AS decoder
    FROM sampled
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize without external codec libs: each payload is
    packaged as a binary PPM (P6), parsed back with a genuine header
    parser, and nearest-neighbor-resized to 8x4 via integer index maps.
    The oracle recomputes the exact sampled byte positions in SQL, so the
    whole encode→decode→resize chain is value-verified. Arrow-batched
    mapInPandas; map-only plan (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select("doc_id", "payload").mapInPandas(
        _image_resize_batches, schema=_RESIZE_SCHEMA
    )


# --------------------------------------------------------------------------
# Windowed audio features over decoded PCM: per-window RMS loudness — the
# VAD / level-metering primitive (frame the signal, one energy per frame).
# --------------------------------------------------------------------------
RMS_WINDOW = 64  # PCM samples per analysis window

_RMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("win_len", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _audio_rms_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: payload → WAV encode → REAL stdlib ``wave``
    decode → fixed-size PCM windows → RMS per window. The energy sum runs
    in exact Python integers; one IEEE division + sqrt at the end keeps
    both engines bit-identical (same discipline as mm_decode_features)."""
    import math

    import pandas as pd

    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        lens: list[int] = []
        rms: list[float] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            pcm, _rate, _ch = decode_wav_pcm8(encode_wav_pcm8(payload))
            for i in range(0, len(pcm), RMS_WINDOW):
                win = pcm[i : i + RMS_WINDOW]
                ids.append(doc_id)
                idxs.append(i // RMS_WINDOW)
                lens.append(len(win))
                rms.append(math.sqrt(sum(b * b for b in win) / len(win)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "win_idx": pd.Series(idxs, dtype="int64"),
                "win_len": pd.Series(lens, dtype="int64"),
                "rms": pd.Series(rms, dtype="float64"),
            }
        )


@query(
    "mm_audio_rms_windows",
    oracle=f"""
    WITH wins AS (
        SELECT doc_id,
               unnest(generate_series(0,
                   CAST(ceil(strlen(text) / {RMS_WINDOW}.0) AS BIGINT) - 1))
                   AS win_idx,
               text, strlen(text) AS n
        FROM documents
    )
    SELECT doc_id,
           win_idx,
           CAST(least({RMS_WINDOW}, n - win_idx * {RMS_WINDOW}) AS BIGINT)
               AS win_len,
           sqrt(list_sum(list_transform(
                    generate_series(1, CAST(least({RMS_WINDOW},
                                             n - win_idx * {RMS_WINDOW}) AS BIGINT)),
                    __i -> CAST(ascii(substr(text,
                               CAST(win_idx * {RMS_WINDOW} + __i AS BIGINT), 1))
                           AS BIGINT)
                         * ascii(substr(text,
                               CAST(win_idx * {RMS_WINDOW} + __i AS BIGINT), 1))))
                / CAST(least({RMS_WINDOW}, n - win_idx * {RMS_WINDOW}) AS DOUBLE))
               AS rms
    FROM wins
    """,
)
def mm_audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window RMS over genuinely decoded audio: each payload rides a
    real 8-bit-PCM WAV container, the stdlib ``wave`` parser extracts the
    frames, and every 64-sample window reports its RMS energy — the
    framing+energy primitive under VAD, silence trimming, and loudness
    normalization. The oracle recomputes each window's energy byte-by-byte
    in SQL, so container round-trip AND window framing are value-verified.

    Map-only Arrow pipeline: rows explode within their partition (like
    mm_frame_sample) — no shuffle at any scale; window energies are exact
    integer sums with a single division+sqrt at the end, bit-identical
    across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select("doc_id", "payload").mapInPandas(
        _audio_rms_batches, schema=_RMS_SCHEMA
    )


# --------------------------------------------------------------------------
# Cross-document frame dedup: duplicated frames across payloads — the
# video-pipeline variant of exact dedup (near-identical intros/outros and
# repeated stock footage show up as shared frame digests).
# --------------------------------------------------------------------------
def _frame_dedup_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH frames AS MATERIALIZED ({ORACLES['mm_frame_sample']})
    SELECT frame_md5,
           count(*) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM frames
    GROUP BY frame_md5
    HAVING count(DISTINCT doc_id) > 1
    """


@query("mm_frame_dedup", oracle=_frame_dedup_oracle())
def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frames shared across documents, from the REGISTERED frame sampler
    (engine and oracle compose mm_frame_sample): content digest, how
    often and in how many payloads it repeats, deterministic keeper. At
    100 TB this is ONE shuffle on the 128-bit digest over the sampled
    frames — the same cost envelope as exact text dedup, which is the
    point: frame-level video dedup is exact dedup after the decode
    stage."""
    from ..registry import QUERIES

    frames = QUERIES["mm_frame_sample"](spark, sf_dir)
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# Scene-cut detection: frame-to-frame intensity change over chunked frames.
# --------------------------------------------------------------------------
SCENE_THRESH = 64  # |frame byte-sum delta| above this marks a cut (~2/byte)

_FRAME_SUMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def _frame_sum_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: every FULL FRAME_BYTES frame with its exact
    integer byte sum (the 'intensity' of the frame). Trailing partial
    frames are dropped so every frame has the same denominator and the
    cut predicate stays pure-integer. Row-exploding map — no shuffle."""
    import pandas as pd

    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        sums: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_full = len(payload) // FRAME_BYTES
            for i in range(n_full):
                ids.append(doc_id)
                idxs.append(i)
                sums.append(sum(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_sum": pd.Series(sums, dtype="int64"),
            }
        )


@query(
    "mm_scene_cuts",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id,
               unnest(range(0, strlen(text) // {FRAME_BYTES})) AS frame_idx,
               text
        FROM documents
    ), sums AS (
        SELECT doc_id, frame_idx,
               list_sum(list_transform(generate_series(1, {FRAME_BYTES}),
                   __i -> ascii(substr(text,
                       CAST(frame_idx * {FRAME_BYTES} AS BIGINT) + __i, 1))))
                   AS frame_sum
        FROM frames
    ), lagged AS (
        SELECT doc_id, frame_idx, frame_sum,
               lag(frame_sum) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx) AS prev
        FROM sums
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
                     AND abs(frame_sum - prev) > {SCENE_THRESH}
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
           min(CASE WHEN prev IS NOT NULL
                    AND abs(frame_sum - prev) > {SCENE_THRESH}
                    THEN frame_idx END) AS first_cut_idx
    FROM lagged
    GROUP BY doc_id
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over a chunked binary payload (the video
    keyframe-selection shape): the Arrow worker emits every full frame's
    exact integer byte sum, then JVM-side a lag window per doc flags
    frames whose intensity jumps more than SCENE_THRESH from their
    predecessor — the Python decode feeds a Catalyst window, showing the
    two execution domains composing. Pure integer deltas: nothing to
    diverge between engines. One window shuffle on doc_id (frames of a
    doc co-locate); the explode stays inside the scan partition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    frames = _payloads(docs).select("doc_id", "payload").mapInPandas(
        _frame_sum_batches, schema=_FRAME_SUMS_SCHEMA
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    lagged = frames.withColumn("prev", F.lag("frame_sum").over(w))
    cut = F.col("prev").isNotNull() & (
        F.abs(F.col("frame_sum") - F.col("prev")) > SCENE_THRESH
    )
    return lagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.coalesce(F.sum(cut.cast("int")), F.lit(0))
        .cast("long")
        .alias("n_cuts"),
        F.min(F.when(cut, F.col("frame_idx"))).alias("first_cut_idx"),
    )


# --------------------------------------------------------------------------
# Quiet-segment detection (VAD shape): contiguous runs of low-energy RMS
# windows per payload — the silence-trimming / speech-activity primitive,
# composed from the REGISTERED window-energy operator.
# --------------------------------------------------------------------------
QUIET_RMS = 97.5  # ~p10 of the corpus window energies


def _quiet_segments_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH rms AS MATERIALIZED ({ORACLES['mm_audio_rms_windows']}),
    quiet AS (
        SELECT doc_id, win_idx FROM rms WHERE rms < {QUIET_RMS}
    ), flagged AS (
        SELECT doc_id, win_idx,
               CASE WHEN win_idx - lag(win_idx) OVER (
                        PARTITION BY doc_id ORDER BY win_idx
                    ) = 1 THEN 0 ELSE 1 END AS new_seg
        FROM quiet
    ), segs AS (
        SELECT doc_id, win_idx,
               sum(new_seg) OVER (PARTITION BY doc_id ORDER BY win_idx
                                  ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM flagged
    ), extents AS (
        SELECT doc_id, seg_id, count(*) AS seg_len
        FROM segs GROUP BY doc_id, seg_id
    )
    SELECT doc_id,
           count(*) AS n_segments,
           CAST(max(seg_len) AS BIGINT) AS longest_run,
           CAST(sum(seg_len) AS BIGINT) AS quiet_windows
    FROM extents GROUP BY doc_id
    """


@query("mm_audio_quiet_segments", oracle=_quiet_segments_oracle())
def mm_audio_quiet_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous quiet segments per audio payload: windows whose RMS
    falls below the corpus p10 threshold, merged into runs of adjacent
    window indices (gaps-and-islands over integers) — per payload, the
    segment count, longest run, and total quiet windows. The
    silence-trimming decision table of a speech pipeline, composed from
    the REGISTERED mm_audio_rms_windows on both engine and oracle sides,
    so the energy definition can never drift from the segmenter.

    Plan shape: the decode+energy stage stays the map-only Arrow
    pipeline; segmentation adds ONE doc_id exchange serving the lag
    window, the run-id prefix sum, and both rollups. RMS values are
    bit-identical across engines (exact integer sums, one division,
    one sqrt), so the threshold comparison cannot split them."""
    from ..registry import QUERIES

    rms = QUERIES["mm_audio_rms_windows"](spark, sf_dir)
    quiet = rms.filter(F.col("rms") < QUIET_RMS).select("doc_id", "win_idx")
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    flagged = quiet.select(
        "doc_id",
        "win_idx",
        F.when(
            F.col("win_idx") - F.lag("win_idx").over(w) == 1, F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("new_seg"),
    )
    segs = flagged.select(
        "doc_id",
        F.sum("new_seg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("seg_id"),
    )
    extents = segs.groupBy("doc_id", "seg_id").agg(
        F.count(F.lit(1)).alias("seg_len")
    )
    return extents.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("seg_len").cast("long").alias("longest_run"),
        F.sum("seg_len").cast("long").alias("quiet_windows"),
    )


# --------------------------------------------------------------------------
# Per-image byte histogram over the decoded pixel grid: the exposure/
# distribution audit a vision-data pipeline runs after decode.
# --------------------------------------------------------------------------
_HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_h", T.LongType()),
        T.StructField("n_pad", T.LongType()),
        T.StructField("bin_0", T.LongType()),
        T.StructField("bin_1", T.LongType()),
        T.StructField("bin_2", T.LongType()),
        T.StructField("bin_3", T.LongType()),
    ]
)


def _image_histogram_batches(
    batches: Iterator["pd.DataFrame"],  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas worker: payload → P6 encode → REAL P6 parse → 4-bin
    intensity histogram (byte >> 6) over the whole pixel grid including
    the zero padding, which lands in bin 0 and is reported separately."""
    import numpy as np
    import pandas as pd

    def one(payload: bytes) -> tuple[int, int, int, int, int, int]:
        img = decode_ppm(encode_ppm(payload))
        h = img.shape[0]
        counts = np.bincount(img.reshape(-1) >> 6, minlength=4)
        n_pad = img.size - len(payload)
        return (h, n_pad, int(counts[0]), int(counts[1]),
                int(counts[2]), int(counts[3]))

    for pdf in batches:
        rows = [one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_h": pd.Series([r[0] for r in rows], dtype="int64"),
                "n_pad": pd.Series([r[1] for r in rows], dtype="int64"),
                "bin_0": pd.Series([r[2] for r in rows], dtype="int64"),
                "bin_1": pd.Series([r[3] for r in rows], dtype="int64"),
                "bin_2": pd.Series([r[4] for r in rows], dtype="int64"),
                "bin_3": pd.Series([r[5] for r in rows], dtype="int64"),
            }
        )


@query(
    "mm_image_histogram",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, strlen(text) AS n,
               greatest(CAST(ceil(strlen(text) / {IMG_W * 3}.0) AS BIGINT),
                        1) AS h,
               list_transform(generate_series(1, strlen(text)),
                   __i -> ascii(substr(text, __i, 1))) AS codes
        FROM documents
    )
    SELECT doc_id, h AS src_h,
           CAST(h * {IMG_W * 3} - n AS BIGINT) AS n_pad,
           CAST(len(list_filter(codes, __c -> __c // 64 = 0))
                + (h * {IMG_W * 3} - n) AS BIGINT) AS bin_0,
           CAST(len(list_filter(codes, __c -> __c // 64 = 1)) AS BIGINT)
               AS bin_1,
           CAST(len(list_filter(codes, __c -> __c // 64 = 2)) AS BIGINT)
               AS bin_2,
           CAST(len(list_filter(codes, __c -> __c // 64 = 3)) AS BIGINT)
               AS bin_3
    FROM sized
    """,
)
def mm_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 4-bin intensity histogram through the REAL PPM codec:
    payload → P6 encode → genuine header parse → histogram of pixel
    bytes (byte >> 6), padding bin-0 mass reported separately — the
    exposure/distribution audit (dark-frame and clipped-image detection
    at production bit depths) a vision-data pipeline runs right after
    decode, and a second value-level verification of the codec chain
    with a different reduction than mm_image_resize's sampled mean.

    Oracle: recomputes the histogram byte-level in SQL from the text
    payload + the container's zero padding, so a bug in the header
    math, the padding, or the parse breaks parity. Arrow-batched
    mapInPandas; map-only plan (no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return _payloads(docs).select("doc_id", "payload").mapInPandas(
        _image_histogram_batches, schema=_HIST_SCHEMA
    )
