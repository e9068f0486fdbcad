"""Multimodal column operators: images / audio / video as opaque binary
columns with typed metadata.

A large-scale training-data pipeline stores media as ``binary`` payloads
beside structured metadata and runs decode / feature-extraction /
resize / frame-sampling as Arrow-batched Python kernels. This module
implements that plumbing for real — schemas, ``mapInPandas`` batch
shape, partition behavior — while the codec itself is pluggable:

* If Pillow / soundfile / PyAV are importable they are used
  (import-gated — this container ships none of the optional installs).
* REAL RIFF/WAV audio decodes through the stdlib ``wave`` module —
  always available, so the real-codec seam is exercised end-to-end
  with no optional install at all.
* Bytes in the deterministic FAKE container formats below decode with
  pure numpy — deterministic, testable, content-derived.
* Anything else raises ``NotImplementedError`` (clearly-marked stub, as
  the decode step would be wired to a real codec library in production).

FAKE container layouts (header ASCII, little-endian payload):

* image: ``FAKEIMG|width|height|channels|`` + w*h*c uint8 pixels
* audio: ``FAKEAUD|sample_rate|n_samples|`` + int16 PCM
* video: ``FAKEVID|fps|n_frames|width|height|`` + frames of w*h uint8

Scale design: every operator is a map-only ``mapInPandas`` over the
payload column — no shuffle, vectorized numpy per Arrow batch, media
bytes never leave the executor. Column pruning still applies: select
the payload column last so scans of metadata-only queries never read
the (huge) binary column.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])

try:  # real codec path — absent in this container, gated
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

try:  # real audio codec beyond WAV (FLAC/OGG) — import-gated
    import soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except Exception:  # pragma: no cover
    _HAVE_SOUNDFILE = False

try:  # real video codec (PyAV/ffmpeg) — import-gated
    import av  # noqa: F401

    _HAVE_AV = True
except Exception:  # pragma: no cover
    _HAVE_AV = False


def _decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_frames, float64 samples) from an audio payload:
    the FAKEAUD container, a REAL RIFF/WAV file (stdlib ``wave`` —
    always available, so the real-codec seam is exercised without any
    optional install), or — import-gated — whatever ``soundfile``
    reads (FLAC, OGG, ...). Anything else raises, clearly marked."""
    parsed = _parse_fake(payload, b"FAKEAUD", 2)
    if parsed is not None:
        sr, n, raw = parsed
        return sr, n, np.frombuffer(raw, dtype=np.int16)[:n].astype(
            np.float64
        )
    riff_reason = None
    if payload[:4] == b"RIFF":
        import io
        import wave

        # stdlib wave only speaks integer-PCM WAVE; anything else in
        # RIFF clothing (float32 WAV, 24-bit, AVI/WEBP containers)
        # falls through to the soundfile rung instead of raising here
        try:
            with wave.open(io.BytesIO(payload)) as w:
                if w.getsampwidth() == 2:
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()), dtype=np.int16
                    ).astype(np.float64)
                    # frame count comes from the samples actually
                    # READ, not the header: a frame-truncated (even-
                    # length) data chunk returns fewer samples than
                    # getnframes() claims, and trusting the header
                    # would overstate n_frames/duration while rms ran
                    # over the real samples — the same [:n]
                    # defensiveness as the FAKEAUD rung
                    n = len(pcm) // nch
                    if nch > 1:
                        # channel-mean downmix: one sample stream per
                        # frame, so n_samples == n_frames whatever
                        # the layout (a torn partial frame is dropped)
                        pcm = pcm[: n * nch].reshape(-1, nch).mean(
                            axis=1
                        )
                    return sr, n, pcm
                riff_reason = (
                    f"sample width {w.getsampwidth()} (stdlib wave "
                    f"rung is 16-bit PCM only)"
                )
        except (wave.Error, EOFError, ValueError) as e:
            # ValueError: frombuffer on an odd-length (truncated) data
            # chunk — torn file, same fall-through as a format error
            riff_reason = str(e) or type(e).__name__
    if _HAVE_SOUNDFILE:  # pragma: no cover - optional install
        import io

        import soundfile as sf

        try:
            data, sr = sf.read(io.BytesIO(payload), dtype="float64")
        except Exception as e:
            raise NotImplementedError(
                f"soundfile could not decode payload: {e}"
            ) from e
        if data.ndim > 1:
            data = data.mean(axis=1)
        # soundfile normalizes to [-1, 1]; rescale to the int16 range
        # so rms is comparable across the WAV and FAKEAUD rungs
        return int(sr), int(data.shape[0]), data * 32768.0
    if riff_reason is not None:
        raise NotImplementedError(
            f"RIFF payload is not 16-bit PCM WAV ({riff_reason}) "
            f"and soundfile is not importable"
        )
    raise NotImplementedError(
        "real audio codecs unavailable: payload is neither FAKEAUD "
        "nor RIFF/WAV, and soundfile is not importable"
    )

#: Typed metadata beside the opaque payload: the standard lakehouse
#: media-column shape (payload + mime + per-mode attributes).
MEDIA_SCHEMA = _schema(
    ("media_id", LongType()),
    ("media_type", StringType()),
    ("payload", BinaryType()),
    ("source", StringType()),
    ("attrs", MapType(StringType(), StringType())),
)


# ------------------------------------------------------------- fake codec


def md5_byte_stream(seed: int, n: int) -> np.ndarray:
    """n deterministic bytes: concat of md5(f"{seed},{block}") digests.

    Byte j of the stream is byte ``j % 16`` of ``md5('{seed},{j // 16}')``
    — a formula ANY engine can recompute (the DuckDB oracles for the
    multimodal gates parse the same hex digests with substr/strpos),
    unlike an np.random bit-stream which exists only inside numpy.
    """
    import hashlib

    out = bytearray()
    for block in range((n + 15) // 16):
        out += hashlib.md5(f"{seed},{block}".encode()).digest()
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic content-derived FAKEIMG payload (md5 byte stream)."""
    pixels = md5_byte_stream(seed, width * height * channels)
    return (
        f"FAKEIMG|{width}|{height}|{channels}|".encode() + pixels.tobytes()
    )


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    pcm = md5_byte_stream(seed, 2 * n_samples).view("<i2")
    return f"FAKEAUD|{sample_rate}|{n_samples}|".encode() + pcm.tobytes()


def encode_fake_video(
    fps: int, n_frames: int, width: int, height: int, seed: int
) -> bytes:
    frames = md5_byte_stream(seed, n_frames * width * height)
    return (
        f"FAKEVID|{fps}|{n_frames}|{width}|{height}|".encode()
        + frames.tobytes()
    )


def _parse_fake(payload: bytes, magic: bytes, n_fields: int):
    if payload is None or not payload.startswith(magic):
        return None
    parts = payload.split(b"|", n_fields + 1)
    return [int(p) for p in parts[1:n_fields + 1]] + [parts[n_fields + 1]]


def _decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    parsed = _parse_fake(payload, b"FAKEIMG", 3)
    if parsed is not None:
        w, h, c, raw = parsed
        return w, h, c, np.frombuffer(raw, dtype=np.uint8)[: w * h * c]
    if _HAVE_PIL:  # pragma: no cover - not available in this container
        import io

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        c = 1 if arr.ndim == 2 else arr.shape[2]
        return img.width, img.height, c, arr.reshape(-1)
    raise NotImplementedError(
        "real image codecs unavailable: payload is neither FAKEIMG nor "
        "decodable without Pillow"
    )


# ------------------------------------------------------- image operators


def decode_image_metadata(
    media: DataFrame, *, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, width, height, channels, n_bytes): decode headers only.

    Map-only mapInPandas; the binary column is pruned from the output so
    downstream plans never carry pixels.
    """
    out_schema = _schema(
        (id_col, LongType()), ("width", IntegerType()),
        ("height", IntegerType()), ("channels", IntegerType()),
        ("n_bytes", LongType()),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, _ = _decode_image(bytes(payload))
                recs.append((mid, w, h, c, len(payload)))
            yield pd.DataFrame(
                recs, columns=[id_col, "width", "height", "channels", "n_bytes"]
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def image_features(
    media: DataFrame, *, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, mean_pixel, std_pixel, per-channel means): vectorized numpy
    feature extraction per Arrow batch."""
    out_schema = _schema(
        (id_col, LongType()), ("mean_pixel", DoubleType()),
        ("std_pixel", DoubleType()),
        ("channel_means", ArrayType(DoubleType())),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image(bytes(payload))
                arr = px.astype(np.float64)
                ch = arr.reshape(-1, c) if c else arr.reshape(-1, 1)
                recs.append(
                    (
                        mid,
                        float(arr.mean()),
                        float(arr.std()),
                        [float(x) for x in ch.mean(axis=0)],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[id_col, "mean_pixel", "std_pixel", "channel_means"],
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def image_stats(
    media: DataFrame, *, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, width, height, channels, mean_pixel, std_pixel): header
    metadata AND pixel features from ONE decode.

    The fused form of :func:`decode_image_metadata` +
    :func:`image_features`: at scale each mapInPandas pass re-reads
    (and for derived media, re-synthesizes) every payload byte, and a
    join of two map-only outputs shuffles both — decoding once and
    emitting all columns is strictly cheaper whenever more than one
    derived quantity is consumed. Keep the narrow operators for
    single-quantity pipelines; compose THIS one when a consumer wants
    metadata and features together.
    """
    out_schema = _schema(
        (id_col, LongType()), ("width", IntegerType()),
        ("height", IntegerType()), ("channels", IntegerType()),
        ("mean_pixel", DoubleType()), ("std_pixel", DoubleType()),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image(bytes(payload))
                arr = px.astype(np.float64)
                recs.append(
                    (mid, w, h, c, float(arr.mean()), float(arr.std()))
                )
            yield pd.DataFrame(
                recs,
                columns=[id_col, "width", "height", "channels",
                         "mean_pixel", "std_pixel"],
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def resize_images(
    media: DataFrame,
    target_width: int,
    target_height: int,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, payload): nearest-neighbor resize, re-encoded as FAKEIMG.

    The resample itself is index arithmetic (numpy take) — the identical
    shape a Pillow ``Image.resize`` call would slot into.
    """
    out_schema = _schema((id_col, LongType()), ("payload", BinaryType()))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, c, px = _decode_image(bytes(payload))
                img = px.reshape(h, w, c)
                ys = (np.arange(target_height) * h // target_height)
                xs = (np.arange(target_width) * w // target_width)
                resized = img[ys][:, xs]
                out = (
                    f"FAKEIMG|{target_width}|{target_height}|{c}|".encode()
                    + resized.tobytes()
                )
                recs.append((mid, bytearray(out)))
            yield pd.DataFrame(recs, columns=[id_col, "payload"])

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


# ------------------------------------------------------- audio operators


def decode_audio_metadata(
    media: DataFrame, *, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(id, sample_rate, n_samples, duration_sec, rms)."""
    out_schema = _schema(
        (id_col, LongType()), ("sample_rate", IntegerType()),
        ("n_samples", LongType()), ("duration_sec", DoubleType()),
        ("rms", DoubleType()),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                sr, n, pcm = _decode_audio(bytes(payload))
                rms = float(np.sqrt((pcm ** 2).mean())) if n else 0.0
                recs.append((mid, sr, n, n / sr if sr else 0.0, rms))
            yield pd.DataFrame(
                recs,
                columns=[id_col, "sample_rate", "n_samples", "duration_sec",
                         "rms"],
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


# ------------------------------------------------------- video operators


def sample_video_frames(
    media: DataFrame,
    every_n: int = 2,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """One output row per sampled frame: (id, frame_index, frame) —
    a UDTF-shaped fan-out, still map-only (no shuffle)."""
    out_schema = _schema(
        (id_col, LongType()), ("frame_index", IntegerType()),
        ("frame", BinaryType()),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                parsed = _parse_fake(payload, b"FAKEVID", 4)
                if parsed is not None:
                    fps, n_frames, w, h, raw = parsed
                    frames = np.frombuffer(raw, dtype=np.uint8)[
                        : n_frames * w * h
                    ].reshape(n_frames, w * h)
                    for i in range(0, n_frames, every_n):
                        recs.append(
                            (mid, i, bytearray(frames[i].tobytes()))
                        )
                    continue
                if _HAVE_AV:  # pragma: no cover - optional install
                    # real container via PyAV/ffmpeg: decode in frame
                    # order, emit every_n-th frame as raw RGB24 bytes
                    # — the same (id, frame_index, frame) shape
                    import io

                    import av as _av

                    with _av.open(io.BytesIO(payload)) as container:
                        for i, frame in enumerate(
                            container.decode(video=0)
                        ):
                            if i % every_n:
                                continue
                            rgb = frame.to_ndarray(format="rgb24")
                            recs.append(
                                (mid, i, bytearray(rgb.tobytes()))
                            )
                    continue
                raise NotImplementedError(
                    "real video codecs unavailable: payload is not "
                    "FAKEVID and PyAV is not importable"
                )
            yield pd.DataFrame(recs, columns=[id_col, "frame_index", "frame"])

    return media.select(id_col, payload_col).mapInPandas(kernel, out_schema)


# ---------------------------------------------------- synthetic corpus


def synthesize_media_table(
    docs: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic media table from the documents table:
    doc_id -> one FAKEIMG whose shape/content derive from the doc id.

    Gives the multimodal operators a reproducible corpus over the
    driver-provided testdata without shipping binary fixtures.
    """
    sizes = [(8, 6, 3), (16, 8, 1), (12, 12, 3), (10, 4, 1)]

    out_schema = MEDIA_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for did in pdf[id_col]:
                w, h, c = sizes[int(did) % len(sizes)]
                payload = encode_fake_image(w, h, c, seed=int(did))
                recs.append(
                    (
                        int(did),
                        "image/fake",
                        bytearray(payload),
                        f"doc:{did}",
                        {"width": str(w), "height": str(h)},
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "media_type", "payload", "source",
                         "attrs"],
            )

    return docs.select(id_col).mapInPandas(kernel, out_schema)


def media_duplicate_pairs(
    media: DataFrame,
    *,
    threshold: float = 0.999,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id_a, media_id_b, cosine): near-duplicate media by
    decoded feature-vector cosine — the multimodal rung of the dedup
    ladder.

    ONE decode pass (:func:`image_features`, Arrow-batched map-only)
    turns each payload into a small feature vector
    [mean_pixel, std_pixel, channel_means...]; the pair scan is
    :func:`~haplorec_spark.operators.dedup.embedding_near_duplicates`
    on those vectors, so media bytes never cross a shuffle — only the
    tiny feature rows do. Byte-identical payloads land at cosine 1.0;
    re-encoded/resized variants land nearby (with the real-codec
    import gate, the same shape holds for real decoders — swap the
    feature kernel, keep the plan). Exact BYTE duplicates need no
    decode at all: group on ``md5(payload)`` (the
    ``exact_duplicates`` shape). For billion-item media corpora,
    bucket these vectors with the LSH/IVF faces instead of the
    pairwise baseline.
    """
    from haplorec_spark.operators.dedup import embedding_near_duplicates

    feats = image_features(
        media, payload_col=payload_col, id_col=id_col
    ).select(
        F.col(id_col),
        F.expr(
            "concat(array(mean_pixel, std_pixel), channel_means)"
        ).alias("embedding"),
    )
    pairs = embedding_near_duplicates(
        feats, threshold=threshold, id_col=id_col
    )
    return pairs.select(
        F.col("vec_id_a").alias("media_id_a"),
        F.col("vec_id_b").alias("media_id_b"),
        "cosine",
    )


# ------------------------------------------------------ query registration

from haplorec_spark.queries import register, table  # noqa: E402


#: hex-pair -> byte value, for oracles that re-derive the md5 stream.
_DUCK_BYTE = (
    "(strpos('0123456789abcdef', substr(hx, 2 * ({j} % 16) + 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(hx, 2 * ({j} % 16) + 2, 1)) - 1"
)


@register(
    "q_multimodal_image_stats",
    # The FAKE payload bytes are md5(f"{media_id},{block}") digests
    # (md5_byte_stream), so DuckDB recomputes every pixel from hex
    # digests and checks the decode + feature kernels value-for-value.
    """
    WITH params AS (
        SELECT doc_id AS media_id,
               [8, 16, 12, 10][(doc_id % 4) + 1]::INT AS width,
               [6, 8, 12, 4][(doc_id % 4) + 1]::INT   AS height,
               [3, 1, 3, 1][(doc_id % 4) + 1]::INT    AS channels
        FROM documents),
    -- 431 = max(w*h*c) - 1 over the size table above
    px AS (
        SELECT media_id, width, height, channels,
               """ + _DUCK_BYTE.format(j="j") + """ AS val
        FROM (SELECT p.*, ks.j,
                     md5(p.media_id::VARCHAR || ',' || (ks.j // 16)::VARCHAR)
                         AS hx
              FROM params p
              CROSS JOIN (SELECT unnest(generate_series(0, 431)) AS j) ks
              WHERE ks.j < p.width * p.height * p.channels))
    SELECT media_id, width, height, channels,
           round(avg(val), 4)        AS mean_pixel,
           round(stddev_pop(val), 4) AS std_pixel
    FROM px
    GROUP BY media_id, width, height, channels
    """,
    "decode + feature-extract a derived binary image column (mapInPandas)",
)
def q_multimodal_image_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = synthesize_media_table(docs)
    return image_stats(media).select(
        "media_id", "width", "height", "channels",
        F.round("mean_pixel", 4).alias("mean_pixel"),
        F.round("std_pixel", 4).alias("std_pixel"),
    )


@register(
    "q_multimodal_frame_sample",
    # Each 4x4 frame is exactly one 16-byte md5 block of the stream, so
    # the oracle recomputes every sampled frame's byte sum from
    # md5(media_id, frame_index) — content-checked, not just row counts.
    """
    WITH f AS (SELECT doc_id AS media_id, fi.frame_index,
                      md5(doc_id::VARCHAR || ','
                          || fi.frame_index::VARCHAR) AS hx
               FROM documents
               CROSS JOIN (VALUES (0), (2), (4)) AS fi(frame_index)
               WHERE doc_id < 50),
    b AS (SELECT media_id, frame_index,
                 """ + _DUCK_BYTE.format(j="k") + """ AS val
          FROM f CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks)
    SELECT media_id, frame_index,
           16 AS frame_bytes,
           sum(val)::BIGINT AS frame_sum
    FROM b GROUP BY media_id, frame_index
    """,
    "frame-sample a derived binary video column (UDTF-shaped mapInPandas)",
)
def q_multimodal_frame_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)

    def to_video(batches):
        for pdf in batches:
            recs = []
            for did in pdf["doc_id"]:
                payload = encode_fake_video(
                    fps=4, n_frames=6, width=4, height=4, seed=int(did)
                )
                recs.append((int(did), "video/fake", bytearray(payload),
                             f"doc:{did}", {}))
            yield pd.DataFrame(
                recs,
                columns=["media_id", "media_type", "payload", "source",
                         "attrs"],
            )

    media = docs.select("doc_id").mapInPandas(to_video, MEDIA_SCHEMA)
    frames = sample_video_frames(media, every_n=2)
    # byte sum via hex expansion: proves the sampled frame CONTENT
    # (not just its size) against the oracle's md5 re-derivation
    frame_sum = (
        "aggregate(transform(sequence(0, length(frame) - 1),"
        " j -> cast(conv(substr(hex(frame), 2 * j + 1, 2), 16, 10) as int)),"
        " 0L, (acc, x) -> acc + x)"
    )
    return frames.select(
        "media_id",
        "frame_index",
        F.length("frame").alias("frame_bytes"),
        F.expr(frame_sum).alias("frame_sum"),
    )
