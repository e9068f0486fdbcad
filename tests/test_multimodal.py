"""Multimodal binary-column operator tests (deterministic fake codec)."""

from __future__ import annotations

import numpy as np
import pytest

from haplorec_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_audio_metadata,
    decode_image_metadata,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, "image/fake", bytearray(encode_fake_image(8, 6, 3, seed=1)),
         "t", {}),
        (2, "image/fake", bytearray(encode_fake_image(4, 4, 1, seed=2)),
         "t", {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_metadata(spark, images):
    got = {r.media_id: r for r in decode_image_metadata(images).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (8, 6, 3)
    assert (got[2].width, got[2].height, got[2].channels) == (4, 4, 1)
    assert got[1].n_bytes == len(encode_fake_image(8, 6, 3, seed=1))


def test_image_features_match_numpy(spark, images):
    from haplorec_spark.operators.multimodal import md5_byte_stream

    got = {r.media_id: r for r in image_features(images).collect()}
    px = md5_byte_stream(1, 8 * 6 * 3).astype(np.float64)
    assert got[1].mean_pixel == pytest.approx(px.mean())
    assert got[1].std_pixel == pytest.approx(px.std())
    assert len(got[1].channel_means) == 3
    assert got[1].channel_means[0] == pytest.approx(
        px.reshape(-1, 3).mean(axis=0)[0]
    )


def test_resize_roundtrip(spark, images):
    resized = resize_images(images, 4, 3)
    meta = {
        r.media_id: r
        for r in decode_image_metadata(
            resized.withColumnRenamed("media_id", "media_id")
        ).collect()
    }
    assert (meta[1].width, meta[1].height, meta[1].channels) == (4, 3, 3)
    assert (meta[2].width, meta[2].height, meta[2].channels) == (4, 3, 1)


def test_decode_unknown_bytes_is_stubbed(spark):
    df = spark.createDataFrame(
        [(9, "image/jpeg", bytearray(b"\xff\xd8notreallyajpeg"), "t", {})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|real image codecs"):
        decode_image_metadata(df).collect()


def test_audio_metadata(spark):
    payload = encode_fake_audio(sample_rate=16000, n_samples=8000, seed=3)
    df = spark.createDataFrame(
        [(5, "audio/fake", bytearray(payload), "t", {})], MEDIA_SCHEMA
    )
    r = decode_audio_metadata(df).collect()[0]
    assert r.sample_rate == 16000
    assert r.n_samples == 8000
    assert r.duration_sec == pytest.approx(0.5)
    from haplorec_spark.operators.multimodal import md5_byte_stream

    pcm = md5_byte_stream(3, 16000).view("<i2").astype(np.float64)
    assert r.rms == pytest.approx(np.sqrt((pcm ** 2).mean()))


def test_video_frame_sampling(spark):
    payload = encode_fake_video(fps=4, n_frames=6, width=4, height=4, seed=7)
    df = spark.createDataFrame(
        [(6, "video/fake", bytearray(payload), "t", {})], MEDIA_SCHEMA
    )
    frames = sample_video_frames(df, every_n=2).collect()
    assert [f.frame_index for f in frames] == [0, 2, 4]
    assert all(len(f.frame) == 16 for f in frames)


def test_image_stats_fuses_metadata_and_features(spark, images):
    from haplorec_spark.operators.multimodal import image_stats

    fused = {r.media_id: r for r in image_stats(images).collect()}
    meta = {r.media_id: r for r in decode_image_metadata(images).collect()}
    feats = {r.media_id: r for r in image_features(images).collect()}
    assert set(fused) == set(meta) == set(feats)
    for mid, r in fused.items():
        assert (r.width, r.height, r.channels) == (
            meta[mid].width, meta[mid].height, meta[mid].channels
        )
        assert r.mean_pixel == feats[mid].mean_pixel
        assert r.std_pixel == feats[mid].std_pixel


def test_media_duplicate_pairs_finds_byte_copies(spark):
    """A byte-identical payload copy reaches cosine 1.0; distinct
    synthetic images stay below a tight threshold."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.multimodal import (
        media_duplicate_pairs,
        synthesize_media_table,
    )

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    media = synthesize_media_table(docs)
    copies = media.filter(F.col("media_id") < 3).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    pairs = media_duplicate_pairs(
        media.unionByName(copies), threshold=0.9999999
    ).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in pairs}
    assert {(0, 1000), (1, 1001), (2, 1002)} <= got
    assert all(r["cosine"] == 1.0 for r in pairs
               if r["media_id_b"] - r["media_id_a"] == 1000)
    # no false positives among the 12 distinct originals
    assert not any(a < 100 and b < 100 for a, b in got)


def test_real_codec_smoke_with_pillow(spark):
    """The pluggable codec seam beyond the fake container: a REAL PNG
    decodes through the same Spark plumbing when Pillow is importable.
    Skip-marked cleanly when it is not (this container ships no image
    libs); run under `pip install pillow` to exercise the real path."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    arr = (
        np.arange(10 * 12 * 3, dtype=np.uint32) * 37 % 256
    ).astype(np.uint8).reshape(10, 12, 3)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(payload), "t", {})], MEDIA_SCHEMA
    )

    (m,) = decode_image_metadata(media).collect()
    assert (m.width, m.height, m.channels, m.n_bytes) == (
        12, 10, 3, len(payload)
    )

    # resize re-encodes as the documented FAKEIMG container; pixel
    # content must equal the nearest-neighbor take over the PNG array
    (r,) = resize_images(media, 6, 5).collect()
    out = bytes(r.payload)
    head, raw = out.split(b"|", 4)[:4], out.split(b"|", 4)[4]
    assert head == [b"FAKEIMG", b"6", b"5", b"3"]
    ys = np.arange(5) * 10 // 5
    xs = np.arange(6) * 12 // 6
    want = arr[ys][:, xs]
    got_px = np.frombuffer(raw, dtype=np.uint8).reshape(5, 6, 3)
    assert (got_px == want).all()

    # features run off the decoded pixels, matching numpy on the array
    (f,) = image_features(media).collect()
    assert f.mean_pixel == pytest.approx(float(arr.mean()), abs=1e-6)


def _wav_bytes(sr, pcm, channels=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def test_real_codec_smoke_wav_audio(spark):
    """The audio seam against a REAL container with no optional
    install: RIFF/WAV decodes through the stdlib wave module inside
    the same mapInPandas plumbing — sample rate, frame count,
    duration and RMS must match numpy on the source samples, mono and
    stereo (channel-mean downmix)."""
    from haplorec_spark.operators.multimodal import decode_audio_metadata

    sr, n = 8000, 1600
    mono = (np.sin(np.arange(n) * 0.05) * 12000).astype(np.int16)
    stereo = np.stack(
        [mono, (mono.astype(np.int32) // 2).astype(np.int16)], axis=1
    ).reshape(-1)
    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_wav_bytes(sr, mono)), "t", {}),
            (2, "audio/wav", bytearray(_wav_bytes(sr, stereo, 2)), "t", {}),
        ],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in decode_audio_metadata(media).collect()}
    m = got[1]
    assert (m["sample_rate"], m["n_samples"]) == (sr, n)
    assert m["duration_sec"] == pytest.approx(n / sr)
    assert m["rms"] == pytest.approx(
        float(np.sqrt((mono.astype(np.float64) ** 2).mean())), rel=1e-9
    )
    s = got[2]
    downmix = stereo.reshape(-1, 2).astype(np.float64).mean(axis=1)
    assert (s["sample_rate"], s["n_samples"]) == (sr, n)
    assert s["rms"] == pytest.approx(
        float(np.sqrt((downmix ** 2).mean())), rel=1e-9
    )


def test_real_codec_smoke_soundfile_flac(spark):
    """Import-gated second audio rung: a FLAC payload decodes through
    soundfile inside the same plumbing. Skips cleanly when soundfile
    is not installed (this container); run under
    `pip install soundfile` to exercise the real path."""
    sf = pytest.importorskip("soundfile")
    import io

    from haplorec_spark.operators.multimodal import decode_audio_metadata

    sr, n = 16000, 2400
    pcm = (np.sin(np.arange(n) * 0.03) * 9000).astype(np.int16)
    buf = io.BytesIO()
    sf.write(buf, pcm, sr, format="FLAC")
    media = spark.createDataFrame(
        [(1, "audio/flac", bytearray(buf.getvalue()), "t", {})],
        MEDIA_SCHEMA,
    )
    (m,) = decode_audio_metadata(media).collect()
    assert (m["sample_rate"], m["n_samples"]) == (sr, n)
    # FLAC is lossless: rescaled float64 samples reproduce int16 rms
    assert m["rms"] == pytest.approx(
        float(np.sqrt((pcm.astype(np.float64) ** 2).mean())), rel=1e-6
    )


def test_real_codec_smoke_av_video(spark):
    """Import-gated video rung: a real container (PyAV/ffmpeg) decodes
    through sample_video_frames' plumbing — frame indices stride
    every_n and each frame lands as raw RGB24 bytes of the declared
    geometry. Skips cleanly when PyAV is not installed (this
    container); run under `pip install av` to exercise it."""
    av = pytest.importorskip("av")
    import io

    from haplorec_spark.operators.multimodal import sample_video_frames

    w, h, n_frames = 32, 24, 8
    buf = io.BytesIO()
    container = av.open(buf, "w", format="mp4")
    stream = container.add_stream("mpeg4", rate=4)
    stream.width, stream.height, stream.pix_fmt = w, h, "yuv420p"
    for i in range(n_frames):
        arr = np.full((h, w, 3), i * 30 % 256, dtype=np.uint8)
        for packet in stream.encode(
            av.VideoFrame.from_ndarray(arr, format="rgb24")
        ):
            container.mux(packet)
    for packet in stream.encode():
        container.mux(packet)
    container.close()
    media = spark.createDataFrame(
        [(1, "video/mp4", bytearray(buf.getvalue()), "t", {})],
        MEDIA_SCHEMA,
    )
    rows = sample_video_frames(media, every_n=2).collect()
    assert [r["frame_index"] for r in rows] == [0, 2, 4, 6]
    assert all(len(r["frame"]) == w * h * 3 for r in rows)


def test_decode_audio_riff_contract_non_pcm16():
    """Regression: a RIFF payload stdlib wave can't read (24-bit PCM,
    float32 WAV, non-WAVE RIFF like AVI) must fall through to the
    soundfile rung when installed, and otherwise raise the contract's
    NotImplementedError — never leak wave.Error out of the kernel."""
    import struct

    from haplorec_spark.operators.multimodal import (
        _HAVE_SOUNDFILE,
        _decode_audio,
    )

    def riff_wav(fmt_code, bits, data):
        fmt = struct.pack(
            "<HHIIHH", fmt_code, 1, 8000, 8000 * bits // 8,
            bits // 8, bits,
        )
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    pcm24 = riff_wav(1, 24, b"\x00\x00\x00" * 16)
    f32 = riff_wav(3, 32, struct.pack("<8f", *([0.25] * 8)))
    for payload in (pcm24, f32):
        if _HAVE_SOUNDFILE:
            sr, n, samples = _decode_audio(payload)
            assert sr == 8000 and n == len(samples)
        else:
            with pytest.raises(NotImplementedError):
                _decode_audio(payload)
    # a RIFF container that is not audio at all is NotImplementedError
    # on BOTH rungs (soundfile cannot read it either)
    with pytest.raises(NotImplementedError):
        _decode_audio(b"RIFF\x08\x00\x00\x00AVI LIST")


def test_decode_audio_truncated_pcm16_wav():
    """A torn 16-bit PCM WAV whose data chunk ends on an odd byte must
    follow the same contract as other undecodable RIFF payloads
    (NotImplementedError / soundfile fall-through), not leak the
    numpy frombuffer ValueError out of the kernel."""
    from haplorec_spark.operators.multimodal import (
        _HAVE_SOUNDFILE,
        _decode_audio,
    )

    pcm = (np.arange(64) * 100).astype(np.int16)
    torn = _wav_bytes(8000, pcm)[:-1]  # odd-length data chunk
    if _HAVE_SOUNDFILE:
        try:
            _decode_audio(torn)  # soundfile may tolerate or refuse
        except NotImplementedError:
            pass
    else:
        with pytest.raises(NotImplementedError):
            _decode_audio(torn)


def test_decode_audio_frame_truncated_wav_uses_actual_samples():
    """ADVICE r7: a frame-truncated (even-length) WAV payload whose
    header still claims the full frame count must report n_frames /
    duration from the samples actually READ — trusting getnframes()
    overstated the audio while rms ran over the real samples."""
    from haplorec_spark.operators.multimodal import _decode_audio

    pcm = (np.sin(np.arange(100) * 0.1) * 9000).astype(np.int16)
    torn = _wav_bytes(8000, pcm)[:-40]  # drop 20 whole mono frames
    sr, n, got = _decode_audio(torn)
    assert (sr, n) == (8000, 80)
    assert len(got) == 80
    np.testing.assert_allclose(got, pcm[:80].astype(np.float64))

    # stereo torn mid-frame: one trailing sample (half a frame) is
    # dropped, frames = whole frames actually present
    stereo = np.stack([pcm, pcm // 2], axis=1).reshape(-1)
    torn2 = _wav_bytes(8000, stereo, channels=2)[:-2]
    sr2, n2, got2 = _decode_audio(torn2)
    assert (sr2, n2) == (8000, 99)
    assert len(got2) == 99
