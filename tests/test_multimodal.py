"""Multimodal binary-column operators: real PNG path + stub contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators import multimodal as M
from pushkind_crawlers_spark.synth.png import decode_png
from pushkind_crawlers_spark.synth.worldgen import make_image_bytes, make_image_pixels


@pytest.fixture(scope="module")
def images_df(spark):
    rows = [
        ("im-0", make_image_bytes(9, "im-0", (32,), fmt="png"), "png"),
        ("im-1", make_image_bytes(9, "im-1", (48,), fmt="png"), "png"),
        ("im-2", make_image_bytes(9, "im-2", (32, 48), fmt="png"), "png"),
    ]
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_image_features(spark, images_df):
    got = {r["image_id"]: r for r in M.extract_image_features(images_df).collect()}
    for i in range(3):
        r = got[f"im-{i}"]
        px = make_image_pixels(9, f"im-{i}", (32,) if i == 0 else ((48,) if i == 1 else (32, 48)))
        assert (r["h"], r["w"]) == px.shape[:2]
        assert len(r["histogram"]) == 32
        assert abs(sum(r["histogram"]) - 1.0) < 1e-3
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert isinstance(r["phash"], int)


def test_thumbnails_roundtrip(spark, images_df):
    got = {r["image_id"]: r for r in M.make_thumbnails(images_df, out_size=16).collect()}
    for r in got.values():
        px = decode_png(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)


def test_unknown_format_is_gated():
    M.set_image_decoder(None)  # force the no-library branch
    try:
        with pytest.raises(NotImplementedError):
            M.decode_image(b"RIFFxxxxWEBP", fmt="webp")
    finally:
        M.reset_image_decoder()


def test_real_codec_probe_dispatch():
    """The runtime probe routes real-world containers to an injected
    decoder while the built-in PNG/LJQ1 codecs keep their payloads —
    a cluster build with PIL installed changes zero code."""
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    assert M.sniff_format(jpeg) == "jpeg"
    assert M.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert M.sniff_format(b"GIF89a\x01") == "gif"

    fake_px = np.full((4, 6, 3), 7, dtype=np.uint8)
    seen = []
    M.set_image_decoder(lambda data: (seen.append(data), fake_px)[1])
    try:
        out = M.decode_image(jpeg, "jpeg")
        assert out.shape == (4, 6, 3) and seen == [jpeg]
        # LJQ1 payloads still decode via the built-in codec, NOT the
        # injected real decoder (magic-based dispatch)
        ljq1 = make_image_bytes(7, "probe-img", (16,), fmt="jpg")
        M.decode_image(ljq1, "jpg")
        assert len(seen) == 1
    finally:
        M.reset_image_decoder()


def test_real_audio_probe_dispatch(spark):
    """WAV-magic payloads route to the injected audio decoder; raw PCM16
    keeps the built-in path; no library + container magic raises."""
    import struct

    pcm = (np.sin(np.arange(1600) / 10.0) * 1000).astype("<i2")
    wav = b"RIFF" + struct.pack("<I", 36 + pcm.nbytes) + b"WAVEfakehdr " + pcm.tobytes()

    M.set_audio_decoder(lambda data: (pcm.astype(np.float64), 16_000))
    try:
        df = spark.createDataFrame(
            [("wav-1", bytearray(wav)), ("raw-1", bytearray(pcm.tobytes()))],
            "audio_id string, bytes binary",
        )
        rows = {r["audio_id"]: r for r in
                df.mapInPandas(M.audio_features_fn(), M.AUDIO_FEATURES).collect()}
        assert rows["wav-1"]["duration_s"] == pytest.approx(0.1)
        assert rows["raw-1"]["duration_s"] == pytest.approx(0.1)
        assert rows["wav-1"]["rms"] == pytest.approx(rows["raw-1"]["rms"])
    finally:
        M.reset_audio_decoder()

    M.set_audio_decoder(None)
    try:
        df1 = spark.createDataFrame([("wav-1", bytearray(wav))],
                                    "audio_id string, bytes binary")
        with pytest.raises(Exception, match="NotImplementedError|not available"):
            df1.mapInPandas(M.audio_features_fn(), M.AUDIO_FEATURES).collect()
    finally:
        M.reset_audio_decoder()


def test_lossy_roundtrip_psnr(spark):
    """North-rule lossy invariant: decode(encode(px)) within PSNR>=40dB
    of the source pixels, deterministic, via the production decode path."""
    from pushkind_crawlers_spark.synth.lossy import encode_lossy
    from pushkind_crawlers_spark.synth.png import psnr

    for i in range(8):
        px = make_image_pixels(21, f"lossy-{i}", (32, 48, 64))
        data = encode_lossy(px)
        assert M.sniff_format(data) == "jpg"
        back = M.decode_image(data, "jpg")
        assert back.shape == px.shape
        assert psnr(back, px) >= 40.0
        assert np.array_equal(back, M.decode_image(data, "jpg"))  # deterministic


def test_image_features_mixed_formats(spark):
    """The feature UDF handles a PNG/lossy mix in one Arrow batch; lossy
    phash is computed on the decoded (quantized) pixels."""
    from pushkind_crawlers_spark.synth.lossy import decode_lossy
    from pushkind_crawlers_spark.synth.phash import gray32, phash64_batch

    rows = []
    for i in range(6):
        fmt = "jpg" if i % 2 == 0 else "png"
        rows.append((f"mx-{i}", make_image_bytes(5, f"mx-{i}", (32,), fmt=fmt), fmt))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in M.extract_image_features(df).collect()}
    assert len(got) == 6
    for i in range(6):
        r = got[f"mx-{i}"]
        fmt = "jpg" if i % 2 == 0 else "png"
        data = make_image_bytes(5, f"mx-{i}", (32,), fmt=fmt)
        px = decode_lossy(data) if fmt == "jpg" else make_image_pixels(5, f"mx-{i}", (32,))
        assert r["phash"] == int(phash64_batch(gray32(px)[None])[0])


def test_resize_nn_exact_downscale():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = M.resize_nn(px, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[0, 0], px[0, 0]) and np.array_equal(out[3, 3], px[6, 6])


def test_audio_features_pcm16(spark):
    t = np.arange(16_000, dtype=np.float64)
    wave = (np.sin(2 * np.pi * 440 * t / 16_000) * 10_000).astype("<i2")
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["a0"], "bytes": [wave.tobytes()]}),
        "audio_id string, bytes binary",
    )
    out = df.mapInPandas(M.audio_features_fn(), M.AUDIO_FEATURES).collect()[0]
    assert abs(out["duration_s"] - 1.0) < 1e-9
    assert abs(out["rms"] - 10_000 / np.sqrt(2)) < 100


def test_video_unknown_container_raises(spark):
    """Real-world MP4/WebM demux is offline-gated: a non-VMJ1 payload
    raises with the schema contract intact."""
    df = spark.createDataFrame([("v0", b"\x00\x00\x00\x18ftyp")],
                               "video_id string, bytes binary")
    with pytest.raises(Exception, match="VMJ1"):
        df.mapInPandas(M.video_frame_sample_fn(), M.VIDEO_FRAMES).collect()


def test_video_demux_roundtrip():
    from pushkind_crawlers_spark.synth.video import demux_video, encode_video

    frames = [b"frame-%d" % i for i in range(7)]
    blob = encode_video(frames, fps=24)
    got, fps = demux_video(blob)
    assert got == frames and fps == 24


def test_video_frame_sampling_every_n(spark):
    """12-frame clip sampled every 5 -> frames 0, 5, 10, byte-identical
    to the encoder's payloads; sampled frames decode as images."""
    from pushkind_crawlers_spark.synth.png import decode_png, encode_png
    from pushkind_crawlers_spark.synth.video import encode_video

    pxs = [np.full((4, 4, 3), 10 * f, dtype=np.uint8) for f in range(12)]
    payloads = [encode_png(p) for p in pxs]
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["v0"], "bytes": [encode_video(payloads)]}),
        "video_id string, bytes binary",
    )
    rows = sorted(
        M.sample_video_frames(df, every_n=5).collect(), key=lambda r: r["frame_no"]
    )
    assert [r["frame_no"] for r in rows] == [0, 5, 10]
    for r in rows:
        assert bytes(r["frame_png"]) == payloads[r["frame_no"]]
        assert np.array_equal(decode_png(bytes(r["frame_png"])), pxs[r["frame_no"]])
