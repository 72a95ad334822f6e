"""Multimodal column operators (graft brief: image/audio/video as opaque
binary columns with typed metadata).

Real in this container: PNG decode (pure-zlib codec), LJQ1 lossy decode
(PSNR>=40dB invariant), resize (numpy nearest-neighbor), grayscale
feature extraction (32-bin histogram + phash), thumbnailing back to
PNG, audio duration/RMS over raw PCM16, and video frame sampling over
the VMJ1 synthetic container. Stubbed behind NotImplementedError:
real-world compressed codecs (libjpeg/WebP, MP3/AAC, MP4/WebM demux) —
the Spark-side plumbing (schema, Arrow batch shape, partitioning) is
identical either way, so swapping in a decoder library on a cluster
changes one function body, not the plan.

Everything is ``mapInPandas`` over Arrow batches — one numpy pass per
batch, no per-row Python beyond the codec loop itself.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..synth.lossy import MAGIC as _LOSSY_MAGIC
from ..synth.lossy import decode_lossy
from ..synth.phash import gray32, phash64_batch
from ..synth.png import _PNG_SIG, decode_png, encode_png

IMAGE_FEATURES = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("phash", T.LongType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("histogram", T.ArrayType(T.FloatType()), True),
])

THUMBNAILS = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("h", T.IntegerType(), True),
])


def sniff_format(data: bytes) -> str:
    """Container detection from magic bytes (what a crawler does anyway —
    Content-Type headers lie)."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:4] == _LOSSY_MAGIC:
        return "jpg"
    return "unknown"


def decode_image(data: bytes, fmt: str = "png") -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    'png' is lossless (pure-zlib codec, decoded pixels exact);
    'jpg'/'jpeg' is the LJQ1 DCT-quantized lossy codec whose parity
    invariant is PSNR>=40dB vs the source pixels (north-rule input_hint).
    A cluster build swaps a real libjpeg decoder into this dispatch
    without touching any plan. Other formats raise.
    """
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpg", "jpeg", "lossy"):
        return decode_lossy(data)
    raise NotImplementedError(
        f"decoder for {fmt!r} not available offline (plumbing is format-agnostic)"
    )


def resize_nn(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index map)."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return px[ys][:, xs]


def image_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(image_id, bytes, fmt) -> typed features; batched phash DCT."""
    for pdf in batches:
        n = len(pdf)
        ws, hs, lumas, hists = [], [], [], []
        grays = np.zeros((n, 32, 32))
        for i, (data, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
            px = decode_image(bytes(data), fmt)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            g = gray32(px)
            grays[i] = g
            lumas.append(float(g.mean()))
            hist, _ = np.histogram(g, bins=32, range=(0.0, 255.0))
            hists.append((hist / max(g.size, 1)).astype(np.float32))
        out = pd.DataFrame({
            "image_id": pdf["image_id"].to_numpy(),
            "w": pd.array(ws, dtype="int32"),
            "h": pd.array(hs, dtype="int32"),
            "fmt": pdf["fmt"].to_numpy(),
            "phash": phash64_batch(grays) if n else pd.array([], dtype="int64"),
            "mean_luma": lumas,
            "histogram": hists,
        })
        yield out


def thumbnail_fn(out_size: int = 16):
    """Factory: (image_id, bytes, fmt) -> PNG thumbnail column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                thumb = resize_nn(px, out_size, out_size)
                ids.append(image_id)
                blobs.append(encode_png(thumb))
                ws.append(out_size)
                hs.append(out_size)
            yield pd.DataFrame({
                "image_id": ids, "bytes": blobs,
                "w": pd.array(ws, dtype="int32"), "h": pd.array(hs, dtype="int32"),
            })

    return fn


def extract_image_features(images: DataFrame) -> DataFrame:
    """images(image_id, bytes, fmt, ...) -> IMAGE_FEATURES frame."""
    return images.select("image_id", "bytes", "fmt").mapInPandas(
        image_features_fn, IMAGE_FEATURES
    )


def make_thumbnails(images: DataFrame, out_size: int = 16) -> DataFrame:
    return images.select("image_id", "bytes", "fmt").mapInPandas(
        thumbnail_fn(out_size), THUMBNAILS
    )


# ----------------------------------------------------- audio/video stubs

AUDIO_FEATURES = T.StructType([
    T.StructField("audio_id", T.StringType(), False),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
])

VIDEO_FRAMES = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("frame_png", T.BinaryType(), True),
])


def audio_features_fn(sample_rate: int = 16_000, pcm16: bool = True):
    """(audio_id, bytes) -> duration + RMS. Treats the payload as raw
    PCM16 (deterministic, library-free); a real container/codec parser
    slots in here on a cluster."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not pcm16:
            raise NotImplementedError("compressed audio decode not available offline")
        for pdf in batches:
            ids, durs, rmss = [], [], []
            for audio_id, data in zip(pdf["audio_id"], pdf["bytes"]):
                pcm = np.frombuffer(bytes(data), dtype="<i2").astype(np.float64)
                ids.append(audio_id)
                durs.append(len(pcm) / sample_rate)
                rmss.append(float(np.sqrt((pcm ** 2).mean())) if len(pcm) else 0.0)
            yield pd.DataFrame({"audio_id": ids, "duration_s": durs, "rms": rmss})

    return fn


def video_frame_sample_fn(every_n: int = 10):
    """(video_id, bytes) -> one row per sampled frame (frames 0, n, 2n…).

    Demuxes the VMJ1 synthetic container (real-on-synthetic, like the
    audio PCM16 path); a real MP4/WebM demuxer slots into
    ``synth.video.demux_video`` on a cluster — the operator contract
    (opaque binary in, frame rows out) and the plan are unchanged.
    Sampled frame payloads are complete still images, so
    :func:`extract_image_features` composes directly on the output.
    """
    from ..synth.video import demux_video

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, blobs = [], [], []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                frames, _fps = demux_video(bytes(data))
                for no in range(0, len(frames), every_n):
                    ids.append(video_id)
                    nos.append(no)
                    blobs.append(frames[no])
            yield pd.DataFrame({
                "video_id": ids,
                "frame_no": pd.array(nos, dtype="int32"),
                "frame_png": blobs,
            })

    return fn


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """videos(video_id, bytes, ...) -> VIDEO_FRAMES rows."""
    return videos.select("video_id", "bytes").mapInPandas(
        video_frame_sample_fn(every_n), VIDEO_FRAMES
    )
