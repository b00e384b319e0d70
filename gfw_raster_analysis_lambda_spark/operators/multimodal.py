"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns.

The Spark-side mechanics are fully real — schemas, Arrow batch shapes,
``mapInPandas`` iteration, partition-size control — while the media
codecs follow the environment's reality: the image path uses this repo's
own PNG/raw/quantizer codecs (real, tested); audio/video decode is a
clearly marked STUB (`NotImplementedError`) with a deterministic fake
behind a flag so the plumbing stays testable. Swap the `_decode_audio` /
`_decode_video` bodies for libsndfile/ffmpeg bindings in production.

Iterator-of-batches (`mapInPandas`) rather than scalar UDFs because media
work wants per-batch amortization (shared codec state) and bounded
memory: one Arrow batch of N tiles decodes to N*w*h pixels, which is the
unit the session's ``maxRecordsPerBatch`` bounds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs

IMAGE_STATS_SCHEMA = (
    "image_id string, w int, h int, px_mean double, px_std double, "
    "px_min double, px_max double, phash long, psnr double"
)


def image_stats(images: DataFrame, with_psnr: bool = False) -> DataFrame:
    """Decode every tile and emit per-image pixel statistics + a recomputed
    phash + (opt-in) the decode-fidelity PSNR vs a lossless re-encode.

    ``with_psnr=False`` (default) emits null psnr and skips the
    re-encode+re-decode round trip — it doubles the codec cost of the hot
    path for a fidelity stat most callers never read. With
    ``with_psnr=True``: inf for lossless formats; >= 40 dB required for
    lossy ones (the input-hint invariant)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
                a = arr.astype(np.float64)
                finite = a[~np.isnan(a)]
                # fidelity: lossy formats quantize; compare against their
                # own decode->encode->decode fixpoint (deterministic)
                if not with_psnr:
                    fid = None
                elif str(r.fmt) == "jpeg":
                    rt = codecs.decode_tile(codecs.encode_tile(arr, "jpeg"), int(r.w), int(r.h), "jpeg")
                    fid = codecs.psnr(arr, rt)
                else:
                    fid = float("inf")
                out.append(
                    (
                        r.image_id, int(r.w), int(r.h),
                        float(finite.mean()), float(finite.std()),
                        float(finite.min()), float(finite.max()),
                        codecs.phash64(np.nan_to_num(a)), fid,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "w", "h", "px_mean", "px_std",
                    "px_min", "px_max", "phash", "psnr",
                ],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, IMAGE_STATS_SCHEMA
    )


def resize_tiles(images: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample every tile by ``factor`` and re-encode
    lossless. Returns the input-hint schema with updated payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
                h2, w2 = arr.shape[0] // factor, arr.shape[1] // factor
                small = (
                    arr[: h2 * factor, : w2 * factor]
                    .reshape(h2, factor, w2, factor)
                    .mean(axis=(1, 3))
                    .astype(arr.dtype if arr.dtype != np.float32 else np.float32)
                )
                fmt = "raw_f32" if arr.dtype == np.float32 else ("raw_u16" if arr.dtype == np.uint16 else "raw_u8")
                rows.append(
                    (
                        r.image_id, codecs.encode_tile(small, fmt), w2, h2, fmt,
                        r.caption, codecs.phash64(np.nan_to_num(small.astype(np.float64))),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return images.mapInPandas(
        run,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def augment_tiles(
    images: DataFrame,
    op: str = "fliph",
    crop: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Deterministic image augmentation for training-data pipelines:
    ``op`` in {fliph, flipv, rot90, rot180, rot270, crop}. ``crop`` is
    (row0, col0, h, w). Decode -> transform -> lossless re-encode; output
    keeps the input-hint schema (caption passes through byte-equal, phash
    recomputed on the transformed pixels). Deterministic on purpose — a
    training corpus rebuild must reproduce bit-identical augmented tiles."""
    if op == "crop" and crop is None:
        raise ValueError("op='crop' requires crop=(row0, col0, h, w)")
    if op not in ("fliph", "flipv", "rot90", "rot180", "rot270", "crop"):
        raise ValueError(f"unknown op {op!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
                if op == "fliph":
                    out = arr[:, ::-1]
                elif op == "flipv":
                    out = arr[::-1, :]
                elif op == "rot90":
                    out = np.rot90(arr, 1)
                elif op == "rot180":
                    out = np.rot90(arr, 2)
                elif op == "rot270":
                    out = np.rot90(arr, 3)
                else:
                    r0, c0, hh, ww = crop
                    out = arr[r0:r0 + hh, c0:c0 + ww]
                out = np.ascontiguousarray(out)
                fmt = "raw_f32" if out.dtype == np.float32 else (
                    "raw_u16" if out.dtype == np.uint16 else "raw_u8"
                )
                rows.append((
                    r.image_id, codecs.encode_tile(out, fmt),
                    out.shape[1], out.shape[0], fmt, r.caption,
                    codecs.phash64(np.nan_to_num(out.astype(np.float64))),
                ))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt", "caption").mapInPandas(
        run,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


# ---------------------------------------------------------------------------
# Audio / video: STUBS (no libsndfile/ffmpeg in this environment)
# ---------------------------------------------------------------------------

def _decode_audio(payload: bytes, fake: bool) -> np.ndarray:
    if fake:
        # deterministic fake: payload bytes as int16 PCM
        return np.frombuffer(payload[: (len(payload) // 2) * 2], dtype="<i2").astype(np.float32) / 32768.0
    raise NotImplementedError(
        "audio decode requires libsndfile/ffmpeg, not present in this "
        "environment; pass fake=True for the deterministic test codec"
    )


def _decode_video(payload: bytes, fake: bool) -> np.ndarray:
    if fake:
        # deterministic fake: bytes -> (frames, 8, 8) uint8 cube
        n = len(payload) // 64
        return np.frombuffer(payload[: n * 64], dtype=np.uint8).reshape(n, 8, 8)
    raise NotImplementedError(
        "video decode requires ffmpeg, not present in this environment; "
        "pass fake=True for the deterministic test codec"
    )


def audio_features(df: DataFrame, fake_codec: bool = False) -> DataFrame:
    """(media_id, n_samples, rms) per audio payload. Real plumbing,
    stubbed entropy decode (see module docstring)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = _decode_audio(bytes(r.payload), fake_codec)
                rms = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
                rows.append((r.media_id, len(pcm), rms))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "rms"])

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id string, n_samples long, rms double"
    )


def video_frame_sample(df: DataFrame, every_n: int = 2, fake_codec: bool = False) -> DataFrame:
    """Explode every n-th frame of each video payload as its own image
    row — the frame-sampling stage of a video training pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                cube = _decode_video(bytes(r.payload), fake_codec)
                for fi in range(0, cube.shape[0], every_n):
                    rows.append(
                        (r.media_id, fi, codecs.encode_tile(cube[fi], "png"), 8, 8, "png")
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame", "bytes", "w", "h", "fmt"]
            )

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id string, frame int, bytes binary, w int, h int, fmt string"
    )
