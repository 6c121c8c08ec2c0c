"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched UDFs
over ``mapInPandas``.

Decode is REAL for the formats stdlib+numpy can parse — P6 PPM images
(``decode_ppm``), WAV audio (``decode_wav``, via the stdlib ``wave``
module), and PPM-sequence "video" (``split_ppm_frames``) — so decode,
nearest-neighbor resize, per-channel statistics, audio RMS/duration, and
frame sampling all run end-to-end on actual pixel/sample data. Only
compressed formats (JPEG/PNG/MP3/H.264) remain stubbed
(``decode_image_stub`` raises NotImplementedError unless the deterministic
fake is requested): those need codec libraries not present in this
container, and the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is identical either way.

This extends the reference's binary-input layer (streams were the only binary
surface — SURVEY.md §1.2) to first-class payload columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "doc_id long, n_bytes int, mime string, payload_hash string, "
    "width int, height int"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake binary payload derived from text (UTF-8 bytes with a
    tiny typed header) — stands in for a real image/audio blob."""
    return df.withColumn(
        "payload",
        F.concat(F.lit(b"FAKEIMG1"), F.encode(F.col(text_col), "utf-8")).cast("binary"),
    ).withColumn("mime", F.lit("image/x-fake"))


def decode_image_stub(payload: bytes, fake: bool = True):
    """STUB: real decode needs an image library not present here.

    With ``fake=True`` returns deterministic (width, height) derived from the
    payload hash so downstream plumbing is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an image library (PIL/cv2) not present in "
            "this environment; plumbing is exercised with fake=True"
        )
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


# ------------------------------------------------------------ real codecs --
# P6 PPM and WAV are fully specified, uncompressed formats parseable with
# stdlib + numpy — no external codec needed, so these paths decode REAL data.


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _ppm_header(payload: bytes, pos: int):
    """Parse one P6 header at ``pos`` → (w, h, raster_start). Shared by
    decode_ppm and split_ppm_frames so validation (magic, comments, maxval)
    cannot drift between them. Raises ValueError on malformed input
    (quarantine via the errorhandler pattern upstream)."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 PPM payload at offset {pos}")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines are not produced by our encoder and rejected here)
    p, fields = pos + 2, []
    while len(fields) < 3:
        while p < len(payload) and payload[p : p + 1].isspace():
            p += 1
        if payload[p : p + 1] == b"#":
            raise ValueError("PPM comments unsupported")
        start = p
        while p < len(payload) and not payload[p : p + 1].isspace():
            p += 1
        fields.append(int(payload[start:p]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return w, h, p + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8."""
    w, h, pos = _ppm_header(payload, 0)
    n = w * h * 3
    raw = payload[pos : pos + n]
    if len(raw) != n:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure-numpy index arithmetic."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def decode_wav(payload: bytes):
    """WAV bytes → (samples float64 in [-1, 1] shaped (n, channels), rate).
    Stdlib ``wave`` handles the RIFF framing; 8/16/32-bit PCM supported."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate, nch, width = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, nch), rate


def split_ppm_frames(payload: bytes):
    """PPM-sequence 'video' (concatenated P6 frames) → list of frame bytes.

    Frame boundaries come from each header's declared dimensions (never from
    searching for the magic — raster bytes can legally contain b"P6");
    _ppm_header validates maxval so frame-length arithmetic is never applied
    to a format it doesn't hold for."""
    frames, pos = [], 0
    while pos < len(payload):
        w, h, raster = _ppm_header(payload, pos)
        end = raster + w * h * 3
        if end > len(payload):
            raise ValueError(f"truncated frame at offset {pos}")
        frames.append(payload[pos:end])
        pos = end
    return frames


def image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real decode + per-channel statistics over PPM payloads, Arrow-batched.
    Output: doc_id, width, height, mean_r/g/b (float, 4 decimals)."""

    schema = (
        "doc_id long, width int, height int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                img = decode_ppm(bytes(b))
                m = img.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (doc_id, img.shape[1], img.shape[0],
                     round(float(m[0]), 4), round(float(m[1]), 4),
                     round(float(m[2]), 4))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height",
                               "mean_r", "mean_g", "mean_b"]
            )

    return df.select("doc_id", payload_col).mapInPandas(run, schema=schema)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  payload_col: str = "payload") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, per Arrow batch.
    Output payload is again a P6 PPM (round-trippable through decode_ppm)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                encode_ppm(resize_nearest(decode_ppm(bytes(b)), out_w, out_h))
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return df.select("doc_id", payload_col).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real WAV decode + duration/RMS per payload, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                x, rate = decode_wav(bytes(b))
                rows.append(
                    (doc_id, rate, x.shape[1],
                     round(x.shape[0] / rate, 6),
                     round(float(np.sqrt((x ** 2).mean())), 6))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "rate", "channels", "duration_s", "rms"]
            )

    return df.select("doc_id", payload_col).mapInPandas(
        run,
        schema="doc_id long, rate int, channels int, duration_s double, rms double",
    )


def frame_sample(df: DataFrame, every_n: int,
                 payload_col: str = "payload") -> DataFrame:
    """REAL frame sampling over PPM-sequence payloads: split frames, keep
    every ``every_n``-th, one output row per kept frame (frame re-encoded as
    a standalone PPM payload)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                for i, fr in enumerate(split_ppm_frames(bytes(b))):
                    if i % every_n == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(fr)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("doc_id", payload_col).mapInPandas(
        run, schema="doc_id long, frame_idx int, frame binary"
    )


def extract_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads (Arrow batches)."""

    cols = ["doc_id", "payload", "mime"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            # md5 (not sha1): an external SQL engine (DuckDB) can recompute it
            # over the same bytes, so the contract oracle verifies the hash
            phash = payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()[:16] if b is not None else None
            )
            dims = payloads.map(
                lambda b: decode_image_stub(bytes(b)) if b is not None else (None, None)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "mime": pdf["mime"],
                    "payload_hash": phash,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(*cols).mapInPandas(run, schema=META_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: explode synthetic
    frame indices (the decode itself is stubbed)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))),
    ).withColumn(
        "frame_key", F.concat_ws(":", F.col("doc_id"), F.col("frame_idx"))
    )
