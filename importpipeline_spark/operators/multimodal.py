"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched UDFs
over ``mapInPandas``. The decode step is STUBBED (no image/audio libs in this
container — ``decode_image_stub`` raises NotImplementedError unless the
deterministic fake is requested), but the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.

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
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))),
    ).withColumn(
        "frame_key", F.concat_ws(":", F.col("doc_id"), F.col("frame_idx"))
    )
