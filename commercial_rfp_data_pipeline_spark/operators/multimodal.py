"""Multimodal columns (BASELINE.json extension surface): image/audio/
video as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

The container ships no image/audio libraries, so the actual decode is
STUBBED: ``decode_image_stub`` raises ``NotImplementedError`` when a
real decode is requested and otherwise produces a deterministic fake
(dimensions derived from the content hash). Everything AROUND the stub
— binary schema, metadata struct, partitioning, UDF signature, Arrow
batch shape — is real and tested; swapping in Pillow/ffmpeg is a
one-function change.

Scale: mapInPandas streams Arrow batches (no per-row pickling); binary
payloads never hit the driver; feature extraction is a narrow map, so
a 100-TB media corpus processes at scan speed with per-batch Python
cost amortized by Arrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int"
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture the multimodal shape from testdata: utf-8 bytes of
    the text stand in for media payloads; mime rotates through the
    three modalities so downstream dispatch is exercised."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        mime.alias("mime"),
    )


def decode_image_stub(payload: bytes, mime: str, real: bool = False) -> dict:
    """STUB decode. ``real=True`` is the seam for an actual decoder
    (Pillow / torchaudio / pyav) — not available in this container."""
    if real:
        raise NotImplementedError(
            "media decoding requires image/audio libs not present in the "
            "container; wire Pillow/ffmpeg here in production"
        )
    # md5 (not sha1) so the fake features are reproducible in the
    # DuckDB oracle — the whole stubbed path stays hash-checked
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0],  # deterministic fake dimensions
        "height": 64 + h[1],
        "n_frames": 1 if mime.startswith("image") else 1 + h[2] % 32,
    }


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.
    Real plumbing, stubbed decode (see module doc)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                decode_image_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling for video rows: explode a deterministic frame
    index list (0, n, 2n, ...) per payload — the Spark-side shape of
    clip extraction; the frame bytes themselves come from the decode
    seam."""
    feats = extract_features(df)
    return feats.filter(F.col("mime") == "video/mp4").select(
        "doc_id",
        "content_md5",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
