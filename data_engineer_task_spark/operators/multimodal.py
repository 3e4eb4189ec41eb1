"""Multimodal (image/audio/video) column handling.

Model: media is an opaque ``binary`` column plus typed metadata
columns; all byte-level work happens in Arrow-batched ``mapInPandas``
so executors stream record batches without row-at-a-time pickling.

The actual codec calls (PIL/ffmpeg/torchaudio) are NOT in this
container, so ``decode_fn`` defaults to a clearly-marked deterministic
fake that derives pseudo-metadata from the bytes. The Spark-side
contract — schema, batch iteration, partitioning — is real and tested;
swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "id long, byte_len long, format string, width long, height long, n_frames long"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder. Derives metadata
    purely from the payload bytes so tests are reproducible. Replace
    with a real decoder off-container."""
    if not payload:
        return {"format": "empty", "width": 0, "height": 0, "n_frames": 0}
    return {
        "format": ["jpeg", "png", "wav", "mp4"][payload[0] % 4],
        "width": 16 * (1 + payload[0] % 64),
        "height": 16 * (1 + (payload[1] if len(payload) > 1 else 0) % 64),
        "n_frames": 1 + payload[-1] % 8,
    }


def real_decode(payload: bytes) -> dict:  # pragma: no cover - env-gated
    """The real decoder entry point. Kept as an explicit stub because
    the media libraries are not installed in this environment."""
    raise NotImplementedError(
        "media codecs not available in this environment; use fake_decode"
    )


def decode_media(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    decode_fn: Callable[[bytes], dict] = fake_decode,
) -> DataFrame:
    """Extract metadata from a binary media column via mapInPandas.

    Batches stream through Arrow; ``decode_fn`` runs per row inside the
    batch loop (media decode is inherently per-payload work — this is
    the documented slow path, isolated here by design)."""
    cols = [id_col, binary_col]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_fn(bytes(b) if b is not None else b"") for b in pdf[binary_col]]
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "byte_len": [len(b) if b is not None else 0 for b in pdf[binary_col]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )
            yield out

    return df.select(*cols).mapInPandas(_decode, DECODE_SCHEMA)


def synthesize_media_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake binary media column from text (md5 →
    bytes) — lets the multimodal plumbing run on text-only testdata."""
    return df.select(
        F.col(id_col), F.unhex(F.md5(F.col(text_col))).alias("media")
    )
