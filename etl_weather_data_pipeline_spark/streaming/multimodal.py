"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video decoding libraries are NOT in this container, so the
decoder is a clearly-marked deterministic stub — but the Spark-side
machinery (binary column schema, Arrow batch iteration via ``mapInPandas``,
output schema, partition behavior) is real and tested. Swapping
``_fake_decode`` for PIL/librosa/ffmpeg is a one-function change that
doesn't touch the plan.

At 100 TB: payloads should be stored as parquet binary columns with
metadata columns alongside (never inside the payload); decode runs
map-side with Arrow batches, so the only tuning knobs are
``spark.sql.execution.arrow.maxRecordsPerBatch`` (bound memory for large
payloads) and input-split size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, byte_len int, head_byte int, checksum long, "
    "width int, height int"
)


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Extract typed features from a binary payload column, Arrow-batched.

    ``mapInPandas`` streams batches through Python once — no per-row pickle,
    no driver involvement; scales with partition count.

    The decoder is nested (not module-level) on purpose: cloudpickle then
    serializes it BY VALUE, so executors never need this package on their
    PYTHONPATH — the UDF works even when the driver imported us from an
    arbitrary path.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> dict:
            # Deterministic stand-in for an image decoder. Real impl:
            #   img = PIL.Image.open(io.BytesIO(payload))  # requires pillow
            # A production decoder should catch per-item errors and emit a
            # null row rather than fail the task.
            n = len(payload)
            checksum = 0
            for b in payload[:64]:  # bounded: only the "header"
                checksum = (checksum * 31 + b) % (1 << 31)
            return {
                "byte_len": n,
                "head_byte": payload[0] if n else 0,
                "checksum": checksum,
                "width": (checksum % 64) + 1,
                "height": (checksum % 48) + 1,
            }

        for pdf in batches:
            feats = pdf[payload_col].map(lambda p: fake_decode(bytes(p)))
            out = pd.DataFrame(list(feats))
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(decode_batches, DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 32,
    max_frames: int = 4,
) -> DataFrame:
    """'Frame sampling' over an opaque payload: emit one row per sampled
    offset (stands in for video frame extraction; same plumbing shape —
    one input row fans out to N output rows inside the Arrow batch)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col])
                for f in range(min(max_frames, max(len(payload) // every_n_bytes, 0))):
                    off = f * every_n_bytes
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": f,
                            "offset": off,
                            "frame_byte": payload[off],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "offset", "frame_byte"]
            )

    return df.mapInPandas(
        sample, f"{id_col} long, frame_idx int, offset int, frame_byte int"
    )
