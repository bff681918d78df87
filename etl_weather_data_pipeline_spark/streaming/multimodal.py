"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video decoding libraries are NOT in this container, so the
decoder is a clearly-marked deterministic stub — but the Spark-side
machinery (binary column schema, Arrow batch iteration via ``mapInPandas``,
output schema, partition behavior) is real and tested. Swapping
``_fake_decode`` for PIL/librosa/ffmpeg is a one-function change that
doesn't touch the plan.

At 100 TB: payloads should be stored as parquet binary columns with
metadata columns alongside (never inside the payload); decode runs
map-side with Arrow batches. Memory is bounded INSIDE the operator
(``max_batch_rows`` re-chunks whatever batch size the session's Arrow
conf delivers), so no session config needs mutating — the remaining
tuning knob is input-split size.
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
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_batch_rows: int = 256,
) -> DataFrame:
    """Extract typed features from a binary payload column, Arrow-batched.

    ``mapInPandas`` streams batches through Python once — no per-row pickle,
    no driver involvement; scales with partition count.

    Memory bound: the incoming Arrow batch size belongs to the session
    (``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) and a
    decoder can fan each row out by orders of magnitude, so the operator
    re-chunks every incoming batch to ``max_batch_rows`` rows before
    decoding — the peak decoded footprint is bounded here, without
    mutating shared session config on the caller.

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

        _NULL_ROW = {
            "byte_len": None,
            "head_byte": None,
            "checksum": None,
            "width": None,
            "height": None,
        }

        for pdf in batches:
            for lo in range(0, len(pdf), max_batch_rows):
                chunk = pdf.iloc[lo : lo + max_batch_rows]
                # NULL payload -> null feature row (the per-item-error
                # contract): bytes(None) would TypeError in the plumbing
                # and fail the whole task before the swappable decoder
                # ever ran.
                feats = chunk[payload_col].map(
                    lambda p: _NULL_ROW if p is None else fake_decode(bytes(p))
                )
                out = pd.DataFrame(list(feats))
                out.insert(0, id_col, chunk[id_col].values)
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
            # zip over .values — no per-row pandas Series construction
            # (iterrows builds one per row: measured ~20x slower).
            ids: list = []
            fidx: list[int] = []
            offs: list[int] = []
            fbytes: list[int] = []
            for rid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                if p is None:
                    continue  # a NULL payload has no frames to sample
                payload = bytes(p)
                for f in range(min(max_frames, len(payload) // every_n_bytes)):
                    off = f * every_n_bytes
                    ids.append(rid)
                    fidx.append(f)
                    offs.append(off)
                    fbytes.append(payload[off])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "frame_byte": pd.Series(fbytes, dtype="int32"),
                }
            )

    return df.mapInPandas(
        sample, f"{id_col} long, frame_idx int, offset int, frame_byte int"
    )


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, src_width int, src_height int, "
    "resized binary"
)


def resize_images(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_batch_rows: int = 256,
) -> DataFrame:
    """'Resize' a binary image column to ``width x height``, Arrow-batched
    — the third multimodal plumbing shape next to decode (1 row -> 1
    feature row) and frame_sample (1 row -> N rows): 1 binary in ->
    1 (smaller) binary out, the preprocessing step a vision-training
    pipeline runs per image. The resizer is a deterministic stub (PIL
    is not in this container): it derives the stub's source dims the
    same way decode_features does and emits a width*height byte grid
    sampled from the payload — real impl is the commented two-liner;
    the output CONTRACT (binary column whose length is exactly
    width*height, metadata alongside, bounded per-batch memory) is
    what the tests pin and what a PIL swap must preserve.

    Memory bound: output rows carry width*height bytes each, so the
    re-chunk to ``max_batch_rows`` bounds the decoded+resized footprint
    per Arrow batch regardless of the session's batch size, same knob
    as decode_features.
    """

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        def fake_resize(payload: bytes) -> tuple[int, int, bytes]:
            # Real impl (requires pillow):
            #   img = PIL.Image.open(io.BytesIO(payload))
            #   out = img.resize((width, height)).tobytes()
            n = len(payload)
            checksum = 0
            for b in payload[:64]:
                checksum = (checksum * 31 + b) % (1 << 31)
            sw, sh = (checksum % 64) + 1, (checksum % 48) + 1
            if n == 0:
                return sw, sh, bytes(width * height)
            # nearest-neighbor sample over the payload as a sw x sh grid
            out = bytearray(width * height)
            for y in range(height):
                for x in range(width):
                    sx = x * sw // width
                    sy = y * sh // height
                    out[y * width + x] = payload[(sy * sw + sx) % n]
            return sw, sh, bytes(out)

        for pdf in batches:
            for lo in range(0, len(pdf), max_batch_rows):
                chunk = pdf.iloc[lo : lo + max_batch_rows]
                sws: list[int | None] = []
                shs: list[int | None] = []
                outs: list[bytes | None] = []
                for p in chunk[payload_col].values:
                    if p is None:
                        # null in, null row out (per-item-error contract)
                        sws.append(None)
                        shs.append(None)
                        outs.append(None)
                        continue
                    sw, sh, rb = fake_resize(bytes(p))
                    sws.append(sw)
                    shs.append(sh)
                    outs.append(rb)
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "width": pd.Series(
                            [width] * len(chunk), dtype="int32"
                        ),
                        "height": pd.Series(
                            [height] * len(chunk), dtype="int32"
                        ),
                        # object dtype: may carry None for null
                        # payloads; Arrow casts to the int32 schema
                        "src_width": pd.Series(sws, dtype=object),
                        "src_height": pd.Series(shs, dtype=object),
                        "resized": pd.Series(outs, dtype=object),
                    }
                )

    return df.mapInPandas(resize_batches, RESIZE_SCHEMA)
