"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (extension surface; the reference is
text-only).

The Spark-side plumbing -- schema, partition-aware batch iteration, Arrow
batch shapes, UDF signatures -- is real and tested.  The actual codec
work (JPEG decode, resampling, frame extraction) needs image/audio
libraries that are NOT in this container, so the decode kernel is
stubbed: ``decode_stub=True`` (default) produces a deterministic fake
(byte-derived "pixels"), and ``decode_stub=False`` raises
``NotImplementedError`` at the clearly marked integration point where a
real ``PIL.Image.open`` / ``soundfile.read`` call would go.

Design notes for 100 TB: binary payloads ride in parquet alongside
metadata so predicate pushdown on metadata prunes before any byte is
decoded; decoding runs in ``mapInPandas`` (Arrow batches, one Python
worker per core, no per-row pickling); frame/patch outputs explode
*after* the filter, never before.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema an ingest job attaches to each blob
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Treat document text bytes as opaque blobs -- the stand-in media
    table for plumbing tests (no real images ship with the testdata)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Cheap metadata pass: never decodes, pure expressions -- the
    pushdown-friendly prefilter stage."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
    )


_DECODE_OUT_SCHEMA = (
    "media_id long, kind string, n_bytes int, feat_mean double, feat_dim int"
)


def decode_and_featurize(
    media: DataFrame, batch_size: int = 256, decode_stub: bool = True
) -> DataFrame:
    """Decode blobs and emit a fixed-width feature row per blob.

    ``mapInPandas``: Arrow-batched, partition-parallel, zero driver
    involvement.  The stub "decoder" derives a deterministic fake pixel
    stream from the payload bytes so the full batch path (schema,
    slicing, feature shape) is exercised and assertable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                # >>> INTEGRATION POINT: real decoder goes here, e.g.
                #   img = PIL.Image.open(io.BytesIO(payload))
                # Image/audio libraries are not available in this
                # container (see module docstring).
                raise NotImplementedError(
                    "real media decoding requires PIL/soundfile; "
                    "run with decode_stub=True in this environment"
                )
            payloads = pdf["payload"]
            # deterministic fake decode: bytes -> uint8 "pixels".
            # Round half-up (not pandas' half-even): byte means of
            # power-of-two-sized payloads land on exact .xxxx5 ties,
            # and SQL engines round those away from zero.
            feat_mean = payloads.map(
                lambda b: math.floor((sum(b) / len(b)) * 10000 + 0.5) / 10000
                if len(b)
                else 0.0
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "feat_mean": feat_mean,
                    "feat_dim": 64,
                }
            )
            yield out

    return media.mapInPandas(run, schema=_DECODE_OUT_SCHEMA)


_RESIZE_OUT_SCHEMA = (
    "media_id long, out_w int, out_h int, payload binary, n_bytes int"
)


def resize(
    media: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    batch_size: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize every image blob to ``out_w x out_h`` and re-emit the
    (smaller) payload -- the thumbnailing / normalization stage of an
    image pipeline.

    Same ``mapInPandas`` shape as :func:`decode_and_featurize` (Arrow
    batches, partition-parallel); the stub "resampler" nearest-neighbor
    subsamples the raw bytes to exactly ``out_w*out_h`` so payload
    sizing, binary round-trip, and downstream schema are all real and
    assertable.  At scale the output parquet is a fraction of the input
    bytes, so resize runs early and everything downstream reads the
    shrunken table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = out_w * out_h
        for pdf in batches:
            if not decode_stub:
                # >>> INTEGRATION POINT: real resampler goes here, e.g.
                #   PIL.Image.open(io.BytesIO(b)).resize((out_w, out_h))
                raise NotImplementedError(
                    "real image resizing requires PIL; "
                    "run with decode_stub=True in this environment"
                )

            def shrink(b: bytes) -> bytes:
                if not b:
                    return bytes(n_out)
                step = max(1, len(b) // n_out)
                out = b[::step][:n_out]
                return out + bytes(n_out - len(out))  # pad short blobs

            payloads = pdf["payload"].map(shrink)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "payload": payloads,
                    "n_bytes": payloads.map(len).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=_RESIZE_OUT_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling, stubbed over byte offsets: emit one
    row per sampled "frame" (one per ``every_n_bytes`` stride) with a
    digest of the bytes AT that offset, so frames of one blob differ.
    Explodes AFTER any metadata filter -- at scale the explode multiplies
    rows, so it must sit above the pruned scan, and does.  The substring
    runs on the binary payload directly (no string round-trip)."""
    n_frames = F.greatest(
        (F.octet_length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "offset_blk"),
        "payload",
    ).select(
        "media_id",
        "frame_idx",
        F.md5(
            F.substring(
                "payload",
                F.col("offset_blk") * every_n_bytes + 1,
                F.lit(every_n_bytes),
            )
        ).alias("frame_digest"),
    )
