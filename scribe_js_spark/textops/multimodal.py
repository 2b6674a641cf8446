"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas`` — the Spark-side plumbing (schema, batching, partition
behavior) is real and tested; the actual codec step is stubbed because
image/audio libraries are not in this container:

- media with the deterministic ``SIMG`` synthetic header decode fully
  (the test path),
- real formats (PNG/JPEG/...) raise ``NotImplementedError`` inside the
  per-document handler and surface as an ``error`` column value, never a
  job failure — the same never-fatal contract as document extraction.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("error", StringType()),
])

_SIMG_MAGIC = b"SIMG"


def encode_synth_image(width: int, height: int, payload: bytes) -> bytes:
    """Deterministic fake image container used by tests/benchmarks."""
    return _SIMG_MAGIC + struct.pack("<II", width, height) + payload


def _decode_one(data: bytes) -> dict:
    if data[:4] == _SIMG_MAGIC:
        width, height = struct.unpack("<II", data[4:12])
        payload = data[12:]
        mean = (sum(payload) / len(payload)) if payload else 0.0
        return {"kind": "simg", "width": width, "height": height,
                "n_bytes": len(data), "mean_byte": mean, "error": None}
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:3] == b"\xff\xd8\xff":
        # Real codecs are stubbed in this environment (no imaging libs).
        raise NotImplementedError("real image codecs not available")
    return {"kind": None, "width": None, "height": None,
            "n_bytes": len(data), "mean_byte": None,
            "error": "unknown_media_format"}


def decode_media(df: DataFrame, id_col: str = "media_id",
                 bytes_col: str = "data") -> DataFrame:
    """binary column -> typed metadata rows via Arrow-batched pandas UDF."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {f.name: [] for f in MEDIA_META_SCHEMA.fields}
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    rec = _decode_one(bytes(data))
                except NotImplementedError as e:
                    rec = {"kind": None, "width": None, "height": None,
                           "n_bytes": len(bytes(data)), "mean_byte": None,
                           "error": f"not_implemented: {e}"}
                out["media_id"].append(int(mid))
                for key in ("kind", "width", "height", "n_bytes",
                            "mean_byte", "error"):
                    out[key].append(rec[key])
            yield pd.DataFrame(out)

    return df.select(
        df[id_col].alias("media_id"), df[bytes_col].alias("data")
    ).mapInPandas(fn, schema=MEDIA_META_SCHEMA)
