"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (BASELINE.json north star): media is carried
as opaque ``binary`` columns with typed metadata; decode / feature
extraction / frame sampling run as Arrow-batched ``mapInPandas`` UDFs.

The decoder slot is real-when-possible: ``best_image_decoder`` picks
Pillow (``pil_image_decoder``) when importable and falls back to the
deterministic hash stub (``default_image_decoder``) in environments
without an image library, like this container. Audio/video extractors
(torchaudio/ffmpeg) drop into the same ``decoder``/``frame_extractor``
slots unchanged. Everything Spark-side — schema, batch shape,
partitioning, the metadata expressions — is real and tested either way.

Scale notes: metadata extraction (size/hash/magic sniff) is pure JVM
expressions — no Python. The Pandas-UDF decode is the one sanctioned
Python hop: Arrow batches, never per-row; batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decoding 100 TB of
media shuffles nothing — mapInPandas is a narrow transformation.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → media format (JVM-side sniffing, no decode)
_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "494433": "mp3",
    "00000018": "mp4",
    "00000020": "mp4",
}


def pack_media(
    df: DataFrame, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Normalize a payload column into the engine's media contract:
    ``media_bytes binary`` + ``media_meta struct<media_type,n_bytes,
    payload_md5,format_sniff>``. String payloads are utf-8 encoded
    (the test fixture path); real pipelines land binary directly."""
    raw = F.col(payload_col)
    as_bin = raw.cast("binary")
    fmt = F.lower(F.hex(F.substring(as_bin, 1, 4)))
    sniff = F.lit("unknown")
    for magic, name in _MAGIC.items():
        sniff = F.when(fmt.startswith(magic.upper()) | fmt.startswith(magic), F.lit(name)).otherwise(sniff)
    return df.withColumn("media_bytes", as_bin).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(as_bin).alias("n_bytes"),
            F.md5(as_bin).alias("payload_md5"),
            sniff.alias("format_sniff"),
        ),
    )


def default_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake (w, h, channels) derived from
    the payload hash, for environments without an image library (this
    sandbox) and for fixture payloads that aren't real images."""
    h = hashlib.md5(payload or b"").digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4)


def pil_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real decoder: Pillow ``Image.open`` over the payload bytes →
    (width, height, channels). Raises on non-image payloads — real
    pipelines want the loud failure (or a try/except wrapper routing
    to a quarantine column), not silent fake dimensions."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return (im.width, im.height, len(im.getbands()))


def best_image_decoder() -> Callable[[bytes], tuple[int, int, int]]:
    """The decoder ``decode_images`` uses when none is passed: Pillow
    when importable, the deterministic stub otherwise — so the
    component is real wherever an image library exists, with no code
    change."""
    try:
        import PIL.Image  # noqa: F401

        return pil_image_decoder
    except ImportError:
        return default_image_decoder


def decode_images(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Decode media payloads to (width, height, channels) via
    Arrow-batched ``mapInPandas``. Keeps every input column and appends
    the three decode columns; one Python hop, no shuffle."""
    import pandas as pd

    decoder = decoder or best_image_decoder()
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(b) for b in pdf[bytes_col]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in decoded]
            pdf["height"] = [d[1] for d in decoded]
            pdf["channels"] = [d[2] for d in decoded]
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    n_frames: int = 4,
    frame_extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame index (``frame_idx``), frame bytes produced by
    ``frame_extractor`` (STUB: deterministic slice of the payload —
    a real ffmpeg-backed extractor slots in unchanged)."""
    import pandas as pd

    def _default_extractor(b: bytes, idx: int) -> bytes:
        if not b:
            return b""
        step = max(1, len(b) // n_frames)
        return b[idx * step : idx * step + min(64, step)]

    frame_extractor = frame_extractor or _default_extractor
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                for i in range(n_frames):
                    r = row.to_dict()
                    r["frame_idx"] = i
                    r["frame_bytes"] = frame_extractor(row[bytes_col], i)
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(_sample, schema=out_schema)
