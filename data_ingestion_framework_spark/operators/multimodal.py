"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (BASELINE.json north star): media is carried
as opaque ``binary`` columns with typed metadata; decode / feature
extraction / frame sampling run as Arrow-batched ``mapInPandas`` UDFs.

The decoder slot is real by default: ``best_image_decoder`` picks
Pillow (``pil_image_decoder``) when importable and otherwise
``header_image_decoder`` — a pure-stdlib ``struct`` parse of the
public PNG IHDR / GIF logical-screen-descriptor / JPEG SOF header
layouts, which yields true width/height/channels with no image
library at all. Both real decoders fail loudly on non-image bytes;
the hash stub (``default_image_decoder``) remains only for fixture
payloads that aren't images. Audio/video extractors
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
import struct
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → sample channels (spec: greyscale, truecolor,
#: indexed, grey+alpha, truecolor+alpha)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers (C0-CF minus DHT C4 / JPG C8 / DAC CC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_dims(payload: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib (width, height, channels) from PNG / GIF / JPEG
    header bytes; ``None`` when the payload is none of the three.

    Reads only the public container layouts — PNG's IHDR chunk
    (8-byte signature, then len+``IHDR``+13 data bytes: two u32be
    dims, bit depth, color type), GIF's logical screen descriptor
    (two u16le dims after ``GIF8?a``), and JPEG's first SOF segment
    (marker scan; u16be height, width, component count) — no image
    library and no pixel decoding.
    """
    if payload is None:
        return None
    if len(payload) >= 26 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        channels = _PNG_CHANNELS.get(payload[25])
        return None if channels is None else (w, h, channels)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        # indexed-color frames resolve to RGB triples
        return (w, h, 3)
    if len(payload) >= 4 and payload[:3] == b"\xff\xd8\xff":
        i = 2
        # an SOF read touches payload[i+9], so the guard is i+10 <= len
        while i + 10 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return (w, h, payload[i + 9])
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def header_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real decoder with zero dependencies: header parse via
    ``parse_image_dims``. Like the Pillow path it raises on
    non-image payloads — loud failure, no fake dimensions."""
    dims = parse_image_dims(payload)
    if dims is None:
        raise ValueError(
            f"not a parseable PNG/GIF/JPEG payload ({(payload or b'')[:8]!r})"
        )
    return dims


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
    when importable (full decode, any format Pillow knows), else the
    stdlib header parser — real dimensions either way, with no code
    change and no dependency."""
    try:
        import PIL.Image  # noqa: F401

        return pil_image_decoder
    except ImportError:
        return header_image_decoder


def _be_bytes(col, n_bytes: int):
    """Big-endian unsigned bytes of an integral column, JVM-side
    (hex → left-pad → unhex)."""
    return F.unhex(F.lpad(F.hex(col), 2 * n_bytes, "0"))


def _le2_bytes(col):
    """Little-endian u16 bytes of an integral column (byte-swapped
    big-endian)."""
    h = F.lpad(F.hex(col), 4, "0")
    return F.unhex(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)))


def synthesize_png_header(width, height, color_type):
    """A spec-valid PNG signature + IHDR chunk as a binary Column,
    built entirely from JVM expressions (dims u32be, bit depth 8,
    CRC-32 via ``F.crc32`` — the same polynomial PNG mandates). Enough
    image for any header-level decoder; pixel chunks are absent by
    design (dimension plumbing, not pixel fabrication)."""
    ihdr_body = F.concat(
        F.lit(b"IHDR"),
        _be_bytes(width, 4),
        _be_bytes(height, 4),
        F.lit(b"\x08"),
        _be_bytes(color_type, 1),
        F.lit(b"\x00\x00\x00"),
    )
    return F.concat(
        F.lit(_PNG_SIG),
        _be_bytes(F.lit(13), 4),
        ihdr_body,
        _be_bytes(F.crc32(ihdr_body), 4),
    )


def synthesize_gif_header(width, height):
    """A GIF89a logical screen descriptor as a binary Column (dims
    u16le + minimal packed fields)."""
    return F.concat(
        F.lit(b"GIF89a"), _le2_bytes(width), _le2_bytes(height), F.lit(b"\xf7\x00\x00")
    )


def _le4_bytes(col):
    """Little-endian u32 bytes of an integral column (byte-swapped
    big-endian)."""
    h = F.lpad(F.hex(col), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(h, 7, 2),
            F.substring(h, 5, 2),
            F.substring(h, 3, 2),
            F.substring(h, 1, 2),
        )
    )


def synthesize_wav_header(sample_rate, channels, bits_per_sample, n_frames):
    """A spec-valid RIFF/WAVE header (fmt + data chunk headers) as a
    binary Column, built from JVM expressions following the public
    canonical-WAVE layout: ``RIFF`` size ``WAVE``, then the 16-byte
    PCM ``fmt `` chunk (audio format 1, channels u16le, sample rate
    u32le, byte rate, block align, bits), then the ``data`` chunk
    header with its declared size. Sample bytes are absent by design —
    metadata plumbing, not audio fabrication (same stance as
    ``synthesize_png_header``)."""
    block_align = F.call_function(
        "div", (channels * bits_per_sample).cast("bigint"), F.lit(8).cast("bigint")
    )
    data_size = (n_frames * block_align).cast("bigint")
    byte_rate = (sample_rate * block_align).cast("bigint")
    fmt_chunk = F.concat(
        F.lit(b"fmt "),
        _le4_bytes(F.lit(16)),
        _le2_bytes(F.lit(1)),
        _le2_bytes(channels),
        _le4_bytes(sample_rate),
        _le4_bytes(byte_rate),
        _le2_bytes(block_align),
        _le2_bytes(bits_per_sample),
    )
    return F.concat(
        F.lit(b"RIFF"),
        _le4_bytes(data_size + F.lit(36)),
        F.lit(b"WAVE"),
        fmt_chunk,
        F.lit(b"data"),
        _le4_bytes(data_size),
    )


def parse_wav_meta(payload: bytes) -> tuple[int, int, int, int] | None:
    """Pure-stdlib (sample_rate, channels, bits_per_sample, n_frames)
    from RIFF/WAVE header bytes; ``None`` when the payload isn't a
    parseable PCM WAV. Walks the chunk list (id + u32le size) for the
    ``fmt `` and ``data`` chunks — the data chunk's DECLARED size
    yields the frame count, so header-only payloads parse like full
    files (audio libraries read the same fields the same way)."""
    if payload is None or len(payload) < 36:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    n_frames = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(payload):
            audio_fmt, channels, rate = struct.unpack("<HHI", payload[i + 8 : i + 16])
            bits = struct.unpack("<H", payload[i + 22 : i + 24])[0]
            if audio_fmt != 1 or channels == 0 or bits == 0 or rate == 0:
                return None
            fmt = (rate, channels, bits)
        elif cid == b"data" and fmt is not None:
            block_align = fmt[1] * fmt[2] // 8
            if block_align == 0:
                return None
            n_frames = size // block_align
            break
        # chunk bodies may be absent in header-only payloads; advance
        # past the declared body only when the bytes are actually there.
        # RIFF chunks are word-aligned: an odd-size body carries one
        # pad byte that is NOT counted in the size field.
        skip = size + (size & 1)
        i += 8 + (skip if i + 8 + skip <= len(payload) else 0)
        if i + 8 > len(payload):
            break
    if fmt is None or n_frames is None:
        return None
    return (fmt[0], fmt[1], fmt[2], n_frames)


def decode_audio(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    parser: Callable[[bytes], tuple[int, int, int, int] | None] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Audio metadata extraction through the same Arrow-batched
    ``mapInPandas`` hop as ``decode_images``: appends (sample_rate,
    channels, bits_per_sample, n_frames, duration_sec) to every row.
    ``parser`` defaults to the stdlib WAV header parse; a torchaudio/
    soundfile-backed callable drops into the slot unchanged. Same
    ``on_error`` policy: 'raise' fails loudly, 'quarantine' NULLs the
    fields and carries the error text."""
    import pandas as pd

    from pyspark.sql import types as T

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    parser = parser or parse_wav_meta
    out_fields = list(df.schema.fields) + [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
    if on_error == "quarantine":
        out_fields.append(T.StructField("decode_error", T.StringType()))
    out_schema = T.StructType(out_fields)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            rates, chans, bits, frames, durs, errs = [], [], [], [], [], []
            for b in pdf[bytes_col]:
                # compute the whole row first, append ONCE — a partial
                # append before a late failure would skew the column
                # lengths and crash the task, defeating quarantine
                try:
                    meta = parser(bytes(b) if b is not None else None)
                    if meta is None:
                        raise ValueError("not a parseable PCM WAV payload")
                    r, c, bps, nf = meta
                    if r <= 0:
                        raise ValueError(f"non-positive sample rate {r}")
                    row = (r, c, bps, nf, nf / r, None)
                except Exception as e:  # noqa: BLE001 — quarantine policy
                    if on_error == "raise":
                        raise
                    row = (None, None, None, None, None, f"{type(e).__name__}: {e}")
                rates.append(row[0])
                chans.append(row[1])
                bits.append(row[2])
                frames.append(row[3])
                durs.append(row[4])
                errs.append(row[5])
            pdf["sample_rate"] = pd.array(rates, dtype="Int32")
            pdf["channels"] = pd.array(chans, dtype="Int32")
            pdf["bits_per_sample"] = pd.array(bits, dtype="Int32")
            pdf["n_frames"] = pd.array(frames, dtype="Int64")
            # nullable Float64: quarantined rows get a true NULL, not
            # NaN (WHERE duration_sec IS NULL must see them)
            pdf["duration_sec"] = pd.array(durs, dtype="Float64")
            if on_error == "quarantine":
                pdf["decode_error"] = errs
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def decode_images(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Decode media payloads to (width, height, channels) via
    Arrow-batched ``mapInPandas``. Keeps every input column and appends
    the three decode columns; one Python hop, no shuffle.

    ``on_error`` picks the failure policy for undecodable payloads:
    ``"raise"`` (default — a corrupt payload fails the job loudly) or
    ``"quarantine"`` — dims come back NULL and a ``decode_error``
    string column carries the exception text, so a 100 TB run routes
    bad payloads to a quarantine sink (filter on ``decode_error IS NOT
    NULL``) instead of dying on the first truncated file.
    """
    import pandas as pd

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    decoder = decoder or best_image_decoder()
    from pyspark.sql import types as T

    out_fields = list(df.schema.fields) + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
    if on_error == "quarantine":
        out_fields.append(T.StructField("decode_error", T.StringType()))
    out_schema = T.StructType(out_fields)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if on_error == "raise":
                decoded = [decoder(b) for b in pdf[bytes_col]]
                errors = None
            else:
                decoded, errors = [], []
                for b in pdf[bytes_col]:
                    try:
                        decoded.append(decoder(b))
                        errors.append(None)
                    except Exception as e:  # noqa: BLE001 — routed, not dropped
                        decoded.append((None, None, None))
                        errors.append(f"{type(e).__name__}: {e}")
            pdf["width"] = [d[0] for d in decoded]
            pdf["height"] = [d[1] for d in decoded]
            pdf["channels"] = [d[2] for d in decoded]
            if errors is not None:
                pdf["decode_error"] = errors
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
        # one whole-batch copy per frame index (n_frames is small),
        # not a per-row iterrows loop — the only per-payload Python is
        # the extractor call itself
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            frames = []
            for i in range(n_frames):
                c = pdf.copy()
                c["frame_idx"] = i
                c["frame_bytes"] = [frame_extractor(b, i) for b in pdf[bytes_col]]
                frames.append(c)
            yield pd.concat(frames, ignore_index=True)[cols]

    return df.mapInPandas(_sample, schema=out_schema)


# -- MP4 / ISO BMFF video containers -----------------------------------------

def synthesize_mp4_header(timescale, duration_units, width, height):
    """A spec-valid ISO BMFF (MP4) metadata skeleton as a binary
    Column, built from JVM expressions following the public ISO/IEC
    14496-12 box layout: ``ftyp`` (isom), then ``moov`` containing a
    version-0 ``mvhd`` (timescale u32be, duration u32be) and one
    ``trak``/``tkhd`` whose width/height are 16.16 fixed-point.
    Media sample data (``mdat``) is absent by design — metadata
    plumbing, not video fabrication (the ``synthesize_wav_header``
    stance)."""
    z = lambda n: F.lit(b"\x00" * n)  # noqa: E731
    ftyp = F.concat(
        _be_bytes(F.lit(20), 4), F.lit(b"ftyp"),
        F.lit(b"isom"), _be_bytes(F.lit(512), 4), F.lit(b"isom"),
    )
    mvhd = F.concat(
        _be_bytes(F.lit(108), 4), F.lit(b"mvhd"),
        z(4),                       # version 0 + flags
        z(8),                       # creation + modification
        _be_bytes(timescale, 4),
        _be_bytes(duration_units, 4),
        _be_bytes(F.lit(0x00010000), 4),  # rate 1.0
        _be_bytes(F.lit(0x0100), 2),      # volume 1.0
        z(10),                      # reserved
        z(36),                      # identity matrix slot (zeros suffice)
        z(24),                      # pre_defined
        _be_bytes(F.lit(2), 4),     # next_track_ID
    )
    tkhd = F.concat(
        _be_bytes(F.lit(92), 4), F.lit(b"tkhd"),
        z(4),                       # version 0 + flags
        z(8),                       # creation + modification
        _be_bytes(F.lit(1), 4),     # track_ID
        z(4),                       # reserved
        _be_bytes(duration_units, 4),
        z(16),                      # reserved/layer/alt_group/volume/reserved
        z(36),                      # matrix
        _be_bytes((width.cast("bigint") * F.lit(65536)), 4),   # 16.16
        _be_bytes((height.cast("bigint") * F.lit(65536)), 4),  # 16.16
    )
    trak = F.concat(_be_bytes(F.lit(100), 4), F.lit(b"trak"), tkhd)
    moov = F.concat(_be_bytes(F.lit(216), 4), F.lit(b"moov"), mvhd, trak)
    return F.concat(ftyp, moov)


def parse_mp4_meta(payload: bytes) -> tuple[int, int, int, int] | None:
    """Pure-stdlib (timescale, duration_units, width, height) from ISO
    BMFF bytes; ``None`` when the payload isn't parseable. Walks the
    top-level box list (u32be size + fourcc), recurses into ``moov``/
    ``trak`` for the version-0 ``mvhd`` and first ``tkhd`` — the same
    fields ffprobe/mp4box surface, read the same way."""
    if payload is None or len(payload) < 16:
        return None

    def boxes(buf, i, end):
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            if size < 8 or i + size > end:
                return
            yield buf[i + 4 : i + 8], i + 8, i + size
            i += size

    mvhd = tkhd = None
    saw_ftyp = False
    for name, body, bend in boxes(payload, 0, len(payload)):
        if name == b"ftyp":
            saw_ftyp = True
        elif name == b"moov":
            for n2, b2, e2 in boxes(payload, body, bend):
                if n2 == b"mvhd" and payload[b2] == 0 and e2 - b2 >= 24:
                    ts, dur = struct.unpack(">II", payload[b2 + 12 : b2 + 20])
                    mvhd = (ts, dur)
                elif n2 == b"trak" and tkhd is None:
                    for n3, b3, e3 in boxes(payload, b2, e2):
                        if n3 == b"tkhd" and payload[b3] == 0 and e3 - b3 >= 84:
                            w, h = struct.unpack(">II", payload[b3 + 76 : b3 + 84])
                            tkhd = (w >> 16, h >> 16)
                            break
    if not saw_ftyp or mvhd is None or tkhd is None or mvhd[0] == 0:
        return None
    return (mvhd[0], mvhd[1], tkhd[0], tkhd[1])


def decode_video(
    df: DataFrame,
    bytes_col: str = "media_bytes",
    parser: Callable[[bytes], tuple[int, int, int, int] | None] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Video container metadata through the same Arrow-batched
    ``mapInPandas`` hop as ``decode_audio``: appends (timescale,
    duration_units, duration_sec, width, height). ``parser`` defaults
    to the stdlib ISO BMFF walk; an ffprobe/pyav-backed callable drops
    into the slot unchanged. ``on_error='quarantine'`` NULLs the
    fields and carries the error text instead of failing the job."""
    import pandas as pd

    from pyspark.sql import types as T

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    parser = parser or parse_mp4_meta
    out_fields = list(df.schema.fields) + [
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_units", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
    if on_error == "quarantine":
        out_fields.append(T.StructField("decode_error", T.StringType()))
    out_schema = T.StructType(out_fields)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            tss, durs, secs, ws, hs, errs = [], [], [], [], [], []
            for b in pdf[bytes_col]:
                try:
                    meta = parser(bytes(b) if b is not None else None)
                    if meta is None:
                        raise ValueError("not a parseable ISO BMFF payload")
                    ts, dur, w, h = meta
                    row = (ts, dur, dur / ts, w, h, None)
                except Exception as e:  # noqa: BLE001 — quarantine policy
                    if on_error == "raise":
                        raise
                    row = (None, None, None, None, None,
                           f"{type(e).__name__}: {e}")
                tss.append(row[0])
                durs.append(row[1])
                secs.append(row[2])
                ws.append(row[3])
                hs.append(row[4])
                errs.append(row[5])
            pdf["timescale"] = pd.array(tss, dtype="Int32")
            pdf["duration_units"] = pd.array(durs, dtype="Int64")
            pdf["duration_sec"] = pd.array(secs, dtype="Float64")
            pdf["width"] = pd.array(ws, dtype="Int32")
            pdf["height"] = pd.array(hs, dtype="Int32")
            if on_error == "quarantine":
                pdf["decode_error"] = errs
            yield pdf

    return df.mapInPandas(_decode, schema=out_schema)


def fake_image_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer for environments without an
    imaging library (this container has no Pillow): emits a synthetic
    PNG-header payload carrying the TARGET dimensions plus an md5 tag
    of the source bytes, so downstream schema/partitioning/dedup
    behavior is exercised with real, reproducible bytes. A real
    deployment passes ``pil_image_resizer`` (or any
    ``(bytes, w, h) -> bytes``) into the same slot."""
    import hashlib

    head = (
        b"\x89PNG\r\n\x1a\n"
        + width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
    )
    return head + hashlib.md5(payload).digest()


def pil_image_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Pillow-backed real resizer (import-gated; the container lacks
    Pillow, so tests for this path skip — the plumbing around it is
    identical either way)."""
    import io

    from PIL import Image  # noqa: F401 — gated import

    img = Image.open(io.BytesIO(payload))
    out = io.BytesIO()
    img.resize((width, height)).save(out, format=img.format or "PNG")
    return out.getvalue()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    bytes_col: str = "media_bytes",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Resize media payloads to ``width``×``height`` via Arrow-batched
    ``mapInPandas`` — the third leg of the multimodal decode /
    feature-extract / resize family. Appends ``resized`` (binary) and
    the target dims; same quarantine contract as ``decode_images``
    (``on_error="quarantine"`` → NULL payload + ``resize_error``
    column instead of a dead job at the first corrupt byte). One
    Python hop, no shuffle; batch shape and schema are real regardless
    of which resizer fills the slot."""
    import pandas as pd

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    if resizer is None:
        try:
            from PIL import Image  # noqa: F401

            resizer = pil_image_resizer
        except ImportError:
            resizer = fake_image_resizer
    from pyspark.sql import types as T

    out_fields = list(df.schema.fields) + [
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_width", T.IntegerType()),
        T.StructField("resized_height", T.IntegerType()),
    ]
    if on_error == "quarantine":
        out_fields.append(T.StructField("resize_error", T.StringType()))
    out_schema = T.StructType(out_fields)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            out, errors = [], []
            for b in pdf[bytes_col]:
                try:
                    out.append(resizer(bytes(b), width, height))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — routed, not dropped
                    if on_error == "raise":
                        raise
                    out.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            pdf["resized"] = out
            pdf["resized_width"] = [
                width if e is None else None for e in errors
            ]
            pdf["resized_height"] = [
                height if e is None else None for e in errors
            ]
            if on_error == "quarantine":
                pdf["resize_error"] = errors
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)
