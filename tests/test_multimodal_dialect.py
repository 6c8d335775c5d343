from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_ingestion_framework_spark.functions.sql_dialect import convert_access_sql
from data_ingestion_framework_spark.operators import multimodal as mm


def _media_df(spark):
    png = b"\x89PNG\r\n\x1a\n" + b"fakepixels" * 10
    jpg = b"\xff\xd8\xff\xe0" + b"jj" * 20
    return spark.createDataFrame(
        [Row(doc_id=1, payload=png), Row(doc_id=2, payload=jpg), Row(doc_id=3, payload=b"")],
        "doc_id int, payload binary",
    )


def test_pack_media_metadata_and_sniffing(spark):
    out = mm.pack_media(_media_df(spark), "payload")
    rows = {r["doc_id"]: r["media_meta"] for r in out.collect()}
    assert rows[1]["format_sniff"] == "png"
    assert rows[2]["format_sniff"] == "jpeg"
    assert rows[3]["format_sniff"] == "unknown"
    assert rows[1]["n_bytes"] == 8 + 100
    assert len(rows[1]["payload_md5"]) == 32


def test_decode_images_stub_deterministic(spark):
    packed = mm.pack_media(_media_df(spark), "payload")
    out1 = {r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in mm.decode_images(packed, decoder=mm.default_image_decoder).collect()}
    out2 = {r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in mm.decode_images(packed, decoder=mm.default_image_decoder).collect()}
    assert out1 == out2  # deterministic stub
    for w, h, c in out1.values():
        assert 64 <= w < 256 and 64 <= h < 256 and 1 <= c <= 4


def test_decode_images_custom_decoder(spark):
    packed = mm.pack_media(_media_df(spark), "payload")
    out = mm.decode_images(packed, decoder=lambda b: (len(b), 1, 1)).collect()
    got = {r["doc_id"]: r["width"] for r in out}
    assert got[1] == 108 and got[3] == 0


def test_sample_frames(spark):
    packed = mm.pack_media(_media_df(spark), "payload")
    out = mm.sample_frames(packed, n_frames=3)
    rows = out.collect()
    assert len(rows) == 9  # 3 docs × 3 frames
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in by_doc.values())


def test_access_sql_conversion():
    sql = "SELECT IIf([Order Total]>100, 'big', 'small') AS sz, Nz([Discount], 0) FROM [Order Details]"
    out = convert_access_sql(sql, table_map={"Order_Details": "order_details"})
    assert "CASE WHEN Order_Total>100 THEN 'big' ELSE 'small' END" in out
    assert "COALESCE(Discount, 0)" in out
    assert "order_details" in out


def test_access_sql_select_into_and_dates():
    out = convert_access_sql("SELECT a, Date() AS d, Now() AS n INTO tgt FROM src")
    assert out.startswith("CREATE OR REPLACE TEMPORARY VIEW tgt AS")
    assert "CURRENT_DATE" in out and "CURRENT_TIMESTAMP" in out


def test_best_decoder_is_always_real(spark):
    """best_image_decoder: Pillow when importable, the stdlib header
    parser otherwise — a real decoder in every environment; the hash
    stub is never the default."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    picked = mm.best_image_decoder()
    assert picked is (mm.pil_image_decoder if has_pil else mm.header_image_decoder)


# 1x1 red PNG (full file, base64) — shared by the header-parse and
# Pillow tests so both decoders are checked against the same bytes.
def _real_png() -> bytes:
    import base64

    return base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4"
        "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
    )


def test_parse_image_dims_formats():
    import struct

    # color type 6 in the IHDR → RGBA, 4 channels
    assert mm.parse_image_dims(_real_png()) == (1, 1, 4)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    assert mm.parse_image_dims(gif) == (320, 200, 3)
    jpeg = (
        b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 33, 77) + b"\x03"
    )
    assert mm.parse_image_dims(jpeg) == (77, 33, 3)
    assert mm.parse_image_dims(b"not an image") is None
    assert mm.parse_image_dims(b"") is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.header_image_decoder(b"garbage bytes")


def test_synthesized_headers_roundtrip(spark):
    """synthesize_png_header/synthesize_gif_header build spec-valid
    bytes JVM-side (including the PNG CRC-32) that the stdlib parser
    decodes back to the exact input dimensions."""
    import struct
    import zlib

    from pyspark.sql import functions as F

    df = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    w = (F.lit(10) + F.col("doc_id")).cast("bigint")
    h = (F.lit(100) + F.col("doc_id")).cast("bigint")
    png = df.withColumn("p", mm.synthesize_png_header(w, h, F.lit(2)))
    for r in png.collect():
        b = bytes(r["p"])
        assert mm.parse_image_dims(b) == (10 + r["doc_id"], 100 + r["doc_id"], 3)
        body, crc = b[12:29], struct.unpack(">I", b[29:33])[0]
        assert crc == zlib.crc32(body)  # PNG-mandated CRC polynomial
    gif = df.withColumn("p", mm.synthesize_gif_header(w, h))
    for r in gif.collect():
        assert mm.parse_image_dims(bytes(r["p"])) == (
            10 + r["doc_id"], 100 + r["doc_id"], 3,
        )


def test_decode_images_default_on_real_headers(spark):
    """The no-argument decode path (best_image_decoder) returns true
    dimensions for real image bytes in any environment."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, payload=_real_png())], "doc_id int, payload binary"
    )
    packed = mm.pack_media(df, "payload")
    out = mm.decode_images(packed).collect()
    assert (out[0]["width"], out[0]["height"]) == (1, 1)


def test_pil_decoder_real_png():
    """skipped without Pillow: a real 1-pixel PNG decodes to its true
    dimensions through the same decoder slot."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import base64

    # 1x1 red PNG, color type 6 → RGBA
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4"
        "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
    )
    assert mm.pil_image_decoder(png) == (1, 1, 4)


def test_decode_images_quarantine_routing(spark):
    """on_error='quarantine': bad payloads get NULL dims + an error
    string instead of failing the job; good payloads decode normally."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, payload=_real_png()), Row(doc_id=2, payload=b"junk")],
        "doc_id int, payload binary",
    )
    packed = mm.pack_media(df, "payload")
    out = {r["doc_id"]: r for r in
           mm.decode_images(packed, on_error="quarantine").collect()}
    assert (out[1]["width"], out[1]["height"]) == (1, 1)
    assert out[1]["decode_error"] is None
    assert out[2]["width"] is None
    assert "ValueError" in out[2]["decode_error"]

    # default stays loud
    import pytest as _pytest
    with _pytest.raises(Exception):
        mm.decode_images(packed).collect()
    with _pytest.raises(ValueError):
        mm.decode_images(packed, on_error="bogus")


def test_wav_header_roundtrip(spark):
    """synthesize_wav_header → parse_wav_meta recovers the exact
    properties (the audio analogue of the PNG/GIF roundtrip)."""
    from data_ingestion_framework_spark.operators.multimodal import (
        parse_wav_meta,
        synthesize_wav_header,
    )

    df = spark.createDataFrame(
        [(8000, 1, 16, 4000), (44100, 2, 16, 44100), (16000, 1, 8, 1)],
        "rate bigint, ch bigint, bits bigint, frames bigint",
    )
    rows = df.select(
        "rate", "ch", "bits", "frames",
        synthesize_wav_header(
            F.col("rate"), F.col("ch"), F.col("bits"), F.col("frames")
        ).alias("wav"),
    ).collect()
    for r in rows:
        meta = parse_wav_meta(bytes(r["wav"]))
        assert meta == (r["rate"], r["ch"], r["bits"], r["frames"])


def test_parse_wav_meta_against_stdlib_struct():
    """A WAV header packed independently with the struct module (the
    canonical-WAVE layout) parses to the same fields."""
    import struct as pystruct

    from data_ingestion_framework_spark.operators.multimodal import parse_wav_meta

    rate, ch, bits, frames = 22050, 2, 16, 1234
    block = ch * bits // 8
    data_size = frames * block
    payload = (
        b"RIFF" + pystruct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + pystruct.pack("<IHHIIHH", 16, 1, ch, rate, rate * block, block, bits)
        + b"data" + pystruct.pack("<I", data_size)
    )
    assert parse_wav_meta(payload) == (rate, ch, bits, frames)
    assert parse_wav_meta(b"RIFFxxxxNOPE") is None
    assert parse_wav_meta(None) is None
    # non-PCM (format 2) rejects
    bad = payload[:20] + pystruct.pack("<H", 2) + payload[22:]
    assert parse_wav_meta(bad) is None


def test_decode_audio_quarantine(spark):
    from data_ingestion_framework_spark.operators.multimodal import (
        decode_audio,
        synthesize_wav_header,
    )

    good = spark.range(1).select(
        F.lit("g").alias("k"),
        synthesize_wav_header(F.lit(8000), F.lit(1), F.lit(16), F.lit(800)).alias(
            "media_bytes"
        ),
    )
    bad = spark.range(1).select(
        F.lit("b").alias("k"), F.lit(b"not audio").cast("binary").alias("media_bytes")
    )
    out = {
        r["k"]: r
        for r in decode_audio(
            good.unionByName(bad), on_error="quarantine"
        ).collect()
    }
    assert out["g"]["sample_rate"] == 8000 and out["g"]["decode_error"] is None
    assert out["g"]["duration_sec"] == 0.1
    assert out["b"]["sample_rate"] is None and "WAV" in out["b"]["decode_error"]


def test_decode_audio_raises_on_garbage(spark):
    import pytest as _pytest

    from data_ingestion_framework_spark.operators.multimodal import decode_audio

    bad = spark.range(1).select(F.lit(b"junk").cast("binary").alias("media_bytes"))
    with _pytest.raises(Exception):
        decode_audio(bad, on_error="raise").collect()


def test_parse_wav_meta_skips_odd_padded_chunks():
    """RIFF word alignment: an odd-size chunk before fmt carries a pad
    byte not counted in its size field — the walk must stay aligned."""
    import struct as pystruct

    from data_ingestion_framework_spark.operators.multimodal import parse_wav_meta

    rate, ch, bits, frames = 8000, 1, 16, 100
    block = ch * bits // 8
    data_size = frames * block
    junk = b"JUNK" + pystruct.pack("<I", 3) + b"abc\x00"  # 3-byte body + pad
    payload = (
        b"RIFF" + pystruct.pack("<I", 0) + b"WAVE" + junk
        + b"fmt " + pystruct.pack("<IHHIIHH", 16, 1, ch, rate, rate * block, block, bits)
        + b"data" + pystruct.pack("<I", data_size)
    )
    assert parse_wav_meta(payload) == (rate, ch, bits, frames)


def test_decode_audio_quarantines_zero_rate(spark):
    """A rate-0 header must quarantine cleanly (single-append row
    building — a late failure can't skew the column lengths) and
    duration_sec must be a true NULL, not NaN."""
    import struct as pystruct

    from data_ingestion_framework_spark.operators.multimodal import decode_audio

    rate0 = (
        b"RIFF" + pystruct.pack("<I", 36) + b"WAVE"
        + b"fmt " + pystruct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
        + b"data" + pystruct.pack("<I", 4)
    )
    df = spark.createDataFrame(
        [("z", bytearray(rate0))], "k string, media_bytes binary"
    )
    out = decode_audio(df, on_error="quarantine").collect()[0]
    assert out["sample_rate"] is None
    assert out["duration_sec"] is None  # NULL, not NaN
    assert out["decode_error"] is not None


def test_decode_video_roundtrip_and_quarantine(spark):
    from data_ingestion_framework_spark.operators.multimodal import (
        decode_video,
        synthesize_mp4_header,
    )

    good = spark.range(1).select(
        F.lit("g").alias("k"),
        synthesize_mp4_header(
            F.lit(90000), F.lit(180000), F.lit(1920), F.lit(1080)
        ).alias("media_bytes"),
    )
    bad = spark.range(1).select(
        F.lit("b").alias("k"), F.lit(b"not a video").cast("binary").alias("media_bytes")
    )
    out = {
        r["k"]: r
        for r in decode_video(
            good.unionByName(bad), on_error="quarantine"
        ).collect()
    }
    g = out["g"]
    assert (g["timescale"], g["duration_units"], g["width"], g["height"]) == (
        90000, 180000, 1920, 1080,
    )
    assert g["duration_sec"] == 2.0 and g["decode_error"] is None
    assert out["b"]["timescale"] is None and "BMFF" in out["b"]["decode_error"]


def test_parse_mp4_meta_rejects_malformed():
    from data_ingestion_framework_spark.operators.multimodal import parse_mp4_meta

    assert parse_mp4_meta(None) is None
    assert parse_mp4_meta(b"") is None
    assert parse_mp4_meta(b"\x00" * 40) is None
    # a truncated box size larger than the payload must not loop/crash
    assert parse_mp4_meta(b"\x00\x00\xff\xfftyp" + b"\x00" * 20) is None


def test_resize_images_fake_path_and_quarantine(spark):
    """resize_images: deterministic fake resizer (no Pillow here) fills
    the slot — target dims + md5 tag of the source bytes; quarantine
    routes a failing payload instead of dying."""
    import hashlib

    from pyspark.sql import Row

    from data_ingestion_framework_spark.operators.multimodal import (
        fake_image_resizer,
        resize_images,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, media_bytes=b"payload-a"), Row(doc_id=2, media_bytes=b"pb")]
    )
    out = {r["doc_id"]: r for r in resize_images(df, 32, 16).collect()}
    assert out[1]["resized_width"] == 32 and out[1]["resized_height"] == 16
    assert out[1]["resized"] == fake_image_resizer(b"payload-a", 32, 16)
    assert bytes(out[1]["resized"])[-16:] == hashlib.md5(b"payload-a").digest()
    assert out[1]["resized"] != out[2]["resized"]  # payload-dependent

    def boom(b, w, h):
        if b == b"pb":
            raise ValueError("corrupt")
        return fake_image_resizer(b, w, h)

    q = {
        r["doc_id"]: r
        for r in resize_images(
            df, 8, 8, resizer=boom, on_error="quarantine"
        ).collect()
    }
    assert q[1]["resize_error"] is None and q[1]["resized"] is not None
    assert q[2]["resized"] is None and "corrupt" in q[2]["resize_error"]
    assert q[2]["resized_width"] is None
