from __future__ import annotations

from pyspark.sql import Row

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
            for r in mm.decode_images(packed).collect()}
    out2 = {r["doc_id"]: (r["width"], r["height"], r["channels"])
            for r in mm.decode_images(packed).collect()}
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


def test_pil_decoder_selected_when_available(spark):
    """best_image_decoder: Pillow when importable, stub otherwise —
    the decode component is real by construction wherever an image
    library exists."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    picked = mm.best_image_decoder()
    assert picked is (mm.pil_image_decoder if has_pil else mm.default_image_decoder)


def test_pil_decoder_real_png():
    """skipped without Pillow: a real 1-pixel PNG decodes to its true
    dimensions through the same decoder slot."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import base64

    # 1x1 red PNG
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP4"
        "z8DwHwAFBQIAX8jx0gAAAABJRU5ErkJggg=="
    )
    assert mm.pil_image_decoder(png) == (1, 1, 3)
