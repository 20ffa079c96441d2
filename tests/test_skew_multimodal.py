from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pargraph_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
    fake_decode_features,
    to_media_table,
)
from pargraph_spark.operators.skew import salted_sum, top_k_hot


def test_salted_sum_equals_plain_sum(spark):
    # Zipf-ish skew: key 0 holds half the rows
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 37).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    for salts in (1, 16):
        salted = {
            r["k"]: r["sum"]
            for r in salted_sum(df, ["k"], F.col("v"), num_salts=salts).collect()
        }
        assert salted == plain


def test_top_k_hot(spark):
    edges = spark.createDataFrame(
        [(i, 7) for i in range(50)] + [(i, 9) for i in range(20)] + [(1, 2)],
        "src long, dst long",
    )
    hot = [(r["dst"], r["fan_in"]) for r in top_k_hot(edges, "dst", 2).collect()]
    assert hot == [(7, 50), (9, 20)]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return to_media_table(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        kind="text-blob",
    ).cache()


def test_media_table_schema_and_meta(media):
    row = media.first()
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))
    assert row["kind"] == "text-blob"


def test_extract_binary_features(spark, media):
    feats = {r["media_id"]: r for r in extract_binary_features(media).collect()}
    for r in media.collect():
        b = bytes(r["payload"])
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(b)
        assert f["digest"] == hashlib.md5(b).hexdigest()
        assert f["head_hex"] == b[:8].hex()


def test_decode_image_codec_formats_raise_without_pil(spark):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL available; raise path not applicable")
    except ImportError:
        pass
    # a JPEG-magic payload is a codec format -> needs PIL
    blob = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0JFIF-not-really"))], "id long, payload binary"
    )
    df = decode_image(to_media_table(blob, "id", "payload", kind="jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|PIL|codec"):
        df.collect()


def _encode_bmp24(w, h, rgb):
    """Independent test-side encoder: bottom-up 24-bit BI_RGB BMP."""
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            r, g, b_ = rgb[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            line += bytes((b_, g, r))  # BGR on disk
        rows.append(bytes(line) + pad)
    pixels = b"".join(rows)
    off = 14 + 40
    header = (
        b"BM" + (off + len(pixels)).to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + pixels


def _pattern_rgb(w, h):
    return bytes(
        c for y in range(h) for x in range(w)
        for c in ((x * 7 + y) % 256, (x + y * 11) % 256, (x * y) % 256)
    )


def test_decode_bmp_exact_pixels(spark):
    import numpy as np

    w, h, tw, th = 10, 6, 4, 4
    rgb = _pattern_rgb(w, h)
    payload = _encode_bmp24(w, h, rgb)
    blob = spark.createDataFrame([(7, bytearray(payload))], "id long, payload binary")
    out = decode_image(to_media_table(blob, "id", "payload", kind="bmp"),
                       target_size=(tw, th)).collect()[0]
    assert (out["width"], out["height"]) == (w, h)
    # independent expectation: numpy nearest-neighbor over the raw pattern
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    expected = a[ys][:, xs].tobytes()
    assert bytes(out["pixels"]) == expected
    assert hashlib.md5(bytes(out["pixels"])).hexdigest() == hashlib.md5(expected).hexdigest()


def test_decode_ppm_exact_pixels(spark):
    import numpy as np

    w, h, tw, th = 5, 9, 3, 7
    rgb = _pattern_rgb(w, h)
    payload = b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb
    blob = spark.createDataFrame([(3, bytearray(payload))], "id long, payload binary")
    out = decode_image(to_media_table(blob, "id", "payload", kind="ppm"),
                       target_size=(tw, th)).collect()[0]
    assert (out["width"], out["height"]) == (w, h)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    assert bytes(out["pixels"]) == a[ys][:, xs].tobytes()


def test_fake_decode_features_deterministic(spark, media):
    a = {r["media_id"]: list(r["feat"]) for r in fake_decode_features(media).collect()}
    b = {r["media_id"]: list(r["feat"]) for r in fake_decode_features(media).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())


def test_decode_image_null_payload_yields_null_row(spark):
    # review r5: bytes(None) in the kernel killed the whole job on one
    # NULL payload (failed fetch upstream); must yield a null row instead
    rgb = _pattern_rgb(4, 3)
    rows = [(1, _encode_bmp24(4, 3, rgb)), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    media = to_media_table(df, "doc_id", "payload", kind="bmp")
    got = {r["media_id"]: r for r in decode_image(media).collect()}
    assert got[1]["width"] == 4 and got[1]["height"] == 3
    assert got[2]["width"] is None and got[2]["pixels"] is None
