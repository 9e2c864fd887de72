"""PIL-backed real-codec boundary (VERDICT r11 item 5).

The build container has no pillow, so the integration tests here SKIP in
CI and the deterministic test codec stays the gate path; on any host
with `pip install pillow` they run the REAL image pipeline end to end
(decode → resize → featurize → perceptual hash) with zero code changes —
the adapters in multimodal.py self-register when PIL imports. The first
test has teeth in both environments: registration state must match PIL
availability exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_pil_registration_matches_availability():
    """Without PIL the image/* adapters must be absent (no half-wired
    registry); with PIL all four must be present."""
    from sequila_native_spark.functions import multimodal as mm

    have = _have_pil()
    assert ("image/*" in mm._DECODERS) == have
    assert ("image/*" in mm._TRANSFORMERS) == have
    assert ("image/*" in mm._FEATURIZERS) == have
    assert ("image/*" in mm._PHASHERS) == have


def _png_bytes(width: int, height: int, color=(200, 30, 30)) -> bytes:
    import io

    from PIL import Image

    img = Image.new("RGB", (width, height), color)
    # a gradient band so the aHash has structure (flat images hash to ~0)
    for x in range(width):
        for y in range(min(height, 4)):
            img.putpixel((x, y), (x * 255 // max(width - 1, 1), 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_pil_decode_resize_roundtrip(spark):
    pytest.importorskip("PIL")
    from sequila_native_spark.functions import decode_media_meta, resize_media

    df = spark.createDataFrame(
        [(1, _png_bytes(64, 48)), (2, _png_bytes(32, 32))],
        "doc_id int, payload binary",
    ).withColumn("media_type", F.lit("image/png"))

    got = {r["doc_id"]: (r["media_format"], r["width"], r["height"])
           for r in decode_media_meta(df, strict_decode=True).collect()}
    assert got == {1: ("png", 64, 48), 2: ("png", 32, 32)}

    small = resize_media(df, 16, 16)
    got2 = {r["doc_id"]: (r["width"], r["height"])
            for r in decode_media_meta(small, strict_decode=True).collect()}
    assert got2 == {1: (16, 16), 2: (16, 16)}


def test_pil_phash_scale_invariant_and_featurize(spark):
    """The real aHash must put the same content at two encoded sizes within
    a small Hamming distance, and distinct content far away; features are
    64-dim L2-normalized and ANN-composable."""
    pytest.importorskip("PIL")
    from sequila_native_spark.functions import extract_features, perceptual_hash

    a1, a2 = _png_bytes(64, 64), _png_bytes(256, 256)  # same content, resized
    b = _png_bytes(64, 64, color=(0, 0, 0))
    df = spark.createDataFrame(
        [(1, a1), (2, a2), (3, b)], "doc_id int, payload binary"
    ).withColumn("media_type", F.lit("image/png"))

    h = {r["doc_id"]: r["phash"]
         for r in perceptual_hash(df, strict=True).collect()}
    assert all(v is not None for v in h.values())
    ham = lambda x, y: bin((x ^ y) & (2 ** 64 - 1)).count("1")  # noqa: E731
    assert ham(h[1], h[2]) <= 8, "same content at 2 sizes must hash nearby"
    assert ham(h[1], h[3]) > 8, "distinct content must not collide"

    feats = {r["doc_id"]: r["embedding"]
             for r in extract_features(df).collect()}
    assert all(f is not None and len(f) == 64 for f in feats.values())
    norm = sum(x * x for x in feats[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-6
