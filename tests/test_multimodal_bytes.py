"""Non-ASCII byte-semantics parity for the multimodal stages.

The engine measures UTF-8 BYTES of the payload (len(data), sum(data),
md5(bytes)); the DuckDB oracles are written in byte terms
(octet_length(encode(..)), hex-pair sums). This test feeds non-ASCII
documents through both and asserts exact agreement — the divergence
the character-semantics oracles would have hidden (documents testdata
is ASCII-only, so the gate alone cannot catch it)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

DOCS = [
    (1, "plain ascii only"),
    (2, "héllo wörld — naïve café"),
    (3, "日本語のテキスト 世界"),
    (4, "emoji 🚀🔥 and mixed ascii"),
    (5, "кириллица текст"),
]


def _oracle(sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return sorted(con.execute(sql).fetchall())


def test_decode_images_nonascii_matches_oracle(spark):
    from sparkga1_spark.operators.multimodal import decode_images
    from sparkga1_spark.plans.registry import all_oracles

    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    got = sorted(tuple(r) for r in decode_images(df).collect())
    want = _oracle(all_oracles()["x_multimodal_decode"])
    assert got == want


def test_audio_features_nonascii_matches_oracle(spark):
    from sparkga1_spark.operators.multimodal import audio_features
    from sparkga1_spark.plans.registry import all_oracles

    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    got = sorted(tuple(r) for r in audio_features(df).collect())
    want = _oracle(all_oracles()["x_multimodal_audio_features"])
    assert got == want


def test_frame_sample_nonascii_matches_oracle(spark):
    from sparkga1_spark.operators.multimodal import sample_frames
    from sparkga1_spark.plans.registry import all_oracles

    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    got = sorted(tuple(r) for r in sample_frames(df).collect())
    want = _oracle(all_oracles()["x_multimodal_framesample"])
    assert got == want


def test_resize_images_real_interpolation(spark):
    """resize_images: stubbed decode, REAL bilinear math. Properties a
    fake resize cannot satisfy: constant image stays constant, a
    horizontal gradient stays monotone per row, output buffer has
    exactly width*height*channels bytes, and the op is deterministic."""
    import numpy as np

    from sparkga1_spark.operators.multimodal import (
        _bilinear_resize,
        resize_images,
    )

    # pure-math unit checks first
    const = np.full((5, 7, 3), 201, np.uint8)
    assert (_bilinear_resize(const, 11, 4) == 201).all()
    grad = np.tile(np.arange(0, 250, 10, dtype=np.uint8)[None, :, None], (3, 1, 1))
    out = _bilinear_resize(grad, 3, 50).astype(int)
    assert (np.diff(out[0, :, 0]) >= 0).all()  # monotone preserved
    assert out.shape == (3, 50, 1)
    # identity resize is exact with half-pixel centers
    rng_img = np.resize(np.arange(97, dtype=np.uint8), (6, 5, 2))
    assert (_bilinear_resize(rng_img, 6, 5) == rng_img).all()

    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    a = {r.doc_id: r for r in resize_images(df, width=16, height=12).collect()}
    b = {r.doc_id: r for r in resize_images(df, width=16, height=12).collect()}
    assert len(a) == len(DOCS)
    for doc_id, row in a.items():
        assert len(bytes(row.data)) == 16 * 12 * row.channels
        assert bytes(row.data) == bytes(b[doc_id].data)  # deterministic
        assert row.px_checksum == sum(bytes(row.data))
