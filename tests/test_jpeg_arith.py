"""Arithmetic-coded JPEG (SOF9, T.81 Annex D/F QM coder) — two-sided
validation against the system libjpeg (ctypes harness in
tests/jpeg_interop.py), exactly the discipline test_vp8_lossy.py uses
with libwebp: the in-repo decoder must reproduce libjpeg-encoded
streams bit-exact, libjpeg must decode in-repo-encoded streams
bit-exact, and the in-repo encoder's ENTROPY BYTES must be
byte-identical to libjpeg's for the same coefficients — pinning every
register convention (MPS-bottom intervals, A=0x10000/CT=11 encoder
init, C=(B0<<24)|(B1<<16)/CT=0 decoder init, carry ripple, 0x00 byte
stuffing, CLEARBITS flush) against an independent implementation."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

HAVE_LIBJPEG = os.path.exists("/usr/lib/x86_64-linux-gnu/libjpeg.so.62")


def _flat(rng, by, bx):
    return np.repeat(
        np.repeat(rng.integers(0, 256, (by, bx), np.uint8), 8, 0), 8, 1
    )


def _gray(px):
    return px if px.ndim == 2 else px[:, :, 0]


def test_aritab_matches_fresh_extraction_and_spec_pins():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    if not HAVE_LIBJPEG:
        pytest.skip("no libjpeg in container")
    from extract_jpeg_aritab import SPEC_PINS, extract

    from sparkga1_spark.operators.jpeg_arith_tab import NLPS, NMPS, QE, SWITCH

    rows = extract()
    assert len(rows) == 114
    assert rows == list(zip(QE, NMPS, NLPS, SWITCH))
    for i, pin in SPEC_PINS.items():
        assert rows[i] == pin


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_qm_entropy_bytes_identical_to_libjpeg():
    """The strongest pin: for identical coefficients the in-repo QM
    encoder must emit libjpeg's exact entropy bytes (deterministic
    coder + identical default conditioning). Includes shapes whose
    streams contain 0xFF bytes, exercising the stuffing path."""
    import jpeg_interop as J

    from sparkga1_spark.operators.multimodal import build_jpeg_arith

    def entropy(data):
        sos = data.find(b"\xff\xda")
        ls = int.from_bytes(data[sos + 2 : sos + 4], "big")
        return data[sos + 2 + ls : -2]

    rng = np.random.default_rng(42)
    stuffed_seen = False
    for shape in [(1, 1), (2, 3), (4, 4), (5, 4), (3, 7)]:
        tile = _flat(rng, *shape)
        ref = entropy(J.compress(tile, quality=100, arith=True))
        mine = entropy(build_jpeg_arith(tile))
        assert mine == ref, f"entropy bytes diverge for {shape}"
        stuffed_seen |= b"\xff\x00" in ref
    assert stuffed_seen, "corpus never exercised the stuffing path"


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_arith_gray_flat_exact_both_directions():
    """Flat blocks at quant 1 are exactly lossless: the in-repo
    encode→decode roundtrip, libjpeg's decode of in-repo files, and
    the in-repo decode of libjpeg files must all reproduce the tile,
    including multi-restart streams."""
    import jpeg_interop as J

    from sparkga1_spark.operators.multimodal import build_jpeg_arith, parse_jpeg

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (2, 3), (5, 4)]:
        tile = _flat(rng, *shape)
        b = build_jpeg_arith(tile)
        assert b"\xff\xc9" in b and b"\xff\xcc" in b  # SOF9 + DAC
        w, h, px = parse_jpeg(b)
        assert (w, h) == (tile.shape[1], tile.shape[0])
        assert np.array_equal(_gray(px), tile)
        pxl, arith_flag = J.decompress(b)
        assert arith_flag and np.array_equal(pxl, tile)
        lb = J.compress(tile, quality=100, arith=True)
        _w, _h, px2 = parse_jpeg(lb)
        assert np.array_equal(_gray(px2), tile)
    # restart intervals: QM coder + statistics + DC state reset per RST
    tile = _flat(rng, 3, 5)
    b = build_jpeg_arith(tile, restart_interval=2)
    assert b"\xff\xdd" in b
    assert np.array_equal(_gray(parse_jpeg(b)[2]), tile)
    pxl, _ = J.decompress(b)
    assert np.array_equal(pxl, tile)


def test_arith_decode_equals_huffman_decode():
    """Entropy-layer equivalence through the in-repo pipeline: the
    SAME pixels encoded arithmetic vs baseline-Huffman vs progressive
    must decode to IDENTICAL rasters (coefficients are shared by
    construction; only the entropy layer differs) — gray, non-8-mult
    dims, color 4:4:4, and subsampled color."""
    from sparkga1_spark.operators.multimodal import (
        build_jpeg_arith,
        build_jpeg_baseline,
        build_jpeg_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(11)
    for img in [
        rng.integers(0, 256, (24, 33), np.uint8),
        rng.integers(0, 256, (19, 21), np.uint8),
        rng.integers(0, 256, (16, 16, 3), np.uint8),
    ]:
        a = parse_jpeg(build_jpeg_arith(img))[2]
        hf = parse_jpeg(build_jpeg_baseline(img))[2]
        pr = parse_jpeg(build_jpeg_progressive(img))[2]
        assert np.array_equal(a, hf)
        assert np.array_equal(a, pr)
    cimg = rng.integers(0, 256, (24, 24, 3), np.uint8)
    for samp in [(2, 2), (2, 1), (1, 2)]:
        a = parse_jpeg(build_jpeg_arith(cimg, sampling=samp))[2]
        hf = parse_jpeg(build_jpeg_baseline(cimg, sampling=samp))[2]
        assert np.array_equal(a, hf)
    # restarts too
    g = rng.integers(0, 256, (40, 24), np.uint8)
    a = parse_jpeg(build_jpeg_arith(g, restart_interval=3))[2]
    hf = parse_jpeg(build_jpeg_baseline(g, restart_interval=3))[2]
    assert np.array_equal(a, hf)


def test_arith_conditioning_is_load_bearing():
    """The DAC conditioning parameters must actually drive the models:
    DC decisions encoded under (L,U)=(0,2) decode to a different value
    under the default (0,1) — the conditioning context selection is
    part of the coded state, not decoration."""
    from sparkga1_spark.operators import jpeg_arith as JA

    # include ±3/±4 diffs: magnitude category m == 2, the one class
    # the (0,1)-vs-(0,2) conditioning bound classifies differently
    vals = [300, -3, 300, 3, -300, 4, 3, -4]

    def roundtrip(L_enc, U_enc, L_dec, U_dec):
        enc = JA.QMEncoder()
        st = bytearray(JA.DC_STAT_BINS)
        state = JA.DCState()
        for v in np.cumsum(vals):
            JA.dc_encode(enc, st, state, L_enc, U_enc, int(v))
        data = enc.flush().replace(b"\xff\x00", b"\xff")
        dec = JA.QMDecoder(data)
        st2 = bytearray(JA.DC_STAT_BINS)
        s2 = JA.DCState()
        out = []
        for _ in vals:
            out.append(JA.dc_decode(dec, st2, s2, L_dec, U_dec))
        return out

    truth = list(np.cumsum(vals))
    assert roundtrip(0, 2, 0, 2) == truth
    assert roundtrip(1, 3, 1, 3) == truth
    assert roundtrip(0, 2, 0, 1) != truth


def test_arith_refusals():
    """Frames outside the DCT family (lossless SOF3) and malformed
    DAC conditioning refuse with ValueError — never a guessed
    raster. (SOF10 progressive-arithmetic DECODES as of r10, and
    SOF3 lossless as of r11 — see test_arith_progressive_sof10 and
    the lossless suite in test_multimodal_bytes.py; the still-refused
    frame here is arithmetic-coded lossless, SOF11.)"""
    from sparkga1_spark.operators.multimodal import (
        build_jpeg_arith,
        build_jpeg_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(3)
    tile = _flat(rng, 2, 2)
    prog = build_jpeg_progressive(tile)
    sof = prog.find(b"\xff\xc2")
    sof11 = bytearray(prog)
    sof11[sof + 1] = 0xCB
    with pytest.raises(ValueError, match="hierarchical|arith-lossless"):
        parse_jpeg(bytes(sof11))
    # a SOF2 header flipped to SOF3 is a MALFORMED lossless stream
    # (full-band Se on a predictive scan) — still a refusal, never a
    # guessed raster
    sof3 = bytearray(prog)
    sof3[sof + 1] = 0xC3
    with pytest.raises(ValueError):
        parse_jpeg(bytes(sof3))

    good = build_jpeg_arith(tile)
    dac = good.find(b"\xff\xcc")
    bad = bytearray(good)
    bad[dac + 5] = 0x21  # DC conditioning L=1 > U=2? (L=1,U=2 ok) -> use L>U
    bad[dac + 5] = 0x13  # L=3 > U=1
    with pytest.raises(ValueError, match="DAC DC conditioning"):
        parse_jpeg(bytes(bad))

    bad = bytearray(good)
    bad[dac + 7] = 0  # AC table's Kx=0, out of 1..63
    with pytest.raises(ValueError, match="DAC AC conditioning"):
        parse_jpeg(bytes(bad))


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_planter_rotation_includes_arith_class():
    """plant_jpeg_real_payloads ids %4==2 carry SOF9 streams (with a
    DRI at %8==6) that decode exactly — the gate row's closed-form
    oracle is unchanged because flat blocks stay lossless."""
    from sparkga1_spark.operators.multimodal import parse_jpeg

    # builder-level replica of the planter's %4==2 arm
    from sparkga1_spark.operators.multimodal import build_jpeg_arith

    from sparkga1_spark.operators.multimodal import (
        build_jpeg_arith_progressive,
    )

    for d, text in [(2, "hello world"), (6, "restart rotation arm")]:
        wb, hb = d % 5 + 1, d % 3 + 1
        raw = text.encode()
        vals = np.resize(np.frombuffer(raw, np.uint8), (hb, wb))
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        if d % 8 == 6:
            blob = build_jpeg_arith_progressive(
                img, successive=True, restart_interval=2
            )
            assert b"\xff\xca" in blob and b"\xff\xdd" in blob
        else:
            blob = build_jpeg_arith(img)
            assert b"\xff\xc9" in blob
        w, h, px = parse_jpeg(blob)
        assert int(_gray(px).astype(np.int64).sum()) == 64 * int(
            vals.astype(np.int64).sum()
        )


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_arith_progressive_sof10():
    """SOF10 (progressive arithmetic, T.81 G.2) decodes for REAL both
    ways: libjpeg's own jpeg_simple_progression SOF10 output (which
    exercises spectral bands + successive approximation) decodes
    bit-exact on flat tiles, the in-repo SOF10 encoder's files decode
    exactly in libjpeg, and all four entropy layers of the same
    pixels decode IDENTICALLY through the in-repo pipeline."""
    import jpeg_interop as J

    from sparkga1_spark.operators.multimodal import (
        build_jpeg_arith_progressive,
        build_jpeg_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(9)
    for shape in [(1, 1), (4, 5)]:
        tile = _flat(rng, *shape)
        lb = J.compress(tile, quality=100, arith=True, progressive=True)
        assert b"\xff\xca" in lb
        assert np.array_equal(_gray(parse_jpeg(lb)[2]), tile)
        for succ in (False, True):
            b = build_jpeg_arith_progressive(tile, successive=succ)
            assert np.array_equal(_gray(parse_jpeg(b)[2]), tile)
            pxl, arith_flag = J.decompress(b)
            assert arith_flag and np.array_equal(pxl, tile)
    # entropy-layer equivalence on nonflat content, incl. color,
    # subsampled color, and restart intervals
    for img, kw in [
        (rng.integers(0, 256, (24, 33), np.uint8), {}),
        (rng.integers(0, 256, (19, 21), np.uint8), dict(successive=True)),
        (rng.integers(0, 256, (16, 16, 3), np.uint8), dict(successive=True)),
        (
            rng.integers(0, 256, (24, 24, 3), np.uint8),
            dict(sampling=(2, 2), successive=True),
        ),
        (
            rng.integers(0, 256, (40, 24), np.uint8),
            dict(restart_interval=3, successive=True),
        ),
    ]:
        a = parse_jpeg(build_jpeg_arith_progressive(img, **kw))[2]
        hf = parse_jpeg(build_jpeg_progressive(img, **kw))[2]
        assert np.array_equal(a, hf), (img.shape, kw)


def test_arith_bitflip_fuzz_never_crashes():
    """Adversarial robustness (the codec-family fuzz convention):
    flipping any single entropy bit of an SOF9 or SOF10 stream must
    either decode to SOME bounded raster or refuse with ValueError —
    never crash, hang, or over-allocate (the QM decoder feeds zeros
    past the segment; every magnitude chain and band walk is guarded)."""
    from sparkga1_spark.operators.multimodal import (
        build_jpeg_arith,
        build_jpeg_arith_progressive,
        parse_jpeg,
    )

    rng = np.random.default_rng(13)
    tile = _flat(rng, 2, 2)
    for blob in (
        build_jpeg_arith(tile),
        build_jpeg_arith_progressive(tile, successive=True),
    ):
        sos = blob.find(b"\xff\xda")
        ls = int.from_bytes(blob[sos + 2 : sos + 4], "big")
        start, end = sos + 2 + ls, len(blob) - 2
        for pos in range(start, end):
            for mask in (0x01, 0x80):
                bad = bytearray(blob)
                bad[pos] ^= mask
                try:
                    _w, _h, px = parse_jpeg(bytes(bad))
                    assert px.dtype.name == "uint8"
                except ValueError:
                    pass


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_arith_foreign_photo_transcode_equivalence():
    """Real-content validation at photographic scale (the foreign-
    interop discipline): losslessly transcode the host's real-encoder
    JPEGs (CPython / Rust-doc test images, incl. a 720x477 4:2:0
    photo — thousands of MCUs of genuine AC statistics churn) into
    coefficient-identical ARITHMETIC and HUFFMAN twins via libjpeg's
    jpeg_read/write_coefficients, and demand the in-repo decodes of
    the two twins are byte-identical rasters. Any QM-coder register,
    statistics-bin, or conditioning defect desyncs within a few MCUs
    and breaks the equality."""
    import glob

    import jpeg_interop as J

    from sparkga1_spark.operators.multimodal import parse_jpeg

    roots = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/**/*.jpg",
        "/root/.rustup/**/*.jpeg",
        "/usr/share/**/*.jpg",
    ]
    paths = sorted({p for r in roots for p in glob.glob(r, recursive=True)})[:8]
    if not paths:
        pytest.skip("no foreign JPEGs on this host")
    checked = 0
    for p in paths:
        with open(p, "rb") as fh:
            data = fh.read()
        try:
            ar = J.transcode(data, arith=True)
            hf = J.transcode(data, arith=False)
        except J.JpegError:
            continue
        assert b"\xff\xc9" in ar  # SOF9
        try:
            a = parse_jpeg(ar)[2]
        except ValueError:
            continue  # source geometry outside the decoder's claims
        h = parse_jpeg(hf)[2]
        assert np.array_equal(a, h), p
        checked += 1
    assert checked >= 4, "too few foreign transcodes validated"


@pytest.mark.skipif(not HAVE_LIBJPEG, reason="no libjpeg")
def test_arith_libjpeg_custom_conditioning_and_restarts():
    """DAC conditioning and restart handling validated against the
    REAL encoder (not just the in-repo mirror): libjpeg streams with
    NON-DEFAULT conditioning (dc_U=2, ac_K=10 — written into the DAC
    and driving different context selections) and with every restart
    interval in {1,2,7} (coder + statistics + DC-state resets at each
    RSTn) must decode exactly."""
    import jpeg_interop as J

    from sparkga1_spark.operators.multimodal import parse_jpeg

    rng = np.random.default_rng(21)
    tile = _flat(rng, 3, 4)
    b = J.compress(tile, quality=100, arith=True, dc_U=2, ac_K=10)
    dac = b.find(b"\xff\xcc")
    body = b[dac + 4 : dac + 2 + int.from_bytes(b[dac + 2 : dac + 4], "big")]
    assert body[1] == 0x20 and body[3] == 10  # U=2/L=0, Kx=10 on the wire
    assert np.array_equal(_gray(parse_jpeg(b)[2]), tile)

    tile = _flat(rng, 4, 5)
    for ri in (1, 2, 7):
        b = J.compress(tile, quality=100, arith=True, restart=ri)
        assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
        assert np.array_equal(_gray(parse_jpeg(b)[2]), tile), ri
