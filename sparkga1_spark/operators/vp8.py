"""Lossy VP8 (RFC 6386) keyframe codec — REAL decode within a
documented subset, plus a minimal in-repo keyframe encoder for
fixtures.

This closes (part of) the repo's longest-standing multimodal fake:
lossy WebP pixels. Scope, per the honesty-ledger convention:

  REAL (decoder): keyframes with 16x16 intra prediction (DC_PRED /
  V_PRED / H_PRED / TM_PRED and the matching 8x8 chroma modes) AND
  B_PRED macroblocks (all ten 4x4 subblock predictors, context-coded
  submodes with the 16x16-implied-mode mapping, the cached MB
  top-right rule), the full boolean (range) coder, keyframe header
  parse, per-frame coefficient-probability updates, mb_no_coeff_skip,
  1..8 DCT partitions, full token decode (zero runs, categories 1-6
  with extra bits, block type 3 for Y-without-Y2), quantizer lookup
  with all five delta fields and the spec clamps (uv_dc index capped
  at 117 = value 132, y2_ac floor 8), Y2 WHT inverse, exact integer
  4x4 IDCT, and intra reconstruction with the spec border rules
  (above=127, left=129, ground-truth-pinned corners).

  REAL (decoder, continued): the §15 in-loop deblocking filter —
  normal (6-tap MB edges + subblock edges with hev logic, Y+chroma)
  and simple (Y-only 4-tap) — with sharpness limits, the keyframe
  hev thresholds, per-MB levels incl. loop-filter adjustment deltas,
  and the inner-edge rule (filtered iff the MB has nonzero
  coefficients or is B_PRED). With B_PRED + the filter, REAL
  libvpx-encoded WebP stills decode BIT-EXACTLY (CPython's
  python.webp is the pytest pin).

  REAL (decoder, continued): segmentation — per-MB segment ids via
  the 3-prob map tree, per-segment quantizers and filter levels in
  both absolute and delta modes (the construct cwebp enables by
  default).

  REFUSED (ValueError, never guessed): interframes only — impossible
  in WebP stills, which are keyframes by construction. For WebP
  still images the decoder is COMPLETE.

All normative constant tables come from
`sparkga1_spark/operators/vp8_tables.py`, EXTRACTED from the
container's public libwebp (see tools/extract_vp8_tables.py — a
hand transcription of ~3000 constants would be undetectably wrong on
both in-repo sides, the plane-code lesson). The whole chain —
tables, boolean coder, header layout, token coding, dequant,
transforms, prediction — is validated in tests/test_vp8_lossy.py by
BIT-EXACT YUV equality against the system libwebp's own decoder
(ctypes WebPDecodeYUV) over encoder-generated streams: a single
wrong table byte or off-by-one in any stage desyncs the range coder
and fails the gate.

Reference parity note: SparkGA1 has no codec layer (genomics); this
module exists for the multimodal training-data pipeline surface
(BASELINE.json north star). Scale shape: decode is a map-only
per-payload Arrow stage like every other codec here.
"""

from __future__ import annotations

from .vp8_tables import (
    AC_Q,
    CAT12_PROBS,
    CAT_PROBS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_Q,
    KBANDS,
    KF_BMODE_PROBS,
    KF_UV_MODE_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

VP8_START_CODE = b"\x9d\x01\x2a"

# intra modes (16x16 / chroma)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4


def _probs_4d(flat):
    """1056-flat → [type][band][ctx] 11-tuples."""
    out = []
    i = 0
    for _t in range(4):
        bands = []
        for _b in range(8):
            ctxs = []
            for _c in range(3):
                ctxs.append(tuple(flat[i : i + 11]))
                i += 11
            bands.append(ctxs)
        out.append(bands)
    return out


_DEFAULT_COEFF_PROBS = _probs_4d(COEFF_PROBS)
_UPDATE_PROBS = _probs_4d(COEFF_UPDATE_PROBS)


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder. Reads virtual zero bytes past
    the end of its partition (the standard tail convention — the
    final bits of a conformant stream need them); structural checks
    above this layer catch desyncs."""

    __slots__ = ("buf", "pos", "range", "value", "bitcount")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.range = 255
        self.value = (self._byte() << 8) | self._byte()
        self.bitcount = 0

    def _byte(self) -> int:
        b = self.buf[self.pos] if self.pos < len(self.buf) else 0
        self.pos += 1
        return b

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bitcount += 1
            if self.bitcount == 8:
                self.bitcount = 0
                self.value |= self._byte()
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §7.2 boolean encoder (32-bit bottom, carry
    propagation into emitted bytes)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bitcount = 24

    def put(self, prob: int, boolean: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if boolean:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 255:
                    self.out[i] = 0
                    i -= 1
                if i < 0:
                    raise ValueError("vp8: carry out of stream head")
                self.out[i] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bitcount -= 1
            if self.bitcount == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bitcount = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.put(128, 1 if v < 0 else 0)

    def tree(self, tree, probs, value: int) -> None:
        # walk the tree toward -value, emitting each branch bit
        path = self._find_path(tree, value, 0)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    def _find_path(self, tree, value, i, path=()):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -value and nxt <= 0:
                return path + ((i, bit),)
            if nxt > 0:
                r = self._find_path(tree, value, nxt, path + ((i, bit),))
                if r is not None:
                    return r
        return None if path else ()

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


# --------------------------------------------------------------------------
# exact integer inverse transforms (RFC 6386 §14.3)
# --------------------------------------------------------------------------

_C1 = 20091  # sqrt(2)*cos(pi/8) - 1, .16 fixed
_C2 = 35468  # sqrt(2)*sin(pi/8),     .16 fixed


def idct4x4(block):
    """16 ints (raster order) → 16 spatial residuals, bit-exact."""
    ip = list(block)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def iwalsh4x4(block):
    """16 ints → 16 DC values for the 16 Y subblocks, bit-exact."""
    ip = list(block)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        a2 = a1 + b1 + 3
        b2 = c1 + d1
        c2 = a1 - b1
        d2 = d1 - c1
        out[r] = a2 >> 3
        out[r + 1] = (b2 + 3) >> 3
        out[r + 2] = (c2 + 3) >> 3
        out[r + 3] = (d2 + 3) >> 3
    return out


def _float_inverse_matrix(transform):
    """Linearize an exact inverse transform (sans rounding) into a
    16x16 float matrix by probing unit coefficient vectors at a large
    scale, then invert — the encoder's forward transform is the exact
    float inverse of the decoder's integer inverse, so quantized
    levels reconstruct as intended without transcribing a forward
    transform."""
    import numpy as np

    scale = 1 << 16
    m = np.zeros((16, 16))
    for j in range(16):
        e = [0] * 16
        e[j] = scale
        m[:, j] = np.asarray(transform(e), dtype=np.float64) / scale
    return np.linalg.inv(m)


# --------------------------------------------------------------------------
# token (coefficient) layer
# --------------------------------------------------------------------------


def _decode_coeffs(bd, probs_type, ctx, first, dq_dc, dq_ac, out16):
    """Decode one 4x4 block's tokens into out16 (raster order,
    DEQUANTIZED). Returns the EOB position n (nonzero present iff
    n > first)."""
    p = probs_type[KBANDS[first]][ctx]
    n = first
    while n < 16:
        if not bd.get(p[0]):
            return n
        while not bd.get(p[1]):
            n += 1
            if n == 16:
                return 16
            p = probs_type[KBANDS[n]][0]
        if not bd.get(p[2]):
            v = 1
            nctx = 1
        else:
            v = _decode_large(bd, p)
            nctx = 2
        if bd.get(128):
            v = -v
        z = ZIGZAG[n]
        out16[z] = v * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            return 16
        p = probs_type[KBANDS[n]][nctx]
    return 16


def _decode_large(bd, p):
    if not bd.get(p[3]):
        if not bd.get(p[4]):
            return 2
        return 3 + bd.get(p[5])
    if not bd.get(p[6]):
        if not bd.get(p[7]):
            return 5 + bd.get(CAT12_PROBS[0][0])
        return 7 + 2 * bd.get(CAT12_PROBS[1][0]) + bd.get(CAT12_PROBS[1][1])
    bit1 = bd.get(p[8])
    bit0 = bd.get(p[9 + bit1])
    cat = 2 * bit1 + bit0
    v = 0
    for cp in CAT_PROBS[cat]:
        v += v + bd.get(cp)
    return v + 3 + (8 << cat)


def _encode_coeffs(be, probs_type, ctx, first, levels16):
    """Mirror of _decode_coeffs over QUANTIZED levels (zigzag-indexed
    raster array). Returns nz flag."""
    lz = [levels16[ZIGZAG[n]] for n in range(16)]
    last = -1
    for n in range(first, 16):
        if lz[n]:
            last = n
    p = probs_type[KBANDS[first]][ctx]
    n = first
    while n < 16:
        if last < n:
            be.put(p[0], 0)  # EOB
            return last >= first
        be.put(p[0], 1)
        while lz[n] == 0:
            be.put(p[1], 0)
            n += 1
            p = probs_type[KBANDS[n]][0]
        be.put(p[1], 1)
        v = abs(lz[n])
        if v == 1:
            be.put(p[2], 0)
            nctx = 1
        else:
            be.put(p[2], 1)
            _encode_large(be, p, v)
            nctx = 2
        be.put(128, 1 if lz[n] < 0 else 0)
        n += 1
        if n == 16:
            return True
        p = probs_type[KBANDS[n]][nctx]
    return True


def _encode_large(be, p, v):
    if v <= 4:
        be.put(p[3], 0)
        if v == 2:
            be.put(p[4], 0)
        else:
            be.put(p[4], 1)
            be.put(p[5], v - 3)
    else:
        be.put(p[3], 1)
        if v <= 10:
            be.put(p[6], 0)
            if v <= 6:
                be.put(p[7], 0)
                be.put(CAT12_PROBS[0][0], v - 5)
            else:
                be.put(p[7], 1)
                be.put(CAT12_PROBS[1][0], (v - 7) >> 1)
                be.put(CAT12_PROBS[1][1], (v - 7) & 1)
        else:
            be.put(p[6], 1)
            for cat in range(4):
                base = 3 + (8 << cat)
                if v < base + (8 << cat) or cat == 3:
                    break
            bit1, bit0 = cat >> 1, cat & 1
            be.put(p[8], bit1)
            be.put(p[9 + bit1], bit0)
            residue = v - base
            cps = CAT_PROBS[cat]
            for i, cp in enumerate(cps):
                be.put(cp, (residue >> (len(cps) - 1 - i)) & 1)


def _clamp_q(i):
    return 0 if i < 0 else 127 if i > 127 else i


def _quantizers(qi, deltas):
    """base index + (y_dc, y2_dc, y2_ac, uv_dc, uv_ac) deltas →
    per-plane (dc, ac) dequant factors with the spec clamps."""
    ydc, y2dc, y2ac, uvdc, uvac = deltas
    y1 = (DC_Q[_clamp_q(qi + ydc)], AC_Q[_clamp_q(qi)])
    y2 = (
        DC_Q[_clamp_q(qi + y2dc)] * 2,
        max(8, AC_Q[_clamp_q(qi + y2ac)] * 155 // 100),
    )
    # chroma DC index is additionally capped at 117 (value 132)
    uv = (DC_Q[min(117, _clamp_q(qi + uvdc))], AC_Q[_clamp_q(qi + uvac)])
    return y1, y2, uv


# --------------------------------------------------------------------------
# intra prediction (RFC 6386 §12.2-12.3); borders: above=127, left=129
# --------------------------------------------------------------------------


def _predict(mode, plane, x0, y0, size, mbx, mby):
    """Return a size×size int prediction block for the reconstructed
    `plane` (numpy 2D, already padded? no — exact dims) at (x0, y0)."""
    import numpy as np

    have_above = y0 > 0
    have_left = x0 > 0
    above = (
        plane[y0 - 1, x0 : x0 + size].astype(np.int32)
        if have_above
        else np.full(size, 127, np.int32)
    )
    left = (
        plane[y0 : y0 + size, x0 - 1].astype(np.int32)
        if have_left
        else np.full(size, 129, np.int32)
    )
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    if mode == TM_PRED:
        # border corners (ground-truth-pinned vs libwebp): a row-0 MB's
        # above-left belongs to the 127 above row (127, even at col 0);
        # a col-0 MB below row 0 takes 129 from the left column
        if have_above and have_left:
            tl = int(plane[y0 - 1, x0 - 1])
        elif have_above:
            tl = 129
        else:
            tl = 127
        return np.clip(left[:, None] + above[None, :] - tl, 0, 255)
    raise ValueError("vp8: unsupported prediction mode")

# --------------------------------------------------------------------------
# frame decode
# --------------------------------------------------------------------------

UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)  # -4 = B_PRED first


def decode_vp8_frame(data: bytes):
    """VP8 payload (RIFF 'VP8 ' chunk body) → (w, h, Y, U, V) numpy
    uint8 planes (Y: h×w; U/V: ceil-halved dims). Keyframe intra
    subset only — see the module docstring for the honesty ledger."""
    import numpy as np

    if len(data) < 10:
        raise ValueError("vp8: truncated frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("vp8: interframe decode unclaimed (keyframes only)")
    part0_size = tag >> 5
    if data[3:6] != VP8_START_CODE:
        raise ValueError("vp8: bad keyframe start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("vp8: zero dimension")
    if 10 + part0_size > len(data):
        raise ValueError("vp8: truncated first partition")
    bd = BoolDecoder(data[10 : 10 + part0_size])

    bd.literal(1)  # color space (0 = YCbCr as specified)
    bd.literal(1)  # clamping type (decode-identical for in-range preds)
    seg_enabled = bd.literal(1)
    seg_map_update = 0
    seg_abs = 0
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        # §9.3: per-segment quantizer / filter features (absolute or
        # delta) + the 3-prob segment-id map tree
        seg_map_update = bd.literal(1)
        if bd.literal(1):  # update segment feature data
            seg_abs = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    mag = bd.literal(7)
                    seg_quant[i] = -mag if bd.get(128) else mag
            for i in range(4):
                if bd.literal(1):
                    mag = bd.literal(6)
                    seg_lf[i] = -mag if bd.get(128) else mag
        if seg_map_update:
            for i in range(3):
                if bd.literal(1):
                    seg_tree_probs[i] = bd.literal(8)
    filter_type = bd.literal(1)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_adj = bd.literal(1)
    ref_delta = [0, 0, 0, 0]
    mode_delta = [0, 0, 0, 0]
    if lf_adj and bd.literal(1):  # delta update
        for arr in (ref_delta, mode_delta):
            for i in range(4):
                if bd.literal(1):
                    mag = bd.literal(6)
                    arr[i] = -mag if bd.get(128) else mag
    nparts = 1 << bd.literal(2)
    part_off = 10 + part0_size
    sizes = []
    for i in range(nparts - 1):
        o = part_off + 3 * i
        if o + 3 > len(data):
            raise ValueError("vp8: truncated partition size table")
        sizes.append(data[o] | (data[o + 1] << 8) | (data[o + 2] << 16))
    part_off += 3 * (nparts - 1)
    token_bds = []
    for i in range(nparts):
        if i < nparts - 1:
            end = part_off + sizes[i]
            if end > len(data):
                raise ValueError("vp8: truncated token partition")
            token_bds.append(BoolDecoder(data[part_off:end]))
            part_off = end
        else:
            if part_off > len(data):
                raise ValueError("vp8: truncated token partition")
            token_bds.append(BoolDecoder(data[part_off:]))

    qi = bd.literal(7)
    deltas = tuple(
        bd.signed_literal(4) if bd.literal(1) else 0 for _ in range(5)
    )
    # per-segment quantizer triples (segment 0 == frame-wide when
    # segmentation is off)
    seg_q = []
    for sid in range(4):
        if seg_enabled:
            base = seg_quant[sid] if seg_abs else qi + seg_quant[sid]
        else:
            base = qi
        seg_q.append(_quantizers(_clamp_q(base), deltas))
    y1q, y2q, uvq = seg_q[0]
    bd.literal(1)  # refresh entropy probs (keyframe state is transient)
    probs = [
        [[list(ctx) for ctx in band] for band in t]
        for t in _DEFAULT_COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = _UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for pi in range(11):
                    if bd.get(up[pi]):
                        row[pi] = bd.literal(8)
    probs = [
        [[tuple(ctx) for ctx in band] for band in t] for t in probs
    ]
    mb_no_skip = bd.literal(1)
    skip_prob = bd.literal(8) if mb_no_skip else 0

    mbw = (w + 15) >> 4
    mbh = (h + 15) >> 4
    Y = np.zeros((mbh * 16, mbw * 16), np.uint8)
    U = np.zeros((mbh * 8, mbw * 8), np.uint8)
    V = np.zeros((mbh * 8, mbw * 8), np.uint8)

    y_above = [0] * (mbw * 4)
    u_above = [0] * (mbw * 2)
    v_above = [0] * (mbw * 2)
    y2_above = [0] * mbw
    bmode_above = [0] * (mbw * 4)  # B_DC for out-of-frame / 16x16 MBs
    mb_info = [[(0, False)] * mbw for _ in range(mbh)]

    for mby in range(mbh):
        y_left = [0] * 4
        u_left = [0] * 2
        v_left = [0] * 2
        y2_left = 0
        bmode_left = [0] * 4
        td = token_bds[mby % nparts]
        for mbx in range(mbw):
            sid = 0
            if seg_enabled and seg_map_update:
                sid = bd.tree(
                    (2, 4, -0, -1, -2, -3), seg_tree_probs
                )
            y1q, y2q, uvq = seg_q[sid]
            skip = bd.get(skip_prob) if mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            submodes = None
            if ymode == B_PRED:
                # 16 subblock modes, each coded against the modes of
                # the blocks above and to the left (B_DC outside the
                # frame and under 16x16-mode neighbors)
                submodes = [0] * 16
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    am = (
                        submodes[sb - 4]
                        if sby > 0
                        else bmode_above[mbx * 4 + sbx]
                    )
                    lm = submodes[sb - 1] if sbx > 0 else bmode_left[sby]
                    submodes[sb] = bd.tree(BMODE_TREE, _KF_BMODE[am][lm])
                for i in range(4):
                    bmode_above[mbx * 4 + i] = submodes[12 + i]
                    bmode_left[i] = submodes[i * 4 + 3]
            else:
                # a 16x16-mode MB's implied subblock context is the
                # MATCHING 4x4 mode (DC->B_DC, V->B_VE, H->B_HE,
                # TM->B_TM) — ground-truth-pinned: an H_PRED MB left
                # of a B_PRED MB desyncs under the all-B_DC misreading
                implied = (B_DC, B_VE, B_HE, B_TM)[ymode]
                for i in range(4):
                    bmode_above[mbx * 4 + i] = implied
                    bmode_left[i] = implied
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)

            y_res = [[0] * 16 for _ in range(16)]
            u_res = [[0] * 16 for _ in range(4)]
            v_res = [[0] * 16 for _ in range(4)]
            nz_any = False
            if skip:
                for i in range(4):
                    y_above[mbx * 4 + i] = y_left[i] = 0
                for i in range(2):
                    u_above[mbx * 2 + i] = u_left[i] = 0
                    v_above[mbx * 2 + i] = v_left[i] = 0
                if ymode != B_PRED:
                    # a skipped B_PRED MB has no Y2 block, so its Y2
                    # contexts pass through untouched
                    y2_above[mbx] = y2_left = 0
            elif ymode == B_PRED:
                # block type 3: Y tokens carry their own DC (no Y2)
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    ctx = y_above[mbx * 4 + sbx] + y_left[sby]
                    coeffs = [0] * 16
                    n = _decode_coeffs(
                        td, probs[3], ctx, 0, y1q[0], y1q[1], coeffs
                    )
                    flag = 1 if n > 0 else 0
                    nz_any = nz_any or flag
                    y_above[mbx * 4 + sbx] = y_left[sby] = flag
                    y_res[sb] = idct4x4(coeffs)
                nz_any = _decode_uv_blocks(
                    td, probs, uvq, mbx, u_above, u_left, v_above, v_left,
                    u_res, v_res,
                ) or nz_any
            else:
                y2 = [0] * 16
                nz = _decode_coeffs(
                    td, probs[1], y2_above[mbx] + y2_left, 0,
                    y2q[0], y2q[1], y2,
                )
                y2_above[mbx] = y2_left = 1 if nz > 0 else 0
                nz_any = nz_any or nz > 0
                y2dc = iwalsh4x4(y2)
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    ctx = y_above[mbx * 4 + sbx] + y_left[sby]
                    coeffs = [0] * 16
                    n = _decode_coeffs(
                        td, probs[0], ctx, 1, y1q[0], y1q[1], coeffs
                    )
                    flag = 1 if n > 1 else 0
                    nz_any = nz_any or flag
                    y_above[mbx * 4 + sbx] = y_left[sby] = flag
                    coeffs[0] = y2dc[sb]
                    y_res[sb] = idct4x4(coeffs)
                nz_any = _decode_uv_blocks(
                    td, probs, uvq, mbx, u_above, u_left, v_above, v_left,
                    u_res, v_res,
                ) or nz_any

            if seg_enabled:
                lvl = seg_lf[sid] if seg_abs else filter_level + seg_lf[sid]
                lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
            else:
                lvl = filter_level
            if lf_adj:
                lvl += ref_delta[0]  # keyframes are intra-reference
                if ymode == B_PRED:
                    lvl += mode_delta[0]
            lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
            mb_info[mby][mbx] = (lvl, nz_any or ymode == B_PRED)

            if ymode == B_PRED:
                _reconstruct_bpred_y(Y, mbx, mby, mbw, submodes, y_res)
                _reconstruct_mb(
                    Y, U, V, mbx, mby, None, uvmode, y_res, u_res, v_res
                )
            else:
                _reconstruct_mb(
                    Y, U, V, mbx, mby, ymode, uvmode, y_res, u_res, v_res
                )
    if filter_level > 0:
        loop_filter_frame(Y, U, V, mb_info, mbw, mbh, filter_type, sharpness)
    return w, h, Y[:h, :w], U[: (h + 1) >> 1, : (w + 1) >> 1], V[
        : (h + 1) >> 1, : (w + 1) >> 1
    ]


def _decode_uv_blocks(
    td, probs, uvq, mbx, u_above, u_left, v_above, v_left, u_res, v_res
):
    nz_any = False
    for plane_res, above, left in (
        (u_res, u_above, u_left),
        (v_res, v_above, v_left),
    ):
        for sb in range(4):
            sby, sbx = divmod(sb, 2)
            ctx = above[mbx * 2 + sbx] + left[sby]
            coeffs = [0] * 16
            n = _decode_coeffs(td, probs[2], ctx, 0, uvq[0], uvq[1], coeffs)
            flag = 1 if n > 0 else 0
            nz_any = nz_any or flag
            above[mbx * 2 + sbx] = left[sby] = flag
            plane_res[sb] = idct4x4(coeffs)
    return nz_any


def _reconstruct_bpred_y(Y, mbx, mby, mbw, submodes, y_res):
    """Sequential 4x4 reconstruction: each subblock's prediction reads
    the just-reconstructed neighbors; rightmost-column subblocks use
    the cached MB top-right pixels as above-right."""
    x0, y0 = mbx * 16, mby * 16
    tr4 = _mb_top_right4(Y, mbx, mby, mbw)
    for sb in range(16):
        sby, sbx = divmod(sb, 4)
        px, py = x0 + sbx * 4, y0 + sby * 4
        pred = _predict4(
            Y, px, py, submodes[sb], tr4 if sbx == 3 else None
        )
        res = y_res[sb]
        for r in range(4):
            for c in range(4):
                v = pred[r][c] + res[r * 4 + c]
                Y[py + r, px + c] = 0 if v < 0 else 255 if v > 255 else v


def _reconstruct_mb(Y, U, V, mbx, mby, ymode, uvmode, y_res, u_res, v_res):
    import numpy as np

    x0, y0 = mbx * 16, mby * 16
    if ymode is not None:  # B_PRED luma reconstructs via its own path
        pred = _predict(ymode, Y, x0, y0, 16, mbx, mby)
        res = np.zeros((16, 16), np.int32)
        for sb in range(16):
            sby, sbx = divmod(sb, 4)
            res[sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4] = np.asarray(
                y_res[sb], np.int32
            ).reshape(4, 4)
        Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred + res, 0, 255).astype(
            np.uint8
        )
    cx0, cy0 = mbx * 8, mby * 8
    for plane, resids in ((U, u_res), (V, v_res)):
        pred = _predict(uvmode, plane, cx0, cy0, 8, mbx, mby)
        res8 = np.zeros((8, 8), np.int32)
        for sb in range(4):
            sby, sbx = divmod(sb, 2)
            res8[sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4] = np.asarray(
                resids[sb], np.int32
            ).reshape(4, 4)
        plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(
            pred + res8, 0, 255
        ).astype(np.uint8)

# --------------------------------------------------------------------------
# minimal keyframe encoder (fixtures / tests): 16x16 intra modes,
# filter level 0, one token partition, no segmentation, default probs
# --------------------------------------------------------------------------


def encode_vp8_keyframe(
    y,
    u,
    v,
    *,
    q_index: int = 4,
    deltas=(0, 0, 0, 0, 0),
    mode_of=None,
    bmode_of=None,
    use_skip: bool = True,
    partitions: int = 1,
    echo_prob_updates: bool = False,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    segment_quants=None,
    segment_of=None,
):
    """Y (h×w), U, V (ceil-halved) uint8 planes → a VP8 keyframe
    payload the documented-subset decoder AND libwebp both decode.
    `mode_of(mbx, mby) -> (ymode, uvmode)` picks intra modes (default
    cycles DC/V/H/TM so every predictor appears; ymode 4 = B_PRED
    with per-subblock modes from `bmode_of(mbx, mby, sb)`, default
    cycling through all ten 4x4 predictors); the encoder
    maintains decoder-identical reconstructed planes so predictions
    never drift. Levels are quantized with the same lookup the
    decoder dequantizes with; the forward transforms are the float
    inverses of the exact integer inverse transforms (probed and
    inverted numerically — nothing transcribed). `partitions` (1, 2,
    4 or 8) stripes token data across DCT partitions by MB row — the
    layout every conformant decoder must route."""
    import numpy as np

    y = np.asarray(y, np.uint8)
    u = np.asarray(u, np.uint8)
    v = np.asarray(v, np.uint8)
    h, w = y.shape
    if not (1 <= w <= 0x3FFF and 1 <= h <= 0x3FFF):
        raise ValueError("vp8: dims out of 14-bit range")
    if u.shape != ((h + 1) >> 1, (w + 1) >> 1) or u.shape != v.shape:
        raise ValueError("vp8: chroma plane dims must be ceil-halved")
    if not 0 <= q_index <= 127:
        raise ValueError("vp8: q_index out of range")
    if partitions not in (1, 2, 4, 8):
        raise ValueError("vp8: partitions must be 1, 2, 4 or 8")
    if mode_of is None:
        mode_of = lambda mbx, mby: (  # noqa: E731
            (mbx + 2 * mby) % 4,
            (mbx + 3 * mby) % 4,
        )
    if bmode_of is None:
        bmode_of = lambda mbx, mby, sb: (sb + mbx + 2 * mby) % 10  # noqa: E731

    mbw = (w + 15) >> 4
    mbh = (h + 15) >> 4
    # edge-pad sources to the MB grid (decoder reconstructs the full
    # padded raster; the crop happens at parse time)
    Yp = np.pad(y, ((0, mbh * 16 - h), (0, mbw * 16 - w)), mode="edge")
    Up = np.pad(
        u,
        ((0, mbh * 8 - u.shape[0]), (0, mbw * 8 - u.shape[1])),
        mode="edge",
    )
    Vp = np.pad(
        v,
        ((0, mbh * 8 - v.shape[0]), (0, mbw * 8 - v.shape[1])),
        mode="edge",
    )
    recY = np.zeros_like(Yp)
    recU = np.zeros_like(Up)
    recV = np.zeros_like(Vp)

    fdct = _float_inverse_matrix(idct4x4)
    fwht = _float_inverse_matrix(iwalsh4x4)
    y1q, y2q, uvq = _quantizers(q_index, deltas)

    def quant16(coefs, dq_dc, dq_ac, first):
        lv = [0] * 16
        for n in range(first, 16):
            z = ZIGZAG[n]
            q = dq_dc if n == 0 else dq_ac
            lv[z] = int(round(coefs[z] / q))
            lv[z] = max(-2114, min(2114, lv[z]))
        return lv

    # header partition
    be = BoolEncoder()
    be.literal(0, 1)  # color space
    be.literal(0, 1)  # clamping
    if segment_quants is not None:
        sq = list(segment_quants) + [q_index] * (4 - len(segment_quants))
        if segment_of is None:
            segment_of = lambda mbx, mby: (mbx + mby) % len(  # noqa: E731
                segment_quants
            )
        be.literal(1, 1)  # segmentation enabled
        be.literal(1, 1)  # update the segment map
        be.literal(1, 1)  # update feature data
        be.literal(1, 1)  # ABSOLUTE quantizers per segment
        for v in sq:
            be.literal(1, 1)
            be.literal(v, 7)
            be.put(128, 0)  # sign: positive
        for _ in range(4):
            be.literal(0, 1)  # no per-segment filter deltas
        for _ in range(3):
            be.literal(1, 1)
            be.literal(128, 8)  # flat segment-id tree probs
        seg_q_enc = [
            _quantizers(_clamp_q(v), deltas) for v in sq
        ]
    else:
        segment_of = None
        seg_q_enc = None
        be.literal(0, 1)  # no segmentation
    be.literal(filter_type & 1, 1)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.literal(0, 1)  # no lf adjustments
    be.literal({1: 0, 2: 1, 4: 2, 8: 3}[partitions], 2)
    be.literal(q_index, 7)
    for d in deltas:
        if d:
            be.literal(1, 1)
            be.signed_literal(d, 4)
        else:
            be.literal(0, 1)
    be.literal(0, 1)  # refresh entropy probs
    k = 0
    for t in range(4):
        for b in range(8):
            for c in range(3):
                up = _UPDATE_PROBS[t][b][c]
                dflt = _DEFAULT_COEFF_PROBS[t][b][c]
                for pi in range(11):
                    # echo_prob_updates exercises the update wire
                    # format without changing semantics: every 16th
                    # prob is explicitly re-transmitted at its default
                    if echo_prob_updates and k % 16 == 0:
                        be.put(up[pi], 1)
                        be.literal(dflt[pi], 8)
                    else:
                        be.put(up[pi], 0)
                    k += 1
    skip_prob = 128
    if use_skip:
        be.literal(1, 1)
        be.literal(skip_prob, 8)
    else:
        be.literal(0, 1)

    te_list = [BoolEncoder() for _ in range(partitions)]
    probs = _DEFAULT_COEFF_PROBS

    y_above = [0] * (mbw * 4)
    u_above = [0] * (mbw * 2)
    v_above = [0] * (mbw * 2)
    y2_above = [0] * mbw
    bmode_above = [0] * (mbw * 4)

    for mby in range(mbh):
        y_left = [0] * 4
        u_left = [0] * 2
        v_left = [0] * 2
        y2_left = 0
        bmode_left = [0] * 4
        te = te_list[mby % partitions]
        for mbx in range(mbw):
            ymode, uvmode = mode_of(mbx, mby)
            if not (0 <= ymode <= 4 and 0 <= uvmode <= 3):
                raise ValueError("vp8: bad encoder mode")
            if seg_q_enc is not None:
                sid = segment_of(mbx, mby) & 3
                y1q, y2q, uvq = seg_q_enc[sid]
            x0, y0 = mbx * 16, mby * 16
            if ymode == B_PRED:
                # sequential 4x4: each subblock quantizes against a
                # prediction from the already-reconstructed plane and
                # reconstructs immediately (decoder-identical)
                submodes = [bmode_of(mbx, mby, sb) % 10 for sb in range(16)]
                tr4 = _mb_top_right4(recY, mbx, mby, mbw)
                y_levels = []
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    px, py = x0 + sbx * 4, y0 + sby * 4
                    pred = np.asarray(
                        _predict4(
                            recY, px, py, submodes[sb],
                            tr4 if sbx == 3 else None,
                        ),
                        np.int32,
                    )
                    blk = Yp[py : py + 4, px : px + 4].astype(np.int32) - pred
                    lv = quant16(fdct @ blk.reshape(16), y1q[0], y1q[1], 0)
                    y_levels.append(lv)
                    deq = [0] * 16
                    for n in range(16):
                        z = ZIGZAG[n]
                        deq[z] = lv[z] * (y1q[0] if n == 0 else y1q[1])
                    rr = np.asarray(idct4x4(deq), np.int32).reshape(4, 4)
                    recY[py : py + 4, px : px + 4] = np.clip(
                        pred + rr, 0, 255
                    ).astype(np.uint8)
                predY = None
                y2_levels = None
            else:
                submodes = None
                predY = _predict(ymode, recY, x0, y0, 16, mbx, mby)
                resY = Yp[y0 : y0 + 16, x0 : x0 + 16].astype(np.int32) - predY
                y_levels = []
                dcs = [0.0] * 16
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    blk = resY[
                        sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4
                    ].reshape(16)
                    cf = fdct @ blk
                    dcs[sb] = cf[0]
                    y_levels.append(quant16(cf, y1q[0], y1q[1], 1))
                y2_cf = fwht @ np.asarray(dcs)
                y2_levels = quant16(y2_cf, y2q[0], y2q[1], 0)

            cx0, cy0 = mbx * 8, mby * 8
            uv_levels = {}
            uv_preds = {}
            for key, src, rec in (("u", Up, recU), ("v", Vp, recV)):
                pred = _predict(uvmode, rec, cx0, cy0, 8, mbx, mby)
                uv_preds[key] = pred
                res = src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int32) - pred
                lv = []
                for sb in range(4):
                    sby, sbx = divmod(sb, 2)
                    blk = res[
                        sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4
                    ].reshape(16)
                    lv.append(quant16(fdct @ blk, uvq[0], uvq[1], 0))
                uv_levels[key] = lv

            all_zero = (
                (y2_levels is None or not any(y2_levels))
                and not any(any(l) for l in y_levels)
                and not any(any(l) for l in uv_levels["u"])
                and not any(any(l) for l in uv_levels["v"])
            )
            skip = 1 if (use_skip and all_zero) else 0
            if seg_q_enc is not None:
                be.tree((2, 4, -0, -1, -2, -3), (128, 128, 128), sid)
            if use_skip:
                be.put(skip_prob, skip)
            be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if ymode == B_PRED:
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    am = (
                        submodes[sb - 4]
                        if sby > 0
                        else bmode_above[mbx * 4 + sbx]
                    )
                    lm = submodes[sb - 1] if sbx > 0 else bmode_left[sby]
                    be.tree(BMODE_TREE, _KF_BMODE[am][lm], submodes[sb])
                for i in range(4):
                    bmode_above[mbx * 4 + i] = submodes[12 + i]
                    bmode_left[i] = submodes[i * 4 + 3]
            else:
                implied = (B_DC, B_VE, B_HE, B_TM)[ymode]
                for i in range(4):
                    bmode_above[mbx * 4 + i] = implied
                    bmode_left[i] = implied
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)

            if skip:
                for i in range(4):
                    y_above[mbx * 4 + i] = y_left[i] = 0
                for i in range(2):
                    u_above[mbx * 2 + i] = u_left[i] = 0
                    v_above[mbx * 2 + i] = v_left[i] = 0
                if ymode != B_PRED:
                    y2_above[mbx] = y2_left = 0
            elif ymode == B_PRED:
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    ctx = y_above[mbx * 4 + sbx] + y_left[sby]
                    nz = _encode_coeffs(te, probs[3], ctx, 0, y_levels[sb])
                    y_above[mbx * 4 + sbx] = y_left[sby] = 1 if nz else 0
                for key, above, left in (
                    ("u", u_above, u_left),
                    ("v", v_above, v_left),
                ):
                    for sb in range(4):
                        sby, sbx = divmod(sb, 2)
                        ctx = above[mbx * 2 + sbx] + left[sby]
                        nz = _encode_coeffs(
                            te, probs[2], ctx, 0, uv_levels[key][sb]
                        )
                        above[mbx * 2 + sbx] = left[sby] = 1 if nz else 0
            else:
                nz = _encode_coeffs(
                    te, probs[1], y2_above[mbx] + y2_left, 0, y2_levels
                )
                y2_above[mbx] = y2_left = 1 if nz else 0
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    ctx = y_above[mbx * 4 + sbx] + y_left[sby]
                    nz = _encode_coeffs(te, probs[0], ctx, 1, y_levels[sb])
                    y_above[mbx * 4 + sbx] = y_left[sby] = 1 if nz else 0
                for key, above, left in (
                    ("u", u_above, u_left),
                    ("v", v_above, v_left),
                ):
                    for sb in range(4):
                        sby, sbx = divmod(sb, 2)
                        ctx = above[mbx * 2 + sbx] + left[sby]
                        nz = _encode_coeffs(
                            te, probs[2], ctx, 0, uv_levels[key][sb]
                        )
                        above[mbx * 2 + sbx] = left[sby] = 1 if nz else 0

            # decoder-identical reconstruction (B_PRED luma already
            # reconstructed subblock-sequentially above)
            if ymode == B_PRED:
                y2deq = None
            else:
                y2deq = [0] * 16
            if y2deq is not None:
                for n in range(16):
                    z = ZIGZAG[n]
                    y2deq[z] = y2_levels[z] * (y2q[0] if n == 0 else y2q[1])
                y2dc = iwalsh4x4(y2deq)
                recres = np.zeros((16, 16), np.int32)
                for sb in range(16):
                    sby, sbx = divmod(sb, 4)
                    deq = [0] * 16
                    for n in range(1, 16):
                        z = ZIGZAG[n]
                        deq[z] = y_levels[sb][z] * y1q[1]
                    deq[0] = y2dc[sb]
                    recres[
                        sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4
                    ] = np.asarray(idct4x4(deq), np.int32).reshape(4, 4)
                recY[y0 : y0 + 16, x0 : x0 + 16] = np.clip(
                    predY + recres, 0, 255
                ).astype(np.uint8)
            for key, rec in (("u", recU), ("v", recV)):
                recres8 = np.zeros((8, 8), np.int32)
                for sb in range(4):
                    sby, sbx = divmod(sb, 2)
                    deq = [0] * 16
                    for n in range(16):
                        z = ZIGZAG[n]
                        deq[z] = uv_levels[key][sb][z] * (
                            uvq[0] if n == 0 else uvq[1]
                        )
                    recres8[
                        sby * 4 : sby * 4 + 4, sbx * 4 : sbx * 4 + 4
                    ] = np.asarray(idct4x4(deq), np.int32).reshape(4, 4)
                rec[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(
                    uv_preds[key] + recres8, 0, 255
                ).astype(np.uint8)

    part0 = be.finish()
    token_parts = [t.finish() for t in te_list]
    sizes = b"".join(
        bytes((len(t) & 0xFF, (len(t) >> 8) & 0xFF, (len(t) >> 16) & 0xFF))
        for t in token_parts[:-1]
    )
    tokens = sizes + b"".join(token_parts)
    tag = (len(part0) << 5) | (1 << 4)  # keyframe(0), version 0, show=1
    head = bytes(
        (
            tag & 0xFF,
            (tag >> 8) & 0xFF,
            (tag >> 16) & 0xFF,
        )
    )
    dims = bytes((w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F))
    return head + VP8_START_CODE + dims + part0 + tokens

# --------------------------------------------------------------------------
# B_PRED: per-subblock 4x4 intra (RFC 6386 §11.2/§12.3)
# --------------------------------------------------------------------------

# subblock mode enum in LIBWEBP's numbering (RD/VR/LD ordered
# differently from libvpx's): the extracted KF_BMODE_PROBS table is
# indexed by THIS order — pinned by the per-mode ground-truth matrix,
# which desynced on exactly the three renumbered modes until the
# enum matched the table
B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU = range(10)

# the bmode tree (ground-truth-pinned codewords): DC=0 TM=10 VE=110
# HE=11100 RD=111010 VR=111011 LD=11110 VL=111110 HD=1111110
# HU=1111111 — the right branch is UNBALANCED (LD peels off first)
BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)

_KF_BMODE = tuple(
    tuple(
        tuple(KF_BMODE_PROBS[(a * 10 + l) * 9 : (a * 10 + l) * 9 + 9])
        for l in range(10)
    )
    for a in range(10)
)


def _predict4(plane, px, py, mode, tr_override=None):
    """One 4x4 subblock prediction from the evolving plane; returns a
    4x4 int list-of-lists. `tr_override` supplies the above-right 4
    pixels for rightmost-column subblocks (the MB top-right, cached —
    rows below the MB top reuse it; interior columns read the
    just-reconstructed neighbor naturally)."""
    have_above = py > 0
    have_left = px > 0
    A = (
        [int(v) for v in plane[py - 1, px : px + 4]]
        if have_above
        else [127] * 4
    )
    if tr_override is not None:
        AR = list(tr_override)
    elif have_above:
        AR = [int(v) for v in plane[py - 1, px + 4 : px + 8]]
    else:
        AR = [127] * 4
    L = (
        [int(v) for v in plane[py : py + 4, px - 1]]
        if have_left
        else [129] * 4
    )
    if have_above and have_left:
        P = int(plane[py - 1, px - 1])
    elif have_above:
        P = 129
    else:
        P = 127

    def a2(a, b):
        return (a + b + 1) >> 1

    def a3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    if mode == B_DC:
        dc = (sum(A) + sum(L) + 4) >> 3
        return [[dc] * 4 for _ in range(4)]
    if mode == B_TM:
        return [
            [max(0, min(255, L[y] + A[x] - P)) for x in range(4)]
            for y in range(4)
        ]
    if mode == B_VE:
        row = [
            a3(P, A[0], A[1]),
            a3(A[0], A[1], A[2]),
            a3(A[1], A[2], A[3]),
            a3(A[2], A[3], AR[0]),
        ]
        return [row[:] for _ in range(4)]
    if mode == B_HE:
        col = [
            a3(P, L[0], L[1]),
            a3(L[0], L[1], L[2]),
            a3(L[1], L[2], L[3]),
            a3(L[2], L[3], L[3]),
        ]
        return [[col[y]] * 4 for y in range(4)]
    if mode == B_LD:
        AA = A + AR
        out = []
        for y in range(4):
            row = []
            for x in range(4):
                i = x + y
                row.append(
                    a3(AA[6], AA[7], AA[7])
                    if i == 6
                    else a3(AA[i], AA[i + 1], AA[i + 2])
                )
            out.append(row)
        return out
    if mode == B_RD:
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        return [
            [a3(E[x - y + 3], E[x - y + 4], E[x - y + 5]) for x in range(4)]
            for y in range(4)
        ]
    if mode == B_VR:
        r0 = [a2(P, A[0]), a2(A[0], A[1]), a2(A[1], A[2]), a2(A[2], A[3])]
        r1 = [
            a3(L[0], P, A[0]),
            a3(P, A[0], A[1]),
            a3(A[0], A[1], A[2]),
            a3(A[1], A[2], A[3]),
        ]
        r2 = [a3(L[1], L[0], P)] + r0[:3]
        r3 = [a3(L[2], L[1], L[0])] + r1[:3]
        return [r0, r1, r2, r3]
    if mode == B_VL:
        AA = A + AR
        r0 = [a2(AA[0], AA[1]), a2(AA[1], AA[2]), a2(AA[2], AA[3]), a2(AA[3], AA[4])]
        r1 = [
            a3(AA[0], AA[1], AA[2]),
            a3(AA[1], AA[2], AA[3]),
            a3(AA[2], AA[3], AA[4]),
            a3(AA[3], AA[4], AA[5]),
        ]
        r2 = r0[1:] + [a3(AA[4], AA[5], AA[6])]
        r3 = r1[1:] + [a3(AA[5], AA[6], AA[7])]
        return [r0, r1, r2, r3]
    if mode == B_HD:
        r0 = [a2(L[0], P), a3(L[0], P, A[0]), a3(P, A[0], A[1]), a3(A[0], A[1], A[2])]
        r1 = [a2(L[1], L[0]), a3(L[1], L[0], P)] + r0[:2]
        r2 = [a2(L[2], L[1]), a3(L[2], L[1], L[0])] + r1[:2]
        r3 = [a2(L[3], L[2]), a3(L[3], L[2], L[1])] + r2[:2]
        return [r0, r1, r2, r3]
    if mode == B_HU:
        r0 = [a2(L[0], L[1]), a3(L[0], L[1], L[2]), a2(L[1], L[2]), a3(L[1], L[2], L[3])]
        r1 = [r0[2], r0[3], a2(L[2], L[3]), a3(L[2], L[3], L[3])]
        r2 = [r1[2], r1[3], L[3], L[3]]
        r3 = [L[3]] * 4
        return [r0, r1, r2, r3]
    raise ValueError("vp8: bad subblock mode")


def _mb_top_right4(Y, mbx, mby, mbw):
    """The 4 above-right pixels of an MB (cached for every rightmost-
    column subblock): from the reconstructed row above, 127s on the
    frame top, replicated last-above-pixel at the frame right edge."""
    if mby == 0:
        return [127] * 4
    y0, x0 = mby * 16, mbx * 16
    if mbx < mbw - 1:
        return [int(v) for v in Y[y0 - 1, x0 + 16 : x0 + 20]]
    return [int(Y[y0 - 1, x0 + 15])] * 4

# --------------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 §15) — applied to the
# reconstructed planes MB-by-MB in raster order (left MB edge, inner
# vertical edges, top MB edge, inner horizontal edges); keyframe intra
# prediction reads UNFILTERED pixels, so only the output stage changes
# --------------------------------------------------------------------------


def _c7(v):
    return -128 if v < -128 else 127 if v > 127 else v


def _common_adjust(px, i0, step, use_outer):
    """filter4 on (p1 p0 | q0 q1) at flat index i0 = p0; returns the
    unshifted `a` for the subblock filter's outer-tap update."""
    p1 = px[i0 - step] - 128
    p0 = px[i0] - 128
    q0 = px[i0 + step] - 128
    q1 = px[i0 + 2 * step] - 128
    a = _c7((_c7(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c7(a + 4) >> 3
    e = _c7(a + 3) >> 3
    px[i0 + step] = _c7(q0 - f) + 128
    px[i0] = _c7(p0 + e) + 128
    return f


def _filter_mask(px, i0, step, interior, edge):
    p3 = px[i0 - 3 * step]
    p2 = px[i0 - 2 * step]
    p1 = px[i0 - step]
    p0 = px[i0]
    q0 = px[i0 + step]
    q1 = px[i0 + 2 * step]
    q2 = px[i0 + 3 * step]
    q3 = px[i0 + 4 * step]
    return (
        abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior
        and abs(q3 - q2) <= interior
        and abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
    )


def _hev(px, i0, step, thr):
    return abs(px[i0 - step] - px[i0]) > thr or abs(
        px[i0 + 2 * step] - px[i0 + step]
    ) > thr


def _subblock_filter(px, i0, step, hev_thr, interior, edge):
    if _filter_mask(px, i0, step, interior, edge):
        hv = _hev(px, i0, step, hev_thr)
        a = _common_adjust(px, i0, step, hv)
        if not hv:
            a = (a + 1) >> 1
            px[i0 + 2 * step] = _c7(px[i0 + 2 * step] - 128 - a) + 128
            px[i0 - step] = _c7(px[i0 - step] - 128 + a) + 128


def _mbloop_filter(px, i0, step, hev_thr, interior, edge):
    if not _filter_mask(px, i0, step, interior, edge):
        return
    if _hev(px, i0, step, hev_thr):
        _common_adjust(px, i0, step, True)
        return
    p2 = px[i0 - 2 * step] - 128
    p1 = px[i0 - step] - 128
    p0 = px[i0] - 128
    q0 = px[i0 + step] - 128
    q1 = px[i0 + 2 * step] - 128
    q2 = px[i0 + 3 * step] - 128
    w = _c7(_c7(p1 - q1) + 3 * (q0 - p0))
    a = _c7((27 * w + 63) >> 7)
    q0 = _c7(q0 - a)
    p0 = _c7(p0 + a)
    a = _c7((18 * w + 63) >> 7)
    q1 = _c7(q1 - a)
    p1 = _c7(p1 + a)
    a = _c7((9 * w + 63) >> 7)
    q2 = _c7(q2 - a)
    p2 = _c7(p2 + a)
    px[i0 - 2 * step] = p2 + 128
    px[i0 - step] = p1 + 128
    px[i0] = p0 + 128
    px[i0 + step] = q0 + 128
    px[i0 + 2 * step] = q1 + 128
    px[i0 + 3 * step] = q2 + 128


def _simple_filter(px, i0, step, edge):
    p1 = px[i0 - step]
    p0 = px[i0]
    q0 = px[i0 + step]
    q1 = px[i0 + 2 * step]
    if abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge:
        _common_adjust(px, i0, step, True)


def _filter_levels(level, sharpness, hev_kf):
    """(interior limit, hev threshold, mb-edge limit, subblock-edge
    limit) for one MB level (§15.1-15.2, keyframe hev rule)."""
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev = 2 if level >= 40 else (1 if level >= 15 else 0)
    return interior, hev, ((level + 2) * 2) + interior, (level * 2) + interior


def loop_filter_frame(Y, U, V, mb_info, mbw, mbh, filter_type, sharpness):
    """Apply the §15 loop filter in place. `mb_info[mby][mbx]` =
    (level, inner) where `inner` filters subblock edges (the MB had
    nonzero coefficients or is B_PRED). `filter_type` 0 = normal
    (Y+U+V, 6-tap MB edges), 1 = simple (Y only, 4-tap)."""
    yw = mbw * 16
    cw = mbw * 8
    # plain int lists: the filter math is signed-char domain and a
    # numpy uint8 view would wrap mid-expression
    y_flat = [int(v) for v in Y.reshape(-1)]
    u_flat = [int(v) for v in U.reshape(-1)]
    v_flat = [int(v) for v in V.reshape(-1)]
    for mby in range(mbh):
        for mbx in range(mbw):
            level, inner = mb_info[mby][mbx]
            if level == 0:
                continue
            interior, hev_t, mb_lim, sb_lim = _filter_levels(
                level, sharpness, True
            )
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            if filter_type == 1:  # simple: Y only
                if mbx > 0:
                    for r in range(16):
                        _simple_filter(y_flat, (y0 + r) * yw + x0 - 1, 1, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(
                                y_flat, (y0 + r) * yw + x0 + dx - 1, 1,
                                sb_lim,
                            )
                if mby > 0:
                    for cidx in range(16):
                        _simple_filter(
                            y_flat, (y0 - 1) * yw + x0 + cidx, yw, mb_lim
                        )
                if inner:
                    for dy in (4, 8, 12):
                        for cidx in range(16):
                            _simple_filter(
                                y_flat, (y0 + dy - 1) * yw + x0 + cidx, yw,
                                sb_lim,
                            )
                continue
            # normal filter: Y + chroma
            if mbx > 0:
                for r in range(16):
                    _mbloop_filter(
                        y_flat, (y0 + r) * yw + x0 - 1, 1,
                        hev_t, interior, mb_lim,
                    )
                for r in range(8):
                    _mbloop_filter(
                        u_flat, (cy0 + r) * cw + cx0 - 1, 1,
                        hev_t, interior, mb_lim,
                    )
                    _mbloop_filter(
                        v_flat, (cy0 + r) * cw + cx0 - 1, 1,
                        hev_t, interior, mb_lim,
                    )
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _subblock_filter(
                            y_flat, (y0 + r) * yw + x0 + dx - 1, 1,
                            hev_t, interior, sb_lim,
                        )
                for r in range(8):
                    _subblock_filter(
                        u_flat, (cy0 + r) * cw + cx0 + 3, 1,
                        hev_t, interior, sb_lim,
                    )
                    _subblock_filter(
                        v_flat, (cy0 + r) * cw + cx0 + 3, 1,
                        hev_t, interior, sb_lim,
                    )
            if mby > 0:
                for cidx in range(16):
                    _mbloop_filter(
                        y_flat, (y0 - 1) * yw + x0 + cidx, yw,
                        hev_t, interior, mb_lim,
                    )
                for cidx in range(8):
                    _mbloop_filter(
                        u_flat, (cy0 - 1) * cw + cx0 + cidx, cw,
                        hev_t, interior, mb_lim,
                    )
                    _mbloop_filter(
                        v_flat, (cy0 - 1) * cw + cx0 + cidx, cw,
                        hev_t, interior, mb_lim,
                    )
            if inner:
                for dy in (4, 8, 12):
                    for cidx in range(16):
                        _subblock_filter(
                            y_flat, (y0 + dy - 1) * yw + x0 + cidx, yw,
                            hev_t, interior, sb_lim,
                        )
                for cidx in range(8):
                    _subblock_filter(
                        u_flat, (cy0 + 3) * cw + cx0 + cidx, cw,
                        hev_t, interior, sb_lim,
                    )
                    _subblock_filter(
                        v_flat, (cy0 + 3) * cw + cx0 + cidx, cw,
                        hev_t, interior, sb_lim,
                    )
    import numpy as np

    Y[:, :] = np.asarray(y_flat, np.uint8).reshape(Y.shape)
    U[:, :] = np.asarray(u_flat, np.uint8).reshape(U.shape)
    V[:, :] = np.asarray(v_flat, np.uint8).reshape(V.shape)
