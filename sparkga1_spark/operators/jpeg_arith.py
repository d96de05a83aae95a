"""JPEG arithmetic entropy coding (ITU-T T.81 Annex D + F.1.4/F.2.4,
public spec) — the QM-coder and the DC/AC statistical models, used by
the SOF9 (extended sequential, arithmetic) decode path in
multimodal.parse_jpeg and by the build_jpeg_arith fixture encoder.

Two-sided validation (tests/test_jpeg_arith.py): the decoder
reproduces libjpeg-encoded arithmetic JPEGs BIT-EXACT, and libjpeg
decodes files from the in-repo encoder BIT-EXACT (ctypes harness in
tests/jpeg_interop.py) — the encoder's entropy bytes are in fact
byte-identical to libjpeg's for the same coefficients, pinning every
register convention below against an independent implementation.

Conventions (empirically pinned against libjpeg, consistent with the
spec's "software conventions" variant):
  - MPS owns the BOTTOM subinterval [0, A-Qe), LPS the top [A-Qe, A);
    conditional exchange applies when A-Qe < Qe at renorm time.
  - Encoder: A=0x10000, C=0, CT=11; bytes leave at C>>19 with carry
    ripple over the buffered bytes; 0x00 byte-stuffing after 0xFF
    (identical to the Huffman convention; confirmed on real libjpeg
    streams — every entropy 0xFF is followed by 0x00).
  - Decoder: C = (B0<<24)|(B1<<16), CT=0, A=0x10000; BYTEIN adds the
    next unstuffed byte at <<8 with CT=8; a marker (anything but
    0xFF00 after 0xFF) ends the data — zero bytes feed forever.
  - Statistics bins are one byte: state index (7 bits) | MPS << 7;
    estimation state machine = Table D.3 (jpeg_arith_tab, extracted +
    spec-pinned). DC model per F.1.4.4.1 (contexts 0..19 keyed on the
    previous diff's category, X-states at 20, magnitude bits at +14);
    AC model per F.1.4.4.2 (3 bins per zigzag index k: EOB / nonzero
    / magnitude, high-magnitude chains at 189/217 split by the Kx
    conditioning bound, sign via the fixed-probability bin 113).
"""

from __future__ import annotations

from sparkga1_spark.operators.jpeg_arith_tab import NLPS, NMPS, QE, SWITCH

DC_STAT_BINS = 64
AC_STAT_BINS = 256


class QMDecoder:
    """QM decoder over one DE-STUFFED entropy segment.

    The caller owns transport framing: parse_jpeg's
    _jpeg_split_entropy already strips the 0x00 stuffing bytes and
    splits at RSTn/terminating markers, so this reader consumes raw
    bytes and feeds zeros past the end (the spec's convention once a
    marker terminates the data)."""

    __slots__ = ("d", "bp", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.bp = 0
        self.c = (self._byte() << 24) | (self._byte() << 16)
        self.ct = 0
        self.a = 0x10000

    def _byte(self) -> int:
        if self.bp >= len(self.d):
            return 0
        b = self.d[self.bp]
        self.bp += 1
        return b

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        s = sv & 0x7F
        mps = sv >> 7
        qe = QE[s]
        ap = self.a - qe
        if (self.c >> 16) < ap:
            if ap & 0x8000:  # no renorm: MPS, no estimation update
                self.a = ap
                return mps
            self.a = ap
            if ap < qe:  # conditional exchange
                d = 1 - mps
                if SWITCH[s]:
                    mps = 1 - mps
                ni = NLPS[s]
            else:
                d = mps
                ni = NMPS[s]
        else:
            self.c -= ap << 16
            if ap < qe:  # conditional exchange
                d = mps
                ni = NMPS[s]
            else:
                d = 1 - mps
                if SWITCH[s]:
                    mps = 1 - mps
                ni = NLPS[s]
            self.a = qe
        st[i] = (mps << 7) | ni
        # renormalize
        a = self.a
        c = self.c
        ct = self.ct
        while True:
            if ct == 0:
                c = (c + (self._byte() << 8)) & 0xFFFFFFFF
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d


class QMEncoder:
    """QM encoder; flush() returns the stuffed entropy bytes."""

    __slots__ = ("a", "c", "ct", "buf")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf: list[int] = []

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples over the buffered bytes (whole stream is
            # buffered — fixtures are small — so the spec's stacked-FF
            # machinery reduces to direct propagation)
            i = len(self.buf) - 1
            while True:
                if i < 0:
                    raise ValueError("qm: carry past stream start")
                self.buf[i] += 1
                if self.buf[i] == 0x100:
                    self.buf[i] = 0
                    i -= 1
                else:
                    break
            self.buf.append(t & 0xFF)
        else:
            self.buf.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        s = sv & 0x7F
        mps = sv >> 7
        qe = QE[s]
        ap = self.a - qe
        if bit == mps:
            if ap & 0x8000:  # no renorm, no estimation update
                self.a = ap
                return
            if ap < qe:  # conditional exchange: MPS takes the top
                self.c += ap
                self.a = qe
            else:
                self.a = ap
            st[i] = (mps << 7) | NMPS[s]
        else:
            if ap < qe:  # conditional exchange: LPS takes the bottom
                self.a = ap
            else:
                self.c += ap
                self.a = qe
            if SWITCH[s]:
                mps = 1 - mps
            st[i] = (mps << 7) | NLPS[s]
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # CLEARBITS (D.1.8): smallest in-interval value with maximal
        # trailing zeros, then push out the remaining two bytes
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        while self.buf and self.buf[-1] == 0:
            self.buf.pop()  # trailing zeros are spec-discardable
        out = bytearray()
        for b in self.buf:
            out.append(b)
            if b == 0xFF:
                out.append(0)  # byte stuffing, as in Huffman streams
        return bytes(out)


class DCState:
    """Per-component DC conditioning (predictor + previous-diff
    category context); stats live per TABLE, this state per
    component."""

    __slots__ = ("last", "ctx")

    def __init__(self) -> None:
        self.last = 0
        self.ctx = 0


def dc_decode(dec: QMDecoder, st: bytearray, state: DCState,
              L: int, U: int) -> int:
    """Decode one DC difference (F.19-F.24); returns the new DC value
    via state.last."""
    base = state.ctx
    if dec.decode(st, base) == 0:
        state.ctx = 0
        return state.last
    sign = dec.decode(st, base + 1)
    o = base + 2 + sign
    m = dec.decode(st, o)
    if m:
        o = 20
        while dec.decode(st, o):
            m <<= 1
            if m == 0x8000:
                raise ValueError("jpeg arith: corrupt DC magnitude")
            o += 1
    if m < ((1 << L) >> 1):
        state.ctx = 0
    elif m > ((1 << U) >> 1):
        state.ctx = 12 + sign * 4
    else:
        state.ctx = 4 + sign * 4
    v = m
    o += 14
    while m := m >> 1:
        if dec.decode(st, o):
            v |= m
    v += 1
    state.last += -v if sign else v
    return state.last


def dc_encode(enc: QMEncoder, st: bytearray, state: DCState,
              L: int, U: int, dc: int) -> None:
    diff = dc - state.last
    state.last = dc
    base = state.ctx
    if diff == 0:
        enc.encode(st, base, 0)
        state.ctx = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(st, base + 1, sign)
    o = base + 2 + sign
    m = 0
    v1 = v - 1
    if v1:
        enc.encode(st, o, 1)
        m = 1
        v2 = v1
        o = 20
        while v2 := v2 >> 1:
            enc.encode(st, o, 1)
            m <<= 1
            o += 1
    enc.encode(st, o, 0)
    if m < ((1 << L) >> 1):
        state.ctx = 0
    elif m > ((1 << U) >> 1):
        state.ctx = 12 + sign * 4
    else:
        state.ctx = 4 + sign * 4
    o += 14
    mm = m
    while mm := mm >> 1:
        enc.encode(st, o, 1 if (mm & v1) else 0)


def ac_decode(dec: QMDecoder, st: bytearray, fixed: bytearray,
              Kx: int, out64, zigzag) -> None:
    """Decode the 63 AC coefficients of one block (F.20 walk) into
    out64 (natural-order flat 64 int array)."""
    k = 1
    while k <= 63:
        o = 3 * (k - 1)
        if dec.decode(st, o):
            return  # EOB
        while dec.decode(st, o + 1) == 0:
            o += 3
            k += 1
            if k > 63:
                raise ValueError("jpeg arith: AC index overflow")
        sign = dec.decode(fixed, 0)
        o += 2
        m = dec.decode(st, o)
        if m:
            if dec.decode(st, o):
                m <<= 1
                o = 189 if k <= Kx else 217
                while dec.decode(st, o):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg arith: corrupt AC magnitude")
                    o += 1
        v = m
        o += 14
        while m := m >> 1:
            if dec.decode(st, o):
                v |= m
        v += 1
        out64[zigzag[k]] = -v if sign else v
        k += 1


def ac_encode(enc: QMEncoder, st: bytearray, fixed: bytearray,
              Kx: int, zz) -> None:
    """Encode the AC run of one block from its zigzag-ordered values
    zz[1..63]."""
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        o = 3 * (k - 1)
        enc.encode(st, o, 0)  # not EOB yet
        v = int(zz[k])
        while v == 0:
            enc.encode(st, o + 1, 0)
            o += 3
            k += 1
            v = int(zz[k])
        enc.encode(st, o + 1, 1)
        sign = 1 if v < 0 else 0
        if sign:
            v = -v
        enc.encode(fixed, 0, sign)
        o += 2
        m = 0
        v1 = v - 1
        if v1:
            enc.encode(st, o, 1)
            m = 1
            v2 = v1
            if v2 := v2 >> 1:
                enc.encode(st, o, 1)
                m <<= 1
                o = 189 if k <= Kx else 217
                while v2 := v2 >> 1:
                    enc.encode(st, o, 1)
                    m <<= 1
                    o += 1
        enc.encode(st, o, 0)
        o += 14
        mm = m
        while mm := mm >> 1:
            enc.encode(st, o, 1 if (mm & v1) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def new_fixed_bin() -> bytearray:
    """The fixed-probability bin (libjpeg state 113): Qe=0x5A1D,
    NMPS=NLPS=113, SWITCH=0 — self-maintaining under the generic
    estimation procedure."""
    return bytearray([113])
