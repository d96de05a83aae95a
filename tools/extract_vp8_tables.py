"""Extract VP8's normative constant tables from the system libwebp.

The VP8 bitstream (RFC 6386) normatively fixes several constant
tables: the quantizer lookup tables (§14.1), the default coefficient
probabilities and their update probabilities (§13.4-13.5), the
coefficient band mapping, and the keyframe B-mode probabilities.
Transcribing ~3000 constants by hand is exactly the failure mode the
repo's honesty ledger exists to prevent (a wrong literal decodes
consistently-wrong against every in-repo check). This tool instead
reads them out of the container's compiled `libwebp.so.7` (Debian
libwebp7 1.2.4, BSD-licensed public code whose tables ARE the RFC's)
using structural signatures, and regenerates
`sparkga1_spark/operators/vp8_tables.py`.

The extraction is NOT trusted on its own: tests/test_vp8_lossy.py
validates the tables end-to-end by decoding VP8 streams with the
in-repo decoder and demanding bit-exact YUV equality against
libwebp's own decode (ctypes WebPDecodeYUV) — a single wrong table
byte desyncs the boolean coder and fails the comparison.

Signatures (verified against values quoted in the public spec and
libvpx sources):
  - kAcTable: uint16[128], monotone, starts 4,5,6,... ends 284
  - kDcTable: uint8[128],  monotone, starts 4,5,6,... ends 157
  - kBands:   uint8[16] == {0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7}
    (immediately after kDcTable; its published value anchors the
    surrounding layout)
  - CoeffsUpdateProba: 1056 bytes right after kBands (+pad), >80% 255
  - kBModesProba: 900 bytes following, first row {231,120,48,...}
  - CoeffsProba0: 1056 bytes following, rows 3..5 carry the published
    anchor {253,136,254,255,228,219,128...}
  - kZigzag {0,1,4,8,...}, kCat3..kCat6 extra-bit probabilities

Usage: python tools/extract_vp8_tables.py [--check]
  --check: re-extract and diff against the committed module (exit 1
  on drift) instead of rewriting it.
"""

from __future__ import annotations

import os
import re
import struct
import sys

SO_CANDIDATES = (
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "/usr/lib/libwebp.so.7",
)

KBANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
PROBA_ANCHOR = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
CAT6_ANCHOR = bytes([254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129])


def _find_so() -> str:
    for p in SO_CANDIDATES:
        if os.path.exists(p):
            return os.path.realpath(p)
    raise SystemExit("libwebp.so.7 not found — cannot extract")


def extract() -> dict:
    data = open(_find_so(), "rb").read()

    # anchor on kBands: the ONE fully published 16-byte sequence that
    # sits inside the table block
    kb = bytes(KBANDS)
    kb_offs = [m.start() for m in re.finditer(re.escape(kb), data)]
    if not kb_offs:
        raise SystemExit("kBands signature not found")
    out = {}
    for kb_off in kb_offs:
        # kDcTable: the 128 bytes before kBands
        dc = data[kb_off - 128 : kb_off]
        if dc[0] != 4 or any(dc[i] > dc[i + 1] for i in range(127)) or dc[-1] != 157:
            continue
        ac = struct.unpack_from("<128H", data, kb_off - 128 - 256)
        if ac[0] != 4 or ac[-1] != 284:
            continue
        # after kBands: zero padding, then update probs (1056), bmodes
        # (900), zero padding, coeff probs (1056); none of the tables
        # begins with a zero byte, so padding is skippable
        def skip_zeros(off):
            while data[off] == 0:
                off += 1
            return off

        upd_off = skip_zeros(kb_off + 16)
        upd = data[upd_off : upd_off + 1056]
        if upd.count(255) < 700 or 0 in upd:
            continue
        bm_off = skip_zeros(upd_off + 1056)
        if data[bm_off : bm_off + 9] != BMODE_ANCHOR:
            continue
        bmodes = data[bm_off : bm_off + 900]
        cp_off = skip_zeros(bm_off + 900)
        cp = data[cp_off : cp_off + 1056]
        if cp[33:44] != PROBA_ANCHOR:
            continue
        out = {
            "ac_q": list(ac),
            "dc_q": list(dc),
            "coeff_update_probs": list(upd),
            "kf_bmode_probs": list(bmodes),
            "coeff_probs": list(cp),
        }
        break
    if not out:
        raise SystemExit("table block signatures did not line up")

    # cat3..6 extra-bit probabilities: zigzag-anchored block
    zz = bytes(ZIGZAG)
    zz_off = next(
        m.start()
        for m in re.finditer(re.escape(zz), data)
        if data[m.start() + 16 : m.start() + 27] == CAT6_ANCHOR
    )
    p = zz_off + 16
    cat6 = list(data[p : p + 11]); p += 12  # NUL-terminated in the .so
    cat5 = list(data[p : p + 5]); p += 6
    cat4 = list(data[p : p + 4]); p += 5
    cat3 = list(data[p : p + 3])
    out.update(cat3=cat3, cat4=cat4, cat5=cat5, cat6=cat6)
    return out


def render(t: dict) -> str:
    def fmt(name, vals, per=16):
        lines = [f"{name} = ("]
        for i in range(0, len(vals), per):
            lines.append("    " + ", ".join(str(v) for v in vals[i : i + per]) + ",")
        lines.append(")")
        return "\n".join(lines)

    head = '''"""VP8 (RFC 6386) normative constant tables.

GENERATED by tools/extract_vp8_tables.py from the container's
Debian `libwebp.so.7` (1.2.4, BSD) — see that tool's docstring for
the extraction signatures and the reason transcription was rejected.
VALIDATED end-to-end by tests/test_vp8_lossy.py: the in-repo decoder
must produce bit-exact YUV planes against libwebp's own decode of
the same streams; a single wrong byte here desyncs the boolean coder
and fails that gate. Layout notes:
  - COEFF_PROBS / COEFF_UPDATE_PROBS are [4 block types][8 bands]
    [3 contexts][11 tree probs], flattened row-major (1056 each).
  - KF_BMODE_PROBS is [10 above][10 left][9 probs] (900), driving the
    §11.5 context-conditioned B_PRED sub-block mode decode (real since
    the r9 lossy-keyframe completion).
  - AC_Q / DC_Q are the §14.1 quantizer lookups (indices clamped to
    0..127 by the codec).
Small tables whose values are published verbatim in the RFC text
(trees, kBands, zigzag, kf mode probs, cat1/cat2 extra-bit probs)
are written directly and covered by the same end-to-end gate.
"""

'''
    parts = [head]
    parts.append(fmt("AC_Q", t["ac_q"]))
    parts.append(fmt("DC_Q", t["dc_q"]))
    parts.append("KBANDS = " + repr(tuple(KBANDS)))
    parts.append("ZIGZAG = " + repr(tuple(ZIGZAG)))
    parts.append(fmt("COEFF_UPDATE_PROBS", t["coeff_update_probs"]))
    parts.append(fmt("COEFF_PROBS", t["coeff_probs"]))
    parts.append(fmt("KF_BMODE_PROBS", t["kf_bmode_probs"]))
    parts.append("CAT_PROBS = (" + ", ".join(
        repr(tuple(t[k])) for k in ("cat3", "cat4", "cat5", "cat6")) + ")")
    parts.append('''
# published-verbatim small tables (RFC 6386 text)
KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)  # B_PRED=4 DC=0 V=1 H=2 TM=3
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
KF_UV_MODE_PROBS = (142, 114, 183)
CAT12_PROBS = ((159,), (165, 145))  # cat1 / cat2 extra-bit probs
''')
    return "\n\n".join(parts) + "\n"


def main():
    t = extract()
    text = render(t)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sparkga1_spark", "operators", "vp8_tables.py",
    )
    if "--check" in sys.argv:
        cur = open(dest).read() if os.path.exists(dest) else ""
        if cur != text:
            print("DRIFT: committed vp8_tables.py != fresh extraction")
            sys.exit(1)
        print("OK: committed tables match a fresh extraction")
        return
    with open(dest, "w") as fh:
        fh.write(text)
    print(f"wrote {dest}: "
          f"{sum(len(v) for v in t.values() if isinstance(v, list))} values")


if __name__ == "__main__":
    main()
