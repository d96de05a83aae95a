"""ctypes harness over the container's libjpeg.so.62 (IJG/libjpeg-turbo,
BSD-zlib licensed) — the INDEPENDENT side of the JPEG interop tests,
exactly the role ctypes WebPDecodeYUV plays for VP8 in
tests/test_vp8_lossy.py.

The classic libjpeg API needs struct layouts; soname 62 pins the
frozen v6b ABI, whose public jpeglib.h layout on LP64 puts
jpeg_compress_struct at 520 bytes (probed: the library's own
JERR_BAD_STRUCT_SIZE message reports 520) — the offsets below are
computed from that public header and cross-checked at runtime
(image_width/height read back after jpeg_read_header must match).

Only used by tests; the engine decodes with pure-Python code.
"""

from __future__ import annotations

import ctypes
import os

_SO = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"

_lj = None
_err = None
_err_cb = None
_err_buf = None  # keepalive: _err is the ADDRESS of this buffer


class JpegError(RuntimeError):
    pass


def _lib():
    global _lj, _err, _err_cb, _err_buf
    if _lj is not None:
        return _lj
    lj = ctypes.CDLL(_SO)
    lj.jpeg_std_error.restype = ctypes.c_void_p
    lj.jpeg_std_error.argtypes = [ctypes.c_void_p]
    errbuf = ctypes.create_string_buffer(1024)
    e = lj.jpeg_std_error(ctypes.addressof(errbuf))

    # Replace error_exit (offset 0 of jpeg_error_mgr) with a callback
    # that raises into Python. libjpeg expects error_exit not to
    # return; raising from a ctypes callback unwinds the Python frame
    # after the C call returns — for jpeg_CreateXX/read_header-style
    # validation errors (all we can hit with self-built inputs) the
    # library state is not re-entered, so this is safe in-process.
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)

    def error_exit(cinfo_p):
        msg_code = ctypes.cast(e + 40, ctypes.POINTER(ctypes.c_int))[0]
        raise JpegError(f"libjpeg error_exit msg_code={msg_code}")

    cb = CB(error_exit)
    ctypes.memmove(
        e, ctypes.cast(cb, ctypes.c_void_p).value.to_bytes(8, "little"), 8
    )
    lj.jpeg_CreateCompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t,
    ]
    lj.jpeg_CreateDecompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t,
    ]
    _lj, _err, _err_cb, _err_buf = lj, e, cb, errbuf  # keepalives
    return lj


# ---- jpeg_compress_struct offsets (v6b ABI, LP64) ----
_C_SIZE = 520
_C_DEST = 40
_C_IMAGE_WIDTH = 48
_C_IMAGE_HEIGHT = 52
_C_INPUT_COMPONENTS = 56
_C_IN_COLOR_SPACE = 60
_C_ARITH_CODE = 260
_C_OPTIMIZE_CODING = 264
_C_NEXT_SCANLINE = 304

# ---- jpeg_decompress_struct offsets (v6b ABI, LP64) ----
_D_SIZE = 632
_D_IMAGE_WIDTH = 48
_D_IMAGE_HEIGHT = 52
_D_NUM_COMPONENTS = 56
_D_OUT_COLOR_SPACE = 64
_D_OUTPUT_WIDTH = 136
_D_OUTPUT_HEIGHT = 140
_D_OUT_COLOR_COMPONENTS = 144
_D_OUTPUT_COMPONENTS = 148
_D_OUTPUT_SCANLINE = 168
_D_ARITH_CODE = 316

JCS_GRAYSCALE = 1
JCS_RGB = 2


def _geti(buf, off):
    return ctypes.cast(
        ctypes.addressof(buf) + off, ctypes.POINTER(ctypes.c_uint)
    )[0]


def _seti(buf, off, v):
    ctypes.cast(
        ctypes.addressof(buf) + off, ctypes.POINTER(ctypes.c_uint)
    )[0] = v


_C_ARITH_DC_U = 208
_C_ARITH_AC_K = 224
_C_RESTART_INTERVAL = 280


def compress(px, *, quality: int = 100, arith: bool = True,
             progressive: bool = False, dc_U: int | None = None,
             ac_K: int | None = None, restart: int = 0) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) → JPEG bytes via libjpeg.
    quality=100 + force_baseline=False gives all-ones quant tables
    (the flat-block-lossless fixture convention); arith=True writes
    arithmetic-coded streams; progressive=True applies libjpeg's
    jpeg_simple_progression scan script (SOF2, or SOF10 with arith)."""
    import numpy as np

    lj = _lib()
    arr = np.ascontiguousarray(np.asarray(px, np.uint8))
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    comps = 1 if gray else 3

    cinfo = ctypes.create_string_buffer(_C_SIZE)
    ctypes.memmove(cinfo, _err.to_bytes(8, "little"), 8)
    lj.jpeg_CreateCompress(cinfo, 62, _C_SIZE)
    try:
        outbuf = ctypes.c_void_p(0)
        outsize = ctypes.c_ulong(0)
        lj.jpeg_mem_dest.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lj.jpeg_mem_dest(
            cinfo, ctypes.byref(outbuf), ctypes.byref(outsize)
        )
        _seti(cinfo, _C_IMAGE_WIDTH, w)
        _seti(cinfo, _C_IMAGE_HEIGHT, h)
        _seti(cinfo, _C_INPUT_COMPONENTS, comps)
        _seti(cinfo, _C_IN_COLOR_SPACE, JCS_GRAYSCALE if gray else JCS_RGB)
        lj.jpeg_set_defaults.argtypes = [ctypes.c_void_p]
        lj.jpeg_set_defaults(cinfo)
        lj.jpeg_set_quality.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lj.jpeg_set_quality(cinfo, quality, 0)
        _seti(cinfo, _C_ARITH_CODE, 1 if arith else 0)
        base = ctypes.addressof(cinfo)
        if dc_U is not None:  # non-default DAC conditioning (v6b layout)
            for t in range(2):
                ctypes.cast(base + _C_ARITH_DC_U + t,
                            ctypes.POINTER(ctypes.c_uint8))[0] = dc_U
        if ac_K is not None:
            for t in range(2):
                ctypes.cast(base + _C_ARITH_AC_K + t,
                            ctypes.POINTER(ctypes.c_uint8))[0] = ac_K
        if restart:
            _seti(cinfo, _C_RESTART_INTERVAL, restart)
        if progressive:
            lj.jpeg_simple_progression.argtypes = [ctypes.c_void_p]
            lj.jpeg_simple_progression(cinfo)
        lj.jpeg_start_compress.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lj.jpeg_start_compress(cinfo, 1)
        lj.jpeg_write_scanlines.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint,
        ]
        lj.jpeg_write_scanlines.restype = ctypes.c_uint
        rowbytes = w * comps
        RowPtrs = ctypes.c_void_p * h
        base = arr.ctypes.data
        rows = RowPtrs(*[base + r * rowbytes for r in range(h)])
        while _geti(cinfo, _C_NEXT_SCANLINE) < h:
            r = _geti(cinfo, _C_NEXT_SCANLINE)
            lj.jpeg_write_scanlines(
                cinfo, ctypes.byref(rows, r * 8), h - r
            )
        lj.jpeg_finish_compress.argtypes = [ctypes.c_void_p]
        lj.jpeg_finish_compress(cinfo)
        data = ctypes.string_at(outbuf.value, outsize.value)
    finally:
        lj.jpeg_destroy_compress.argtypes = [ctypes.c_void_p]
        lj.jpeg_destroy_compress(cinfo)
        if outbuf.value:
            ctypes.CDLL(None).free(ctypes.c_void_p(outbuf.value))
    return data


def decompress(data: bytes):
    """JPEG bytes → (numpy uint8 HxW or HxWxC, arith_code flag) via
    libjpeg (handles baseline/progressive/arithmetic alike)."""
    import numpy as np

    lj = _lib()
    cinfo = ctypes.create_string_buffer(_D_SIZE)
    ctypes.memmove(cinfo, _err.to_bytes(8, "little"), 8)
    lj.jpeg_CreateDecompress(cinfo, 62, _D_SIZE)
    try:
        buf = ctypes.create_string_buffer(data, len(data))
        lj.jpeg_mem_src.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ulong,
        ]
        lj.jpeg_mem_src(cinfo, buf, len(data))
        lj.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lj.jpeg_read_header(cinfo, 1)
        arith = bool(_geti(cinfo, _D_ARITH_CODE))
        lj.jpeg_start_decompress.argtypes = [ctypes.c_void_p]
        lj.jpeg_start_decompress(cinfo)
        w = _geti(cinfo, _D_OUTPUT_WIDTH)
        h = _geti(cinfo, _D_OUTPUT_HEIGHT)
        comps = _geti(cinfo, _D_OUTPUT_COMPONENTS)
        out = np.empty((h, w * comps), np.uint8)
        rowbytes = w * comps
        lj.jpeg_read_scanlines.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint,
        ]
        lj.jpeg_read_scanlines.restype = ctypes.c_uint
        base = out.ctypes.data
        while _geti(cinfo, _D_OUTPUT_SCANLINE) < h:
            r = _geti(cinfo, _D_OUTPUT_SCANLINE)
            RowPtrs = ctypes.c_void_p * (h - r)
            rows = RowPtrs(*[base + rr * rowbytes for rr in range(r, h)])
            lj.jpeg_read_scanlines(cinfo, rows, h - r)
        lj.jpeg_finish_decompress.argtypes = [ctypes.c_void_p]
        lj.jpeg_finish_decompress(cinfo)
    finally:
        lj.jpeg_destroy_decompress.argtypes = [ctypes.c_void_p]
        lj.jpeg_destroy_decompress(cinfo)
    if comps == 1:
        return out.reshape(h, w), arith
    return out.reshape(h, w, comps), arith


def transcode(data: bytes, *, arith: bool) -> bytes:
    """LOSSLESS transcode (the jpegtran flow): read the source's DCT
    coefficients with jpeg_read_coefficients, copy critical
    parameters, and re-write them arithmetic- or Huffman-coded —
    coefficient-identical twins of REAL photographic content for the
    entropy-layer equivalence tests."""
    lj = _lib()
    src = ctypes.create_string_buffer(_D_SIZE)
    ctypes.memmove(src, _err.to_bytes(8, "little"), 8)
    lj.jpeg_CreateDecompress(src, 62, _D_SIZE)
    dst = ctypes.create_string_buffer(_C_SIZE)
    ctypes.memmove(dst, _err.to_bytes(8, "little"), 8)
    lj.jpeg_CreateCompress(dst, 62, _C_SIZE)
    try:
        buf = ctypes.create_string_buffer(data, len(data))
        lj.jpeg_mem_src.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ulong,
        ]
        lj.jpeg_mem_src(src, buf, len(data))
        lj.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lj.jpeg_read_header(src, 1)
        lj.jpeg_read_coefficients.argtypes = [ctypes.c_void_p]
        lj.jpeg_read_coefficients.restype = ctypes.c_void_p
        coefs = lj.jpeg_read_coefficients(src)
        if not coefs:
            raise JpegError("jpeg_read_coefficients failed")
        outbuf = ctypes.c_void_p(0)
        outsize = ctypes.c_ulong(0)
        lj.jpeg_mem_dest.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lj.jpeg_mem_dest(dst, ctypes.byref(outbuf), ctypes.byref(outsize))
        lj.jpeg_copy_critical_parameters.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lj.jpeg_copy_critical_parameters(src, dst)
        _seti(dst, _C_ARITH_CODE, 1 if arith else 0)
        _seti(dst, _C_OPTIMIZE_CODING, 0 if arith else 1)
        lj.jpeg_write_coefficients.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lj.jpeg_write_coefficients(dst, ctypes.c_void_p(coefs))
        lj.jpeg_finish_compress.argtypes = [ctypes.c_void_p]
        lj.jpeg_finish_compress(dst)
        lj.jpeg_finish_decompress.argtypes = [ctypes.c_void_p]
        lj.jpeg_finish_decompress(src)
        out = ctypes.string_at(outbuf.value, outsize.value)
    finally:
        lj.jpeg_destroy_compress.argtypes = [ctypes.c_void_p]
        lj.jpeg_destroy_compress(dst)
        lj.jpeg_destroy_decompress.argtypes = [ctypes.c_void_p]
        lj.jpeg_destroy_decompress(src)
        if 'outbuf' in dir() and outbuf.value:
            ctypes.CDLL(None).free(ctypes.c_void_p(outbuf.value))
    return out
