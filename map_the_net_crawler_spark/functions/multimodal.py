"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (driver brief).

Two decode tiers, picked per-runtime by a feature probe:

- **Header decode (always on, pure Python)** — real container parsing
  with no external libs: PNG IHDR (width/height), JPEG SOF marker scan,
  GIF logical screen, BMP DIB header, WAV/RIFF fmt+data chunks
  (sample rate → duration).  These are byte-level parses of the actual
  file formats, not fakes.
- **Pixel decode (Pillow, probed at import)** — when PIL is installed
  the image feature vector comes from real pixel statistics (per-band
  mean/extent histogram); otherwise features fall back to a
  deterministic sha256 derivation of the payload (clearly marked,
  stable for tests).  Swapping in soundfile/pyav for audio/video frames
  changes no Spark code — the ``mapInPandas`` batch loop is the decode
  boundary.

Everything Spark-side is real and tested either way: schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partitioning by media type.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # feature probe: real pixel decode when Pillow exists
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - container has no Pillow
    _PILImage = None

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image/audio/video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),        # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURES_SCHEMA = ("media_id long, media_type string, format string, "
                   "width int, height int, duration_ms int, "
                   "feature_dim int, features array<float>, "
                   "decode_ok boolean, error string")

_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff_media(b: bytes) -> dict | None:
    """Pure-Python container sniff: returns {format, width, height,
    duration_ms} for PNG/JPEG/GIF/BMP/WAV payloads, None if the bytes
    match no known magic.  Real byte-level parsing of the public file
    formats — no image/audio libraries required."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"format": "png", "width": w, "height": h,
                "duration_ms": None}
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:  # fill-byte padding before a marker is legal
                i += 1
                continue
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return {"format": "jpeg", "width": w, "height": h,
                        "duration_ms": None}
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > len(b):
                break
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + max(seg_len, 2)
        return {"format": "jpeg", "width": None, "height": None,
                "duration_ms": None}
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return {"format": "gif", "width": w, "height": h,
                "duration_ms": None}
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        return {"format": "bmp", "width": w, "height": abs(h),
                "duration_ms": None}
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, rate, block_align, data_size = 12, None, None, None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            csize = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                rate = struct.unpack("<I", b[i + 12:i + 16])[0]
                block_align = struct.unpack("<H", b[i + 20:i + 22])[0]
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)
        dur = None
        if rate and block_align and data_size is not None:
            dur = int(data_size / (rate * block_align) * 1000)
        return {"format": "wav", "width": None, "height": None,
                "duration_ms": dur}
    return None


def _stub_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic sha256-derived feature fallback (used when no pixel
    decoder is installed).  Stable for tests; clearly not a real model."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def _png_pixels(b: bytes) -> np.ndarray | None:
    """Pure-stdlib PNG pixel decode (zlib inflate + scanline unfilter).

    Supports the common non-interlaced 8-bit-depth layouts — gray (0),
    RGB (2), palette (3), gray+alpha (4), RGBA (6) — which covers every
    PNG the engine synthesizes and the vast bulk of web PNGs.  Returns
    an HxWx3 uint8 RGB array, or None for unsupported variants
    (interlaced / 16-bit), which fall back to the sha256 stub."""
    import zlib
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h = struct.unpack(">II", b[16:24])
    depth, ctype, _comp, _filt, interlace = struct.unpack("BBBBB", b[24:29])
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 3, 4, 6):
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    idat, palette, i = [], None, 8
    while i + 8 <= len(b):
        clen = struct.unpack(">I", b[i:i + 4])[0]
        cid = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + clen]
        if cid == b"IDAT":
            idat.append(data)
        elif cid == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IEND":
            break
        i += 12 + clen
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            li = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = li[x - channels] if x >= channels else 0
                bb = pv[x]
                if ftype == 1:
                    li[x] = (li[x] + a) & 0xFF
                elif ftype == 3:
                    li[x] = (li[x] + (a + bb) // 2) & 0xFF
                else:
                    c = pv[x - channels] if x >= channels else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    li[x] = (li[x] + pred) & 0xFF
            line = li.astype(np.uint8)
        else:
            return None
        out[y] = line
    px = out.reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px
    if ctype == 3:
        if palette is None:
            return None
        return palette[px[:, :, 0]]
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> RGB (alpha dropped)


def _bmp_pixels(b: bytes) -> np.ndarray | None:
    """Pure-stdlib BMP pixel decode: uncompressed 24-bit BI_RGB only
    (the classic Windows DIB layout).  Returns HxWx3 uint8 RGB."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    offset = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    bpp, comp = struct.unpack("<HI", b[28:34])
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(b) < offset + row * h:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=row * h, offset=offset)
    px = px.reshape(h, row)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if flip else px  # bottom-up storage


def _luma_hist_features(px: np.ndarray, dim: int) -> np.ndarray:
    """ITU-R 601-2 luma histogram, L1-normalized, binned to dim — the
    same feature definition the Pillow tier computes (convert('L') uses
    the identical integer luma transform)."""
    rgb = px.astype(np.int32)
    luma = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    hist = np.bincount(luma.ravel(), minlength=256).astype(np.float64)
    hist = hist / max(hist.sum(), 1.0)
    bins = np.array_split(hist, dim)
    return np.array([x.sum() for x in bins], dtype=np.float32)


def _pixel_features(payload: bytes, dim: int) -> np.ndarray | None:
    """Real pixel statistics (luma histogram, L1-normalized, binned to
    dim).  Decoder pick: Pillow when installed (any format); otherwise
    the pure-stdlib PNG/BMP decoders above — so the pixel tier runs for
    real in bare containers too.  None => caller falls back to the
    sha256 stub (e.g. JPEG/GIF without Pillow: entropy coding is out of
    scope for a stdlib decoder)."""
    if _PILImage is not None:  # pragma: no cover - container has no Pillow
        import io
        with _PILImage.open(io.BytesIO(payload)) as im:
            g = im.convert("L")
            hist = np.asarray(g.histogram(), dtype=np.float64)
        hist = hist / max(hist.sum(), 1.0)
        bins = np.array_split(hist, dim)
        return np.array([x.sum() for x in bins], dtype=np.float32)
    px = _png_pixels(payload)
    if px is None:
        px = _bmp_pixels(payload)
    if px is None:
        return None
    return _luma_hist_features(px, dim)


def _decode_one(payload: bytes, media_type: str, dim: int):
    """Decode boundary for one payload: header sniff (always real) +
    feature extraction (pixel stats when a decoder handles the format,
    sha256 stub otherwise).  Returns (info|None, features).

    Pixel decoding of untrusted crawl bytes can raise anything (corrupt
    body behind a valid magic: zlib errors, Pillow UnidentifiedImageError
    / DecompressionBombError / OSError, shape errors) — any such failure
    degrades to the stub features rather than killing the Spark task."""
    info = sniff_media(payload)
    feats = None
    if info is not None and info["format"] in ("png", "jpeg", "gif", "bmp"):
        try:
            feats = _pixel_features(payload, dim)
        except Exception:
            feats = None
    if feats is None:
        feats = _stub_features(payload, dim)
    return info, feats


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas over media batches → container metadata + features.

    Arrow moves the binary payloads in columnar batches; the per-batch
    loop is the decode boundary (the only place Python touches bytes).
    Partitioning: repartition by media_type so one slow codec does not
    skew every partition.  ``decode_ok`` = the payload's magic matched a
    known container; unknown bytes still get stub features (with
    decode_ok=false) so downstream joins never lose rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(pdf["media_id"],
                                           pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    info, feats = _decode_one(raw, mtype, dim)
                    out.append((mid, mtype,
                                info["format"] if info else None,
                                info["width"] if info else None,
                                info["height"] if info else None,
                                info["duration_ms"] if info else None,
                                dim, feats.tolist(), info is not None, None))
                except (NotImplementedError, struct.error) as e:
                    out.append((mid, mtype, None, None, None, None,
                                dim, None, False, str(e)))
            yield pd.DataFrame(out, columns=["media_id", "media_type",
                                             "format", "width", "height",
                                             "duration_ms", "feature_dim",
                                             "features", "decode_ok",
                                             "error"])

    return (media.repartition("media_type")
            .select("media_id", "media_type", "payload")
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    the decoder should extract — pure Column math (sequence over
    duration), so the expensive decode fan-out is planned JVM-side and
    the stubbed decoder only materializes requested frames."""
    return (media.filter(F.col("media_type") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0))
                                   - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
