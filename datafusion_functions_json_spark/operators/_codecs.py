"""Pure-Python media codecs for the multimodal operators — no Spark, no
third-party codec libraries.

The real decode chain for :mod:`.multimodal` is:

1. ``PIL`` (Pillow) when importable — widest format coverage, C-speed;
2. these stdlib+numpy decoders — PNG (``zlib`` inflate + scanline
   unfilter), binary PPM/PGM, and WAV/PCM via the stdlib ``wave`` module;
3. header-only dimension sniffing for JPEG/GIF (real width/height/
   channels, no pixel data → no feature vector).

Every function returns ``None`` fields on malformed input instead of
raising — per-row decode failure must never fail a 100-TB Spark task
(same philosophy as the JSON kernels: tests/main.rs invalid-input rows).

The feature vectors are deliberately simple, deterministic summaries
(4×4 luma grid for images, 16 RMS bins for audio): the point is a real
decoded-bytes → fixed-width-embedding contract the pipeline operators
can join/dedup/cluster on, not a learned representation.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "decode_image_bytes",
    "decode_wav_bytes",
    "image_grid_features",
    "parse_avi",
    "decode_avi_frame",
    "encode_avi",
    "FEATURE_DIM",
]

FEATURE_DIM = 16

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# hard ceiling on inflated PNG scanline bytes per row (128 MiB ≈ a
# 6500×6500 RGBA image) — larger claims are dims-only, never inflated
_MAX_RAW_BYTES = 128 * 1024 * 1024
# channels per PNG color type (3 = palette: dims-only, no pixel decode)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> Optional[np.ndarray]:
    """Reverse PNG scanline filtering (RFC 2083 §6). Filters 0/2 are
    vectorized; 1/3/4 carry a per-byte dependency and fall back to a
    Python loop — correct over fast (the fast path at scale is PIL)."""
    if len(raw) < height * (stride + 1):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(b: bytes):
    """(height, width, channels, pixels|None) for a PNG payload, or None
    if ``b`` is not a PNG. 8-bit non-interlaced gray/RGB/gray-alpha/RGBA
    get full pixel decode; palette/16-bit/interlaced → dims only."""
    if not b.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data_start = pos + 8
        if data_start + length > len(b):
            break
        if ctype == b"IHDR":
            if length < 13:
                return None
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", b, data_start)
            )
        elif ctype == b"IDAT":
            idat += b[data_start : data_start + length]
        elif ctype == b"IEND":
            break
        pos = data_start + length + 4  # skip CRC
    if width is None or color_type not in (0, 2, 3, 4, 6):
        return None
    channels = 3 if color_type == 3 else _PNG_CHANNELS[color_type]
    if bit_depth != 8 or interlace != 0 or color_type == 3 or not idat:
        return (height, width, channels, None)
    nch = _PNG_CHANNELS[color_type]
    # Bounded inflate: a crafted IDAT can expand >1000:1, and an
    # unbounded zlib.decompress on an untrusted row could OOM an
    # executor. Cap at the exact filtered-scanline size implied by the
    # header (plus 1 byte to detect overflow); oversized headers and
    # overflowing streams are treated as failed decodes, never raised.
    need = height * (width * nch + 1)
    if need <= 0 or need > _MAX_RAW_BYTES:
        return (height, width, channels, None)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), need + 1)
        if len(raw) > need or d.unconsumed_tail:
            return (height, width, channels, None)
    except zlib.error:
        return (height, width, channels, None)
    rows = _png_unfilter(raw, height, width * nch, nch)
    if rows is None:
        return (height, width, channels, None)
    return (height, width, channels, rows.reshape(height, width, nch))


def _decode_pnm(b: bytes):
    """Binary PPM (P6) / PGM (P5): header tokens then raw samples."""
    if not (b.startswith(b"P6") or b.startswith(b"P5")):
        return None
    nch = 3 if b.startswith(b"P6") else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, pos = [], 2
    while len(tokens) < 3 and pos < len(b):
        ch = b[pos : pos + 1]
        if ch == b"#":
            while pos < len(b) and b[pos] not in (0x0A, 0x0D):
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            tokens.append(b[start:pos])
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    pos += 1  # single whitespace after maxval
    if maxval != 255 or width <= 0 or height <= 0:
        return (height, width, nch, None)
    need = width * height * nch
    if len(b) - pos < need:
        return (height, width, nch, None)
    px = np.frombuffer(b, np.uint8, need, pos).reshape(height, width, nch)
    return (height, width, nch, px)


def _sniff_jpeg(b: bytes):
    """JPEG SOFn marker scan → (height, width, channels, None)."""
    if not b.startswith(b"\xff\xd8"):
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        # SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(b):
                return None
            height, width = struct.unpack_from(">HH", b, pos + 5)
            # channel byte may be truncated off (pos+9 == len-1 case):
            # keep the dims we already parsed rather than dropping them
            channels = b[pos + 9] if pos + 10 <= len(b) else None
            return (height, width, channels, None)
        pos += 2 + seg_len
    return None


def _sniff_gif(b: bytes):
    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        return None
    if len(b) < 10:
        return None
    width, height = struct.unpack_from("<HH", b, 6)
    return (height, width, 3, None)


def decode_image_bytes(b: Optional[bytes]):
    """Best-effort image decode: (height, width, channels, pixels|None),
    or (None, None, None, None) when ``b`` is null or no decoder
    recognizes it. ``pixels`` is a (h, w, ch) uint8 array when a full
    decode was possible (PNG, PPM/PGM), else None (JPEG/GIF header-only
    sniff)."""
    if b is None:
        return (None, None, None, None)
    b = bytes(b)
    for dec in (_decode_png, _decode_pnm, _sniff_jpeg, _sniff_gif):
        try:
            got = dec(b)
        except (ValueError, struct.error, IndexError):
            got = None
        if got is not None:
            return got
    return (None, None, None, None)


def image_grid_features(pixels: Optional[np.ndarray]) -> Optional[list]:
    """4×4 grid of mean luma in [0,1] → FEATURE_DIM floats. Gray uses the
    single channel; RGB(A) uses Rec.601 luma, alpha ignored."""
    if pixels is None or pixels.size == 0:
        return None
    px = pixels.astype(np.float64)
    if px.shape[2] == 1:
        luma = px[:, :, 0]
    elif px.shape[2] == 2:  # gray + alpha
        luma = px[:, :, 0]
    else:
        luma = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    h, w = luma.shape

    def edges(n):
        # 4 bands; images narrower than 4px collapse to one full band
        return np.linspace(0, n, 5, dtype=int) if n >= 4 else np.array([0, n, n, n, n])

    ys, xs = edges(h), edges(w)
    feats = []
    for i in range(4):
        for j in range(4):
            block = luma[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            feats.append(float(block.mean()) / 255.0 if block.size else 0.0)
    return feats


_MJPG = struct.unpack("<I", b"MJPG")[0]
_MAX_AVI_FRAMES = 100_000  # index cap: a crafted chunk list can't balloon


def _riff_chunks(b: bytes, pos: int, end: int):
    """Iterate (fourcc, data_start, data_end) over a RIFF chunk run.
    Chunks are word-aligned; truncated chunks clamp to the buffer."""
    while pos + 8 <= end:
        cc = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        data_start = pos + 8
        data_end = min(data_start + sz, end)
        yield cc, data_start, data_end
        pos = data_start + sz + (sz & 1)


def parse_avi(b: Optional[bytes]):
    """Parse a RIFF/AVI container WITHOUT decoding pixels: returns
    ``{width, height, fps, bitcount, compression, top_down, frames}``
    where ``frames`` is the list of raw video-chunk payload slices
    ('##db' uncompressed DIB / '##dc' compressed, e.g. MJPEG), or None
    if ``b`` is not an AVI. Indexing is O(container scan), no pixel
    work — frame decode happens per-request in
    :func:`decode_avi_frame`, the skew-buster split the multimodal
    fan-out relies on."""
    if b is None:
        return None
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    info = {
        "width": None,
        "height": None,
        "fps": None,
        "bitcount": None,
        "compression": None,
        "top_down": False,
        "frames": [],
    }

    def walk(pos, end):
        for cc, ds, de in _riff_chunks(b, pos, end):
            if cc in (b"RIFF", b"LIST"):
                walk(ds + 4, de)  # skip the 4-byte list type
            elif cc == b"avih" and de - ds >= 40:
                (micro,) = struct.unpack_from("<I", b, ds)
                w, h = struct.unpack_from("<II", b, ds + 32)
                info["width"] = info["width"] or (w or None)
                info["height"] = info["height"] or (h or None)
                if micro and info["fps"] is None:
                    info["fps"] = 1e6 / micro
            elif cc == b"strh" and de - ds >= 28 and b[ds : ds + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", b, ds + 20)
                if scale and rate:
                    info["fps"] = rate / scale
            elif cc == b"strf" and de - ds >= 20 and info["bitcount"] is None:
                bw, bh = struct.unpack_from("<ii", b, ds + 4)
                (bc,) = struct.unpack_from("<H", b, ds + 14)
                (comp,) = struct.unpack_from("<I", b, ds + 16)
                info["width"] = info["width"] or abs(bw) or None
                info["height"] = info["height"] or abs(bh) or None
                info["top_down"] = bh < 0
                info["bitcount"] = bc
                info["compression"] = comp
            elif (
                cc[2:4] in (b"db", b"dc")
                and cc[:2].isdigit()
                and len(info["frames"]) < _MAX_AVI_FRAMES
            ):
                info["frames"].append(b[ds:de])

    try:
        walk(12, len(b))
    except (struct.error, IndexError):
        return None
    if info["width"] is None or info["height"] is None:
        return None
    return info


def decode_avi_frame(info: dict, idx: int):
    """Decode frame ``idx`` of a :func:`parse_avi` result to a
    (h, w, 3) uint8 RGB array, or None when out of range / unsupported.
    Full pixel decode for uncompressed BI_RGB 24/32-bit DIB frames
    (bottom-up rows, BGR order, 4-byte row padding — all per the DIB
    spec); MJPEG ('MJPG') frame bytes should be routed to the JPEG
    path by the caller (PIL where importable, header sniff here)."""
    if info is None or not 0 <= idx < len(info["frames"]):
        return None
    w, h = info["width"], info["height"]
    comp, bits = info["compression"], info["bitcount"]
    if comp != 0 or bits not in (24, 32) or not w or not h:
        return None
    data = info["frames"][idx]
    bypp = bits // 8
    stride = ((w * bypp + 3) // 4) * 4
    if len(data) < stride * h:
        return None
    rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    if not info["top_down"]:
        px = px[::-1]  # bottom-up DIB
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) -> RGB


def _avi_chunk(cc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return cc + struct.pack("<I", len(data)) + data + pad


def encode_avi(frames, fps: int = 1) -> bytes:
    """Minimal AVI writer: uncompressed 24-bit BI_RGB DIB video frames
    (bottom-up rows, BGR byte order, 4-byte row padding). The sink-side
    twin of :func:`parse_avi`/:func:`decode_avi_frame` — used by tests
    and fixture-planting queries; at scale, a real pipeline would write
    per-row payloads with this and store them in a binary column."""
    h, w, _ = frames[0].shape
    stride = ((w * 3 + 3) // 4) * 4

    def dib(frame):
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = frame[y][:, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        return b"".join(rows)

    avih = struct.pack(
        "<14I", int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    hdrl = _avi_chunk(
        b"LIST",
        b"hdrl"
        + _avi_chunk(b"avih", avih)
        + _avi_chunk(
            b"LIST",
            b"strl" + _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf),
        ),
    )
    movi = _avi_chunk(
        b"LIST",
        b"movi" + b"".join(_avi_chunk(b"00db", dib(f)) for f in frames),
    )
    return _avi_chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_wav_bytes(b: Optional[bytes]):
    """WAV/PCM decode via the stdlib ``wave`` module: (sample_rate,
    n_samples, features|None), or (None, None, None) for null/non-WAV
    payloads. Features: 16 RMS-energy bins over the mono mix, normalized
    to full scale."""
    if b is None:
        return (None, None, None)
    try:
        with wave.open(io.BytesIO(bytes(b))) as w:
            sample_rate = w.getframerate()
            n_frames = w.getnframes()
            n_channels = w.getnchannels()
            samp_width = w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error, ValueError):
        return (None, None, None)
    if n_frames == 0:
        return (sample_rate, 0, None)
    if samp_width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif samp_width == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif samp_width == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit et al.: report real rate/count, skip features
        return (sample_rate, n_frames, None)
    usable = (len(x) // n_channels) * n_channels
    mono = x[:usable].reshape(-1, n_channels).mean(axis=1)
    if mono.size == 0:
        return (sample_rate, n_frames, None)
    edges = np.linspace(0, mono.size, FEATURE_DIM + 1, dtype=int)
    feats = []
    for i in range(FEATURE_DIM):
        seg = mono[edges[i] : edges[i + 1]]
        feats.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    return (sample_rate, n_frames, feats)
