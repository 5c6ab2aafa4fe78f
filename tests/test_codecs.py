"""Spark-free unit tests for the pure-stdlib media codecs
(operators/_codecs.py): PNG decode across all five scanline filters,
PPM/PGM, JPEG/GIF header sniffing, WAV/PCM, and the feature grids.

Fixtures are generated in-test (own minimal PNG/WAV writers) so the
suite needs no binary files and no codec libraries.
"""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from datafusion_functions_json_spark.operators._codecs import (
    FEATURE_DIM,
    decode_avi_frame,
    decode_image_bytes,
    decode_wav_bytes,
    encode_avi,
    image_grid_features,
    parse_avi,
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for (h, w, ch) uint8 arrays, applying one
    filter type to every scanline — exercises the decoder's unfilter
    paths (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth)."""
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        filt = np.empty_like(line)
        for i in range(len(line)):
            a = int(line[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        raw.append(filter_type)
        raw += filt.astype(np.uint8).tobytes()
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """16-bit PCM WAV from an int16 sample array."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _checker(h, w, ch):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)




class TestPngDecode:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_roundtrip_all_filters_and_channels(self, filter_type, ch):
        px = _checker(11, 7, ch)
        h, w, c, decoded = decode_image_bytes(encode_png(px, filter_type))
        assert (h, w, c) == (11, 7, ch)
        assert decoded is not None and np.array_equal(decoded, px)

    def test_truncated_png_gives_dims_only_or_none(self):
        full = encode_png(_checker(8, 8, 3))
        # cut inside the IDAT payload: header parses, pixels don't
        h, w, c, px = decode_image_bytes(full[:45])
        assert (h, w, c) in ((8, 8, 3), (None, None, None))
        assert px is None

    def test_garbage_is_all_null(self):
        assert decode_image_bytes(b"not an image at all") == (None, None, None, None)
        assert decode_image_bytes(None) == (None, None, None, None)
        assert decode_image_bytes(b"") == (None, None, None, None)

    def test_features_deterministic_and_grid_shaped(self):
        px = _checker(32, 32, 3)
        f1 = image_grid_features(px)
        f2 = image_grid_features(px)
        assert f1 == f2 and len(f1) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in f1)
        # constant image -> constant features
        flat = image_grid_features(np.full((16, 16, 3), 128, np.uint8))
        assert all(abs(v - 128 / 255) < 1e-12 for v in flat)

    def test_tiny_image_features(self):
        f = image_grid_features(np.full((2, 2, 1), 255, np.uint8))
        assert len(f) == FEATURE_DIM and f[0] == 1.0

    def test_decompression_bomb_is_dims_only(self):
        # IDAT inflates to far more than the header-implied scanline
        # size (a zip-bomb row) -> must NOT inflate unboundedly; the
        # row degrades to dims-only, never an OOM or exception
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)  # claims 4x4 RGB
        bomb = zlib.compress(b"\x00" * (50 * 1024 * 1024), 9)  # ~50 MiB raw
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", bomb)
            + _png_chunk(b"IEND", b"")
        )
        assert len(payload) < 1024 * 1024  # the bomb itself is small
        h, w, c, px = decode_image_bytes(payload)
        assert (h, w, c, px) == (4, 4, 3, None)

    def test_absurd_dims_never_inflated(self):
        # header claims 60000x60000 RGBA (~14 GiB of scanlines): the
        # decoder must refuse to allocate and return dims-only
        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 6, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _png_chunk(b"IEND", b"")
        )
        h, w, c, px = decode_image_bytes(payload)
        assert (h, w, c, px) == (60000, 60000, 4, None)


class TestPnm:
    def test_ppm_p6(self):
        px = _checker(5, 4, 3)
        payload = b"P6\n# comment\n4 5\n255\n" + px.tobytes()
        h, w, c, decoded = decode_image_bytes(payload)
        assert (h, w, c) == (5, 4, 3)
        assert np.array_equal(decoded, px)

    def test_pgm_p5(self):
        px = _checker(3, 6, 1)
        payload = b"P5 6 3 255\n" + px.tobytes()
        h, w, c, decoded = decode_image_bytes(payload)
        assert (h, w, c) == (3, 6, 1)
        assert np.array_equal(decoded, px)


class TestHeaderSniff:
    def test_jpeg_sof(self):
        # SOI + APP0 stub + SOF0 with 480x640, 3 components
        sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3)
        payload = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
        h, w, c, px = decode_image_bytes(payload)
        assert (h, w, c, px) == (480, 640, 3, None)

    def test_jpeg_truncated_before_channel_byte_keeps_dims(self):
        # SOF parses height/width but the payload ends exactly before
        # the component-count byte: dims survive, channels is NULL
        sof = b"\xff\xc0" + struct.pack(">HBHH", 11, 8, 480, 640)
        payload = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
        h, w, c, px = decode_image_bytes(payload)
        assert (h, w, c, px) == (480, 640, None, None)

    def test_gif(self):
        payload = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
        h, w, c, px = decode_image_bytes(payload)
        assert (h, w, c, px) == (200, 320, 3, None)


class TestWav:
    def test_mono_16bit(self):
        samples = (np.sin(np.linspace(0, 40 * np.pi, 3200)) * 20000).astype(np.int16)
        sr, n, feats = decode_wav_bytes(encode_wav(samples, 16000))
        assert sr == 16000 and n == 3200
        assert len(feats) == FEATURE_DIM
        # a steady sine has near-equal RMS in every bin
        assert max(feats) - min(feats) < 0.05
        assert all(0.4 < v < 0.8 for v in feats)  # amplitude 20000/32768 / sqrt(2)

    def test_stereo_downmix(self):
        left = np.full(1600, 10000, np.int16)
        right = np.full(1600, -10000, np.int16)
        inter = np.empty(3200, np.int16)
        inter[0::2], inter[1::2] = left, right
        sr, n, feats = decode_wav_bytes(encode_wav(inter, 44100, channels=2))
        assert sr == 44100 and n == 1600
        # L/R cancel in the mono mix
        assert all(v < 1e-9 for v in feats)

    def test_silence_and_empty(self):
        sr, n, feats = decode_wav_bytes(encode_wav(np.zeros(160, np.int16)))
        assert n == 160 and all(v == 0.0 for v in feats)
        sr0, n0, f0 = decode_wav_bytes(encode_wav(np.zeros(0, np.int16)))
        assert (sr0, n0, f0) == (16000, 0, None)

    def test_non_wav_is_null(self):
        assert decode_wav_bytes(b"RIFF but not really") == (None, None, None)
        assert decode_wav_bytes(None) == (None, None, None)
        assert decode_wav_bytes(b"") == (None, None, None)

    def test_8bit_unsigned(self):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes([128] * 100))  # digital silence at 8-bit
        sr, n, feats = decode_wav_bytes(buf.getvalue())
        assert sr == 8000 and n == 100
        assert all(v == 0.0 for v in feats)


class TestAvi:
    def test_roundtrip_rgb_frames(self):
        frames = [_checker(6, 5, 3), _checker(6, 5, 3), _checker(6, 5, 3)]
        info = parse_avi(encode_avi(frames, fps=2))
        assert info is not None
        assert (info["width"], info["height"]) == (5, 6)
        assert info["fps"] == 2.0
        assert info["compression"] == 0 and info["bitcount"] == 24
        assert len(info["frames"]) == 3
        for i, f in enumerate(frames):
            got = decode_avi_frame(info, i)
            assert got is not None and np.array_equal(got, f), f"frame {i}"

    def test_odd_width_row_padding(self):
        # width 3 -> 9-byte rows padded to 12: the stride math must strip
        # the pad, not shift pixels
        frames = [_checker(4, 3, 3)]
        info = parse_avi(encode_avi(frames))
        assert np.array_equal(decode_avi_frame(info, 0), frames[0])

    def test_out_of_range_and_garbage(self):
        info = parse_avi(encode_avi([_checker(4, 4, 3)]))
        assert decode_avi_frame(info, 1) is None
        assert decode_avi_frame(info, -1) is None
        assert parse_avi(b"RIFF\x00\x00\x00\x00WAVE") is None
        assert parse_avi(b"not a container") is None
        assert parse_avi(None) is None

    def test_truncated_container_is_none_or_partial(self):
        full = encode_avi([_checker(8, 8, 3), _checker(8, 8, 3)])
        cut = parse_avi(full[: len(full) // 2])
        # header may parse (dims known); truncated frames must not crash
        if cut is not None:
            for i in range(len(cut["frames"])):
                decode_avi_frame(cut, i)  # no exception; None is fine


class TestPilParity:
    def test_pil_decodes_our_png_identically(self):
        PIL_Image = pytest.importorskip("PIL.Image")
        px = _checker(10, 9, 3)
        img = PIL_Image.open(io.BytesIO(encode_png(px, 4)))
        assert np.array_equal(np.asarray(img), px)
