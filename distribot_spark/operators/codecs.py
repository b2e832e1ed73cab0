"""Stdlib-only raster codecs: binary PPM (P6) and 24-bit BMP.

Real codecs for the multimodal path — no PIL/ffmpeg in this environment,
but these two formats are fully specified byte layouts that numpy parses
directly, so decode/resize are *actual* decode/resize, not simulations:

- PPM P6 (Netpbm): ASCII header ``P6 <w> <h> <maxval>`` (with ``#``
  comments allowed between tokens), then ``h*w*3`` raw RGB bytes.
- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, uncompressed
  (BI_RGB) 24-bit pixels, rows padded to 4 bytes and stored bottom-up in
  BGR order.

All functions take/return ``np.ndarray`` images shaped (h, w, 3), dtype
uint8.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = 4 whitespace-separated tokens, '#' comments run to newline
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(buf) and not buf[i : i + 1].isspace():
            i += 1
        tokens.append(buf[start:i])
    i += 1  # single whitespace byte after maxval, then raw pixels
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(buf, dtype=np.uint8, count=h * w * 3, offset=i)
    return px.reshape(h, w, 3).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if bottom_up else img).copy()


def sniff(buf: bytes) -> str | None:
    """Identify a supported raster format by magic bytes."""
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"BM":
        return "bmp"
    return None


def decode(buf: bytes) -> tuple[str, np.ndarray]:
    fmt = sniff(buf)
    if fmt == "ppm":
        return fmt, decode_ppm(buf)
    if fmt == "bmp":
        return fmt, decode_bmp(buf)
    raise ValueError("unsupported image format")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample: dst pixel (x,y) takes src pixel
    (x*sw//width, y*sh//height) — integer index math, no interpolation."""
    sh, sw = img.shape[:2]
    ys = (np.arange(height) * sh) // height
    xs = (np.arange(width) * sw) // width
    return img[np.ix_(ys, xs)]


# -- audio: 16-bit mono PCM WAV (stdlib `wave`) -------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a PCM WAV via the stdlib wave module —
    a real RIFF/WAVE container, not a simulation."""
    import io
    import wave

    assert samples.dtype == np.int16 and samples.ndim == 1
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Parse a PCM WAV; returns (sample_rate, int16 mono samples).
    Raises ValueError on anything but 16-bit mono PCM."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(buf), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("only 16-bit mono PCM supported")
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as ex:  # torn/corrupt container
        raise ValueError(f"bad wav: {ex}") from ex
    if rate <= 0:
        # the wave module happily reads a zero/negative fmt-chunk rate;
        # downstream duration math would divide by it
        raise ValueError(f"bad wav: non-positive sample rate {rate}")
    return rate, np.frombuffer(frames, dtype=np.int16)
