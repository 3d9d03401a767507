"""Pure-stdlib+NumPy media codecs for the multimodal operators.

The container ships no PIL/ffmpeg, but that only blocks COMPRESSED
formats (JPEG/H.264). Uncompressed formats have fully-specified byte
layouts decodable with NumPy alone, so those decode kernels are REAL:

- BMP (Windows DIB, BITMAPINFOHEADER): 8-bit grayscale (palette) and
  24-bit BGR, bottom-up rows, 4-byte row padding. Encoder + decoder.
- PNG (RFC 2083): 8-bit grayscale / RGB / RGBA, all five scanline
  filters (None/Sub/Up/Average/Paeth) — IDAT is just zlib, which the
  stdlib ships, so even this COMPRESSED format decodes without PIL.
  Encoder (filter 0) + decoder.
- WAV (RIFF PCM): 16-bit mono/stereo via the stdlib ``wave`` module.
  Encoder + decoder.

JPEG/MP4 remain environment-gated: ``decode_image`` raises
NotImplementedError for them with the production one-liner documented,
exactly as the multimodal brief requires.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------- BMP

_BMP_FILE_HDR = "<2sIHHI"          # magic, file size, res1, res2, px offset
_BMP_INFO_HDR = "<IiiHHIIiiII"     # BITMAPINFOHEADER (40 bytes)


def bmp_encode(px: np.ndarray) -> bytes:
    """Encode (h, w) uint8 grayscale or (h, w, 3) uint8 RGB as BMP."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(
            f"bmp_encode supports (h, w) gray or (h, w, 3) RGB, got shape "
            f"{px.shape} — use png_encode for RGBA")
    h, w = px.shape[:2]
    bpp = 8 if gray else 24
    row_bytes = (w * bpp // 8 + 3) & ~3          # rows pad to 4 bytes
    palette = bytes(
        b for v in range(256) for b in (v, v, v, 0)) if gray else b""
    px_offset = struct.calcsize(_BMP_FILE_HDR) + \
        struct.calcsize(_BMP_INFO_HDR) + len(palette)
    img_size = row_bytes * h
    out = bytearray()
    out += struct.pack(_BMP_FILE_HDR, b"BM", px_offset + img_size, 0, 0,
                       px_offset)
    out += struct.pack(_BMP_INFO_HDR, 40, w, h, 1, bpp, 0, img_size,
                       2835, 2835, 256 if gray else 0, 0)
    out += palette
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    if gray:
        rows[:, :w] = px
    else:
        rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    out += rows[::-1].tobytes()                   # bottom-up
    return bytes(out)


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode BMP -> (h, w) uint8 grayscale or (h, w, 3) uint8 RGB."""
    magic, _, _, _, px_offset = struct.unpack_from(_BMP_FILE_HDR, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, comp, _, _, _, _, _) = struct.unpack_from(
        _BMP_INFO_HDR, payload, struct.calcsize(_BMP_FILE_HDR))
    if hdr_size < 40 or comp != 0:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, "
                         f"compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=px_offset).reshape(h, row_bytes)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        return rows[:, :w].copy()
    if bpp == 24:
        return rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
    raise ValueError(f"unsupported BMP bit depth {bpp}")


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def png_encode(px: np.ndarray) -> bytes:
    """Encode (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA uint8 as PNG
    (8-bit, filter 0 scanlines)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = px.reshape(h, w * ch)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), flat], axis=1).tobytes()
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """Decode 8-bit gray/RGB/RGBA PNG -> uint8 array. All five scanline
    filters handled; interlacing/palette/16-bit are out of scope (raise)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, "
                    f"color={color}, interlace={interlace})")
            meta = (w, h, _PNG_CHANNELS[color])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    filters, data = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = data[y].copy()
        f = filters[y]
        if f == 0:
            pass
        elif f == 2:                                   # Up
            row = (row + prev) & 0xFF
        elif f in (1, 3, 4):                           # Sub/Average/Paeth
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                up = prev[x]
                if f == 1:
                    row[x] = (row[x] + left) & 0xFF
                elif f == 3:
                    row[x] = (row[x] + ((left + up) >> 1)) & 0xFF
                else:
                    ul = prev[x - ch] if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) \
                        else (up if pb <= pc else ul)
                    row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = row
        prev = row
    px = out.astype(np.uint8)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)


# ---------------------------------------------------------------- WAV

def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 PCM (n,) mono or (n, 2) stereo as RIFF WAV."""
    samples = np.asarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF WAV -> (int16 samples (n,) or (n, ch), sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got "
                             f"{8 * f.getsampwidth()}-bit")
        rate = f.getframerate()
        ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    samples = np.frombuffer(raw, dtype=np.int16)
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


# ------------------------------------------------------------- dispatch

def decode_image(payload: bytes, mime: str | None) -> np.ndarray:
    """Real decode for self-describing uncompressed formats; compressed
    formats use Pillow when it is importable (production environments)
    and stay environment-gated otherwise (no PIL in this container)."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    try:  # optional dependency, same pattern as grapheme's `regex`
        import PIL.Image  # noqa: PLC0415
    except ImportError:
        raise NotImplementedError(
            f"no decoder for {mime or 'unknown'} in this environment — "
            f"install Pillow to decode compressed image formats")
    return np.asarray(PIL.Image.open(io.BytesIO(payload)))


def decode_audio(payload: bytes, mime: str | None) -> tuple[np.ndarray, int]:
    if payload[:4] == b"RIFF":
        return wav_decode(payload)
    raise NotImplementedError(
        f"no decoder for {mime or 'unknown'} in this environment — "
        f"production body: soundfile.read(io.BytesIO(payload))")
