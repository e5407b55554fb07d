"""Pure numpy + zlib image/audio codecs for the multimodal stages.

The sandbox has no Pillow/imageio/ffmpeg, but PNG is just zlib-compressed
filtered scanlines (RFC 2083) and WAV PCM is a stdlib `wave` read — so the
decode / resize / feature kernels can be REAL computations rather than
stubs. Scope (documented, asserted):

- PNG: 8-bit greyscale / RGB / RGBA, non-interlaced; all five scanline
  filters (None/Sub/Up/Average/Paeth) on decode; encoder emits filter 0.
- WAV: PCM 8/16-bit via the stdlib `wave` module.
- "video": a tiny length-prefixed PNG frame container (`ANIM`), enough to
  exercise a real parse-sample-decode kernel without a container library.

Environment probe (2026-08-18, this container): Pillow, imageio, cv2,
pyshacl and rdflib are NOT importable; zlib / struct / wave are. Hence
this module instead of an import-gated Pillow path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}          # PNG color type -> channels
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}        # channels -> PNG color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, *, compress_level: int = 6) -> bytes:
    """(H, W) or (H, W, {1,2,3,4}) uint8 array -> PNG bytes (filter 0)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"png_encode wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w, c = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # one 0x00 filter byte per scanline, then raw pixels
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) or (H, W, C) uint8 array. 8-bit, non-interlaced."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or ctype not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} "
                    f"interlace={interlace}); this codec does 8-bit "
                    "non-interlaced grey/greyA/RGB/RGBA")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    c = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * c
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):                       # filters chain row-to-row
        f, cur = filters[y], lines[y]
        up = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 2:                         # Up (vectorizable whole-row)
            out[y] = cur + up
        elif f in (1, 3, 4):                 # Sub/Average/Paeth need a
            row = out[y]                     # running left neighbor
            left = np.zeros(c, dtype=np.uint8)
            for x in range(0, stride, c):
                seg = slice(x, x + c)
                if f == 1:
                    row[seg] = cur[seg] + left
                elif f == 3:
                    row[seg] = cur[seg] + (
                        (left.astype(np.int16) + up[seg]) // 2).astype(np.uint8)
                else:
                    ul = out[y - 1][x - c:x] if (y and x) else zero[:c]
                    row[seg] = cur[seg] + _paeth(
                        left, up[seg], ul if len(ul) else zero[:c])
                left = row[seg]
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


_BMP_MAGIC = b"BM"


def bmp_encode(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> 24-bit uncompressed bottom-up BMP
    (BITMAPINFOHEADER). Greyscale input replicates to RGB."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"bmp_encode wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported shape {arr.shape} (24-bit BMP only)")
    h, w, _ = a.shape
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)      # rows pad to 4 bytes
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = a[::-1, :, ::-1].reshape(h, row_bytes)  # BGR, bottom-up
    pixels = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", _BMP_MAGIC, off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB array. Handles
    bottom-up (positive height) and top-down (negative) row order."""
    if data[:2] != _BMP_MAGIC:
        raise ValueError("not a BMP (bad signature)")
    (off,) = struct.unpack_from("<I", data, 10)
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hsz < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={comp}); this "
                         "codec does 24-bit uncompressed")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                       offset=off).reshape(h, stride)
    img = px[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if bottom_up else img).copy()


def image_decode(data: bytes) -> np.ndarray:
    """Format-sniffing decode: PNG or BMP by magic bytes."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == _BMP_MAGIC:
        return bmp_decode(data)
    raise ValueError("unknown image container (not PNG/BMP)")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure indexing — exact, no interpolation)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic real features: a (sqrt(dim) x sqrt(dim)) mean-luminance
    grid, unit-normalized — the classic tiny perceptual descriptor."""
    if img.ndim == 3:
        lum = img[..., :3].astype(np.float32).mean(axis=2) \
            if img.shape[2] >= 3 else img[..., 0].astype(np.float32)
    else:
        lum = img.astype(np.float32)
    g = int(np.sqrt(dim))
    assert g * g == dim, "dim must be a perfect square"
    cell = resize_nearest(lum, g * 8, g * 8).reshape(g, 8, g, 8)
    feat = cell.mean(axis=(1, 3)).reshape(-1)
    n = np.linalg.norm(feat)
    return (feat / n if n else feat).astype(np.float32)


# --------------------------------------------------------------- ANIM "video"

_ANIM_MAGIC = b"ANIM"


def anim_encode(frames: list[np.ndarray]) -> bytes:
    """Concatenate PNG frames into a length-prefixed container."""
    payload = [_ANIM_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        png = png_encode(f)
        payload.append(struct.pack(">I", len(png)))
        payload.append(png)
    return b"".join(payload)


def anim_iter_frames(data: bytes):
    """Yield (index, png_bytes) without decoding — sampling can skip."""
    if data[:4] != _ANIM_MAGIC:
        raise ValueError("not an ANIM container")
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        yield i, data[pos + 4:pos + 4 + ln]
        pos += 4 + ln


# ----------------------------------------------------------------------- WAV

def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1], sample_rate)."""
    import io
    import wave
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Real per-clip features: duration, RMS, zero-crossing rate, peak."""
    n = len(samples)
    zc = int(np.count_nonzero(np.diff(np.signbit(samples)))) if n > 1 else 0
    return {
        "duration_s": float(n / rate) if rate else 0.0,
        "rms": float(np.sqrt(np.mean(samples ** 2))) if n else 0.0,
        "zcr": float(zc / (n - 1)) if n > 1 else 0.0,
        "peak": float(np.abs(samples).max()) if n else 0.0,
    }


def spectral_features(samples: np.ndarray, rate: int,
                      n_bands: int = 8) -> dict:
    """Real frequency-domain clip features via one rfft: dominant frequency
    (Hz), spectral centroid (magnitude-weighted mean frequency, Hz), and
    `n_bands` equal-width band energy fractions up to Nyquist — the
    classic cheap audio fingerprint/quality block (a pure-numpy stand-in
    for the mel filterbank front end, no audio libs in this container)."""
    n = len(samples)
    if n < 2 or not rate:
        return {"dominant_hz": 0.0, "centroid_hz": 0.0,
                "band_energy": [0.0] * n_bands}
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    mag[0] = 0.0                         # drop DC for dominance/centroid
    tot = float(mag.sum())
    power = mag ** 2
    ptot = float(power.sum())
    band_idx = np.minimum((freqs / (rate / 2.0) * n_bands).astype(int),
                          n_bands - 1)
    bands = np.bincount(band_idx, weights=power, minlength=n_bands)
    return {
        "dominant_hz": float(freqs[int(mag.argmax())]),
        "centroid_hz": float((freqs * mag).sum() / tot) if tot else 0.0,
        "band_energy": (bands / ptot).tolist() if ptot
        else [0.0] * n_bands,
    }
