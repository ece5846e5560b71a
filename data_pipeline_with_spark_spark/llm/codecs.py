"""Pure-numpy image codecs: BMP, PPM, and PNG (stdlib ``zlib``).

The container environment has no PIL/libvips/ffmpeg, but three standard
image containers need no external compression library:

- **BMP** (Windows bitmap, ``BITMAPINFOHEADER`` + uncompressed 24-bit
  BGR, bottom-up rows, 4-byte row padding) — the classic interchange
  format, decodable with struct math alone.
- **PPM** (Netpbm ``P6``: ASCII header ``P6 <w> <h> <maxval>`` then raw
  RGB bytes) — the simplest real image container in existence.
- **PNG** — IDAT is zlib-compressed filtered scanlines, and ``zlib`` is
  in the Python stdlib, so the most common real-world image format
  decodes in pure public-knowledge Python: 8-bit depth, color types
  0/2/3/4/6 (gray / RGB / palette / gray+alpha / RGBA), all five
  scanline filters (None/Sub/Up/Average/Paeth), non-interlaced. The
  encoder emits spec-valid grayscale or truecolor PNGs any viewer
  opens.

These are *real* codecs for those formats (byte-exact round-trip for
BMP/PPM, pixel-exact for PNG, header + CRC validation), not fakes: any
external 24-bit uncompressed BMP, binary PPM, or 8-bit non-interlaced
PNG decodes correctly. They give the multimodal pipeline
(``llm/multimodal.py``) genuine pixels end-to-end without any native
image library. JPEG (lossy DCT + Huffman) still requires a codec lib
and raises ``UnsupportedImageError``.

North-star capability (multimodal columns over binary payloads); no
reference counterpart — the reference (elliemci/data-pipeline-with-spark)
has no image path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedImageError(ValueError):
    """Payload is not a container this pure-numpy codec can handle."""


# --------------------------------------------------------------------------
# BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes) + pixels.
# 24-bit BGR, BI_RGB (no compression), rows bottom-up, padded to 4 bytes.

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")   # magic, file size, res, res, data offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an H×W×3 uint8 RGB array as an uncompressed 24-bit BMP."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:  # grayscale convenience: replicate into RGB
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 (or HxW) uint8, got shape {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR order, bottom row first, each row padded to a 4-byte boundary.
    bgr = arr[::-1, :, ::-1]
    rows = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        rows += bgr[r].tobytes()
        rows += zeros
    data_offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    file_size = data_offset + len(rows)
    header = _BMP_FILE_HEADER.pack(b"BM", file_size, 0, 0, data_offset)
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size,  # biSize
        w,                      # biWidth
        h,                      # biHeight (>0 => bottom-up)
        1,                      # biPlanes
        24,                     # biBitCount
        0,                      # biCompression = BI_RGB
        len(rows),              # biSizeImage
        2835, 2835,             # 72 DPI in px/metre
        0, 0,                   # palette entries / important colors
    )
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an H×W×3 uint8 RGB array."""
    if (
        len(data) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
        or data[:2] != b"BM"
    ):
        raise UnsupportedImageError("not a BMP payload (or truncated header)")
    _, _, _, _, data_offset = _BMP_FILE_HEADER.unpack_from(data, 0)
    bi_size = struct.unpack_from("<I", data, _BMP_FILE_HEADER.size)[0]
    if bi_size < 40:
        raise UnsupportedImageError(f"unsupported BMP header size {bi_size}")
    (_, w, h, planes, bpp, compression, *_rest) = _BMP_INFO_HEADER.unpack_from(
        data, _BMP_FILE_HEADER.size
    )
    if compression != 0 or bpp != 24 or planes != 1:
        raise UnsupportedImageError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(data) < need:
        raise UnsupportedImageError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --------------------------------------------------------------------------
# PPM (Netpbm P6): "P6\n<w> <h>\n<maxval>\n" + raw RGB bytes.

def encode_ppm(rgb: np.ndarray) -> bytes:
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 (or HxW) uint8, got shape {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise UnsupportedImageError("not a binary PPM (P6) payload")
    # Header tokens may be separated by any whitespace and '#' comments.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedImageError("truncated PPM header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise UnsupportedImageError(f"only maxval=255 PPM supported (got {maxval})")
    need = w * h * 3
    if len(data) - pos < need:
        raise UnsupportedImageError("truncated PPM pixel data")
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


# --------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM16 mono/stereo): the uncompressed audio container —
# 12-byte RIFF header + "fmt " chunk + "data" chunk of raw samples.
# Like BMP/PPM, needs no codec library; any external PCM16 WAV decodes.

_WAV_FMT = struct.Struct("<HHIIHH")  # format, channels, rate, byte_rate, align, bits


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples (1-D mono or [n, channels]) as PCM16 WAV."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected 1-D or 2-D samples, got shape {arr.shape}")
    n_channels = arr.shape[1]
    data = arr.tobytes()  # interleaved little-endian int16
    byte_rate = sample_rate * n_channels * 2
    fmt = _WAV_FMT.pack(1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to ([n, channels] int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedImageError("not a RIFF/WAVE payload")
    pos, rate, n_channels, pcm = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            if size < _WAV_FMT.size:
                raise UnsupportedImageError("truncated WAV fmt chunk")
            audio_fmt, n_channels, rate, _, _, bits = _WAV_FMT.unpack_from(data, body)
            if audio_fmt != 1 or bits != 16:
                raise UnsupportedImageError(
                    f"only PCM16 WAV supported (format={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            if body + size > len(data):
                raise UnsupportedImageError("truncated WAV data chunk")
            pcm = data[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise UnsupportedImageError("WAV missing fmt or data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if n_channels > 1:
        samples = samples[: (len(samples) // n_channels) * n_channels].reshape(
            -1, n_channels
        )
    else:
        samples = samples[:, None] if samples.ndim == 1 else samples
        samples = samples.reshape(-1, 1)
    return samples.copy(), int(rate)


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2): the uncompressed VIDEO container — one ASCII stream
# header ("YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<fmt>\n"), then per frame a
# "FRAME\n" marker + raw planes. Grayscale video is C400 / Cmono (luma
# plane only), which keeps this a pure-struct parser like BMP/WAV.

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode [n_frames, h, w] uint8 grayscale frames as Y4M (Cmono)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"expected [n, h, w] frames, got shape {arr.shape}")
    n, h, w = arr.shape
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps[0], fps[1])
    body = b"".join(b"FRAME\n" + arr[i].tobytes() for i in range(n))
    return header + body


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a grayscale (Cmono/C400) Y4M to ([n, h, w] uint8, fps)."""
    if not data.startswith(_Y4M_MAGIC):
        raise UnsupportedImageError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise UnsupportedImageError("truncated Y4M stream header")
    w = h = None
    fps = (25, 1)
    fmt = b"420"  # Y4M default when no C tag present
    for tok in data[len(_Y4M_MAGIC) : nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = (int(num), int(den))
        elif tok[:1] == b"C":
            fmt = tok[1:]
    if w is None or h is None:
        raise UnsupportedImageError("Y4M header missing W/H")
    if not (fmt.startswith(b"mono") or fmt.startswith(b"400")):
        raise UnsupportedImageError(
            f"only grayscale Y4M (Cmono/C400) supported, got C{fmt.decode()}"
        )
    frame_bytes = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise UnsupportedImageError("malformed Y4M FRAME marker")
        body = fnl + 1
        if body + frame_bytes > len(data):
            raise UnsupportedImageError("truncated Y4M frame data")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=body).reshape(
                h, w
            )
        )
        pos = body + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps


# --------------------------------------------------------------------------
# PNG: 8-byte signature, then chunks of (length BE32, type, data, CRC32
# over type+data). IHDR fixes the geometry; IDAT chunks concatenate into
# one zlib stream of filtered scanlines (1 filter byte + W*channels
# bytes per row); IEND terminates. Filters are byte-predictors against
# the left (Sub), upper (Up), their floor-average (Average), or the
# Paeth predictor — all defined in the public W3C PNG spec.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels per pixel (bit depth 8 => 1 byte per channel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode uint8 pixels as a spec-valid non-interlaced 8-bit PNG:
    H×W arrays become grayscale (color type 0), H×W×3 truecolor RGB
    (color type 2). Scanlines use filter 0 (None) — a legal, simple,
    deterministic choice; zlib does the compressing."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"expected HxW (gray) or HxWx3 (RGB) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters into reconstructed bytes
    ([h, stride] uint8). Sub is a per-lane cumulative sum (uint8
    accumulate wraps mod 256 for free); Up is vectorized against the
    prior row; Average/Paeth carry a left-dependency and run per byte —
    fine for the Arrow-batch sizes the multimodal operators feed."""
    if len(raw) < h * (1 + stride):
        raise UnsupportedImageError("truncated PNG scanline data")
    out = np.empty((h, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub
            rec = (
                np.add.accumulate(
                    row.astype(np.uint8).reshape(-1, bpp), axis=0, dtype=np.uint8
                )
                .reshape(-1)
                .astype(np.int32)
            )
        elif ft == 2:  # Up
            rec = (row + prior) & 0xFF
        elif ft == 3:  # Average
            rec = row
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise UnsupportedImageError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (color types 0/2/3/4/6) to an
    H×W×3 uint8 RGB array (gray replicated, alpha dropped, palette
    resolved via PLTE) — the same output contract as decode_bmp. Chunk
    CRCs are verified; 16-bit depth, sub-byte depths, and Adam7
    interlace raise ``UnsupportedImageError`` honestly."""
    if data[:8] != _PNG_SIG:
        raise UnsupportedImageError("not a PNG payload")
    pos = 8
    ihdr = None
    plte: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise UnsupportedImageError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise UnsupportedImageError(f"PNG {ctype!r} chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3:
                raise UnsupportedImageError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise UnsupportedImageError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise UnsupportedImageError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise UnsupportedImageError("Adam7-interlaced PNG not supported")
    if depth != 8:
        raise UnsupportedImageError(f"only 8-bit PNG supported (depth={depth})")
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedImageError(f"unknown PNG color type {color_type}")
    if not idat:
        raise UnsupportedImageError("PNG missing IDAT")
    channels = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise UnsupportedImageError(f"corrupt PNG IDAT stream: {e}") from None
    px = _png_unfilter(raw, h, w * channels, channels).reshape(h, w, channels)
    if color_type == 2:
        return px.copy()
    if color_type == 6:
        return px[:, :, :3].copy()
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color type 3: palette indices -> PLTE rows
    if plte is None:
        raise UnsupportedImageError("palette PNG missing PLTE chunk")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(plte):
        raise UnsupportedImageError("PNG palette index out of range")
    return plte[idx]


# --------------------------------------------------------------------------
# Dispatch + pixel ops shared by the multimodal operators.

def sniff_format(data: bytes) -> str | None:
    """'bmp' / 'ppm' / 'png' for IMAGE containers this codec decodes,
    else None."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == _PNG_SIG:
        return "png"
    return None


def sniff_media(data: bytes) -> str | None:
    """Any container this module decodes: images, 'wav', or 'y4m'."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:9] == _Y4M_MAGIC:
        return "y4m"
    return sniff_format(data)


def decode_image(data: bytes) -> np.ndarray:
    """Decode BMP, PPM, or PNG payload bytes to an H×W×3 uint8 RGB
    array."""
    fmt = sniff_format(bytes(data))
    if fmt == "bmp":
        return decode_bmp(bytes(data))
    if fmt == "ppm":
        return decode_ppm(bytes(data))
    if fmt == "png":
        return decode_png(bytes(data))
    raise UnsupportedImageError(
        "unrecognized image container (expected BMP, P6 PPM, or PNG)"
    )


def encode_image(rgb: np.ndarray, fmt: str = "bmp") -> bytes:
    if fmt == "bmp":
        return encode_bmp(rgb)
    if fmt == "ppm":
        return encode_ppm(rgb)
    if fmt == "png":
        return encode_png(rgb)
    raise ValueError(f"unknown format {fmt!r}")


def to_grayscale(rgb: np.ndarray) -> np.ndarray:
    """Integer ITU-R BT.601 luma: (299R + 587G + 114B) // 1000.

    Pure-integer so the result is bit-deterministic across platforms;
    a gray image (R==G==B) maps to exactly its byte value.
    """
    arr = np.asarray(rgb, dtype=np.int64)
    return ((299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]) // 1000).astype(
        np.uint8
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (2-D grayscale or 3-D RGB), the
    deterministic sampling used by the resize operator and pHash.
    Source index = floor(dst * src / dstN) — pure integer arithmetic."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    # np.ix_ indexes the first two axes; a trailing channel axis rides
    return img[np.ix_(ys, xs)]
