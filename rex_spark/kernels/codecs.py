"""Pure-stdlib media codecs: PCM WAV, BMP and PNG encode/decode.

The sandbox ships no image/audio libraries, but these three container
formats are decodable with ``struct`` + ``zlib`` alone — which is what
a training-data pipeline needs to compute REAL pixel/sample statistics
instead of hash-derived stand-ins (the remaining
``decode_asset`` NotImplementedError is reserved for genuinely
compressed codecs such as video/mp4).

Everything is integer arithmetic on uint8/int16/int32 arrays — exact
and deterministic, so the oracle can verify the encode -> distributed
decode round-trip against the SOURCE arrays without ever invoking the
decoders (the strongest gold: a decoder bug cannot cancel itself out).

No reference analog: Spico197/REx is text-only; multimodal columns are
first-class here per the builder's brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# WAV (RIFF / PCM)
# --------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode integer samples to a PCM WAV container.

    ``samples``: shape (n_frames,) or (n_frames, channels); int values
    in range for ``bits`` (8 -> unsigned 0..255 stored as-is,
    16 -> signed little-endian).
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    if bits == 16:
        data = arr.astype("<i2").tobytes()
    elif bits == 8:
        data = arr.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bits={bits}")
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        sample_rate,
        byte_rate,
        block_align,
        bits,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    body = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV container -> (sample_rate, channels, samples).

    ``samples`` is int32, shape (n_frames, channels).  Walks the RIFF
    chunk list (tolerating extra chunks like LIST/INFO); raises
    ValueError for non-RIFF bytes, non-PCM encodings or bit depths
    other than 8/16/32.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, len(payload)
    fmt_fields = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > end:
            # A declared size past the payload means truncation; decoding
            # the short remainder would report status 'ok' with wrong
            # n_values/sum — honor the corrupt-status contract instead.
            raise ValueError(f"truncated {cid!r} chunk")
        chunk = payload[pos : pos + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block, bits = fmt_fields
    if audio_format != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {audio_format}")
    if channels < 1:
        raise ValueError("channels < 1")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(arr) // channels
    return (
        sample_rate,
        channels,
        arr[: n_frames * channels].reshape(n_frames, channels).astype(np.int32),
    )


def wav_data_span(payload: bytes) -> tuple[int, int, int, int]:
    """(data_offset, data_len, sample_rate, block_align) of a PCM WAV —
    lets a frame sampler seek sample-exact byte windows without
    materializing the whole sample array."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, len(payload)
    rate = block = data_off = data_len = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt " and size >= 16:
            _fmt, _ch, rate, _br, block, _bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
        elif cid == b"data":
            data_off, data_len = pos, size
        pos += size + (size & 1)
    if rate is None or data_off is None:
        raise ValueError("missing fmt/data chunk")
    return data_off, data_len, rate, block


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 24/32bpp)
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array to a 24bpp bottom-up BMP."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp wants (H, W, 3) RGB")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, each padded to a 4-byte boundary
    rows = []
    bgr = arr[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        rows.append(bgr[y].tobytes() + b"\0" * pad)
    data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32bpp BMP -> (H, W, 3) uint8 RGB.

    Handles bottom-up (positive height) and top-down (negative height)
    row orders; raises ValueError for other bit depths / compressions.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression})"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    nch = bpp // 8
    row_bytes = w * nch
    stride = (row_bytes + 3) & ~3
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB (alpha dropped for 32bpp)
    return np.ascontiguousarray(rows[:, :, [2, 1, 0]])


# --------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, all five scanline filters)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode uint8 pixels to PNG.  Shapes: (H, W) gray, (H, W, 3) RGB,
    (H, W, 4) RGBA.  ``filter_mode``: 'none' writes filter 0 rows;
    'cycle' rotates through all five filter types row by row so the
    decoder's de-filtering is exercised end to end."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, nch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, nch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, nch = 6, 4
    else:
        raise ValueError("encode_png wants (H,W), (H,W,3) or (H,W,4)")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * nch).astype(np.int32)
    prev = np.zeros(w * nch, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        row = flat[y]
        ftype = 0 if filter_mode == "none" else y % 5
        left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
        upleft = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
        if ftype == 0:
            enc = row
        elif ftype == 1:
            enc = row - left
        elif ftype == 2:
            enc = row - prev
        elif ftype == 3:
            enc = row - (left + prev) // 2
        else:
            pred = np.array(
                [
                    _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
                    for i in range(w * nch)
                ],
                dtype=np.int32,
            )
            enc = row - pred
        out.append(ftype)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(bytes(out), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit gray/RGB/RGBA non-interlaced PNG -> uint8 array
    of shape (H, W) / (H, W, 3) / (H, W, 4).  Verifies chunk CRCs;
    raises ValueError for other bit depths, palettes or interlacing."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, end = len(_PNG_SIG), len(payload)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= end:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > end:
            # Mid-chunk truncation: unpack_from past the buffer would
            # raise struct.error, breaking the documented ValueError
            # contract for corrupt payloads.
            raise ValueError("truncated PNG")
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported depth/color ({depth}, {color_type})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    nch = _COLOR_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            recon = row
        elif ftype == 2:
            recon = (row + prev) & 0xFF
        elif ftype == 1:
            # recon[x] = raw[x] + recon[x-nch]: per-lane cumsum mod 256
            recon = row.reshape(w, nch).cumsum(axis=0, dtype=np.int64)
            recon = (recon & 0xFF).astype(np.int32).reshape(stride)
        elif ftype == 3:
            recon = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = recon[x - nch] if x >= nch else 0
                recon[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:
            recon = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = recon[x - nch] if x >= nch else 0
                upleft = int(prev[x - nch]) if x >= nch else 0
                recon[x] = (row[x] + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, nch)
    return img[:, :, 0] if nch == 1 else img
