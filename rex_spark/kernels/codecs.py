"""Pure-stdlib media codecs: PCM WAV, BMP, PNG, baseline JPEG, GIF
(LZW) and MJPEG-AVI video.

The sandbox ships no image/audio libraries, but these formats are
decodable with ``struct`` + ``zlib`` + numpy alone — which is what
a training-data pipeline needs to compute REAL pixel/sample statistics
instead of hash-derived stand-ins (the remaining
``decode_asset`` NotImplementedError is reserved for inter-frame
compressed video codecs such as mp4).

WAV/BMP/PNG/GIF are integer arithmetic on uint8/int16/int32 arrays — exact
and deterministic, so the oracle can verify the encode -> distributed
decode round-trip against the SOURCE arrays without ever invoking the
decoders (the strongest gold: a decoder bug cannot cancel itself out).
JPEG is lossy in general, but the fixture construction documented at
the JPEG section keeps the same source-array-gold property for the
oracle corpus.

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


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, 8-bit, huffman)
# --------------------------------------------------------------------------
#
# Pure stdlib+numpy baseline JPEG: huffman entropy coding, dequant,
# 8x8 IDCT, YCbCr->RGB.  The encoder writes 4:4:4 with self-declared
# FLAT huffman tables (every DC symbol 4 bits, every AC symbol 9 bits
# — JPEG permits arbitrary DHT tables, the decoder always builds from
# the file's own DHT, and flat tables avoid re-typing the spec's
# Annex-K code lists; compression ratio is not this codec's job).
# The decoder handles any DHT, sampling factors up to 2x2 (4:2:0 via
# pixel-replication upsample), restart intervals, and raises
# ValueError for progressive/12-bit/arithmetic/CMYK streams.
#
# Exactness contract used by the oracle fixture
# (operators/multimodal.py jpeg slot): for images whose every 8x8
# block is a uniform value v with (v - 128) even, quality=50 encoding
# round-trips EXACTLY — all AC coefficients are exactly 0 and the DC
# quantizer (q00 = 16 -> round(8d/16)*16/8 = d for even d) is
# lossless, including through YCbCr when R=G=B — so source-array gold
# certifies the full huffman/DCT path without running the decoder.

# standard Annex-K base quantization tables (row-major), scaled by the
# libjpeg quality convention in _jpeg_qtables
_JPEG_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_JPEG_Q_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)


def _zigzag_order() -> list[int]:
    """Row-major indices in zigzag scan order (computed, not typed:
    anti-diagonal s = r + c, odd diagonals walk r increasing)."""
    order = []
    for s in range(15):
        rs = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rs.reverse()
        order.extend(r * 8 + (s - r) for r in rs)
    return order


_ZIGZAG = np.array(_zigzag_order(), dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II basis: block spectra = T @ B @ T.T
_DCT_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _c, _x

# flat huffman alphabets (see header comment): DC categories 0..11 at
# 4 bits; all 162 baseline AC symbols (EOB, ZRL, (run,size)) at 9 bits
_DC_SYMS = list(range(12))
_AC_SYMS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_DC_CODE = {sym: (i, 4) for i, sym in enumerate(_DC_SYMS)}
_AC_CODE = {sym: (i, 9) for i, sym in enumerate(_AC_SYMS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s then 0s is fine
        return bytes(self.out)


def _jpeg_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_Q_LUMA, _JPEG_Q_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def _dht_segment(tc: int, th: int, syms: list[int], length: int) -> bytes:
    bits = [0] * 16
    bits[length - 1] = len(syms)
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)
    return struct.pack(">HH", 0xFFC4, len(body) + 2) + body


def _cat_bits(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(bw: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Huffman-encode one component block's 64 zigzag coefficients."""
    dc = int(coeffs[0])
    size, bits = _cat_bits(dc - pred)
    code, ln = _DC_CODE[size]
    bw.put(code, ln)
    if size:
        bw.put(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODE[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits = _cat_bits(v)
        code, ln = _AC_CODE[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if run:
        code, ln = _AC_CODE[0x00]  # EOB
        bw.put(code, ln)
    return dc


def _component_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane -> (n_blocks, 64) quantized zigzag coeffs,
    blocks in raster order, plane edge-padded to multiples of 8."""
    h, w = plane.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    spectra = np.einsum("ux,nxy,vy->nuv", _DCT_T, blocks, _DCT_T)
    quant = np.round(spectra.reshape(-1, 64) / qtab.astype(np.float64))
    return quant.astype(np.int64)[:, _ZIGZAG]


def encode_jpeg(
    pixels: np.ndarray, quality: int = 50, subsampling: str = "444"
) -> bytes:
    """Encode uint8 pixels — (H, W) gray or (H, W, 3) RGB — to a
    baseline sequential JPEG (8-bit, self-declared flat huffman
    tables).  ``subsampling``: '444' (default) or '420' (2x2 luma
    sampling, chroma box-averaged at half resolution — exercises the
    decoder's MCU interleave + upsample path).  Lossy in general; see
    the exactness contract above."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [
            np.clip(p, 0, 255).astype(np.uint8) for p in (y, cb, cr)
        ]
    else:
        raise ValueError("encode_jpeg wants (H,W) gray or (H,W,3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    ql, qc = _jpeg_qtables(quality)
    ncomp = len(planes)
    if ncomp == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (two tables, zigzag order on the wire)
    for tq, tab in ((0, ql), (1, qc))[: 1 if ncomp == 1 else 2]:
        body = bytes([tq]) + bytes(int(v) for v in tab[_ZIGZAG])
        out += struct.pack(">HH", 0xFFDB, len(body) + 2) + body
    # SOF0
    comp_spec = b""
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        hv = (samp[ci][0] << 4) | samp[ci][1]
        comp_spec += bytes([ci + 1, hv, tq])
    body = struct.pack(">BHHB", 8, h, w, ncomp) + comp_spec
    out += struct.pack(">HH", 0xFFC0, len(body) + 2) + body
    # DHT: flat tables, one DC + one AC class used by every component
    out += _dht_segment(0, 0, _DC_SYMS, 4)
    out += _dht_segment(1, 0, _AC_SYMS, 9)
    # SOS
    body = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([0, 63, 0])
    out += struct.pack(">HH", 0xFFDA, len(body) + 2) + body

    per_comp, grids = [], []
    for ci, p in enumerate(planes):
        hi, vi = samp[ci]
        # pad to the full MCU grid at luma resolution, then box-average
        # down to this component's sampling
        ph, pw = mcus_y * 8 * vmax, mcus_x * 8 * hmax
        padded = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            padded = np.round(
                padded.astype(np.float64)
                .reshape(ph // fy, fy, pw // fx, fx)
                .mean(axis=(1, 3))
            ).astype(np.uint8)
        per_comp.append(
            _component_blocks(padded, ql if ci == 0 else qc)
        )
        grids.append((mcus_y * vi, mcus_x * hi))
    bw = _BitWriter()
    preds = [0] * ncomp
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci in range(ncomp):
            hi, vi = samp[ci]
            gw = grids[ci][1]
            for v in range(vi):
                for hh in range(hi):
                    bi = (my * vi + v) * gw + (mx * hi + hh)
                    preds[ci] = _encode_blocks(
                        bw, per_comp[ci][bi], preds[ci]
                    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with byte-unstuffing; raises
    ValueError on truncation (the corrupt-payload contract)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker ends the scan

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("unexpected marker inside entropy data")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def get(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self.acc, self.nbits = 0, 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """DHT spec -> {(length, code): symbol} canonical table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential 8-bit JPEG -> uint8 array of shape
    (H, W) gray or (H, W, 3) RGB.  Handles arbitrary DHT tables,
    sampling factors up to 2x2 (chroma upsampled by pixel
    replication), and restart intervals; raises ValueError for
    progressive / arithmetic / 12-bit / CMYK streams and any
    truncation or malformed structure."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, end = 2, len(payload)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= end:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg_start, seg_end = pos + 4, pos + 2 + seg_len
        if seg_end > end:
            raise ValueError("truncated JPEG segment")
        body = payload[seg_start:seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                tab = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[tq] = tab[_UNZIGZAG]  # store row-major
                i += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline huffman
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise ValueError(f"unsupported sampling {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nsyms = sum(bits)
                vals = list(body[i + 17 : i + 17 + nsyms])
                if len(vals) < nsyms:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + nsyms
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            scan = (scan_comps, seg_end)
            break
        pos = seg_end
    if sof is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("bad JPEG dimensions")
    scan_comps, data_pos = scan
    if len(scan_comps) != len(comps):
        raise ValueError("partial (non-interleaved) scans unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # block grid width
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        cid_tabs = {sc[0]: (sc[1], sc[2]) for sc in scan_comps}
        c["td"], c["ta"] = cid_tabs[c["id"]]

    br = _BitReader(payload, data_pos)
    preds = {c["id"]: 0 for c in comps}
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            dc_tab = htables.get((0, c["td"]))
            ac_tab = htables.get((1, c["ta"]))
            if dc_tab is None or ac_tab is None:
                raise ValueError("missing huffman table")
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    block = np.zeros(64, dtype=np.int64)
                    size = _read_symbol(br, dc_tab)
                    if size > 11:
                        raise ValueError("bad DC category")
                    diff = _extend(br.get(size), size) if size else 0
                    preds[c["id"]] += diff
                    block[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, ac_tab)
                        if rs == 0x00:  # EOB
                            break
                        run, sz = rs >> 4, rs & 0x0F
                        if sz == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k >= 64:
                            raise ValueError("AC run past block end")
                        block[k] = _extend(br.get(sz), sz)
                        k += 1
                    bi = (my * c["v"] + v) * c["bw"] + (mx * c["h"] + hh)
                    c["coef"][bi] = block

    planes = []
    for c in comps:
        qtab = qtables.get(c["tq"])
        if qtab is None:
            raise ValueError("missing quant table")
        spectra = (c["coef"][:, _UNZIGZAG] * qtab).reshape(-1, 8, 8)
        blocks = np.einsum(
            "xu,nuv,yv->nxy", _DCT_T.T, spectra.astype(np.float64), _DCT_T.T
        )
        blocks = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
        plane = (
            blocks.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # replication-upsample to the full-resolution grid, then crop
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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


# --------------------------------------------------------------------------
# GIF (87a/89a, LZW) — palette images, lossless, so the source-array
# gold contract holds with no fixture tricks.  Encoder builds the
# palette from the image's unique colors (<=256 or ValueError) and
# compresses with real variable-width GIF-LZW; decoder handles global
# and local color tables, interlace, extension blocks, and the 4096-
# entry table cap, returning (H, W, 3) RGB via palette lookup.
# --------------------------------------------------------------------------


def _gif_palette(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette[N,3] uint8, indices[H,W] intp) for gray or RGB input."""
    if arr.ndim == 2:
        rgb = np.repeat(arr[:, :, None], 3, axis=2)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        rgb = arr
    else:
        raise ValueError("encode_gif wants (H,W) gray or (H,W,3) RGB")
    packed = (
        rgb[:, :, 0].astype(np.int64) << 16
    ) | (rgb[:, :, 1].astype(np.int64) << 8) | rgb[:, :, 2].astype(np.int64)
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(f"GIF palette overflow: {len(uniq)} unique colors")
    palette = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    return palette, inv.reshape(arr.shape[:2])


class _LSBBitWriter:
    """GIF packs LZW codes least-significant-bit first."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, length: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += length
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-variant LZW: variable code width min_code+1..12, CLEAR-reset
    when the table fills at 4096 entries."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bw = _LSBBitWriter()

    def reset():
        return {(c,): c for c in range(clear)}, eoi + 1, min_code + 1

    table, next_code, size = reset()
    bw.put(clear, size)
    buf: tuple = ()
    for px in indices.ravel().tolist():
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        bw.put(table[buf], size)
        if next_code == 4096:
            bw.put(clear, size)
            table, next_code, size = reset()
        else:
            table[cand] = next_code
            next_code += 1
            # the decoder widens when ITS next_code (one behind ours at
            # read time) reaches 1<<size — mirror that exactly
            if next_code == (1 << size) + 1 and size < 12:
                size += 1
        buf = (px,)
    if buf:
        bw.put(table[buf], size)
        # the decoder adds one more table entry after reading this final
        # code, so ITS next_code reaches our next_code — if that lands
        # exactly on 1<<size it widens before reading EOI; mirror that
        # (safely false right after a clear, where the decoder skips the
        # add: next_code == clear+2 < 2*clear for every min_code >= 2)
        if next_code == (1 << size) and size < 12:
            size += 1
    bw.put(eoi, size)
    return bw.flush()


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode uint8 pixels — (H,W) gray or (H,W,3) RGB with <=256
    unique colors — as a non-interlaced GIF89a with a global palette."""
    arr = np.asarray(pixels, dtype=np.uint8)
    palette, indices = _gif_palette(arr)
    h, w = indices.shape
    # palette on the wire is padded to a power of two (>= 2)
    pbits = max(1, int(len(palette) - 1).bit_length())
    ptable = np.zeros((1 << pbits, 3), dtype=np.uint8)
    ptable[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((pbits - 1) << 4) | (pbits - 1), 0, 0])
    out += ptable.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, pbits)
    out.append(min_code)
    data = _lzw_encode(indices, min_code)
    for off in range(0, len(data), 255):
        block = data[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {c: (c,) for c in range(clear)}
    next_code, size = eoi + 1, min_code + 1
    out = np.empty(n_pixels, dtype=np.int32)
    filled = 0
    acc = nbits = pos = 0
    prev: tuple | None = None
    while True:
        while nbits < size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        if code == clear:
            table = {c: (c,) for c in range(clear)}
            next_code, size, prev = eoi + 1, min_code + 1, None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("corrupt GIF LZW code")
        if filled + len(entry) > n_pixels:
            raise ValueError("GIF LZW output overruns image")
        out[filled : filled + len(entry)] = entry
        filled += len(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << size) and size < 12:
                size += 1
        prev = entry
    if filled != n_pixels:
        raise ValueError("truncated GIF image data")
    return out


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_images(payload: bytes):
    """Yield ``(left, top, rgb[h,w,3])`` for every image descriptor in
    stream order.  Raw frames: no disposal-method compositing and no
    transparency blending (an animation-aware consumer composites;
    per-frame stats/dedup want the raw rects anyway)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF palette")
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    yielded = 0
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF (no trailer)")
        tag = payload[pos]
        pos += 1
        if tag == 0x3B:
            if yielded == 0:
                raise ValueError("GIF has no image data")
            return
        if tag == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if tag != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{tag:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local palette")
            palette = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image has no color table")
        chunks = bytearray()
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code}")
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF data sub-blocks")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            if pos + n > len(payload):
                raise ValueError("truncated GIF data sub-block")
            chunks += payload[pos : pos + n]
            pos += n
        idx = _lzw_decode(bytes(chunks), min_code, w * h)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF index outside palette")
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _GIF_INTERLACE]
            )
            rows = np.empty(h, dtype=np.int64)
            rows[order] = np.arange(h)
            idx = idx.reshape(h, w)[rows].ravel()
        yield left, top, palette[idx].reshape(h, w, 3)
        yielded += 1


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST image of a GIF87a/89a to (H, W, 3) uint8 RGB."""
    for _left, _top, rgb in _gif_images(payload):
        return rgb
    raise ValueError("GIF has no image data")


def decode_gif_frames(payload: bytes):
    """Decode every frame of an (animated) GIF: list of
    ``(left, top, rgb[h,w,3])`` raw rects in stream order — the shape a
    per-frame stats/dedup pass consumes.  Frames may be sub-rects of
    the logical screen; see _gif_images for the no-compositing note."""
    return list(_gif_images(payload))


def encode_gif_animation(frames) -> bytes:
    """Concatenate full-screen frames — each (H,W) gray or (H,W,3) RGB
    with <=256 unique colors — into a multi-image GIF89a (one local
    palette per frame; no GCE timing blocks, which decoders skip)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif_animation wants at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("GIF animation frames must share one size")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no global color table
    for frame in frames:
        palette, indices = _gif_palette(frame)
        pbits = max(1, int(len(palette) - 1).bit_length())
        ptable = np.zeros((1 << pbits, 3), dtype=np.uint8)
        ptable[: len(palette)] = palette
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x80 | (pbits - 1)])  # local color table flag+size
        out += ptable.tobytes()
        min_code = max(2, pbits)
        out.append(min_code)
        data = _lzw_encode(indices, min_code)
        for off in range(0, len(data), 255):
            block = data[off : off + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# AVI / MJPEG (RIFF container, one 'vids' stream of baseline JPEG
# frames) — the pure-stdlib VIDEO codepath.  Each frame is an
# independent baseline JPEG, so the JPEG exactness contract above
# carries over per frame and the source-array gold stays valid.
# ``avi_frame_spans`` exposes (offset, size) per frame WITHOUT
# decoding, so a frame sampler can seek frame-exactly in a payload of
# any length — the 100 TB shape (never materialize all frames to
# sample one).
# --------------------------------------------------------------------------


def encode_avi_mjpeg(frames, fps: int = 5, quality: int = 50) -> bytes:
    """Encode a list/array of same-shape uint8 frames — (H,W) gray or
    (H,W,3) RGB — as an MJPEG AVI ('MJPG' fourcc, one video stream)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg wants at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("AVI frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<14I", usec, max(len(j) for j in jpegs) * fps, 0, 0x10,
        len(jpegs), 0, 1, max(len(j) for j in jpegs), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(jpegs), max(len(j) for j in jpegs), 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: (fourcc, keyframe flag, offset from 'movi' tag, size)
    entries, off = [], 4
    for j in jpegs:
        entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_size) scanning a RIFF chunk run."""
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > end:
            raise ValueError("truncated AVI chunk")
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_frame_spans(payload: bytes):
    """Parse only the container: (w, h, usec_per_frame,
    [(offset, size), ...]) for the video frames — no JPEG decode."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))
    if 8 + riff_size > len(payload):
        raise ValueError("truncated AVI payload")
    w = h = usec = None
    spans = []
    for tag, start, size in _riff_chunks(payload, 12, end):
        if tag != b"LIST":
            continue
        kind = payload[start : start + 4]
        if kind == b"hdrl":
            for t2, s2, n2 in _riff_chunks(payload, start + 4, start + size):
                if t2 == b"avih":
                    if n2 < 40:
                        raise ValueError("short avih header")
                    usec = struct.unpack_from("<I", payload, s2)[0]
                    w, h = struct.unpack_from("<II", payload, s2 + 32)
        elif kind == b"movi":
            for t2, s2, n2 in _riff_chunks(payload, start + 4, start + size):
                if t2[2:4] in (b"dc", b"db"):
                    spans.append((s2, n2))
    if w is None or usec is None or usec == 0:
        raise ValueError("AVI missing avih header")
    if not spans:
        raise ValueError("AVI has no video frames")
    return int(w), int(h), int(usec), spans


def decode_avi(payload: bytes):
    """Decode an MJPEG AVI: (width, height, fps, frames[F,H,W(,3)])."""
    w, h, usec, spans = avi_frame_spans(payload)
    decoded = [
        decode_jpeg(payload[off : off + size]) for off, size in spans
    ]
    frames = np.stack(decoded)
    if frames.shape[1] != h or frames.shape[2] != w:
        raise ValueError("AVI frame dimensions disagree with header")
    return int(w), int(h), 1_000_000 // usec, frames
