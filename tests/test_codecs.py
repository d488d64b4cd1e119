"""Codec kernels (kernels/codecs.py): round-trips, hand-crafted byte
vectors (which pin the wire format independently of our own encoders,
excluding complementary encode/decode bugs), corrupt-input behavior,
and the decode-stats / frame-sampling operator kernels."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rex_spark.kernels.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    wav_data_span,
)


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("bits", [8, 16])
def test_wav_roundtrip(channels, bits):
    r = _rng(channels * 100 + bits)
    if bits == 16:
        src = r.integers(-32768, 32768, size=(1777, channels)).astype(np.int16)
    else:
        src = r.integers(0, 256, size=(1777, channels)).astype(np.uint8)
    rate, ch, out = decode_wav(encode_wav(src, 22050, bits))
    assert (rate, ch) == (22050, channels)
    assert np.array_equal(out, src.astype(np.int32))


@pytest.mark.parametrize("w", [1, 2, 5, 8])  # 5 exercises row padding
def test_bmp_roundtrip(w):
    img = _rng(w).integers(0, 256, size=(6, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize(
    "shape", [(9, 11), (6, 4, 3), (13, 3, 4), (1, 1), (2, 1, 3), (1, 7, 4)]
)
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip(shape, mode):
    img = _rng(len(shape) * 31 + shape[0]).integers(
        0, 256, size=shape
    ).astype(np.uint8)
    out = decode_png(encode_png(img, mode))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    nch=st.sampled_from([0, 3, 4]),
    mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(h, w, nch, mode, seed):
    shape = (h, w) if nch == 0 else (h, w, nch)
    img = _rng(seed).integers(0, 256, size=shape).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img, mode)), img)


# --------------------------------------------------------------------------
# hand-crafted byte vectors: the wire format itself, not our encoder
# --------------------------------------------------------------------------


def test_wav_crafted_bytes():
    # 2 frames stereo 16-bit @8000: samples (1, -2), (300, -400); plus a
    # LIST chunk the parser must skip.
    data = struct.pack("<4h", 1, -2, 300, -400)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
    lst = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    body = b"WAVE" + fmt + lst + struct.pack("<4sI", b"data", len(data)) + data
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    rate, ch, out = decode_wav(payload)
    assert (rate, ch) == (8000, 2)
    assert out.tolist() == [[1, -2], [300, -400]]
    off, dlen, rate2, block = wav_data_span(payload)
    assert payload[off : off + dlen] == data and (rate2, block) == (8000, 4)


def test_bmp_crafted_bytes():
    # 1x2 24bpp bottom-up: file rows are (bottom) blue, (top) red.
    # Rows padded to 4 bytes (w=1 -> 3 bytes + 1 pad).
    rows = bytes([255, 0, 0, 0]) + bytes([0, 0, 255, 0])  # BGR: blue, red
    info = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    img = decode_bmp(hdr + info + rows)
    assert img.tolist() == [[[255, 0, 0]], [[0, 0, 255]]]  # top red, bottom blue


def test_bmp_topdown_and_32bpp():
    # 1x2 32bpp TOP-DOWN (negative height): rows in natural order.
    rows = bytes([10, 20, 30, 99]) + bytes([40, 50, 60, 99])  # BGRA
    info = struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 32, 0, len(rows), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    img = decode_bmp(hdr + info + rows)
    assert img.tolist() == [[[30, 20, 10]], [[60, 50, 40]]]


def test_png_crafted_bytes():
    # 2x2 gray, filter 0 then filter 2 (Up): raw scanlines
    #   row0: 00 | 10 20          -> 10 20
    #   row1: 02 | 05 05  (Up)    -> 15 25
    raw = bytes([0, 10, 20, 2, 5, 5])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert decode_png(payload).tolist() == [[10, 20], [15, 25]]


# --------------------------------------------------------------------------
# corrupt / unsupported inputs
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fn,junk",
    [
        (decode_wav, b"not a riff at all"),
        (decode_bmp, b"PK\x03\x04 zipfile"),
        (decode_png, b"\x89PNG\r\n\x1a\ngarbage"),
        (decode_png, b"total junk"),
    ],
)
def test_corrupt_raises_valueerror(fn, junk):
    with pytest.raises(ValueError):
        fn(junk)


def test_png_bad_crc_raises():
    img = _rng(3).integers(0, 256, size=(3, 3)).astype(np.uint8)
    payload = bytearray(encode_png(img))
    payload[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def _block_uniform(seed, bh, bw, nch=1):
    """The JPEG exact-roundtrip fixture shape: per-8x8-block uniform
    values with even offsets from 128 (gray or R=G=B)."""
    r = _rng(seed)
    bv = (128 + 2 * (r.integers(0, 121, (bh, bw)) - 60)).astype(np.uint8)
    plane = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    return plane if nch == 1 else np.repeat(plane[:, :, None], nch, 2)


@pytest.mark.parametrize("nch", [1, 3])
def test_jpeg_exact_roundtrip_444(nch):
    img = _block_uniform(nch * 10, 4, 6, nch)
    from rex_spark.kernels.codecs import decode_jpeg, encode_jpeg

    assert np.array_equal(decode_jpeg(encode_jpeg(img, 50)), img)


def test_jpeg_exact_roundtrip_420():
    """2x2 luma sampling: block-uniform R=G=B images have flat
    chroma=128 (box-average invariant), so 4:2:0 round-trips exactly
    too — pinning the decoder's MCU interleave + upsample path."""
    from rex_spark.kernels.codecs import decode_jpeg, encode_jpeg

    img = _block_uniform(7, 4, 4, 3)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, 50, subsampling="420")), img
    )


def test_jpeg_lossy_tolerance():
    """Smooth content at quality 90 must reconstruct within a couple of
    levels (sanity bound on the DCT/quant/huffman path for non-exact
    inputs); odd (non-multiple-of-8) dimensions crop correctly."""
    from rex_spark.kernels.codecs import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 61)
    smooth = np.clip(np.add.outer(x, np.linspace(0, 255, 45)) / 2, 0, 255)
    smooth = smooth.astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(smooth, 90))
    assert dec.shape == smooth.shape
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 3


def test_jpeg_handcrafted_vector():
    """Wire format pinned independently of encode_jpeg: a hand-built
    8x8 gray JPEG (all-1 quant table, one-symbol huffman tables,
    DC-only block of quantized value 16) must decode to a flat 130
    (IDCT flat = 16/8 + 128)."""
    from rex_spark.kernels.codecs import decode_jpeg

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table 0: single 1-bit code -> category 5; AC table 0: single
    # 1-bit code -> EOB
    dht_dc = seg(0xFFC4, bytes([0x00, 1] + [0] * 15 + [5]))
    dht_ac = seg(0xFFC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy bits: DC code '0' + 5 value bits 10000 (=16) + EOB '0',
    # padded with 1 -> 0b01000001
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
        + bytes([0b01000001]) + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8)
    assert np.array_equal(out, np.full((8, 8), 130, dtype=np.uint8))


def test_jpeg_corrupt_and_unsupported():
    from rex_spark.kernels.codecs import decode_jpeg, encode_jpeg

    img = _block_uniform(3, 2, 2)
    p = encode_jpeg(img, 50)
    for cut in (10, len(p) // 2, len(p) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(p[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8garbage bytes here")
    # progressive SOF2 must be rejected, not mis-decoded
    prog = bytearray(p)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # decode_stats_row contract: corrupt jpeg -> status row, not a raise
    from rex_spark.operators.multimodal import decode_stats_row

    row = decode_stats_row(p, "image/jpeg")
    assert row[0] == "ok" and row[4] == img.size
    flipped = bytearray(p)
    flipped[len(p) // 2] ^= 0xFF
    assert decode_stats_row(bytes(flipped), "image/jpeg")[0] in (
        "ok", "corrupt",  # a mid-entropy flip may still decode; must not raise
    )
    assert decode_stats_row(p[:20], "image/jpeg")[0] == "corrupt"


def test_truncation_raises_valueerror():
    """ADVICE r5: a truncated WAV data chunk must raise (-> status
    'corrupt'), never silently decode fewer frames as 'ok'; a PNG cut
    mid-chunk must honor the documented ValueError contract instead of
    leaking struct.error."""
    wav = encode_wav(np.arange(64, dtype=np.int16).reshape(32, 2), 8000)
    with pytest.raises(ValueError):
        decode_wav(wav[:-10])  # data chunk declares more bytes than present
    with pytest.raises(ValueError):
        wav_data_span(wav[:-10])
    png = encode_png(_rng(7).integers(0, 256, (5, 5, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        decode_png(png[:30])  # cut mid-IHDR
    with pytest.raises(ValueError):
        decode_png(png[:-13])  # cut inside IDAT's trailing bytes


def test_extract_features_tolerates_corrupt_payload(spark):
    """One bit-flipped PNG must not fail the features stage: the
    corrupt asset falls back to the hash stand-in feature (same
    total-failure-free contract as decode_stats_row)."""
    from rex_spark.operators.multimodal import (
        _feature_kernel,
        extract_features,
    )

    good = encode_png(_rng(11).integers(0, 256, (4, 4, 3)).astype(np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    df = spark.createDataFrame(
        [(0, "image", "image/png", bytes(good), None, None, None),
         (1, "image", "image/png", bytes(bad), None, None, None)],
        "asset_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )
    rows = {r["asset_id"]: r for r in extract_features(df).collect()}
    assert len(rows) == 2
    want_fallback = _feature_kernel(bytes(bad), "image")
    assert rows[1]["feature"] == pytest.approx(want_fallback.tolist())
    assert rows[0]["feature"] != pytest.approx(want_fallback.tolist())


def test_decode_asset_dispatch_and_unsupported():
    from rex_spark.operators.multimodal import decode_asset

    img = _rng(5).integers(0, 256, size=(4, 6, 3)).astype(np.uint8)
    kind, w, h, nch, pix = decode_asset(encode_png(img, "cycle"), "image/png")
    assert (kind, w, h, nch) == ("image", 6, 4, 3)
    assert np.array_equal(pix, img)
    with pytest.raises(NotImplementedError):
        decode_asset(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    with pytest.raises(ValueError):
        decode_asset(b"junk bytes", "image/png")  # corrupt, NOT unsupported


# --------------------------------------------------------------------------
# operator kernels over the decodable fixture
# --------------------------------------------------------------------------


def test_decode_stats_row_matches_source():
    from rex_spark.operators.multimodal import (
        _asset_source,
        _encode_source,
        decode_stats_row,
    )

    for i in range(21):  # 3 full slot cycles: png/bmp/jpeg/gif/wav/avi/mp4
        kind, mime, source, (w, h, _d, rate, nch) = _asset_source(i, seed=42)
        payload = _encode_source(kind, mime, source)
        row = decode_stats_row(payload, mime)
        if mime == "video/mp4":
            assert row[0] == "unsupported"
            continue
        vals = np.asarray(source).astype(np.int64).ravel()
        exp_a = rate if kind == "audio" else w
        exp_b = source.shape[0] if kind == "audio" else h
        assert row == (
            "ok", nch, exp_a, exp_b, int(vals.size), int(vals.sum()),
            int(vals.min()), int(vals.max()),
        )


def test_wav_frame_sampling_is_sample_exact():
    from rex_spark.operators.multimodal import FRAME_BYTES, _frame_kernel

    r = _rng(11)
    samples = r.integers(-32768, 32768, size=(8000, 1)).astype(np.int16)
    payload = encode_wav(samples, 8000, 16)
    frames = _frame_kernel(payload, 1000, 250, mime="audio/wav")
    assert [t for _, t, _ in frames] == [0, 250, 500, 750]
    for _, t, frame in frames:
        start = (t * 8000 // 1000)  # frame index; block_align = 2
        expect = samples[start : start + FRAME_BYTES // 2, 0].astype("<i2")
        assert frame == expect.tobytes().ljust(FRAME_BYTES, b"\0")


def test_real_feature_path_uses_decoded_stats():
    from rex_spark.operators.multimodal import (
        _asset_source,
        _encode_source,
        _stats_feature,
        decode_asset,
    )

    kind, mime, source, _meta = _asset_source(0, seed=42)  # png slot
    payload = _encode_source(kind, mime, source)
    vec = _stats_feature(decode_asset(payload, mime))
    vals = np.asarray(source).astype(np.int64).ravel()
    assert vec[2] == float(len(vals))
    assert vec[3] == np.float32(vals.sum() / len(vals))
    assert vec[4] == float(vals.min()) and vec[5] == float(vals.max())


def test_decodable_assets_spark_stats(spark):
    """Distributed decode equals the source-array gold for a small n
    (the full-n parity is the asset_decode oracle row)."""
    from rex_spark.operators.multimodal import (
        _asset_source,
        decode_stats,
        make_decodable_assets,
    )

    out = {
        r["asset_id"]: r
        for r in decode_stats(make_decodable_assets(spark, 21)).collect()
    }
    assert len(out) == 21
    for i in range(21):
        kind, mime, source, (w, h, _d, rate, nch) = _asset_source(i, seed=42)
        row = out[i]
        assert row["mime"] == mime
        if mime == "video/mp4":
            assert row["status"] == "unsupported" and row["sum_val"] is None
            continue
        vals = np.asarray(source).astype(np.int64).ravel()
        assert row["status"] == "ok"
        assert row["channels"] == nch
        assert row["dim_a"] == (rate if kind == "audio" else w)
        assert row["dim_b"] == (source.shape[0] if kind == "audio" else h)
        assert (row["n_values"], row["sum_val"]) == (vals.size, vals.sum())
        assert (row["min_val"], row["max_val"]) == (vals.min(), vals.max())


def test_decode_stats_row_reports_corrupt_not_raise():
    """One bit-flipped asset in a corpus must yield a 'corrupt' status
    row, never an exception that fails the whole Spark stage."""
    from rex_spark.operators.multimodal import decode_stats_row

    img = _rng(7).integers(0, 256, size=(3, 3)).astype(np.uint8)
    payload = bytearray(encode_png(img))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    assert decode_stats_row(bytes(payload), "image/png") == (
        "corrupt", None, None, None, None, None, None, None,
    )
    assert decode_stats_row(b"total junk", "audio/wav")[0] == "corrupt"
    # unsupported mimes keep their own status
    assert decode_stats_row(b"x", "video/mp4")[0] == "unsupported"


def test_wav_frame_sampling_never_reads_past_data_chunk():
    """A data chunk shorter than FRAME_BYTES followed by a trailing
    LIST/INFO chunk must zero-pad, not leak the next chunk's bytes in
    as 'samples' (the SAMPLE-EXACT contract)."""
    from rex_spark.operators.multimodal import FRAME_BYTES, _frame_kernel

    samples = np.arange(4, dtype=np.int16)[:, None]  # 8 data bytes < 16
    payload = encode_wav(samples, 8000, 16)
    trailer = b"LIST" + (12).to_bytes(4, "little") + b"INFOIART\x04\x00\x00\x00ABCD"
    riff_sized = bytearray(payload + trailer)
    riff_sized[4:8] = (len(riff_sized) - 8).to_bytes(4, "little")
    frames = _frame_kernel(bytes(riff_sized), 1000, 500, mime="audio/wav")
    expect = samples[:, 0].astype("<i2").tobytes().ljust(FRAME_BYTES, b"\0")
    for _, _, frame in frames:
        assert frame == expect
        assert b"LIST" not in frame and b"INFO" not in frame


# --------------------------------------------------------------------------
# GIF (LZW) and MJPEG-AVI video
# --------------------------------------------------------------------------


def test_gif_roundtrip_gray_and_rgb():
    from rex_spark.kernels.codecs import decode_gif, encode_gif

    g = _rng(21).integers(0, 256, size=(33, 41)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(g)), np.repeat(g[:, :, None], 3, axis=2)
    )
    pal = _rng(22).integers(0, 256, size=(61, 3)).astype(np.uint8)
    img = pal[_rng(23).integers(0, 61, size=(40, 37))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_roundtrip_grows_table_past_4096():
    """Random 256-gray noise at 120x133 forces the LZW table to the
    4096 cap and through the CLEAR-reset path in both directions."""
    from rex_spark.kernels.codecs import decode_gif, encode_gif

    g = _rng(24).integers(0, 256, size=(120, 133)).astype(np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif(g)), np.repeat(g[:, :, None], 3, axis=2)
    )


@given(h=st.integers(1, 12), w=st.integers(1, 12),
       ncolors=st.integers(1, 16), seed=st.integers(0, 2**31))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(h, w, ncolors, seed):
    from rex_spark.kernels.codecs import decode_gif, encode_gif

    r = _rng(seed)
    pal = r.integers(0, 256, size=(ncolors, 3)).astype(np.uint8)
    img = pal[r.integers(0, ncolors, size=(h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def _pack_lsb(codes, widths):
    """Independent spec-driven LSB-first packer for crafted vectors."""
    acc = nbits = 0
    out = bytearray()
    for code, width in zip(codes, widths):
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_container(w, h, palette, min_code, lzw_bytes, interlace=False):
    pbits = max(1, (len(palette) - 1).bit_length())
    table = palette + [(0, 0, 0)] * ((1 << pbits) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((pbits - 1) << 4) | (pbits - 1), 0, 0])
    out += bytes(v for rgb in table for v in rgb)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00, min_code])
    out += bytes([len(lzw_bytes)]) + lzw_bytes + b"\x00\x3b"
    return bytes(out)


def test_gif_crafted_bytes_clear_per_pixel():
    """Wire-format pin independent of our encoder: every pixel emitted
    as a literal after a CLEAR, so no table entry is ever referenced."""
    from rex_spark.kernels.codecs import decode_gif

    # 2x2, palette {black, white}, pixels [1,0],[0,1]; min_code 2:
    # clear=4, eoi=5, all codes 3 bits wide
    data = _pack_lsb([4, 1, 4, 0, 4, 0, 4, 1, 5], [3] * 9)
    img = decode_gif(
        _gif_container(2, 2, [(0, 0, 0), (255, 255, 255)], 2, data)
    )
    assert img.tolist() == [
        [[255, 255, 255], [0, 0, 0]],
        [[0, 0, 0], [255, 255, 255]],
    ]


def test_gif_crafted_bytes_dict_and_kwkwk():
    from rex_spark.kernels.codecs import decode_gif

    # dictionary reference: clear,1,0,6,eoi -> 1,0,1,0 (entry 6 = "1 0");
    # the width bump to 4 bits happens only after next_code reaches 8,
    # so eoi here is still 3 bits
    data = _pack_lsb([4, 1, 0, 6, 5], [3] * 5)
    img = decode_gif(_gif_container(4, 1, [(0, 0, 0), (9, 9, 9)], 2, data))
    assert img[:, :, 0].tolist() == [[9, 0, 9, 0]]
    # KwKwK (code == next_code): clear,1,6 -> 1,1,1
    data = _pack_lsb([4, 1, 6, 5], [3] * 4)
    img = decode_gif(_gif_container(3, 1, [(0, 0, 0), (7, 7, 7)], 2, data))
    assert img[:, :, 0].tolist() == [[7, 7, 7]]


def test_gif_interlaced_and_extension_blocks():
    """Interlaced row order (4 passes) + a graphic-control extension the
    parser must skip; 1-wide column of 8 distinct gray rows."""
    from rex_spark.kernels.codecs import decode_gif, encode_gif

    col = (np.arange(8, dtype=np.uint8) * 30).reshape(8, 1)
    plain = encode_gif(col)
    # splice: mark interlaced and reorder rows into pass order; easier to
    # re-encode by hand: palette = 8 grays, pixels = row index
    pal = [(int(v), int(v), int(v)) for v in col[:, 0]]
    # pass order for h=8: rows 0, 8.. -> [0], then 4, then 2,6, then odd
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    codes = [8]  # clear (min_code 3 -> clear=8, eoi=9, width 4)
    for rowi in order:
        codes += [8, rowi]
    codes.append(9)
    # every pixel preceded by clear -> all literal, width stays 4
    data = _pack_lsb(codes, [4] * len(codes))
    img = decode_gif(_gif_container(1, 8, pal, 3, data, interlace=True))
    assert np.array_equal(img[:, 0, 0], col[:, 0])
    assert np.array_equal(decode_gif(plain)[:, 0, 0], col[:, 0])


def test_gif_corrupt_inputs():
    from rex_spark.kernels.codecs import decode_gif, encode_gif

    payload = encode_gif(_rng(3).integers(0, 256, size=(9, 9)).astype(np.uint8))
    for bad in (b"", b"GIF", b"NOPE99" + payload[6:], payload[:20],
                payload[:-10], payload[: len(payload) // 2]):
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError):  # >256 unique colors
        encode_gif(_rng(4).integers(0, 256, size=(64, 64, 3)).astype(np.uint8))


def test_avi_mjpeg_roundtrip():
    from rex_spark.kernels.codecs import decode_avi, encode_avi_mjpeg

    def block_frame(seed, bw, bh, rgb):
        vals = _rng(seed).integers(0, 121, size=(bh, bw))
        plane = (128 + 2 * (vals - 60)).astype(np.uint8)
        plane = np.repeat(np.repeat(plane, 8, 0), 8, 1)
        return np.repeat(plane[:, :, None], 3, 2) if rgb else plane

    frames = [block_frame(i, 3, 2, False) for i in range(4)]
    w, h, fps, out = decode_avi(encode_avi_mjpeg(frames, fps=5))
    assert (w, h, fps) == (24, 16, 5)
    assert np.array_equal(out, np.stack(frames))
    frames = [block_frame(10 + i, 2, 2, True) for i in range(3)]
    w, h, fps, out = decode_avi(encode_avi_mjpeg(frames, fps=10))
    assert (w, h, fps) == (16, 16, 10)
    assert np.array_equal(out, np.stack(frames))


def test_avi_crafted_container_bytes():
    """Container wire-format pin independent of our encoder: hand-built
    RIFF/hdrl/movi with dummy frame payloads; avi_frame_spans must find
    exactly the '00dc' bodies (odd sizes padded to even on the wire)."""
    from rex_spark.kernels.codecs import avi_frame_spans

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", 200000, 0, 0, 0x10, 2, 0, 1, 0, 6, 4,
                       0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST",
        b"movi" + chunk(b"00dc", b"FRAME-A") + chunk(b"junk", b"zz")
        + chunk(b"00db", b"FRAME-B!"),
    )
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    w, h, usec, spans = avi_frame_spans(payload)
    assert (w, h, usec) == (6, 4, 200000)
    assert [payload[o : o + s] for o, s in spans] == [b"FRAME-A", b"FRAME-B!"]


def test_avi_frame_sampling_is_frame_exact():
    from rex_spark.kernels.codecs import avi_frame_spans
    from rex_spark.operators.multimodal import (
        FRAME_BYTES,
        _asset_source,
        _encode_source,
        _frame_kernel,
    )

    kind, mime, source, (_w, _h, dur, _fps, _c) = _asset_source(5, seed=42)
    assert mime == "video/x-msvideo"
    payload = _encode_source(kind, mime, source)
    _, _, usec, spans = avi_frame_spans(payload)
    frames = _frame_kernel(payload, dur, 200, mime=mime)
    assert len(frames) == -(-dur // 200)
    for _idx, t, chunk_bytes in frames:
        off, size = spans[min(t * 1000 // usec, len(spans) - 1)]
        want = payload[off : off + min(FRAME_BYTES, size)]
        assert chunk_bytes == want.ljust(FRAME_BYTES, b"\0")
        assert chunk_bytes[:2] == b"\xff\xd8"  # landed on a JPEG SOI


def test_avi_corrupt_inputs():
    from rex_spark.kernels.codecs import decode_avi, encode_avi_mjpeg
    from rex_spark.operators.multimodal import decode_stats_row

    img = (np.full((16, 16), 128, dtype=np.uint8))
    payload = encode_avi_mjpeg([img, img], fps=5)
    for bad in (b"", b"RIFFxxxx", payload[: len(payload) // 2], payload[:-6]):
        with pytest.raises(ValueError):
            decode_avi(bad)
    from rex_spark.kernels.codecs import avi_frame_spans

    off, _size = avi_frame_spans(payload)[3][0]
    flipped = bytearray(payload)
    flipped[off] ^= 0xFF  # smash the first frame's JPEG SOI marker
    assert decode_stats_row(bytes(flipped), "video/x-msvideo")[0] == "corrupt"
    assert decode_stats_row(bytes(payload), "video/x-msvideo")[0] == "ok"


def test_frame_stats_matches_source_and_plants_dups(spark):
    """Distributed per-frame decode equals the source arrays, mp4 rows
    are flagged, and the planted shared first frame produces REAL
    cross-asset pixel_md5 duplicates (frame dedup is non-vacuous)."""
    import hashlib

    from rex_spark.operators.multimodal import (
        _asset_source,
        frame_stats,
        make_decodable_assets,
    )

    # avi shapes repeat with period 12 among the avi slots, so the
    # first planted shared-shape pair is assets (5, 89) — n=90 covers it
    n = 90
    rows = frame_stats(make_decodable_assets(spark, n)).collect()
    got = {(r["asset_id"], r["frame_idx"]): r for r in rows}
    want_md5 = {}
    for i in range(n):
        kind, mime, source, _meta = _asset_source(i, seed=42)
        if kind != "video" and mime != "image/gif":
            assert not any(aid == i for aid, _ in got)
            continue
        if mime == "video/mp4":
            assert got[(i, -1)]["status"] == "unsupported"
            continue
        frames = source if mime == "video/x-msvideo" else source[None]
        for k in range(frames.shape[0]):
            vals = frames[k].astype(np.int64).ravel()
            r = got[(i, k)]
            assert r["status"] == "ok"
            assert (r["n_values"], r["sum_val"]) == (vals.size, vals.sum())
            assert (r["min_val"], r["max_val"]) == (vals.min(), vals.max())
            md5 = hashlib.md5(frames[k].tobytes()).hexdigest()
            assert r["pixel_md5"] == md5
            if mime == "video/x-msvideo":
                want_md5.setdefault(md5, set()).add(i)
    # planted dup: at least one first-frame md5 shared by >= 2 assets
    assert any(len(aids) >= 2 for aids in want_md5.values())


def test_distributed_asset_synthesis_matches_driver(spark):
    """Executor-side fixture synthesis is bit-identical to the
    driver-side build (pure function of (i, seed) — the make_page
    determinism pattern)."""
    from rex_spark.operators.multimodal import (
        make_decodable_assets,
        make_decodable_assets_distributed,
    )

    a = {r["asset_id"]: r for r in make_decodable_assets(spark, 15).collect()}
    b = {
        r["asset_id"]: r
        for r in make_decodable_assets_distributed(spark, 15, partitions=4).collect()
    }
    assert set(a) == set(b) == set(range(15))
    for i in range(15):
        ra, rb = a[i], b[i]
        assert (ra["kind"], ra["mime"]) == (rb["kind"], rb["mime"])
        assert bytes(ra["payload"]) == bytes(rb["payload"])
        assert (ra["width"], ra["height"], ra["duration_ms"]) == (
            rb["width"], rb["height"], rb["duration_ms"]
        )


def test_animated_gif_roundtrip_and_frame_stats():
    """Multi-image GIF: every frame round-trips in stream order, and
    the frame_stats kernel fans an animation out to one row per frame
    (with the first-frame dedup md5 equal across two animations that
    share frame 0)."""
    import hashlib

    from rex_spark.kernels.codecs import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )
    from rex_spark.operators.multimodal import frame_stats_rows

    r = _rng(31)
    frames = [r.integers(0, 200, size=(14, 17)).astype(np.uint8)
              for _ in range(4)]
    payload = encode_gif_animation(frames)
    out = decode_gif_frames(payload)
    assert len(out) == 4
    for src, (left, top, rgb) in zip(frames, out):
        assert (left, top) == (0, 0)
        assert np.array_equal(rgb, np.repeat(src[:, :, None], 3, 2))
    # decode_gif (single-frame contract) sees exactly frame 0
    assert np.array_equal(
        decode_gif(payload), np.repeat(frames[0][:, :, None], 3, 2)
    )
    rows = frame_stats_rows(payload, "image/gif")
    assert [row[0] for row in rows] == [0, 1, 2, 3]
    for src, row in zip(frames, rows):
        rgb = np.repeat(src[:, :, None], 3, 2)
        vals = rgb.astype(np.int64).ravel()
        assert row[1] == "ok"
        assert (row[2], row[3]) == (vals.size, vals.sum())
        assert row[6] == hashlib.md5(rgb.tobytes()).hexdigest()
    # two animations sharing frame 0 -> same dedup key for row 0 only
    other = encode_gif_animation([frames[0], frames[2][::-1]])
    rows2 = frame_stats_rows(other, "image/gif")
    assert rows2[0][6] == rows[0][6] and rows2[1][6] != rows[1][6]
    # corrupt animation -> flagged row, not an exception
    assert frame_stats_rows(payload[: len(payload) // 2], "image/gif") == [
        (-1, "corrupt", None, None, None, None, None)
    ]
