"""Vendored pure-stdlib baseline JPEG codec (round-7 verdict item 5).

The last compressed format a crawl corpus actually contains: PNG (zlib)
and IMA-ADPCM set the vendoring pattern (multimodal.py), JPEG completes
the ladder — Huffman entropy decode, dequantize, 8x8 IDCT, chroma
upsampling, YCbCr->RGB, all from the public ITU-T T.81 spec.  Scope is
8-bit samples, 1 or 3 components, any sampling factors up to 2x2
(covers 4:4:4 / 4:2:2 / 4:2:0 — the overwhelming majority of real
JPEGs), for baseline sequential DCT (SOF0), EXTENDED sequential DCT
(SOF1, round 10 — same entropy coding, 8- OR 12-bit samples with
16-bit quantization tables; 12-bit planes downconvert to the 8-bit row
contract by >> 4 at assembly), and progressive DCT with Huffman coding
(SOF2, Annex G: spectral selection + successive approximation, round 9
— the second-most-common crawl variant; 12-bit accepted there too);
arithmetic coding (SOF9+) belongs to PIL.  Restart markers (DRI/RSTn) are
handled.  The encoder twin writes baseline 4:4:4 with the spec's Annex K
example tables so round-trip tests and the resize path work lib-free;
decode correctness is additionally pinned by a hand-assembled
single-block bitstream test vector (tests/test_multimodal_codecs.py),
keeping decoder and encoder from sharing a symmetric bug.

Everything here is scalar Python on purpose: payloads decoded in the
engine are thumbnail/feature-sized, and the Spark-side contract
(mapInPandas over binary batches) is what carries the scale argument —
a C codec slots in behind the same function signatures.
"""

from __future__ import annotations

import struct


def _zigzag() -> list[int]:
    """Raster index of the k-th zigzag coefficient (T.81 figure 5)."""
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(0, s + 1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return out


ZIGZAG = _zigzag()

_COS = [
    [
        __import__("math").cos((2 * x + 1) * u * __import__("math").pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]
_ALPHA = [0.3535533905932738] + [0.5] * 7  # sqrt(1/8), sqrt(2/8)


def _idct_2d(coef: list[float]) -> list[float]:
    """8x8 inverse DCT (separable: rows then columns)."""
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _ALPHA[u] * coef[base + u] * _COS[u][x]
            tmp[base + x] = s
    out = [0.0] * 64
    for c in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _ALPHA[v] * tmp[v * 8 + c] * _COS[v][y]
            out[y * 8 + c] = s
    return out


def _fdct_2d(block: list[float]) -> list[float]:
    """8x8 forward DCT, the encoder twin of `_idct_2d`."""
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += block[base + x] * _COS[u][x]
            tmp[base + u] = _ALPHA[u] * s
    out = [0.0] * 64
    for c in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + c] * _COS[v][y]
            out[v * 8 + c] = _ALPHA[v] * s
    return out


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (RSTn are consumed by the MCU
    loop via `restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        while self.n <= 24:
            if self.pos >= len(self.d):
                return self.n > 0
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
                if nxt != 0x00:
                    # RSTn (MCU loop consumes via restart()) or EOI/segment
                    return self.n > 0
                self.pos += 2  # stuffed 0xFF00 -> literal 0xFF data byte
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise EOFError
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        # bulk path: k MSB-first bits are the top k of the accumulator —
        # identical value to k sequential bit() calls, without k loop
        # iterations (magnitude bits dominate entropy-decode time)
        if self.n < k:
            self._fill()
        if self.n >= k:
            self.n -= k
            return (self.acc >> self.n) & ((1 << k) - 1)
        v = 0
        for _ in range(k):  # buffer exhausted mid-read: preserve the
            v = (v << 1) | self.bit()  # exact EOFError position
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.acc, self.n = 0, 0
        if (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2

    def decode(self, table: dict) -> int:
        # Fast path: resolve codes of <= 8 bits with one 256-entry table
        # probe on the top 8 buffered bits (canonical JPEG tables put
        # the frequent symbols there); built lazily once per table and
        # cached under a string key that cannot collide with the
        # (length, code) tuple keys.  Longer codes and near-end buffers
        # fall through to the bit-serial reference loop unchanged.
        lut = table.get("lut8")
        if lut is None:
            lut = _build_lut8(table)
            table["lut8"] = lut
        if self.n < 8:
            self._fill()
        if self.n >= 8:
            e = lut[(self.acc >> (self.n - 8)) & 0xFF]
            if e is not None:
                self.n -= e & 0xFF
                return e >> 8
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _build_lut8(table: dict) -> list:
    """256-entry direct-lookup table for Huffman codes of length <= 8:
    entry i resolves the code whose bits prefix the byte i to
    (symbol << 8) | code_length.  Codes are prefix-free (canonical), so
    the suffix fills never overlap; codes longer than 8 bits leave None
    and decode() falls back to the bit-serial loop."""
    lut: list = [None] * 256
    for key, sym in table.items():
        if not isinstance(key, tuple):
            continue
        length, code = key
        if length <= 8:
            base = code << (8 - length)
            entry = (sym << 8) | length
            for i in range(base, base + (1 << (8 - length))):
                lut[i] = entry
    return lut


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t magnitude bits to a signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes, assemble=None):
    """Decode a baseline JPEG to (width, height, rows of (r, g, b)) — the
    `_decode_bmp`/`_decode_png` shape, so features and resize are
    codec-agnostic.  Returns None for anything that is not a baseline
    sequential 8-bit JPEG this decoder covers.

    `assemble` swaps the block-assembly tail (dequantize -> IDCT ->
    level-shift -> upsample -> color-convert) for an alternative
    implementation with the same inputs — how codec_np.py's vectorized
    arm reuses this entropy decoder without duplicating it.  None = the
    scalar spec-reference tail (`_assemble_blocks`)."""
    try:
        return _decode_jpeg_strict(payload, assemble)
    except (ValueError, EOFError, IndexError, KeyError, struct.error):
        return None


def _decode_jpeg_strict(payload: bytes, assemble=None):
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    prog = None  # accumulated coefficient state across progressive scans
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                tprec, tid = body[i] >> 4, body[i] & 0x0F
                if tprec not in (0, 1):
                    return None
                if tprec:  # 16-bit entries (Pq=1): the 12-bit-sample case
                    vals = list(struct.unpack_from(">64H", body, i + 1))
                else:
                    vals = list(body[i + 1 : i + 65])
                table = [0] * 64
                for k in range(64):
                    table[ZIGZAG[k]] = vals[k]
                qt[tid] = table
                i += 1 + (128 if tprec else 64)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                huff[(tc, th)] = _build_huffman(
                    counts, body[i + 17 : i + 17 + n]
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 ext seq / SOF2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            # baseline is 8-bit by definition; extended sequential and
            # progressive also allow 12-bit (T.81 Table B.2)
            if prec != 8 and not (prec == 12 and marker in (0xC1, 0xC2)):
                return None
            if nc not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                return None
            frame = (w, h, comps, prec)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless/differential/arithmetic
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                return None
            ns = body[0]
            if not progressive:
                scan = {}
                for si in range(ns):
                    cs, tables = body[1 + 2 * si], body[2 + 2 * si]
                    scan[cs] = (tables >> 4, tables & 0x0F)
                return _decode_scan(
                    payload, pos, frame, qt, huff, scan, restart_interval,
                    assemble,
                )
            scan_comps = [
                (body[1 + 2 * si], body[2 + 2 * si] >> 4,
                 body[2 + 2 * si] & 0x0F)
                for si in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if prog is None:
                prog = _init_progressive(frame)
            pos = _decode_progressive_scan(
                payload, pos, frame, prog, huff, scan_comps,
                ss, se, ah, al, restart_interval,
            )
        elif marker == 0xD9:  # EOI
            if progressive and prog is not None:
                return _assemble_progressive(frame, prog, qt, assemble)
            return None  # EOI before any scan
        # APPn / COM / others: skipped
    # progressive streams truncated before EOI still render what arrived —
    # exactly the point of the format; require at least one decoded scan
    if progressive and prog is not None and prog["scans"] > 0:
        return _assemble_progressive(frame, prog, qt, assemble)
    return None


def _decode_scan(payload, pos, frame, qt, huff, scan, restart_interval,
                 assemble=None):
    w, h, comps, prec = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    blocks = []  # per comp: dequantized 64-coef blocks in raster block order
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        blocks.append([None] * (c["bw"] * c["bh"]))
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, scan[c["id"]][0])]
                ac_tab = huff[(1, scan[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        t = reader.decode(dc_tab)
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = (
                                _extend(reader.bits(s), s) * q[ZIGZAG[k]]
                            )
                            k += 1
                        blocks[ci][
                            (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        ] = coef
            mcu += 1
    return (assemble or _assemble_blocks)(
        w, h, comps, blocks, hmax, vmax, prec, None
    )


def _assemble_blocks(w, h, comps, blocks, hmax, vmax, prec, qtables):
    """Scalar spec-reference assembly tail shared by baseline and
    progressive decode: per-block (dequantize ->) IDCT -> level-shift ->
    clamp into component planes, then upsample + color-convert.
    `qtables` is None when blocks arrive already dequantized (baseline
    scans dequantize at entropy time) or a per-component quant table
    (progressive scans accumulate raw integer coefficients)."""
    half, maxv = 1 << (prec - 1), (1 << prec) - 1
    planes = []
    for ci, c in enumerate(comps):
        stride = c["bw"] * 8
        plane = [0] * (stride * c["bh"] * 8)
        q = qtables[ci] if qtables else None
        for bi, coef in enumerate(blocks[ci]):
            if q is not None:
                coef = [coef[i] * q[i] for i in range(64)]
            px = _idct_2d(coef)
            oy, ox = (bi // c["bw"]) * 8, (bi % c["bw"]) * 8
            for yy in range(8):
                row = (oy + yy) * stride + ox
                for xx in range(8):
                    v = int(px[yy * 8 + xx] + half + 0.5)
                    plane[row + xx] = (
                        0 if v < 0 else (maxv if v > maxv else v)
                    )
        planes.append(plane)
    return _planes_to_rows(w, h, comps, planes, hmax, vmax, prec)


def _planes_to_rows(w, h, comps, planes, hmax, vmax, prec=8):
    """Shared tail of baseline and progressive decode: upsample chroma and
    convert YCbCr->RGB (or replicate the single gray plane).  12-bit
    planes convert in their native range and downshift to the 8-bit
    (r, g, b) row contract at the end (>> 4, the standard display
    downconversion) — prec == 8 is bit-for-bit the historical path."""
    half, maxv, shift = 1 << (prec - 1), (1 << prec) - 1, prec - 8
    rows = []
    if len(comps) == 1:
        stride = comps[0]["bw"] * 8
        p = planes[0]
        for y in range(h):
            rows.append(
                [((v >> shift),) * 3 for v in p[y * stride : y * stride + w]]
                if shift else
                [(v, v, v) for v in p[y * stride : y * stride + w]]
            )
        return w, h, rows
    strides = [c["bw"] * 8 for c in comps]
    for y in range(h):
        line = []
        for x in range(w):
            yv = planes[0][
                (y * comps[0]["v"] // vmax) * strides[0]
                + (x * comps[0]["h"] // hmax)
            ]
            cb = planes[1][
                (y * comps[1]["v"] // vmax) * strides[1]
                + (x * comps[1]["h"] // hmax)
            ]
            cr = planes[2][
                (y * comps[2]["v"] // vmax) * strides[2]
                + (x * comps[2]["h"] // hmax)
            ]
            r = yv + 1.402 * (cr - half)
            g = yv - 0.344136 * (cb - half) - 0.714136 * (cr - half)
            b = yv + 1.772 * (cb - half)
            line.append(
                tuple(
                    (0 if v < 0 else (maxv if v > maxv else int(v + 0.5)))
                    >> shift
                    for v in (r, g, b)
                )
            )
        rows.append(line)
    return w, h, rows


# --------------------------------------------------------------------------
# Progressive (SOF2) decode: T.81 Annex G — spectral selection +
# successive approximation, Huffman entropy coding.  Coefficients
# accumulate across scans in integer form and dequantize+IDCT once at
# EOI.  Control flow mirrors the libjpeg jdphuff reference semantics
# (the de-facto conformance target), re-derived from the spec text.


def _init_progressive(frame) -> dict:
    w, h, comps, _prec = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coef = []
    for c in comps:
        c["bw"] = mcux * c["h"]   # interleaved (padded) block grid
        c["bh"] = mcuy * c["v"]
        # non-interleaved scans iterate only the blocks covering the
        # component's actual samples (T.81 A.2.2), stored into the
        # padded grid
        c["bw2"] = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
        c["bh2"] = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
        coef.append([[0] * 64 for _ in range(c["bw"] * c["bh"])])
    return {"coef": coef, "mcux": mcux, "mcuy": mcuy,
            "hmax": hmax, "vmax": vmax, "scans": 0}


def _ac_first(reader, tab, coef, ss, se, al, eobrun):
    """One block of an AC first-pass scan (Ah == 0); returns new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            return (1 << r) - 1 + (reader.bits(r) if r else 0)
        k += r
        if k > se:
            raise ValueError("AC band overflow")
        coef[ZIGZAG[k]] = _extend(reader.bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, tab, coef, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah == Al + 1): newly-nonzero
    coefficients arrive as +/-1<<Al; every nonzero-HISTORY coefficient the
    traversal passes consumes one correction bit.  Returns new EOBRUN."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(z):
        if reader.bit() and (coef[z] & p1) == 0:
            coef[z] += p1 if coef[z] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.bits(r) if r else 0)
                    break
                # r == 15: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                val = p1 if reader.bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement overflow")
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        # remainder of the band rides the EOB run: corrections only
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    payload, pos, frame, prog, huff, scan_comps, ss, se, ah, al,
    restart_interval,
):
    """Decode one progressive scan into prog['coef']; returns the stream
    position of the marker that terminated the scan."""
    _w, _h, comps, _prec = frame
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    members = [
        (by_id[cs][0], by_id[cs][1], dc_t, ac_t)
        for cs, dc_t, ac_t in scan_comps
    ]
    reader = _BitReader(payload, pos)
    eobrun = 0
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se == 0")
        pred = [0] * len(comps)

        def dc_block(ci, dc_t, blk):
            coef = prog["coef"][ci][blk]
            if ah == 0:
                t = reader.decode(huff[(0, dc_t)])
                diff = _extend(reader.bits(t), t) if t else 0
                pred[ci] += diff
                coef[0] = pred[ci] << al
            elif reader.bit():
                coef[0] |= 1 << al

        if len(members) > 1:  # interleaved DC scan
            mcu = 0
            for my in range(prog["mcuy"]):
                for mx in range(prog["mcux"]):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        reader.restart()
                        pred = [0] * len(comps)
                    for ci, c, dc_t, _ac_t in members:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    ci, dc_t,
                                    (my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx,
                                )
                    mcu += 1
        else:
            ci, c, dc_t, _ac_t = members[0]
            n = 0
            for by in range(c["bh2"]):
                for bx in range(c["bw2"]):
                    if restart_interval and n and n % restart_interval == 0:
                        reader.restart()
                        pred = [0] * len(comps)
                    dc_block(ci, dc_t, by * c["bw"] + bx)
                    n += 1
    else:
        if len(members) != 1:
            raise ValueError("AC scans are single-component (T.81 G.1.1)")
        ci, c, _dc_t, ac_t = members[0]
        tab = huff[(1, ac_t)]
        n = 0
        for by in range(c["bh2"]):
            for bx in range(c["bw2"]):
                if restart_interval and n and n % restart_interval == 0:
                    reader.restart()
                    eobrun = 0
                coef = prog["coef"][ci][by * c["bw"] + bx]
                if ah == 0:
                    eobrun = _ac_first(reader, tab, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, tab, coef, ss, se, al, eobrun)
                n += 1
    prog["scans"] += 1
    return reader.pos


def _assemble_progressive(frame, prog, qt, assemble=None):
    w, h, comps, prec = frame
    qtables = [qt[c["tq"]] for c in comps]
    return (assemble or _assemble_blocks)(
        w, h, comps, prog["coef"], prog["hmax"], prog["vmax"], prec, qtables
    )


# --------------------------------------------------------------------------
# Encoder twin: baseline 4:4:4 with the T.81 Annex K example tables.

QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          bytes(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
          bytes(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]))
AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]))


def _encode_table(counts: list[int], symbols: bytes) -> dict[int, tuple]:
    """symbol -> (length, code), the encoder's view of a Huffman table."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _scaled_quant(table: list[int], quality: int) -> list[int]:
    """libjpeg's public quality scaling of the Annex K tables."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (t * scale + 50) // 100)) for t in table]


def _magnitude(v: int) -> tuple[int, int]:
    """(bit length t, t-bit representation) of a coefficient."""
    t, a = 0, abs(v)
    while a:
        t += 1
        a >>= 1
    return t, v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(rows, quality: int = 75, precision: int = 8) -> bytes:
    """Encode (r, g, b) pixel rows as a 4:4:4 JPEG (Annex K tables,
    libjpeg quality scaling) — the writer twin of `decode_jpeg`, so
    resize can keep JPEG payloads JPEG lib-free.

    precision=8 writes baseline (SOF0).  precision=12 writes EXTENDED
    sequential (SOF1): 8-bit input samples upshift to the 12-bit domain
    (<< 4) and the quantization tables scale by the same 16 (written as
    16-bit Pq=1 DQT entries), so quantized coefficients — and therefore
    the Annex K Huffman tables and the ±1023 AC clamp — keep exactly
    the 8-bit ranges.  The decode twin downshifts back at assembly."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    h, w = len(rows), len(rows[0])
    up = 1 << (precision - 8)
    qy = [q * up for q in _scaled_quant(QUANT_LUM, quality)]
    qc = [q * up for q in _scaled_quant(QUANT_CHR, quality)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, table: list[int]) -> bytes:
        if precision == 8:
            body = bytes([tid]) + bytes(table[ZIGZAG[k]] for k in range(64))
        else:
            body = bytes([0x10 | tid]) + b"".join(
                struct.pack(">H", table[ZIGZAG[k]]) for k in range(64)
            )
        return seg(0xDB, body)

    def dht(tc: int, th: int, spec) -> bytes:
        counts, symbols = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)

    head = b"\xff\xd8" + dqt(0, qy) + dqt(1, qc)
    head += seg(
        0xC0 if precision == 8 else 0xC1,
        struct.pack(">BHHB", precision, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    head += (
        dht(0, 0, DC_LUM) + dht(1, 0, AC_LUM)
        + dht(0, 1, DC_CHR) + dht(1, 1, AC_CHR)
    )
    head += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    enc = {
        "dcl": _encode_table(*DC_LUM), "acl": _encode_table(*AC_LUM),
        "dcc": _encode_table(*DC_CHR), "acc": _encode_table(*AC_CHR),
    }
    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, (h + 7) // 8 * 8, 8):
        for bx in range(0, (w + 7) // 8 * 8, 8):
            ycc = [[0.0] * 64, [0.0] * 64, [0.0] * 64]
            for yy in range(8):
                sy = min(by + yy, h - 1)
                for xx in range(8):
                    r, g, b = rows[sy][min(bx + xx, w - 1)]
                    if up > 1:  # 8-bit input samples -> 12-bit domain
                        r, g, b = r * up, g * up, b * up
                    i = yy * 8 + xx
                    ycc[0][i] = (
                        0.299 * r + 0.587 * g + 0.114 * b - 128.0 * up
                    )
                    ycc[1][i] = -0.168736 * r - 0.331264 * g + 0.5 * b
                    ycc[2][i] = 0.5 * r - 0.418688 * g - 0.081312 * b
            for ci in range(3):
                q = qy if ci == 0 else qc
                dct = _fdct_2d(ycc[ci])
                # baseline range clamp (round-8 ADVICE): at quality >= ~96
                # quant steps hit 1 and a max-contrast block can quantize
                # past 1023, whose magnitude category (t=11) has no entry
                # in the Annex K AC tables — baseline encoders clamp AC to
                # [-1023, 1023]; the DC DIFF below then also fits its
                # 11-bit category by construction (|dc| <= 1023 each side
                # => |diff| <= 2046 < 2048)
                coef = [
                    max(-1023, min(1023, int(round(dct[ZIGZAG[k]] / q[ZIGZAG[k]]))))
                    for k in range(64)
                ]
                dc_tab = enc["dcl"] if ci == 0 else enc["dcc"]
                ac_tab = enc["acl"] if ci == 0 else enc["acc"]
                diff = coef[0] - pred[ci]
                pred[ci] = coef[0]
                t, m = _magnitude(diff)
                length, code = dc_tab[t]
                bw.put(code, length)
                if t:
                    bw.put(m, t)
                run = 0
                for k in range(1, 64):
                    if coef[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = ac_tab[0xF0]
                        bw.put(code, length)  # ZRL
                        run -= 16
                    t, m = _magnitude(coef[k])
                    length, code = ac_tab[(run << 4) | t]
                    bw.put(code, length)
                    bw.put(m, t)
                    run = 0
                if run:
                    length, code = ac_tab[0x00]
                    bw.put(code, length)  # EOB
    bw.flush()
    return head + bytes(bw.out) + b"\xff\xd9"
