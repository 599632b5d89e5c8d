"""Vendored baseline-JPEG codec, DC-only decode + grayscale encode
(r14 — the r13 verdict's item 8: give the compressed-codec pixel leg
EXECUTED coverage in containers with no imaging library).

Everything here reproduces the PUBLIC JPEG specification (ITU-T T.81
/ ISO 10918-1): the standard Annex K luminance quantization + Huffman
tables, Annex F entropy coding, and the classic "DC-only" decode —
fully entropy-decode every coefficient (the bitstream cannot be
skipped), but reconstruct only the DC term of each 8×8 block, which
IS the block mean: a mathematically exact 1/8-scale box-filtered
image, no IDCT needed. That is the standard thumbnail/feature path
over crawl JPEGs (decode cost ~entropy decode alone), and exactly
what the multimodal resize stage needs, since the output thumbnail
is almost always ≤ 1/8 of a crawl photo anyway.

Scope, stated honestly:

- DECODE: baseline sequential DCT (SOF0), 8-bit, any component
  count/subsampling (the Y plane's DC grid is returned), restart
  markers, byte stuffing. Progressive (SOF2), arithmetic coding, and
  12-bit return ``None`` — callers quarantine, same contract as a
  corrupt body.
- ENCODE: grayscale baseline JPEG (1 component, no subsampling,
  Annex K tables at quality 50) — a REAL decodable JPEG for the
  resample stage's output and the pytest fixtures; it is not meant
  to chase libjpeg's rate-distortion, only correctness.

Pure Python + numpy (container-baked); no external codec anywhere.
Used by multimodal.decode_and_resize_images as the JPEG branch when
PIL is absent — the NotImplementedError guard now covers only the
formats with neither a vendored codec nor PIL (PNG/GIF/WebP pixels).
"""

from __future__ import annotations

# ---- Annex K.1: standard luminance quantization table (quality 50),
# zig-zag order not needed for DC-only use — stored in natural order.
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# ---- Annex K.3: standard DC luminance Huffman spec (BITS, HUFFVAL)
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
# ---- Annex K.3.2: standard AC luminance Huffman spec
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
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
]


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code) -> symbol}."""
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


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """{symbol -> (code, length)} — the encoder-side view."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 destuffing, RSTn handling
    (resync to the byte after the marker), stop at any other
    marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.hit_marker = False

    def _fill(self) -> bool:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                    self.pos += 2  # stuffed literal FF
                else:
                    # a real marker terminates the entropy segment;
                    # the caller decides (RST resync or stop)
                    self.hit_marker = True
                    return self.nbits > 0
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        if self.nbits == 0:
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def resync_restart(self) -> bool:
        """Consume an RSTn marker and realign; False if the marker is
        not a restart (scan over)."""
        d = self.data
        # drop unread buffered bits (restart is byte-aligned)
        self.acc = 0
        self.nbits = 0
        self.hit_marker = False
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            return False
        m = d[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2
            return True
        return False


def _decode_huff(br: _BitReader, table: dict) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed
    value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_dc_decode(data: bytes):
    """DC-only decode of a baseline JPEG: returns
    ``(width, height, bw, bh, gray)`` where ``gray`` is the Y
    channel's per-8×8-block means as ``bh`` rows × ``bw`` cols of
    bytes (row-major bytes object) — the exact 1/8-scale box-filtered
    luma image. ``None`` for anything this decoder does not cover
    (progressive, arithmetic, 12-bit, truncated/corrupt streams) —
    the caller's quarantine contract.

    Malformed-but-length-consistent streams (a SOF declaring more
    components than its segment holds, a zero-component frame, a
    16-bit DQT shorter than 128 bytes, ...) quarantine to None
    exactly like truncated ones: the parser bounds-checks each
    segment, and a last-resort exception fence below guarantees that
    ONE adversarial crawl byte string whose header still sniffs as
    JPEG can never fail the whole mapInPandas batch it rides in
    (ADVICE r14 — resize_images runs this with no try/except of its
    own, by contract)."""
    try:
        return _jpeg_dc_decode(data)
    except (IndexError, ValueError, KeyError, ZeroDivisionError,
            OverflowError):
        # structurally invalid in a way the explicit checks missed:
        # still a quarantine, never a job failure
        return None


def _jpeg_dc_decode(data: bytes):
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps = None  # [(cid, h, v, tq)]
    width = height = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS: no image
            return None
        seglen = (data[pos + 2] << 8) | data[pos + 3]
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if i + (64 if pq == 0 else 128) > len(seg):
                    return None  # table body shorter than declared
                if pq == 0:
                    qtables[tq] = list(seg[i : i + 64])
                    i += 64
                else:
                    qtables[tq] = [
                        (seg[i + 2 * k] << 8) | seg[i + 2 * k + 1]
                        for k in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) != n:
                    return None
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if len(seg) < 6 or seg[0] != 8:
                return None  # short frame header / 12-bit not covered
            height = (seg[1] << 8) | seg[2]
            width = (seg[3] << 8) | seg[4]
            nc = seg[5]
            if nc < 1 or width < 1 or height < 1:
                return None  # zero-component / zero-area frame
            if len(seg) < 6 + 3 * nc:
                return None  # declares more components than it holds
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                if hv >> 4 == 0 or hv & 0xF == 0:
                    return None  # zero sampling factor
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * c]))
            pos += 2 + seglen
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — entropy data follows
            if comps is None or width is None or len(seg) < 1:
                return None
            ns = seg[0]
            if ns < 1 or len(seg) < 1 + 2 * ns:
                return None  # scan header shorter than declared
            scan = []  # (comp_idx, dc_table, ac_table)
            for s in range(ns):
                cs = seg[1 + 2 * s]
                td, ta = seg[2 + 2 * s] >> 4, seg[2 + 2 * s] & 0xF
                ci = next(
                    (i for i, c in enumerate(comps) if c[0] == cs), None
                )
                if ci is None:
                    return None
                scan.append((ci, td, ta))
            if len(scan) != len(comps):
                return None  # non-interleaved multi-scan not covered
            return _decode_scan(
                data, pos + 2 + seglen, width, height, comps, scan,
                qtables, htables, restart_interval,
            )
        if marker not in (0xC0, 0xC1):
            pos += 2 + seglen
    return None


def _decode_scan(
    data, pos, width, height, comps, scan, qtables, htables,
    restart_interval,
):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # Y is component 0 by convention (first in SOF)
    y_h, y_v, y_tq = comps[0][1], comps[0][2], comps[0][3]
    if y_tq not in qtables:
        return None
    dcq = qtables[y_tq][0]
    ybw, ybh = mcus_x * y_h, mcus_y * y_v
    yplane = [0] * (ybw * ybh)

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # any bits still buffered are byte-padding before the
                # marker (fill never reads past a marker, and data
                # bits are always consumed before padding) — resync
                # discards them and consumes the RSTn
                if not br.resync_restart():
                    return None
                preds = [0] * len(comps)
            for (ci, td, ta) in scan:
                _, ch, cv, _ = comps[ci]
                dct = htables.get((0, td))
                act = htables.get((1, ta))
                if dct is None or act is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        t = _decode_huff(br, dct)
                        if t is None:
                            return None
                        if t > 11:
                            return None
                        diff = 0
                        if t:
                            v = br.read_bits(t)
                            if v is None:
                                return None
                            diff = _extend(v, t)
                        preds[ci] += diff
                        if ci == 0:
                            gy, gx = my * y_v + by, mx * y_h + bx
                            yplane[gy * ybw + gx] = preds[ci]
                        # AC coefficients must be entropy-decoded to
                        # advance the stream even though DC-only
                        # reconstruction discards them
                        kk = 1
                        while kk <= 63:
                            rs = _decode_huff(br, act)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if br.read_bits(s) is None:
                                return None
                            kk += 1
            mcu_count += 1

    # DC coefficient → block mean: level-shift +128, dequantize, /8
    bw, bh = -(-width // 8), -(-height // 8)
    out = bytearray(bw * bh)
    for yy in range(bh):
        for xx in range(bw):
            dc = yplane[min(yy, ybh - 1) * ybw + min(xx, ybw - 1)]
            px = (dc * dcq) // 8 + 128
            out[yy * bw + xx] = 0 if px < 0 else (255 if px > 255 else px)
    return width, height, bw, bh, bytes(out)


# ------------------------------------------------------------------
# grayscale baseline encoder (fixtures + the resample stage's output)
# ------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def jpeg_gray_encode(
    width: int, height: int, gray: bytes, restart_interval: int = 0
) -> bytes:
    """Encode a row-major 8-bit grayscale image as a REAL baseline
    JPEG (1 component, Annex K quality-50 luminance tables). Exists
    for the DC decoder's executable fixtures and as the resample
    stage's JPEG output leg; correctness over compression quality.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (predictor reset + byte alignment) — crawl JPEGs
    routinely carry them, so the decoder's restart path needs an
    executable fixture."""
    import numpy as np

    if len(gray) != width * height:
        raise ValueError(f"gray length {len(gray)} != {width}x{height}")
    q = np.array(STD_LUMA_QUANT, dtype=np.float64).reshape(8, 8)
    # DCT-II orthonormal basis
    n = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    c[0, :] = np.sqrt(1.0 / 8.0)

    img = np.frombuffer(gray, dtype=np.uint8).astype(np.float64).reshape(
        height, width
    )
    bw, bh = -(-width // 8), -(-height // 8)
    padded = np.empty((bh * 8, bw * 8))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]  # edge-replicate pad
    padded[:, width:] = padded[:, width - 1 : width]

    dc_enc = _build_encode_table(STD_DC_BITS, STD_DC_VALS)
    ac_enc = _build_encode_table(STD_AC_BITS, STD_AC_VALS)
    w = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align (1-fill padding), then the raw marker —
                # markers are never byte-stuffed
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = 0
            mcu += 1
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = c @ blk @ c.T
            # round-half-away like libjpeg's integer path is not
            # required for validity; plain rounding keeps it simple
            qz = np.floor(coef / q + 0.5).astype(np.int64)
            zz = [int(qz.flat[_ZIGZAG[k]]) for k in range(64)]
            diff = zz[0] - pred
            pred = zz[0]
            t = _category(diff)
            code, ln = dc_enc[t]
            w.write(code, ln)
            if t:
                mag = diff if diff >= 0 else diff + (1 << t) - 1
                w.write(mag, t)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]  # ZRL
                    w.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_enc[(run << 4) | s]
                w.write(code, ln)
                mag = v if v >= 0 else v + (1 << s) - 1
                w.write(mag, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_enc[0x00]  # EOB
                w.write(code, ln)
    w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(
        STD_LUMA_QUANT[_ZIGZAG[k]] for k in range(64)
    ))
    sof = seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
              + width.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS)
              ) + seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS)
                      + bytes(STD_AC_VALS))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(w.out) + b"\xff\xd9"
    )
