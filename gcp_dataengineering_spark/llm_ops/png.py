"""Vendored PNG decoder/encoder (r15 — the r14 verdict's item 2):
real pixel decode for the second-most-common crawl image format with
NO imaging library, exactly like the r13 PPM and r14 baseline-JPEG
legs. Pure stdlib ``zlib`` + numpy, implementing the PUBLIC PNG
specification (W3C PNG second edition / RFC 2083): 8-byte signature,
length-type-data-CRC chunks, IHDR geometry, concatenated-IDAT zlib
stream, per-scanline filter bytes 0-4 (None/Sub/Up/Average/Paeth),
PLTE palette expansion.

Scope (honest, like the JPEG leg):

- bit depth 8 fully, and 16 downscaled to 8 (``>> 8``, the
  standard's own recommended reduction); depths 1/2/4 quarantine.
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA). Alpha is DECODED and returned; the resample leg in
  multimodal.resize_images drops it (thumbnails first — compositing
  policy belongs to the caller). Palette tRNS is ignored (treated
  opaque) — documented, not silent.
- interlace 0 AND Adam7 (interlace 1): each Adam7 pass defilters as
  its own sub-image and scatters onto its (x0::dx, y0::dy) grid.
- every chunk walk is bounds-checked, chunk CRCs are verified, and
  the whole decode is fenced by the jpegdc quarantine rule: ONE
  adversarial crawl payload whose header still sniffs as PNG must
  never fail the mapInPandas batch it rides in — malformed input
  returns ``None``, never raises.

Decode cost note: filters Sub and Up defilter vectorized (Sub via
wrapping ``np.add.accumulate`` over bpp-strided lanes); Average and
Paeth are sequential by specification (each byte depends on the
reconstructed left neighbour) and run as per-row Python loops. This
is the codec-free fallback leg — when PIL is importable the
multimodal resample uses it instead, same as JPEG.

The encoder emits deterministic 8-bit gray or RGB PNGs (filter 0
rows, one zlib IDAT) — fixture generation and the resample stage's
output format.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["png_decode", "png_encode", "PNG_CHANNELS"]

_SIG = b"\x89PNG\r\n\x1a\n"
PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """The spec's predictor (W3C PNG §9.4): closest of left/up/upleft
    to p = a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
# (W3C PNG §8.2) — each pass is an independently filtered sub-image.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_expect(w: int, h: int, bpp: int) -> int:
    """Exact serialized size of an Adam7 image: per non-empty pass,
    ph scanlines of (1 filter byte + pw·bpp). Empty passes (grid
    starts past the image) contribute NOTHING — not even filter
    bytes."""
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            total += ph * (1 + pw * bpp)
    return total


def _defilter_adam7(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray | None:
    """De-interlace Adam7: defilter each pass as its own sub-image
    (fresh zero prior row — filters never cross passes), scatter its
    pixels onto the (y0::dy, x0::dx) grid. Returns (h, w·bpp) uint8
    like the sequential path."""
    out = np.zeros((h, w, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        size = ph * (1 + pw * bpp)
        sub = _defilter(raw[pos : pos + size], ph, pw * bpp, bpp)
        if sub is None:
            return None
        pos += size
        out[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if pos != len(raw):
        return None
    return out.reshape(h, w * bpp)


def _defilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray | None:
    """Reverse the scanline filters: raw is h × (1 + stride) bytes
    (leading filter byte per row); returns (h, stride) uint8."""
    if len(raw) != h * (1 + stride):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).copy()
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x - bpp]
            pad = (-len(row)) % bpp
            lanes = np.concatenate(
                [row, np.zeros(pad, dtype=np.uint8)]
            ).reshape(-1, bpp)
            np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
            cur = lanes.reshape(-1)[: len(row)]
        elif ftype == 2:  # Up
            cur = row + prev  # uint8 add wraps mod 256, per spec
        elif ftype == 3:  # Average — sequential in x by construction
            cur = row
            p = prev
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(p[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — sequential in x by construction
            cur = row
            p = prev
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                upleft = int(p[x - bpp]) if x >= bpp else 0
                cur[x] = (
                    int(cur[x]) + _paeth(left, int(p[x]), upleft)
                ) & 0xFF
        else:
            return None  # filter type 5+: invalid stream
        out[y] = cur
        prev = out[y]
    return out


def png_decode(data: bytes):
    """Decode a PNG to ``(width, height, px)`` with ``px`` a uint8
    array of shape (h, w, channels) — channels per the color type
    (palette rows expand through PLTE to 3). ``None`` for anything
    outside the documented scope OR any malformed/truncated/corrupt
    stream — the caller's quarantine contract (never raises)."""
    try:
        return _png_decode(data)
    except (IndexError, ValueError, KeyError, OverflowError,
            MemoryError, struct.error, zlib.error):
        # structurally invalid in a way the explicit checks missed:
        # still a quarantine, never a job failure (jpegdc's rule)
        return None


def _png_decode(data: bytes):
    if len(data) < len(_SIG) + 12 or data[: len(_SIG)] != _SIG:
        return None
    pos = len(_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        length = struct.unpack(">I", data[pos : pos + 4])[0]
        ctype = data[pos + 4 : pos + 8]
        body_end = pos + 8 + length
        if length > 0x7FFFFFFF or body_end + 4 > len(data):
            return None  # lying length / truncated chunk
        body = data[pos + 8 : body_end]
        crc = struct.unpack(">I", data[body_end : body_end + 4])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            return None  # corrupt chunk
        if ctype == b"IHDR":
            if ihdr is not None or length != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if length % 3 != 0 or length > 3 * 256 or length == 0:
                return None
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, tRNS, ...) are skipped; tRNS
        # on palette images is treated as opaque (module docstring)
        pos = body_end + 4
    if ihdr is None or not idat or not seen_iend:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    if w < 1 or h < 1 or comp != 0 or filt != 0:
        return None
    if interlace not in (0, 1):
        return None
    if color not in PNG_CHANNELS or depth not in (8, 16):
        return None
    if color == 3 and (depth != 8 or plte is None):
        return None
    channels = PNG_CHANNELS[color]
    bpp = channels * depth // 8
    stride = w * bpp
    expect = (
        h * (1 + stride) if interlace == 0 else _adam7_expect(w, h, bpp)
    )
    if expect > 1 << 31:
        return None  # decompressed size cap: decode bomb guard
    # cap the inflate at expect+1: a stream that decompresses to MORE
    # than the header's geometry (a decode bomb, or just a lying
    # IHDR) stops expanding right there and quarantines on the length
    # mismatch below instead of exhausting executor memory
    raw = zlib.decompressobj().decompress(bytes(idat), expect + 1)
    if interlace == 0:
        flat = _defilter(raw, h, stride, bpp)
    else:
        if len(raw) != expect:
            return None
        flat = _defilter_adam7(raw, w, h, bpp)
    if flat is None:
        return None
    if depth == 16:
        # big-endian 16-bit samples -> high byte (the standard's own
        # 16->8 reduction)
        px = flat.reshape(h, w, channels, 2)[:, :, :, 0]
    else:
        px = flat.reshape(h, w, channels)
    if color == 3:
        idx = px.reshape(h, w)
        if int(idx.max()) >= len(plte):
            return None  # palette index out of range
        px = plte[idx]
    return w, h, np.ascontiguousarray(px)


def png_encode(px) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, 3) RGB — as an
    8-bit PNG (filter 0 scanlines, one zlib-9 IDAT). Deterministic
    for a given zlib build; round-trips bit-exactly through
    :func:`png_decode`."""
    arr = np.ascontiguousarray(np.asarray(px, dtype=np.uint8))
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color = 2
    else:
        raise ValueError(
            f"png_encode takes (h, w) gray or (h, w, 3) RGB, got shape "
            f"{arr.shape}"
        )
    h, w = arr.shape[0], arr.shape[1]
    if h < 1 or w < 1:
        raise ValueError(f"empty image {arr.shape}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = arr.reshape(h, -1)
    raw = b"".join(b"\x00" + stride[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
