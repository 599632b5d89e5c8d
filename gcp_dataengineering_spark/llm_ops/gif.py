"""Vendored GIF decoder/encoder (r15, following the r13 PPM / r14
JPEG / r15 PNG legs): real pixel decode for crawl GIFs with NO
imaging library, implementing the PUBLIC GIF87a/89a specification
(CompuServe GSA89a): header + logical screen descriptor, global and
local color tables, extension blocks, image descriptor, LZW-
compressed index stream with variable code width, and the 4-pass
row interlace.

Scope (honest, like the sibling legs):

- FIRST image frame only (the thumbnail contract — animation
  belongs to a video pipeline, not an image resample).
- Output is (indices, palette): the resample leg resizes the INDEX
  plane and re-encodes against the ORIGINAL palette, so no color
  quantization is ever needed and the output is a real GIF.
- Transparency (GCE transparent index) is treated opaque —
  compositing policy belongs to the caller, the PNG leg's rule.
- Every block walk is bounds-checked and the whole decode is fenced
  by the jpegdc quarantine rule: one adversarial crawl payload whose
  header still sniffs as GIF must never fail the mapInPandas batch —
  malformed input returns ``None``, never raises.

The encoder emits a real GIF87a with a genuine variable-width LZW
stream (clear-code resets at table overflow) — deterministic bytes,
round-trips bit-exactly through the decoder.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["gif_decode", "gif_encode"]


def gif_decode(data: bytes):
    """Decode a GIF's first frame to ``(width, height, idx, palette)``
    — idx a uint8 array (h, w) of palette indices, palette a uint8
    array (n, 3). ``None`` for anything malformed/truncated or
    outside scope (no color table at all) — the quarantine contract
    (never raises)."""
    try:
        return _gif_decode(data)
    except (IndexError, ValueError, KeyError, OverflowError,
            MemoryError, struct.error):
        return None


def _sub_blocks(data: bytes, pos: int):
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (bytes, next_pos) or (None, pos) on truncation."""
    out = bytearray()
    while True:
        if pos >= len(data):
            return None, pos
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            return None, pos
        out.extend(data[pos : pos + n])
        pos += n


def _gif_decode(data: bytes):
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer before any image
            return None
        if b == 0x21:  # extension: label + sub-block chain
            if pos + 2 > len(data):
                return None
            pos += 2
            _, pos = _sub_blocks(data, pos)
            if _ is None:
                return None
            continue
        if b != 0x2C:  # not an image descriptor: invalid stream
            return None
        if pos + 10 > len(data):
            return None
        ix0, iy0, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        if w < 1 or h < 1:
            return None
        if (ix0, iy0) != (0, 0) or w != sw or h != sh:
            # sub-screen / offset first frame: parse_image_header reports
            # the SCREEN dims, so resampling the bare frame plane would
            # silently stretch it and disagree with the reported geometry.
            # Quarantine — compositing policy belongs to an animation
            # pipeline, not the thumbnail contract.
            return None
        if w * h > 1 << 31:
            # pixel-budget decode-bomb guard (mirrors png.py's expect cap):
            # reject at the header so a quadratically-expanding LZW stream
            # can never grow `out` to multi-GB before the length check.
            return None
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                return None
            pal = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            return None  # no color table anywhere: out of scope
        if pos >= len(data):
            return None
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        stream, pos = _sub_blocks(data, pos)
        if stream is None:
            return None
        idx_flat = _lzw_decode(stream, min_code, w * h)
        if idx_flat is None:
            return None
        idx = np.frombuffer(bytes(idx_flat), dtype=np.uint8).reshape(h, w)
        if int(idx.max()) >= len(pal):
            return None  # index beyond the color table
        if iflags & 0x40:  # 4-pass row interlace
            out = np.empty_like(idx)
            rows = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            for src, dst in enumerate(rows):
                out[dst] = idx[src]
            idx = out
        return w, h, idx, pal


def _lzw_decode(stream: bytes, min_code: int, expect: int):
    """GIF-variant LZW: variable code width starting at min_code+1,
    clear/EOI codes, width grows after the table fills a width (cap
    12 bits). Returns exactly ``expect`` indices or None."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1

    width = min_code + 1
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in stream:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out) if len(out) == expect else None
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None  # code beyond table+1: corrupt
            out.extend(entry)
            if len(out) > expect:
                return None  # more pixels than the descriptor declared
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    # stream ended without EOI: accept iff exactly the declared pixels
    return bytes(out) if len(out) == expect else None


def gif_encode(idx, palette) -> bytes:
    """Encode (h, w) uint8 palette indices + (n, 3) uint8 palette as
    a single-frame GIF87a with a real variable-width LZW stream.
    Deterministic; round-trips bit-exactly through
    :func:`gif_decode`."""
    ix = np.ascontiguousarray(np.asarray(idx, dtype=np.uint8))
    pal = np.ascontiguousarray(np.asarray(palette, dtype=np.uint8))
    if ix.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError(f"gif_encode takes (h, w) indices + (n, 3) palette, "
                         f"got {ix.shape} / {pal.shape}")
    h, w = ix.shape
    if h < 1 or w < 1 or not 1 <= len(pal) <= 256:
        raise ValueError(f"bad geometry {ix.shape} / palette {len(pal)}")
    if int(ix.max()) >= len(pal):
        raise ValueError("index beyond palette")
    # color-table size: power of two >= max(2, len(pal)), zero-padded
    bits = max(1, (max(len(pal), 2) - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    min_code = max(2, bits)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    out += _lzw_encode(ix.reshape(-1).tobytes(), min_code)
    out += b"\x3b"
    return bytes(out)


def _lzw_encode(pixels: bytes, min_code: int) -> bytes:
    """GIF LZW with the spec's code-width growth and a clear-code
    reset when the table hits 4096, emitted as 255-byte sub-blocks."""
    clear = 1 << min_code
    eoi = clear + 1
    bitbuf = 0
    nbits = 0
    body = bytearray()

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code + 1

    table, next_code, width = fresh()
    emit(clear, width)
    run = b""
    for byte in pixels:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # width grows when next_code EXCEEDS the current width's range
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table, next_code, width = fresh()
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        body.append(bitbuf & 0xFF)
    out = bytearray()
    for lo in range(0, len(body), 255):
        chunk = body[lo : lo + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_animation_info(data: bytes | None):
    """(n_frames, loop_count) from a GIF payload — animation
    VISIBILITY for corpus stats (r17, the r16 verdict's item 7); the
    first-frame pixel-decode contract (:func:`gif_decode`) is
    untouched. Block walk only, no pixel work: counts image
    descriptors (0x2C — skipping each frame's local color table and
    LZW sub-block chain) and reads the NETSCAPE2.0 application
    extension's loop count (u16 LE after the 0x01 sub-block id;
    0 = loop forever, per the published extension). A still GIF is
    (1, None). ``None, None`` for non-GIF/truncated payloads — the
    quarantine contract (never raises)."""
    try:
        if not data or len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
            return (None, None)
        flags = data[10]
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        n_frames = 0
        loop = None
        while pos < len(data):
            b = data[pos]
            if b == 0x3B:
                break
            if b == 0x21:  # extension
                if pos + 2 > len(data):
                    return (None, None)
                label = data[pos + 1]
                pos += 2
                blocks, pos = _sub_blocks(data, pos)
                if blocks is None:
                    return (None, None)
                if (
                    label == 0xFF
                    and blocks[:11] == b"NETSCAPE2.0"
                    and len(blocks) >= 14
                    and blocks[11] == 0x01
                ):
                    loop = int.from_bytes(blocks[12:14], "little")
                continue
            if b != 0x2C:
                return (None, None)
            if pos + 10 > len(data):
                return (None, None)
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            if pos >= len(data):
                return (None, None)
            pos += 1  # LZW minimum code size
            blocks, pos = _sub_blocks(data, pos)
            if blocks is None:
                return (None, None)
            n_frames += 1
        return (n_frames, loop) if n_frames > 0 else (None, None)
    except (IndexError, ValueError, OverflowError, struct.error):
        return (None, None)
