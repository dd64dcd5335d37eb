"""Vendored pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only).

The sandbox disallows installing PIL, which used to leave the
``real=True`` media-decode path of x13/x19 permanently skipped. PNG is
simple enough to decode honestly without a native codec: chunk parse →
zlib inflate → per-scanline unfilter (all five filter types) → optional
palette expansion. This module implements exactly that for the common
8-bit-depth, non-interlaced subset, plus a grayscale encoder and a
block-average thumbnailer, so the engine's real image path runs
everywhere. When PIL *is* installed, ``multimodal`` still prefers it
(full format coverage); this codec is the PNG fallback, and the
grayscale conversion uses the same ITU-R 601-2 integer luma PIL's
``convert("L")`` uses so both paths agree bit-for-bit on RGB input.

Reference for parity intent: the reference repo treats media as opaque
blobs (it has no decode at all); this is extension surface from the
build brief's multimodal requirements.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIG


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit, non-interlaced PNG.

    Returns ``(width, height, channels, pixels)`` with ``pixels`` a
    row-major byte string of ``height*width*channels`` samples
    (palette images are expanded to RGB, so channels is then 3).
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = bytes(data[pos + 8 : pos + 8 + length])
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            plte = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}); codec covers the 8-bit non-interlaced subset"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    rp = 0
    for y in range(h):
        ftype = raw[rp]
        rp += 1
        line = bytearray(raw[rp : rp + stride])
        rp += stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color == 3:  # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        rgb = bytearray(h * w * 3)
        for i, idx in enumerate(out):
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, bytes(out)


def to_gray(w: int, h: int, ch: int, pixels: bytes) -> bytes:
    """Collapse to single-channel luma — PIL ``convert("L")`` parity:
    ITU-R 601-2 with the same integer truncation (L = (R*299 + G*587 +
    B*114) // 1000). Alpha is ignored, matching PIL."""
    if ch == 1:
        return pixels
    if ch == 2:  # gray+alpha
        return bytes(pixels[::2])
    out = bytearray(w * h)
    for i in range(w * h):
        r, g, b = pixels[ch * i], pixels[ch * i + 1], pixels[ch * i + 2]
        out[i] = (r * 299 + g * 587 + b * 114) // 1000
    return bytes(out)


def _filter_line(ftype: int, line: bytes, prev: bytes, ch: int) -> bytes:
    """Apply (forward) PNG filter ``ftype`` to one scanline — the encoder
    inverse of the decoder's unfilter, kept for all five types so the
    roundtrip property test can drive every decode branch."""
    if ftype == 0:  # r12: None filter copies bytes unchanged — skip the
        return bytes(line)  # per-byte loop (the default encode path)
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        x = line[i]
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (x - pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    body = ctype + payload
    return struct.pack(">I", len(payload)) + body + struct.pack(">I", zlib.crc32(body))


def encode_png_gray(w: int, h: int, pixels: bytes, filter_type: int = 0) -> bytes:
    """Encode 8-bit grayscale pixels as a valid PNG. ``filter_type``
    selects the per-scanline filter (0 by default; 1–4 exist so tests can
    exercise every decoder unfilter branch with real encoded files)."""
    if len(pixels) != w * h:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    prev = bytes(w)
    scan = []
    for y in range(h):
        line = bytes(pixels[y * w : (y + 1) * w])
        scan.append(bytes([filter_type]) + _filter_line(filter_type, line, prev, 1))
        prev = line
    idat = zlib.compress(b"".join(scan), 9)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def thumbnail_gray(
    w: int, h: int, pixels: bytes, max_dim: int = 8
) -> tuple[int, int, bytes]:
    """Aspect-preserving block-average downsample of a grayscale image to
    fit ``max_dim`` (PIL ``thumbnail``-shaped contract: never upscales)."""
    if max(w, h) <= max_dim:
        return w, h, pixels
    scale = max(w, h) / max_dim
    tw, th = max(1, round(w / scale)), max(1, round(h / scale))
    out = bytearray(tw * th)
    for ty in range(th):
        y0, y1 = int(ty * h / th), max(int((ty + 1) * h / th), int(ty * h / th) + 1)
        for tx in range(tw):
            x0, x1 = int(tx * w / tw), max(int((tx + 1) * w / tw), int(tx * w / tw) + 1)
            acc = cnt = 0
            for y in range(y0, y1):
                row = y * w
                for x in range(x0, x1):
                    acc += pixels[row + x]
                    cnt += 1
            out[ty * tw + tx] = acc // cnt
    return tw, th, bytes(out)
