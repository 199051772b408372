"""GIF89a codec — dependency-free encoder + decoder (round 12).

GIF is the last common crawled-image container the multimodal layer did
not cover (BMP/PNG/JPEG landed in r5-r12). Unlike JPEG it is fully
LOSSLESS: LZW over palette indices, so a from-scratch encoder/decoder
pair sits under the same exact integer hash oracle as the PNG keys —
any bug in the variable-width LZW code stream, the sub-block framing,
the 4-pass interlace reorder, or the transparency plumbing breaks the
doc-level pixel sums.

Implemented from the GIF89a specification (public, CompuServe 1990):
  - header + logical screen descriptor + global color table
    (power-of-two padded, as the spec requires),
  - graphic control extension (transparency index),
  - image descriptor with optional 4-pass interlace (rows 0/8, 4/8,
    2/4, 1/2),
  - LZW with variable code width 3..12 bits LSB-first, CLEAR/EOI
    codes, table growth to 4096 entries and CLEAR-on-full, packed in
    255-byte sub-blocks.

Decode is typed on untrusted bytes: every malformed shape (truncated
sub-block chain, code beyond the table, missing trailer, index outside
the color table) raises ValueError — never IndexError/struct.error and
never an assert that ``-O`` strips.
"""

from __future__ import annotations

import struct

GIF_SIG = (b"GIF87a", b"GIF89a")

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096

# interlace pass grid: (first row, row step) per GIF89a appendix E
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_row_order(height: int) -> list[int]:
    """Source-row order in which an interlaced stream stores rows."""
    return [r for y0, dy in _GIF_INTERLACE for r in range(y0, height, dy)]


# --- LZW ---------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF's bit order, the reverse of JPEG's)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def finish(self) -> bytes:
        if self._n:
            self._out.append(self._acc & 0xFF)
        return bytes(self._out)


class _BitReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, width: int) -> int:
        while self._n < width:
            if self._pos >= len(self._data):
                raise ValueError("truncated GIF LZW stream")
            self._acc |= self._data[self._pos] << self._n
            self._pos += 1
            self._n += 8
        code = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._n -= width
        return code


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, then codes at a width that grows
    with the dictionary (encoder runs one entry AHEAD of the decoder,
    so the width bump fires at ``next_code == (1 << width) + 1``), a
    CLEAR + reset when the table hits 4096, and a final EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    w.write(clear, width)
    if not indices:
        w.write(eoi, width)
        return w.finish()
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    cur = bytes([indices[0]])
    for k in indices[1:]:
        ext = cur + bytes([k])
        if ext in table:
            cur = ext
            continue
        w.write(table[cur], width)
        table[ext] = next_code
        next_code += 1
        # the DECODER adds its mirror entry before reading the next
        # code, reaching 2^width exactly when we reach 2^width + 1
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code > _TABLE_LIMIT:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([k])
    w.write(table[cur], width)
    # the decoder still adds a mirror entry after the FINAL data code,
    # and may bump its width before reading EOI — mirror that phantom
    # add or the EOI is written one bit narrower than it is read
    next_code += 1
    if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
        width += 1
    w.write(eoi, width)
    return w.finish()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Decode exactly ``n_expected`` indices; typed errors on corrupt
    streams (code beyond table, missing EOI, over/underrun)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if not table:
            raise ValueError("GIF LZW data before first CLEAR code")
        if prev is None:
            if code >= clear:
                raise ValueError(f"GIF LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW code {code} beyond table ({len(table)})")
        out += entry
        if len(out) > n_expected:
            raise ValueError("GIF LZW stream yields more pixels than the image")
        if prev is not None and len(table) < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"GIF LZW stream ended at {len(out)} of {n_expected} pixels"
        )
    return bytes(out)


# --- container ---------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]],
    transparent: int | None = None,
    interlace: bool = False,
) -> bytes:
    """GIF89a with a global color table. ``indices`` are row-major
    TOP-DOWN palette indices; with ``interlace`` the rows are stored in
    4-pass order. ``transparent`` emits a graphic control extension
    naming that palette entry fully transparent."""
    n_pal = len(palette)
    if not (indices and 1 <= n_pal <= 256 and max(indices) < n_pal):
        raise ValueError("bad GIF encode inputs")
    # global color table is power-of-two sized, min 2 entries
    gct_bits = 1
    while (1 << gct_bits) < n_pal:
        gct_bits += 1
    gct_n = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((gct_bits - 1) & 0x07) | (7 << 4))  # GCT flag + size
    out += b"\x00\x00"  # background index, aspect ratio
    for e in range(gct_n):
        out += bytes(palette[e]) if e < n_pal else b"\x00\x00\x00"
    if transparent is not None:
        if not 0 <= transparent < n_pal:
            raise ValueError("transparent index outside the palette")
        out += b"\x21\xf9\x04"
        out.append(0x01)  # packed: transparency flag, disposal 0
        out += b"\x00\x00"  # delay
        out.append(transparent)
        out.append(0)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out.append(0x40 if interlace else 0x00)  # no local table
    if interlace:
        rows = _interlace_row_order(height)
        stored = b"".join(
            indices[r * width : (r + 1) * width] for r in rows
        )
    else:
        stored = indices
    mcs = max(2, gct_bits)
    out.append(mcs)
    out += _sub_blocks(lzw_encode(stored, mcs))
    out.append(0x3B)
    return bytes(out)


def _parse_gif(payload: bytes) -> tuple[int, int, bytes, int | None, bytes]:
    """Shared parse → (width, height, indices, transparent, color_table)."""
    if payload[:6] not in GIF_SIG:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        if pos + 3 * gct_n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = payload[pos : pos + 3 * gct_n]
        pos += 3 * gct_n
    transparent: int | None = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF missing image descriptor")
        b = payload[pos]
        pos += 1
        if b == 0x3B:
            raise ValueError("GIF trailer before any image data")
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            blocks = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension blocks")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(payload):
                    raise ValueError("truncated GIF extension block")
                blocks += payload[pos : pos + n]
                pos += n
            if label == 0xF9 and len(blocks) >= 4 and blocks[0] & 0x01:
                transparent = blocks[3]
            continue
        if b == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left, top, width, height = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            break
        raise ValueError(f"unexpected GIF block 0x{b:02X}")
    if width == 0 or height == 0:
        raise ValueError("empty GIF image")
    table = gct
    if ipacked & 0x80:  # local color table overrides
        lct_n = 2 << (ipacked & 0x07)
        if pos + 3 * lct_n > len(payload):
            raise ValueError("truncated GIF local color table")
        table = payload[pos : pos + 3 * lct_n]
        pos += 3 * lct_n
    if table is None:
        raise ValueError("GIF image has no color table")
    interlaced = bool(ipacked & 0x40)
    if pos >= len(payload):
        raise ValueError("GIF missing LZW min code size")
    mcs = payload[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF image sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(payload):
            raise ValueError("truncated GIF image sub-block")
        lzw += payload[pos : pos + n]
        pos += n
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("GIF missing trailer")
    stored = lzw_decode(bytes(lzw), mcs, width * height)
    if interlaced:
        img = bytearray(width * height)
        for stored_i, r in enumerate(_interlace_row_order(height)):
            img[r * width : (r + 1) * width] = stored[
                stored_i * width : (stored_i + 1) * width
            ]
        stored = bytes(img)
    n_entries = len(table) // 3
    if max(stored) >= n_entries:
        raise ValueError("GIF pixel index outside the color table")
    return width, height, stored, transparent, bytes(table)


def decode_gif(payload: bytes) -> tuple[int, int, bytes, int | None]:
    """Parse a single-frame GIF87a/89a → (width, height, pixels,
    transparent_index). ``pixels`` is row-major TOP-DOWN RGB bytes
    (3/pixel) after palette expansion and interlace reorder; the
    transparency index from a graphic control extension is returned so
    callers can derive per-pixel alpha. Typed ValueError on every
    malformed shape."""
    import numpy as np

    width, height, stored, transparent, table = _parse_gif(payload)
    pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
    idx = np.frombuffer(stored, dtype=np.uint8)
    return width, height, pal[idx].tobytes(), transparent


def decode_gif_indices(payload: bytes) -> tuple[int, int, bytes, int | None]:
    """Like :func:`decode_gif` but returns raw palette indices (needed
    for per-pixel alpha against the transparency index — the RGB
    expansion is lossy when palette entries collide)."""
    w, h, stored, transparent, _table = _parse_gif(payload)
    return w, h, stored, transparent
