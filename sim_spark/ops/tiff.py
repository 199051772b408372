"""Baseline TIFF codec — dependency-free encoder + decoder (round 12).

Scanned-document corpora ship TIFF; what a pipeline needs is the
container walk (endian-tagged IFD entries, strip layout) and the two
classic baseline compressions: PackBits (RLE, TIFF 6.0 §9) and TIFF
LZW (§13 — MSB-first code packing with the EARLY-CHANGE width bump,
both deliberately different from GIF's LSB-first/late-change variant,
which ops/gif.py implements; having both under one oracle pins the
variant distinction).

Scope: single-IFD baseline grayscale (1 sample/px) or RGB (3), 8-bit,
little- or big-endian containers, multi-strip, compression 1 (none) /
5 (LZW) / 32773 (PackBits). Typed ValueError on every malformed shape.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_tiff",
    "decode_tiff",
    "packbits_encode",
    "packbits_decode",
    "tiff_lzw_encode",
    "tiff_lzw_decode",
]

# IFD tag ids (TIFF 6.0)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP = 273, 277
_T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 278, 279


# --- PackBits (TIFF 6.0 section 9) -------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: literal runs and >=3-byte repeats."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(data[i])
            i = j
            continue
        # literal: extend until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < n_expected:
        if i >= n:
            raise ValueError("truncated PackBits stream")
        c = data[i]
        i += 1
        if c < 128:  # literal of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    if len(out) != n_expected or i != n:
        raise ValueError("PackBits length mismatch")
    return bytes(out)


# --- TIFF LZW (6.0 section 13): MSB-first, EARLY-CHANGE ----------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


class _MsbWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc = (self._acc << width) | code
        self._n += width
        while self._n >= 8:
            self._out.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def finish(self) -> bytes:
        if self._n:
            self._out.append((self._acc << (8 - self._n)) & 0xFF)
        return bytes(self._out)


class _MsbReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read(self, width: int) -> int:
        while self._n < width:
            if self._pos >= len(self._data):
                raise ValueError("truncated TIFF LZW stream")
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._n += 8
        v = (self._acc >> (self._n - width)) & ((1 << width) - 1)
        self._n -= width
        self._acc &= (1 << self._n) - 1
        return v


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: 8-bit alphabet, CLEAR=256, EOI=257, MSB-first
    packing, and the EARLY width change — the width bumps when the next
    code to be ADDED is 2^w - 1 (one step before GIF's rule), table
    reset at 4094."""
    w = _MsbWriter()
    width = 9
    w.write(_LZW_CLEAR, width)
    if not data:
        w.write(_LZW_EOI, width)
        return w.finish()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _LZW_EOI + 1
    cur = bytes([data[0]])
    for b in data[1:]:
        ext = cur + bytes([b])
        if ext in table:
            cur = ext
            continue
        w.write(table[cur], width)
        table[ext] = next_code
        next_code += 1
        # EARLY CHANGE: the decoder widens when ITS table (one entry
        # behind ours) reaches 2^w - 1, i.e. when our next_code reaches
        # 2^w — one step before GIF's rule
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # spec: reset before the table fills
            w.write(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _LZW_EOI + 1
            width = 9
        cur = bytes([b])
    w.write(table[cur], width)
    # the decoder adds a mirror entry after the FINAL data code and may
    # widen before reading EOI — phantom-add to keep EOI's width synced
    next_code += 1
    if next_code == (1 << width) and width < 12:
        width += 1
    w.write(_LZW_EOI, width)
    return w.finish()


def tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    r = _MsbReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if not table:
            raise ValueError("TIFF LZW data before first CLEAR")
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"TIFF LZW code {code} beyond table")
        out += entry
        if len(out) > n_expected:
            raise ValueError("TIFF LZW yields more bytes than expected")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY CHANGE: decoder widens one entry sooner than GIF
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(
            f"TIFF LZW ended at {len(out)} of {n_expected} bytes"
        )
    return bytes(out)


# --- container ----------------------------------------------------------------


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Single-IFD baseline TIFF: 8-bit gray (1ch) or RGB (3ch),
    compression 1/5/32773, multi-strip, either byte order."""
    if channels not in (1, 3) or compression not in (1, 5, 32773):
        raise ValueError("unsupported TIFF encode shape")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    e = ">" if big_endian else "<"
    if rows_per_strip is None:
        rows_per_strip = max(1, height // 3)
    row_bytes = width * channels
    strips_raw = [
        pixels[r * row_bytes : min(r + rows_per_strip, height) * row_bytes]
        for r in range(0, height, rows_per_strip)
    ]
    comp = {
        1: lambda b: b,
        5: tiff_lzw_encode,
        32773: packbits_encode,
    }[compression]
    strips = [comp(s) for s in strips_raw]

    n_tags = 9
    # layout: header(8) | IFD | [bits array][offsets arrays] | strip data
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    arrays_off = ifd_off + ifd_size
    n_strips = len(strips)
    need_arrays = n_strips > 1
    # RGB BitsPerSample (count=3 SHORT = 6 bytes) exceeds the 4-byte IFD
    # value field, so TIFF 6.0 requires it OUT-OF-LINE at a real offset
    # (r12 packed two 8s inline, which libtiff would read as an offset —
    # ADVICE r12). 6 bytes keeps the later arrays word-aligned.
    bits_arr_off = arrays_off
    after_bits = arrays_off + (6 if channels == 3 else 0)
    offsets_arr_off = after_bits
    counts_arr_off = after_bits + (4 * n_strips if need_arrays else 0)
    data_off = counts_arr_off + (4 * n_strips if need_arrays else 0)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    def tag(tid: int, ttype: int, count: int, value: int) -> bytes:
        if ttype == 3 and count == 1:  # SHORT packed left-justified
            return struct.pack(e + "HHI", tid, ttype, count) + struct.pack(
                e + "HH", value, 0
            )
        return struct.pack(e + "HHII", tid, ttype, count, value)

    tags = [
        tag(_T_WIDTH, 3, 1, width),
        tag(_T_HEIGHT, 3, 1, height),
        tag(_T_BITS, 3, 1, 8) if channels == 1 else
        struct.pack(e + "HHII", _T_BITS, 3, 3, bits_arr_off),
        tag(_T_COMPRESSION, 3, 1, compression),
        tag(_T_PHOTOMETRIC, 3, 1, 1 if channels == 1 else 2),
        tag(_T_STRIP_OFFSETS, 4, n_strips,
            offsets[0] if not need_arrays else offsets_arr_off),
        tag(_T_SPP, 3, 1, channels),
        tag(_T_ROWS_PER_STRIP, 3, 1, rows_per_strip),
        tag(_T_STRIP_COUNTS, 4, n_strips,
            len(strips[0]) if not need_arrays else counts_arr_off),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n_tags)
    for t in tags:
        out += t
    out += struct.pack(e + "I", 0)  # next IFD
    if channels == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)  # out-of-line BitsPerSample
    if need_arrays:
        for o in offsets:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a baseline TIFF → (width, height, channels, pixels)
    row-major TOP-DOWN, one byte per sample."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (magic,) = struct.unpack_from(e + "H", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic number")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_tags,) = struct.unpack_from(e + "H", payload, ifd_off)
    if ifd_off + 2 + n_tags * 12 + 4 > len(payload):
        raise ValueError("truncated TIFF IFD")
    fields: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + i * 12
        tid, ttype, count = struct.unpack_from(e + "HHI", payload, base)
        if ttype == 3 and count == 1:
            (value,) = struct.unpack_from(e + "H", payload, base + 8)
        else:
            (value,) = struct.unpack_from(e + "I", payload, base + 8)
        fields[tid] = (ttype, count, value)

    def req(tid: int, default: int | None = None) -> tuple[int, int, int]:
        if tid not in fields:
            if default is not None:
                return (3, 1, default)
            raise ValueError(f"TIFF missing required tag {tid}")
        return fields[tid]

    width = req(_T_WIDTH)[2]
    height = req(_T_HEIGHT)[2]
    channels = req(_T_SPP, 1)[2]
    compression = req(_T_COMPRESSION, 1)[2]
    photometric = req(_T_PHOTOMETRIC)[2]
    if channels not in (1, 3) or photometric not in (0, 1, 2):
        raise ValueError(
            f"unsupported TIFF: spp={channels} photometric={photometric}"
        )
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    bits = req(_T_BITS, 8)
    rows_per_strip = req(_T_ROWS_PER_STRIP, height)[2]
    so_t, so_n, so_v = req(_T_STRIP_OFFSETS)
    sc_t, sc_n, sc_v = req(_T_STRIP_COUNTS)
    if so_n != sc_n:
        raise ValueError("strip offsets/counts length mismatch")

    def arr(ttype: int, count: int, value: int) -> list[int]:
        if count == 1:
            return [value]
        width_b = 2 if ttype == 3 else 4
        if value + count * width_b > len(payload):
            raise ValueError("truncated TIFF strip array")
        fmt = e + ("H" if ttype == 3 else "I") * count
        return list(struct.unpack_from(fmt, payload, value))

    # BitsPerSample: count 1 is inline; count > 1 exceeds the 4-byte IFD
    # value field, so per TIFF 6.0 the value IS an offset to a SHORT
    # array — follow it (ADVICE r12: r11/r12 packed pairs inline, which
    # spec-correct readers misparse).
    if bits[1] not in (1, channels):
        raise ValueError("unsupported BitsPerSample layout")
    if any(b != 8 for b in arr(bits[0], bits[1], bits[2])):
        raise ValueError("only 8-bit TIFF supported")
    offsets = arr(so_t, so_n, so_v)
    counts = arr(sc_t, sc_n, sc_v)
    row_bytes = width * channels
    out = bytearray()
    decomp = {
        1: lambda b, n: b if len(b) == n else (_ for _ in ()).throw(
            ValueError("uncompressed strip length mismatch")
        ),
        5: tiff_lzw_decode,
        32773: packbits_decode,
    }[compression]
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip overruns payload")
        first_row = si * rows_per_strip
        n_rows = min(rows_per_strip, height - first_row)
        if n_rows <= 0:
            raise ValueError("more strips than rows")
        out += decomp(payload[off : off + cnt], n_rows * row_bytes)
    if len(out) != height * row_bytes:
        raise ValueError("TIFF pixel payload length mismatch")
    return width, height, channels, bytes(out)
