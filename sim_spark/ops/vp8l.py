"""VP8L — lossless WebP bitstream codec (round 14).

WebP is the one genuinely common crawled-image container the
multimodal layer did not cover (VERDICT r13 missing #2). Its lossless
arm, VP8L, is exactly the from-scratch-decodable class the GIF/PNG
work proved out: LSB-first bit packing, canonical prefix (Huffman)
codes transmitted as DEFLATE-style code lengths, LZ77 backward
references with a 2D short-distance neighborhood, an optional color
cache, and four reversible pixel transforms. Everything here follows
the public WebP Lossless Bitstream Specification (RFC 9649 / the
libwebp format docs); no codec library exists in this environment, so
like GIF's LZW both directions are implemented from the spec text and
cross-checked by hand-built known-answer vectors in the tests.

Decoder coverage (the full spec surface):
* simple prefix codes (1 or 2 symbols) and normal codes via the
  19-slot code-length code, including the 16/17/18 repeat codes and
  the optional max_symbol short-circuit;
* LZ77 copies: length/distance prefix coding (24 length + 40 distance
  symbols with extra bits), plane-code→distance mapping through the
  120-entry 2D neighborhood, plain distances past it;
* color cache (hash 0x1e35a7bd, 1..11 bits), inserted on EVERY
  emitted pixel including copied ones;
* meta prefix codes (the "huffman image" selecting per-tile code
  groups) via the same recursive image decode;
* all four transforms, inverted in reverse stream order: PREDICTOR
  (14 modes incl. Select and both ClampAddSubtract forms), COLOR
  (per-tile signed 3.5 fixed-point cross-channel deltas),
  SUBTRACT_GREEN, COLOR_INDEXING (delta-coded palette, including the
  sub-byte pixel bundling used for palettes of ≤16 colors).

Encoder (deliberately spartan, like the PNG/GIF encoders: enough to
produce spec-valid streams whose decode is SQL-oracle-able):
SUBTRACT_GREEN transform, literal coding with per-channel canonical
Huffman codes (simple codes when ≤2 distinct symbols), and run-length
LZ77 (distance 1) emitted through the >120 plain-distance plane codes
so round-trips exercise the copy path.

Typed ValueError on every malformed shape: bad signature or version,
over/under-subscribed (Kraft-incomplete) prefix codes, repeat runs
overflowing the alphabet, LZ77 references before image start or past
image end, cache indices out of range, duplicate transforms, bad
palette or tile indices, truncated bitstreams.
"""

from __future__ import annotations

import heapq

__all__ = ["encode_vp8l", "decode_vp8l"]

_SIG = 0x2F
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
              15)

# The 120-code short-distance neighborhood: plane code i+1 maps to
# (dx, dy) below, distance = dy * xsize + dx (clamped to >= 1); codes
# past 120 are plain distances (spec: "Decoding the distance codes").
_PLANE_OFFSETS = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


# --- bit I/O (LSB-first within each byte, per spec §2) -----------------------


class _BitReader:
    """r15: the stream is one Python int (little-endian, so overall bit
    position p is bit p of the int) — read(n) is a shift+mask instead
    of a per-bit loop with bounds branches; identical LSB-first
    semantics, identical truncation errors (the old reader raised as
    soon as a read crossed the end of the buffer)."""

    __slots__ = ("_acc", "_pos", "_nbits")

    def __init__(self, data: bytes, start: int = 0):
        self._acc = int.from_bytes(data[start:], "little")
        self._pos = 0
        self._nbits = 8 * (len(data) - start)

    def read(self, n: int) -> int:
        pos = self._pos
        if pos + n > self._nbits:
            raise ValueError("truncated VP8L bitstream")
        self._pos = pos + n
        return (self._acc >> pos) & ((1 << n) - 1)

    def read_code_bit(self) -> int:
        """One bit for prefix-code walking (codes are read MSB-first:
        code = (code << 1) | bit, the DEFLATE convention)."""
        pos = self._pos
        if pos >= self._nbits:
            raise ValueError("truncated VP8L bitstream")
        self._pos = pos + 1
        return (self._acc >> pos) & 1


def _rev_bits(code: int, length: int) -> int:
    """MSB-first code -> LSB-first wire bits (write() order)."""
    rev = 0
    for _ in range(length):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    return rev


class _BitWriter:
    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._nbits
        self._nbits += n
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a prefix code MSB-first (mirror of read_code_bit):
        bit-reverse once, then one write() instead of one per bit."""
        rev = 0
        for _ in range(length):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, length)

    def bytes(self) -> bytes:
        out = bytearray(self._out)
        if self._nbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


# --- canonical prefix codes --------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """RFC 1951 canonical assignment: {symbol: (code, length)}."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _Decoder:
    """Bit-by-bit canonical decoder built from code lengths, with the
    Kraft completeness check the spec requires. A single-symbol code
    is accepted as a zero-bit code (the uniform-power-of-two case has
    no two-length encoding, so writers must be able to emit it)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int], what: str):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError(f"empty {what} prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.max_len = 0
            return
        top = max(ln for _, ln in nz)
        kraft = sum((1 << top) >> ln for _, ln in nz)
        if kraft != 1 << top:
            kind = "over" if kraft > (1 << top) else "under"
            raise ValueError(f"{kind}-subscribed {what} prefix code")
        self.single = None
        codes = _canonical_codes(lengths)
        self.max_len = max(ln for _, ln in nz)
        # r15: canonical first-code arrays instead of a (len, code) dict
        # — per decoded bit this is two int compares and, on a hit, one
        # list index, vs a tuple hash + dict probe. Same codes, same
        # accept/reject decisions.
        first = [0] * (self.max_len + 1)
        last = [-1] * (self.max_len + 1)
        syms: list[list[int]] = [[] for _ in range(self.max_len + 1)]
        by_len: dict[int, list[tuple[int, int]]] = {}
        for sym, (code, ln) in codes.items():
            by_len.setdefault(ln, []).append((code, sym))
        for ln, pairs in by_len.items():
            pairs.sort()
            first[ln] = pairs[0][0]
            last[ln] = pairs[-1][0]
            syms[ln] = [s for _, s in pairs]
        self.table = (first, last, syms)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # inlined walk over the reader's big-int accumulator: no method
        # call per bit; truncation raises at exactly the bit where the
        # old per-bit reader would have
        first, last, syms = self.table
        acc, pos, nbits = br._acc, br._pos, br._nbits
        chunk = acc >> pos
        code = 0
        for ln in range(1, self.max_len + 1):
            if pos + ln > nbits:
                raise ValueError("truncated VP8L bitstream")
            code = (code << 1) | (chunk & 1)
            chunk >>= 1
            if first[ln] <= code <= last[ln]:
                br._pos = pos + ln
                return syms[ln][code - first[ln]]
        raise ValueError("invalid prefix code word in VP8L stream")


def _huffman_lengths(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Deterministic Huffman code lengths, depth-limited by clamping
    then repairing the Kraft sum to exactly one."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freqs[s], s, s) for s in syms]  # (weight, tiebreak, node)
    heapq.heapify(heap)
    parent: dict = {}
    serial = 1 << 30
    while len(heap) > 1:
        w1, _, n1 = heapq.heappop(heap)
        w2, _, n2 = heapq.heappop(heap)
        parent[n1] = serial
        parent[n2] = serial
        heapq.heappush(heap, (w1 + w2, serial, serial))
        serial += 1
    lengths = {}
    for s in syms:
        ln, node = 0, s
        while node in parent:
            node = parent[node]
            ln += 1
        lengths[s] = min(ln, limit)
    # repair Kraft to exactly 2^limit units
    unit = 1 << limit
    total = sum(unit >> lengths[s] for s in syms)
    order = sorted(syms, key=lambda s: (freqs[s], s))
    while total > unit:  # over-subscribed: lengthen the rarest
        for s in order:
            if lengths[s] < limit:
                total -= (unit >> lengths[s]) >> 1
                lengths[s] += 1
                break
        else:  # pragma: no cover - cannot happen for |syms| <= 2^limit
            raise ValueError("cannot length-limit prefix code")
    while total < unit:  # under: shorten the largest fitting gap
        gap = unit - total
        best = None
        for s in syms:
            if lengths[s] > 1 and (unit >> lengths[s]) <= gap:
                if best is None or lengths[s] > lengths[best]:
                    best = s
        total += unit >> lengths[best]
        lengths[best] -= 1
    return lengths


# --- shared LZ77 prefix arithmetic (spec: length & distance coding) ----------


def _lz77_read(br: _BitReader, sym: int) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_sym(value: int) -> tuple[int, int, int]:
    """value >= 1 → (symbol, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    extra = x.bit_length() - 2
    sym = 2 * extra + 2 + ((x >> extra) & 1)
    offset = (2 + (sym & 1)) << extra
    return sym, value - offset - 1, extra


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t & 0xFF) * _s8(c & 0xFF)) >> 5


# --- decoder -----------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet: int, what: str) -> _Decoder:
    if br.read(1):  # simple code: 1 or 2 symbols given inline
        n_sym = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet
        if s0 >= alphabet:
            raise ValueError(f"simple-code symbol out of {what} alphabet")
        if n_sym == 2:
            s1 = br.read(8)
            if s1 >= alphabet:
                raise ValueError(
                    f"simple-code symbol out of {what} alphabet"
                )
            if s1 == s0:
                raise ValueError(f"duplicate simple-code symbol in {what}")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        dec = _Decoder.__new__(_Decoder)
        if n_sym == 1:
            dec.single, dec.table, dec.max_len = s0, None, 0
        else:
            # stream order is code order: bit 0 → s0, bit 1 → s1
            dec.single = None
            dec.table = ([0, 0], [-1, 1], [[], [s0, s1]])
            dec.max_len = 1
        return dec
    # normal: code-length code, then RLE-coded symbol lengths
    n_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(n_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Decoder(clc_lengths, f"{what} code-length")
    if br.read(1):  # optional max_symbol short-circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    sym = 0
    prev_len = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = br.read(2) + 3, prev_len
            elif code_len == 17:
                repeat, fill = br.read(3) + 3, 0
            else:
                repeat, fill = br.read(7) + 11, 0
            if sym + repeat > alphabet:
                raise ValueError(
                    f"{what} code-length repeat overflows the alphabet"
                )
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return _Decoder(lengths, what)


def _decode_entropy_image(
    br: _BitReader, xsize: int, ysize: int, allow_meta: bool, what: str
) -> list[int]:
    """The generic spatially-coded ARGB image decode: color cache,
    optional meta prefix codes (level 0 only), 5-code groups, literal
    / LZ77 / cache symbols."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits} invalid")
    meta = None
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _subsample(xsize, meta_bits), _subsample(ysize, meta_bits)
        meta_img = _decode_image_stream(br, mw, mh, False, "meta")
        meta = (meta_bits, mw, meta_img)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta_img) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        tuple(
            _read_prefix_code(br, alphabets[i], f"{what} group{g} code{i}")
            for i in range(5)
        )
        for g in range(n_groups)
    ]
    cache = [0] * cache_size
    n = xsize * ysize
    out = [0] * n
    pos = 0
    x = 0
    group = groups[0]

    def emit(px: int) -> None:
        nonlocal pos
        out[pos] = px
        pos += 1
        if cache_size:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while pos < n:
        if meta is not None:
            mb, mw, mi = meta
            tile = mi[((pos // xsize) >> mb) * mw + (x >> mb)]
            gi = (tile >> 8) & 0xFFFF
            group = groups[gi]
        s = group[0].read(br)
        if s < 256:
            r = group[1].read(br)
            b = group[2].read(br)
            a = group[3].read(br)
            emit((a << 24) | (r << 16) | (s << 8) | b)
            x += 1
            if x == xsize:
                x = 0
        elif s < 280:
            length = _lz77_read(br, s - 256)
            dist_code = _lz77_read(br, group[4].read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _PLANE_OFFSETS[dist_code - 1]
                dist = max(dy * xsize + dx, 1)
            if dist > pos:
                raise ValueError(
                    "VP8L backward reference before image start"
                )
            if pos + length > n:
                raise ValueError("VP8L backward reference past image end")
            for _ in range(length):
                emit(out[pos - dist])
            x = pos % xsize
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            emit(cache[idx])
            x += 1
            if x == xsize:
                x = 0
    return out


def _inv_predictor(argb: list[int], xsize: int, ysize: int,
                   bits: int, tiles: list[int]) -> None:
    tw = _subsample(xsize, bits)

    def avg2(a: int, b: int) -> int:
        return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF

    def clip_add_full(a: int, b: int, c: int) -> int:
        px = 0
        for sh in (0, 8, 16, 24):
            v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
            px |= max(0, min(255, v)) << sh
        return px

    def clip_add_half(ave: int, c: int) -> int:
        px = 0
        for sh in (0, 8, 16, 24):
            av = (ave >> sh) & 0xFF
            d = av - ((c >> sh) & 0xFF)
            # C truncating division: int(d / 2) rounds toward zero
            v = av + (d // 2 if d >= 0 else -((-d) // 2))
            px |= max(0, min(255, v)) << sh
        return px

    def select(t: int, l, tl: int) -> int:
        pa = pb = 0
        for sh in (0, 8, 16, 24):
            p = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            pa += abs(p - ((l >> sh) & 0xFF))
            pb += abs(p - ((t >> sh) & 0xFF))
        return l if pa <= pb else t

    for pos in range(xsize * ysize):
        x, y = pos % xsize, pos // xsize
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = argb[pos - 1]
        elif x == 0:
            pred = argb[pos - xsize]
        else:
            mode = (tiles[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
            L = argb[pos - 1]
            T = argb[pos - xsize]
            TL = argb[pos - xsize - 1]
            TR = argb[pos - xsize + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = avg2(avg2(L, TR), T)
            elif mode == 6:
                pred = avg2(L, TL)
            elif mode == 7:
                pred = avg2(L, T)
            elif mode == 8:
                pred = avg2(TL, T)
            elif mode == 9:
                pred = avg2(T, TR)
            elif mode == 10:
                pred = avg2(avg2(L, TL), avg2(T, TR))
            elif mode == 11:
                pred = select(T, L, TL)
            elif mode == 12:
                pred = clip_add_full(L, T, TL)
            elif mode == 13:
                pred = clip_add_half(avg2(L, T), TL)
            else:
                raise ValueError(f"VP8L predictor mode {mode} invalid")
        px = argb[pos]
        out = 0
        for sh in (0, 8, 16, 24):
            out |= ((((px >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF) << sh
        argb[pos] = out


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, level0: bool, what: str
) -> list[int]:
    orig_xsize = xsize
    transforms = []
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(t)
            if t in (0, 1):  # predictor / color: per-tile sub-image
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _subsample(xsize, bits), _subsample(ysize, bits),
                    False, "transform",
                )
                transforms.append((t, bits, sub))
            elif t == 2:
                transforms.append((2, None, None))
            else:  # color indexing: delta-coded palette + bundling
                psize = br.read(8) + 1
                deltas = _decode_image_stream(br, psize, 1, False, "palette")
                palette = []
                prev = 0
                for d in deltas:
                    px = 0
                    for sh in (0, 8, 16, 24):
                        px |= ((((d >> sh) & 0xFF) + ((prev >> sh) & 0xFF))
                               & 0xFF) << sh
                    palette.append(px)
                    prev = px
                wbits = (3 if psize <= 2 else 2 if psize <= 4
                         else 1 if psize <= 16 else 0)
                transforms.append((3, wbits, palette))
                xsize = _subsample(xsize, wbits)
    argb = _decode_entropy_image(br, xsize, ysize, level0, what)
    for t, arg, data in reversed(transforms):
        if t == 0:
            _inv_predictor(argb, xsize, ysize, arg, data)
        elif t == 1:
            tw = _subsample(xsize, arg)
            for pos in range(xsize * ysize):
                x, y = pos % xsize, pos // xsize
                tile = data[(y >> arg) * tw + (x >> arg)]
                g2r, g2b, r2b = tile & 0xFF, (tile >> 8) & 0xFF, (
                    tile >> 16) & 0xFF
                px = argb[pos]
                g = px >> 8
                red = ((px >> 16) + _ct_delta(g2r, g)) & 0xFF
                blue = (px + _ct_delta(g2b, g) + _ct_delta(r2b, red)) & 0xFF
                argb[pos] = (px & 0xFF00FF00) | (red << 16) | blue
        elif t == 2:
            for pos, px in enumerate(argb):
                g = (px >> 8) & 0xFF
                red = (((px >> 16) & 0xFF) + g) & 0xFF
                blue = ((px & 0xFF) + g) & 0xFF
                argb[pos] = (px & 0xFF00FF00) | (red << 16) | blue
        else:  # color indexing: unbundle + palette lookup
            wbits, palette = arg, data
            bpp = 8 >> wbits
            packed_w = xsize
            out = [0] * (orig_xsize * ysize)
            for y in range(ysize):
                for x in range(orig_xsize):
                    packed = argb[y * packed_w + (x >> wbits)]
                    idx = ((packed >> 8) >> (
                        (x & ((1 << wbits) - 1)) * bpp)) & ((1 << bpp) - 1)
                    # out-of-range palette index decodes to transparent
                    # black per the spec, not an error
                    out[y * orig_xsize + x] = (
                        palette[idx] if idx < len(palette) else 0
                    )
            argb = out
            xsize = orig_xsize
    return argb


def decode_vp8l(payload: bytes) -> dict:
    """Decode a VP8L chunk payload → {"width", "height", "rgb"
    (bytes, w*h*3), "alpha" (bytes, w*h), "alpha_hint"}."""
    if len(payload) < 5:
        raise ValueError("truncated VP8L payload")
    if payload[0] != _SIG:
        raise ValueError(
            f"bad VP8L signature byte 0x{payload[0]:02x} (expected 0x2f)"
        )
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    argb = _decode_image_stream(br, w, h, True, "main")
    rgb = bytearray(w * h * 3)
    alpha = bytearray(w * h)
    for i, px in enumerate(argb):
        rgb[3 * i] = (px >> 16) & 0xFF
        rgb[3 * i + 1] = (px >> 8) & 0xFF
        rgb[3 * i + 2] = px & 0xFF
        alpha[i] = (px >> 24) & 0xFF
    return dict(
        width=w, height=h, rgb=bytes(rgb), alpha=bytes(alpha),
        alpha_hint=alpha_hint,
    )


# --- encoder -----------------------------------------------------------------


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int],
                       alphabet: int) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code description; returns {sym: (code, len)}."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 < 2 and len(syms) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {s0: (0, 1), syms[1]: (1, 1)}
        return {s0: (0, 0)}
    bw.write(0, 1)  # normal
    full = [0] * alphabet
    for s, ln in lengths.items():
        full[s] = ln
    clc_freq: dict[int, int] = {}
    for ln in full:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = (_huffman_lengths(clc_freq, 7)
                   if len(clc_freq) > 1 else {next(iter(clc_freq)): 1})
    n_clc = 4
    for i in range(19):
        if clc_lengths.get(_CLC_ORDER[i], 0):
            n_clc = max(n_clc, i + 1)
    bw.write(n_clc - 4, 4)
    for i in range(n_clc):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol short-circuit: emit every length
    if len(clc_lengths) > 1:
        clc_codes = _canonical_codes(
            [clc_lengths.get(i, 0) for i in range(19)]
        )
    else:
        # a single-symbol code-length code reads zero bits per length
        # (the uniform-power-of-two alphabet case), mirroring the
        # decoder's zero-bit single-symbol handling
        clc_codes = {next(iter(clc_lengths)): (0, 0)}
    # r15: pre-reverse every code once so the emit loops are a plain
    # LSB-first write() per symbol instead of a per-call bit reversal
    # (write_code) — same bits on the wire.
    clc_rev = {s: (_rev_bits(c, b), b) for s, (c, b) in clc_codes.items()}
    for ln in full:
        code, bits = clc_rev[ln]
        bw.write(code, bits)
    return _canonical_codes(full)


def encode_vp8l(
    width: int,
    height: int,
    rgb: bytes,
    subtract_green: bool = True,
    lz77: bool = True,
) -> bytes:
    """Encode opaque RGB pixels as a spec-valid VP8L payload:
    optional SUBTRACT_GREEN transform, canonical-Huffman literals,
    and run-length LZ77 (distance 1, emitted through the plain
    plane codes > 120) when ``lz77`` is set."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}*{height}*3"
        )
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("VP8L dimensions out of the 14-bit range")
    pixels = []
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        if subtract_green:
            r, b = (r - g) & 0xFF, (b - g) & 0xFF
        pixels.append((0xFF << 24) | (r << 16) | (g << 8) | b)

    # tokenize: literals + distance-1 runs (min profitable length 3)
    tokens: list[tuple] = []
    i = 0
    n = len(pixels)
    while i < n:
        if lz77 and i > 0 and pixels[i] == pixels[i - 1]:
            run = 1
            while i + run < n and pixels[i + run] == pixels[i - 1]:
                run += 1
            if run >= 3:
                run = min(run, 4096)  # length symbol 23 tops out here
                tokens.append(("copy", run))
                i += run
                continue
        tokens.append(("lit", pixels[i]))
        i += 1

    g_freq: dict[int, int] = {}
    r_freq: dict[int, int] = {}
    b_freq: dict[int, int] = {}
    a_freq: dict[int, int] = {}
    d_freq: dict[int, int] = {}
    dist_sym, _, _ = _lz77_sym(121)  # distance 1 → plane code 121
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            g_freq[(px >> 8) & 0xFF] = g_freq.get((px >> 8) & 0xFF, 0) + 1
            r_freq[(px >> 16) & 0xFF] = r_freq.get((px >> 16) & 0xFF, 0) + 1
            b_freq[px & 0xFF] = b_freq.get(px & 0xFF, 0) + 1
            a_freq[(px >> 24) & 0xFF] = a_freq.get((px >> 24) & 0xFF, 0) + 1
        else:
            ls, _, _ = _lz77_sym(tok[1])
            g_freq[256 + ls] = g_freq.get(256 + ls, 0) + 1
            d_freq[dist_sym] = d_freq.get(dist_sym, 0) + 1
    if not d_freq:
        d_freq[0] = 1  # unused code still needs a valid description
    for f in (r_freq, b_freq, a_freq):
        if not f:
            f[0] = 1

    def lens(freq: dict[int, int]) -> dict[int, int]:
        return (_huffman_lengths(freq, 15) if len(freq) > 1
                else {next(iter(freq)): 1})

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)  # alpha hint: opaque
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN carries no payload
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    def _rev_all(codes: dict) -> dict:
        # r15: pre-reverse each symbol's code once so the per-pixel emit
        # below is a single LSB-first write() (write_code reversed per
        # call); _write_prefix_code's returned codes stay MSB-first.
        return {s: (_rev_bits(c, ln), ln) for s, (c, ln) in codes.items()}

    g_codes = _rev_all(_write_prefix_code(bw, lens(g_freq), 280))
    r_codes = _rev_all(_write_prefix_code(bw, lens(r_freq), 256))
    b_codes = _rev_all(_write_prefix_code(bw, lens(b_freq), 256))
    a_codes = _rev_all(_write_prefix_code(bw, lens(a_freq), 256))
    d_codes = _rev_all(_write_prefix_code(bw, lens(d_freq), 40))
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            bw.write(*g_codes[(px >> 8) & 0xFF])
            bw.write(*r_codes[(px >> 16) & 0xFF])
            bw.write(*b_codes[px & 0xFF])
            bw.write(*a_codes[(px >> 24) & 0xFF])
        else:
            ls, lv, lb = _lz77_sym(tok[1])
            bw.write(*g_codes[256 + ls])
            if lb:
                bw.write(lv, lb)
            ds, dv, db = _lz77_sym(121)
            bw.write(*d_codes[ds])
            if db:
                bw.write(dv, db)
    return bytes([_SIG]) + bw.bytes()
