"""Unit tests for the WebP container + VP8L codec (ops/webp.py,
ops/vp8l.py, round 14).

The query-level hash oracles (multimodal_webp_container_walk,
multimodal_webp_vp8l_decode) pin the end-to-end pipeline over the
encoder-emitted subset (literals, SUBTRACT_GREEN, distance-1 LZ77
runs). These tests pin everything a coarse aggregate could cancel out
of, and — critically — the DECODE-ONLY paths the spartan encoder
never emits, via hand-built bitstreams written with the module's own
bit writer: color cache, meta prefix codes (two code groups selected
by the huffman image), the predictor transform, the color (cross
channel) transform, color-indexing with sub-byte bundling, the
max_symbol short-circuit, and the 2D plane-code distance
neighborhood. Typed-ValueError coverage mirrors the other codecs:
Kraft over/under-subscription, repeat overflow, out-of-range cache
index and references, RIFF framing corruption.
"""

from __future__ import annotations

import random
import struct

import pytest

from sim_spark.ops.vp8l import (
    _SIG,
    _BitReader,
    _BitWriter,
    _Decoder,
    _lz77_read,
    _lz77_sym,
    _write_prefix_code,
    decode_vp8l,
    encode_vp8l,
)
from sim_spark.ops.webp import encode_webp, parse_webp


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _emit_codes(bw: _BitWriter, g_syms, r_syms, b_syms, a_syms, d_syms,
                cache_size=0):
    """Write the 5-code group from symbol->freq dicts; returns the 5
    canonical code maps."""
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    out = []
    for syms, alpha in zip((g_syms, r_syms, b_syms, a_syms, d_syms),
                           alphabets):
        freq = dict(syms) if syms else {0: 1}
        if len(freq) == 1:
            lengths = {next(iter(freq)): 1}
        else:
            # equal-ish lengths are fine for tests: power-of-two pad
            n = 1
            while (1 << n) < len(freq):
                n += 1
            lengths = {}
            # make Kraft-exact: first (2^n - len) symbols get n bits is
            # wrong; use canonical trick: give everything n bits, then
            # shorten from the front while the sum is under 1.
            for s in sorted(freq):
                lengths[s] = n
            unit = 1 << 15
            total = sum(unit >> ln for ln in lengths.values())
            for s in sorted(lengths):
                while total < unit and lengths[s] > 1 and (
                        total + (unit >> lengths[s])) <= unit:
                    total += unit >> lengths[s]
                    lengths[s] -= 1
        out.append(_write_prefix_code(bw, lengths, alpha))
    return out


def _write_sym(bw, codes, sym, what="sym"):
    code, ln = codes[sym]
    bw.write_code(code, ln)


# --- round-trips over the encoder-emitted subset -----------------------------


def test_vp8l_roundtrip_property():
    rng = random.Random(14)
    for trial in range(30):
        w, h = rng.randint(1, 33), rng.randint(1, 21)
        kind = trial % 3
        if kind == 0:  # random full-entropy
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        elif kind == 1:  # small palette -> long runs
            pal = [bytes(rng.randrange(256) for _ in range(3))
                   for _ in range(rng.choice([1, 2, 5]))]
            rgb = b"".join(pal[rng.randrange(len(pal))]
                           for _ in range(w * h))
        else:  # gradient
            rgb = bytes((r * 3 + c * 7 + ch) % 256
                        for r in range(h) for c in range(w)
                        for ch in range(3))
        for sg in (True, False):
            for lz in (True, False):
                d = decode_vp8l(encode_vp8l(w, h, rgb,
                                            subtract_green=sg, lz77=lz))
                assert (d["width"], d["height"]) == (w, h)
                assert d["rgb"] == rgb
                assert d["alpha"] == b"\xff" * (w * h)


def test_vp8l_edge_dims():
    for w, h in [(1, 1), (1, 17), (17, 1), (64, 1), (1, 64)]:
        rgb = bytes((5 * i) % 256 for i in range(w * h * 3))
        d = decode_vp8l(encode_vp8l(w, h, rgb))
        assert d["rgb"] == rgb
    with pytest.raises(ValueError, match="dimension"):
        encode_vp8l(0, 1, b"")
    with pytest.raises(ValueError, match="dimension"):
        encode_vp8l((1 << 14) + 1, 1, b"\0" * (((1 << 14) + 1) * 3))
    with pytest.raises(ValueError, match="rgb length"):
        encode_vp8l(2, 2, b"\0" * 11)


def test_vp8l_long_run_crosses_length_cap():
    """A 5000-px solid image needs multiple max-length (4096) copies."""
    w, h = 100, 50
    rgb = b"\x12\x34\x56" * (w * h)
    payload = encode_vp8l(w, h, rgb)
    d = decode_vp8l(payload)
    assert d["rgb"] == rgb
    assert len(payload) < 200  # run-length coding actually engaged


def test_lz77_sym_inverse_property():
    br_probe = []
    for v in list(range(1, 70)) + [120, 121, 1000, 4096]:
        sym, extra_val, extra_bits = _lz77_sym(v)
        bw = _BitWriter()
        bw.write(extra_val, extra_bits)
        br = _BitReader(bw.bytes() + b"\x00")
        assert _lz77_read(br, sym) == v
        br_probe.append(sym)
    assert max(br_probe) <= 39


# --- hand-built vectors for decode-only paths --------------------------------


def test_decode_color_cache():
    """Literal then cache-hit: the cache must be populated on every
    emitted pixel and indexed by the 0x1e35a7bd multiplicative hash."""
    cache_bits = 4
    px = _argb(0xFF, 0x12, 0x34, 0x56)
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix codes
    codes = _emit_codes(
        bw,
        {0x34: 1, 280 + idx: 1},
        {0x12: 1}, {0x56: 1}, {0xFF: 1}, {0: 1},
        cache_size=1 << cache_bits,
    )
    g, r, b, a, dcode = codes
    _write_sym(bw, g, 0x34)   # literal: g
    _write_sym(bw, r, 0x12)
    _write_sym(bw, b, 0x56)
    _write_sym(bw, a, 0xFF)
    _write_sym(bw, g, 280 + idx)  # cache hit -> same pixel
    data = bytes([_SIG]) + bw.bytes()
    d = decode_vp8l(data)
    assert d["rgb"] == bytes([0x12, 0x34, 0x56]) * 2
    assert d["alpha"] == b"\xff\xff"


def test_decode_cache_untouched_slot_is_zero():
    """A cache symbol hitting a never-populated slot decodes to the
    all-zero pixel (the cache initializes to zero, not an error —
    out-of-range indices are structurally impossible because the green
    alphabet is exactly 280 + cache_size)."""
    cache_bits = 1
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    codes = _emit_codes(bw, {281: 1}, {0: 1}, {0: 1}, {0: 1}, {0: 1},
                        cache_size=2)
    _write_sym(bw, codes[0], 281)  # cache idx 1, never written
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    assert d["rgb"] == b"\x00\x00\x00"
    assert d["alpha"] == b"\x00"


def test_decode_meta_prefix_two_groups():
    """8x1 image, meta_bits=2 -> two tiles; tile 0 uses group 0 (red
    0xAA), tile 1 group 1 (red 0xBB). The huffman image's green
    channel carries the group index."""
    w, h = 8, 1
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(0, 3)  # meta_bits = 2 -> tiles of 4 px
    # meta image: 2x1 entropy image (allow_meta False): pixels' green
    # byte = group index; (g<<8) -> groups 0 and 1
    bw.write(0, 1)  # meta image: no color cache
    mcodes = _emit_codes(bw, {0: 1, 1: 1}, {0: 1}, {0: 1}, {0: 1}, {0: 1})
    _write_sym(bw, mcodes[0], 0)  # tile 0 -> group 0
    _write_sym(bw, mcodes[1], 0)
    _write_sym(bw, mcodes[2], 0)
    _write_sym(bw, mcodes[3], 0)
    _write_sym(bw, mcodes[0], 1)  # tile 1 -> group 1
    _write_sym(bw, mcodes[1], 0)
    _write_sym(bw, mcodes[2], 0)
    _write_sym(bw, mcodes[3], 0)
    # two code groups
    _emit_codes(bw, {0x10: 1}, {0xAA: 1}, {0x20: 1}, {0xFF: 1}, {0: 1})
    _emit_codes(bw, {0x11: 1}, {0xBB: 1}, {0x21: 1}, {0xFF: 1}, {0: 1})
    # all 8 pixels decode through single-symbol (zero-bit) codes:
    # the stream carries no further payload bits
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    assert d["rgb"][:3] == bytes([0xAA, 0x10, 0x20])
    assert d["rgb"][4 * 3:4 * 3 + 3] == bytes([0xBB, 0x11, 0x21])
    assert d["rgb"][:12] == bytes([0xAA, 0x10, 0x20]) * 4
    assert d["rgb"][12:] == bytes([0xBB, 0x11, 0x21]) * 4


def test_decode_predictor_transform():
    """2x2, one 8px tile, mode 1 (Left): residuals accumulate across
    each row; row starts add to the row above (x==0 rule)."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(1, 3)  # bits = 3 -> 8x8 tiles -> 1x1 tile image
    # tile sub-image: 1x1, green byte = mode 1 (L)
    bw.write(0, 1)  # no cache
    _emit_codes(bw, {1: 1}, {0: 1}, {0: 1}, {0: 1}, {0: 1})
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # main: no cache
    bw.write(0, 1)  # main: no meta
    _emit_codes(bw, {5: 1}, {3: 1}, {7: 1}, {0: 1}, {0: 1})
    # 4 identical residual pixels (a=0,r=3,g=5,b=7), all zero-bit codes
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    rgb = d["rgb"]
    assert rgb[0:3] == bytes([3, 5, 7])          # p0: res + opaque black
    assert rgb[3:6] == bytes([6, 10, 14])        # p1 (y==0): res + L
    assert rgb[6:9] == bytes([6, 10, 14])        # p2 (x==0): res + T
    assert rgb[9:12] == bytes([9, 15, 21])       # p3: mode L -> res + p2
    assert d["alpha"] == b"\xff" * 4             # alpha res 0 + FF each


def test_decode_color_transform():
    """1x1 tile with green-to-red delta 16 (0.5 fixed-point): red_out
    = red_code + (16 * signed(green)) >> 5."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(1, 3)  # bits=3
    bw.write(0, 1)  # tile image: no cache
    # tile pixel: red byte = r2b, green byte = g2b... layout:
    # g2r = tile & 0xFF (blue ch), g2b = (tile>>8)&FF (green ch),
    # r2b = (tile>>16)&FF (red ch)
    _emit_codes(bw, {0: 1}, {0: 1}, {16: 1}, {0: 1}, {0: 1})
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # main: no cache
    bw.write(0, 1)  # main: no meta
    _emit_codes(bw, {64: 1}, {10: 1}, {20: 1}, {0xFF: 1}, {0: 1})
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    # g=64 (positive), g2r=16: delta = (16*64)>>5 = 32 -> red=10+32=42
    # g2b=0, r2b=0 -> blue=20
    assert d["rgb"] == bytes([42, 64, 20])


def test_decode_color_indexing_bundled():
    """6x1 image, 4-color palette -> wbits=2, 4 indices per packed
    green byte; an out-of-range index decodes to transparent black."""
    palette = [_argb(0xFF, 10, 20, 30), _argb(0xFF, 40, 50, 60),
               _argb(0xFF, 70, 80, 90), _argb(0xFF, 0, 0, 0)]
    bw = _BitWriter()
    _header(bw, 6, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # palette size - 1 = 3
    # palette sub-image: 4x1 deltas (first = color0, then diffs)
    bw.write(0, 1)  # no cache
    deltas = []
    prev = 0
    for px in palette:
        d = 0
        for sh in (0, 8, 16, 24):
            d |= ((((px >> sh) & 0xFF) - ((prev >> sh) & 0xFF)) & 0xFF) << sh
        prev = px
        deltas.append(d)
    gset = {}
    rset = {}
    bset = {}
    aset = {}
    for d in deltas:
        gset[(d >> 8) & 0xFF] = 1
        rset[(d >> 16) & 0xFF] = 1
        bset[d & 0xFF] = 1
        aset[(d >> 24) & 0xFF] = 1
    pcodes = _emit_codes(bw, gset, rset, bset, aset, {0: 1})
    for d in deltas:
        _write_sym(bw, pcodes[0], (d >> 8) & 0xFF)
        _write_sym(bw, pcodes[1], (d >> 16) & 0xFF)
        _write_sym(bw, pcodes[2], d & 0xFF)
        _write_sym(bw, pcodes[3], (d >> 24) & 0xFF)
    bw.write(0, 1)  # no more transforms
    # main image: packed width = ceil(6/4) = 2
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # packed px0 green byte: indices 0,1,2,3 LSB-first 2-bit fields
    packed0 = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    # packed px1: indices 1,0 then 2 unused slots (index 2 harmless)
    packed1 = 1 | (0 << 2)
    mcodes = _emit_codes(bw, {packed0: 1, packed1: 1}, {0: 1}, {0: 1},
                         {0: 1}, {0: 1})
    _write_sym(bw, mcodes[0], packed0)
    _write_sym(bw, mcodes[1], 0)
    _write_sym(bw, mcodes[2], 0)
    _write_sym(bw, mcodes[3], 0)
    _write_sym(bw, mcodes[0], packed1)
    _write_sym(bw, mcodes[1], 0)
    _write_sym(bw, mcodes[2], 0)
    _write_sym(bw, mcodes[3], 0)
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    exp = []
    for idx in (0, 1, 2, 3, 1, 0):
        px = palette[idx]
        exp += [(px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF]
    assert d["rgb"] == bytes(exp)


def test_decode_max_symbol_short_circuit():
    """max_symbol stops the code-length read early; remaining lengths
    stay zero."""
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green code written by hand with max_symbol: lengths for syms
    # 0..1 = 1 bit each, rest zero, via the normal path
    bw.write(0, 1)  # normal code
    bw.write(0, 4)  # n_clc = 4: order 17,18,0,1
    bw.write(0, 3)  # len(17) = 0
    bw.write(0, 3)  # len(18) = 0
    bw.write(0, 3)  # len(0) = 0
    bw.write(1, 3)  # len(1) = 1 -> single-symbol CLC: every read is 1
    bw.write(1, 1)  # max_symbol short-circuit PRESENT
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2 -> read exactly two lengths
    # CLC is single-symbol (zero bits per read): lengths = [1, 1]
    codes_r = _write_prefix_code(bw, {0xAA: 1}, 256)
    codes_b = _write_prefix_code(bw, {0xBB: 1}, 256)
    codes_a = _write_prefix_code(bw, {0xFF: 1}, 256)
    codes_d = _write_prefix_code(bw, {0: 1}, 40)
    bw.write_code(1, 1)  # green symbol 1 (canonical: 0->0, 1->1)
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    assert d["rgb"] == bytes([0xAA, 1, 0xBB])


def test_decode_plane_code_distances():
    """A copy through plane code 2 (dx=1,dy=0 -> dist 1) and through
    a 2D neighbor (dx=0,dy=1 -> dist=xsize)."""
    w, h = 3, 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # tokens: 3 literals row 0 (r=1,2,3), then copy len 3 dist=w
    # (plane code 1: (0,1) -> dist 3)
    lsym, lval, lbits = _lz77_sym(3)
    codes = _emit_codes(
        bw, {0x05: 1, 256 + lsym: 1}, {1: 1, 2: 1, 3: 1}, {9: 1},
        {0xFF: 1}, {_lz77_sym(1)[0]: 1},  # plane-code value 1 -> sym 0
    )
    g, r, b, a, dc = codes
    for red in (1, 2, 3):
        _write_sym(bw, g, 0x05)
        _write_sym(bw, r, red)
        _write_sym(bw, b, 9)
        _write_sym(bw, a, 0xFF)
    _write_sym(bw, g, 256 + lsym)
    bw.write(lval, lbits)
    dsym, dval, dbits = _lz77_sym(1)  # plane code 1
    _write_sym(bw, dc, dsym)
    bw.write(dval, dbits)
    d = decode_vp8l(bytes([_SIG]) + bw.bytes())
    assert d["rgb"][0:9] == d["rgb"][9:18]  # row 1 copies row 0


# --- typed errors ------------------------------------------------------------


def test_vp8l_typed_errors():
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(b"\x2f\x00")
    good = encode_vp8l(4, 4, bytes(range(48)))
    with pytest.raises(ValueError, match="version"):
        bad = bytearray(good)
        bad[4] |= 0xE0  # version bits live at the top of byte 4
        decode_vp8l(bytes(bad))
    with pytest.raises(ValueError):
        decode_vp8l(good[:8])  # truncated mid-stream


def test_vp8l_kraft_oversubscribed():
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)  # normal green code
    bw.write(0, 4)  # n_clc = 4
    bw.write(0, 3)
    bw.write(0, 3)
    bw.write(0, 3)
    bw.write(1, 3)  # CLC single symbol 1 -> every length = 1
    bw.write(0, 1)  # no max_symbol: 280 symbols all length 1
    with pytest.raises(ValueError, match="over-subscribed"):
        decode_vp8l(bytes([_SIG]) + bw.bytes())


def test_vp8l_reference_before_start():
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    lsym, lval, lbits = _lz77_sym(2)
    codes = _emit_codes(bw, {256 + lsym: 1}, {0: 1}, {0: 1}, {0: 1},
                        {_lz77_sym(121)[0]: 1})
    _write_sym(bw, codes[0], 256 + lsym)
    bw.write(lval, lbits)
    dsym, dval, dbits = _lz77_sym(121)
    _write_sym(bw, codes[4], dsym)
    bw.write(dval, dbits)
    with pytest.raises(ValueError, match="before image start"):
        decode_vp8l(bytes([_SIG]) + bw.bytes())


def test_vp8l_duplicate_transform_rejected():
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(1, 1)
    bw.write(2, 2)  # again
    with pytest.raises(ValueError, match="duplicate VP8L transform"):
        decode_vp8l(bytes([_SIG]) + bw.bytes())


# --- RIFF container ----------------------------------------------------------


def _vp8l_payload():
    return encode_vp8l(6, 4, bytes((3 * i) % 256 for i in range(72)))


def test_webp_simple_and_extended_roundtrip():
    p = _vp8l_payload()
    r = parse_webp(encode_webp((b"VP8L", p)))
    assert r["variant"] == "lossless"
    assert (r["canvas_w"], r["canvas_h"]) == (6, 4)
    assert r["image_payload"] == p
    r2 = parse_webp(encode_webp((b"VP8L", p), canvas=(100, 50),
                                exif=b"Exif\x00meta", xmp=b"<x/>",
                                iccp=b"profile"))
    assert r2["variant"] == "extended"
    assert (r2["canvas_w"], r2["canvas_h"]) == (100, 50)
    assert (r2["image_w"], r2["image_h"]) == (6, 4)
    assert r2["flags"] == dict(icc=True, alpha=False, exif=True,
                               xmp=True, animation=False)
    assert [c for c, _ in r2["chunks"]] == [
        "VP8X", "ICCP", "VP8L", "EXIF", "XMP "]
    assert r2["exif"] == b"Exif\x00meta"
    assert r2["iccp"] == b"profile"


def test_webp_odd_chunk_padding():
    p = _vp8l_payload()
    f = encode_webp((b"VP8L", p), exif=b"odd")  # 3-byte chunk -> pad
    assert len(f) % 2 == 0
    r = parse_webp(f)
    assert r["exif"] == b"odd"


def test_webp_lossy_dims():
    vp8 = (bytes([0x10, 0, 0]) + b"\x9d\x01\x2a"
           + struct.pack("<HH", 640 | (1 << 14), 480) + b"\0" * 6)
    r = parse_webp(encode_webp((b"VP8 ", vp8)))
    assert r["variant"] == "lossy"
    assert (r["canvas_w"], r["canvas_h"]) == (640, 480)


def test_webp_typed_errors():
    p = _vp8l_payload()
    f = encode_webp((b"VP8L", p))
    with pytest.raises(ValueError, match="RIFF magic"):
        parse_webp(b"RIFX" + f[4:])
    with pytest.raises(ValueError, match="WEBP form"):
        parse_webp(f[:8] + b"WAVE" + f[12:])
    with pytest.raises(ValueError, match="disagrees"):
        parse_webp(f + b"\x00")
    trunc = f[:-3]
    trunc = trunc[:4] + struct.pack("<I", len(trunc) - 8) + trunc[8:]
    with pytest.raises(ValueError, match="runs past end"):
        parse_webp(trunc)
    with pytest.raises(ValueError, match="none of"):
        bad = b"RIFF" + struct.pack("<I", 4 + 8 + 2) + b"WEBP" \
            + b"JUNK" + struct.pack("<I", 2) + b"ab"
        parse_webp(bad)
    # flag/chunk disagreement
    raw = bytearray(encode_webp((b"VP8L", p), exif=b"meta"))
    off = raw.index(b"VP8X") + 8
    raw[off] &= 0xF7  # clear the EXIF flag, keep the chunk
    with pytest.raises(ValueError, match="disagrees with EXIF"):
        parse_webp(bytes(raw))
    # start-code corruption in lossy
    vp8 = bytes([0x10, 0, 0]) + b"\xff\x01\x2a" + b"\0" * 6
    with pytest.raises(ValueError, match="start code"):
        parse_webp(encode_webp((b"VP8 ", vp8)))


def test_webp_alpha_hint_surfaces_in_flags():
    p = bytearray(_vp8l_payload())
    # set the alpha-hint bit (bit 28 of the LE32 after the signature)
    p[4] |= 0x10
    r = parse_webp(encode_webp((b"VP8L", bytes(p))))
    assert r["flags"]["alpha"] is True
