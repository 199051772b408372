"""Unit tests for the GIF89a codec (ops/gif.py, round 12).

The query-level hash oracle (multimodal_gif_decode) pins the end-to-end
pipeline; these tests pin the codec internals a coarse aggregate could
cancel out of: variable-width LZW round-trips including the width-bump
boundaries and the CLEAR-on-full reset, the end-of-stream phantom-add
width sync (the decoder adds a table entry after the FINAL data code
and may widen before reading EOI), sub-block framing, 4-pass interlace
reorder, transparency plumbing, and typed errors on corrupt bytes.
"""

from __future__ import annotations

import numpy as np
import pytest

from sim_spark.ops.gif import (
    _interlace_row_order,
    decode_gif,
    decode_gif_indices,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(7)
    for n, alpha, mcs in [
        (0, 2, 2), (1, 2, 2), (10, 4, 2), (5000, 16, 4),
        (60000, 256, 8), (200000, 250, 8),
    ]:
        idx = rng.integers(0, alpha, n).astype(np.uint8).tobytes()
        assert lzw_decode(lzw_encode(idx, mcs), mcs, n) == idx


def test_lzw_width_bump_boundaries():
    """Constant + near-constant streams drive long dictionary chains,
    hitting every width bump exactly at the 2^w boundary; the
    end-of-stream phantom add is exercised by sweeping lengths."""
    for mcs in (2, 4, 8):
        for n in range(1, 400, 7):
            idx = bytes(n)  # all zeros -> maximal chain reuse
            assert lzw_decode(lzw_encode(idx, mcs), mcs, n) == idx


def test_lzw_clear_on_full_table():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, 300_000).astype(np.uint8).tobytes()
    assert lzw_decode(lzw_encode(idx, 8), 8, len(idx)) == idx


def test_lzw_rejects_corrupt():
    idx = bytes(range(16)) * 4
    enc = lzw_encode(idx, 4)
    with pytest.raises(ValueError):
        lzw_decode(enc[:3], 4, len(idx))  # truncated
    with pytest.raises(ValueError):
        lzw_decode(enc, 4, len(idx) + 5)  # underrun vs expectation
    with pytest.raises(ValueError):
        lzw_decode(enc, 1, len(idx))  # mcs out of range


def test_container_roundtrip_all_shapes():
    rng = np.random.default_rng(11)
    for trial in range(60):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        P = int(rng.integers(1, 257))
        pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(P)]
        idx = rng.integers(0, P, w * h).astype(np.uint8).tobytes()
        inter = bool(rng.integers(0, 2))
        tr = int(rng.integers(0, P)) if rng.integers(0, 2) else None
        g = encode_gif(w, h, idx, pal, transparent=tr, interlace=inter)
        w2, h2, rgb, tr2 = decode_gif(g)
        assert (w2, h2, tr2) == (w, h, tr)
        exp = np.array(pal, dtype=np.uint8)[np.frombuffer(idx, dtype=np.uint8)]
        assert rgb == exp.tobytes()
        assert decode_gif_indices(g)[2] == idx


def test_interlace_is_a_real_reorder():
    """The stored row order must differ from sequential (h > 4), and a
    decoder that ignored the interlace flag would misplace rows."""
    h = 11
    order = _interlace_row_order(h)
    assert sorted(order) == list(range(h)) and order != list(range(h))
    w = 5
    P = 7
    pal = [(e, 2 * e, 3 * e) for e in range(P)]
    idx = (np.arange(w * h) % P).astype(np.uint8).tobytes()
    seq = encode_gif(w, h, idx, pal, interlace=False)
    inter = encode_gif(w, h, idx, pal, interlace=True)
    assert decode_gif(seq)[2] == decode_gif(inter)[2]


def test_twelve_bit_codes_inside_container():
    rng = np.random.default_rng(1)
    w, h = 300, 300
    idx = rng.integers(0, 256, w * h).astype(np.uint8).tobytes()
    pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(256)]
    g = encode_gif(w, h, idx, pal, interlace=True)
    _, _, rgb, _ = decode_gif(g)
    exp = np.array(pal, dtype=np.uint8)[np.frombuffer(idx, dtype=np.uint8)]
    assert rgb == exp.tobytes()


def test_typed_errors_on_corrupt_bytes():
    pal = [(1, 2, 3), (4, 5, 6)]
    g = encode_gif(3, 3, bytes([0, 1] * 4 + [0]), pal)
    for bad in (
        b"NOPE",
        g[:6],       # header only
        g[:20],      # inside the color table
        g[:-1],      # missing trailer
        g[:-2] + b"\x00",  # sub-block chain cut before trailer
        b"GIF89a",
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes([0, 0, 0, 5]), [(0, 0, 0)])  # index >= P
    with pytest.raises(ValueError):
        encode_gif(2, 2, b"", [(0, 0, 0)])  # empty pixels
    with pytest.raises(ValueError):
        encode_gif(2, 2, bytes(4), [(0, 0, 0)], transparent=9)
