"""Decoder golden tests: the struct-level WAV/BMP parsers against
hand-computed bytes, independent of Spark (VERDICT r4 task #5)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sim_spark.ops.multimodal import (
    decode,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    gen_bmp_payload,
    gen_wav_payload,
)


def test_wav_roundtrip_golden():
    samples = np.array([0, 1, -1, 32767, -32768, 123], dtype="<i2")
    payload = encode_wav(samples, 16000)
    # golden header facts, asserted byte-for-byte
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert struct.unpack_from("<I", payload, 24)[0] == 16000  # sample rate
    assert struct.unpack_from("<H", payload, 34)[0] == 16  # bits/sample
    assert len(payload) == 44 + 12
    rate, out = decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(out, samples)


def test_wav_parser_walks_unknown_chunks():
    samples = np.array([7, -7, 7], dtype="<i2")
    p = encode_wav(samples, 8000)
    # splice a LIST chunk with odd length (forces pad-byte handling)
    # between fmt and data
    head, data_chunk = p[:36], p[36:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, out = decode_wav(head + odd + data_chunk)
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_bmp_roundtrip_golden():
    # 2x2 image, known bytes; width 2 -> row_bytes 6, stride 8 (padding!)
    pixels = bytes(range(12))  # top-down BGR
    payload = encode_bmp(2, 2, pixels)
    assert payload[:2] == b"BM"
    w, h = struct.unpack_from("<ii", payload, 18)
    assert (w, h) == (2, 2)
    # bottom-up storage: first stored row is the BOTTOM (bytes 6..11)
    data_off = struct.unpack_from("<I", payload, 10)[0]
    assert payload[data_off : data_off + 6] == pixels[6:]
    assert payload[data_off + 6 : data_off + 8] == b"\x00\x00"  # stride pad
    dw, dh, out = decode_bmp(payload)
    assert (dw, dh, out) == (2, 2, pixels)


def test_bmp_topdown_variant():
    pixels = bytes(range(12))
    p = bytearray(encode_bmp(2, 2, pixels))
    # rewrite as top-down (negative height) with rows already top-first
    struct.pack_into("<i", p, 22, -2)
    data_off = struct.unpack_from("<I", p, 10)[0]
    p[data_off : data_off + 6], p[data_off + 8 : data_off + 14] = (
        pixels[:6],
        pixels[6:],
    )
    dw, dh, out = decode_bmp(bytes(p))
    assert (dw, dh, out) == (2, 2, pixels)


def test_decode_dispatch():
    w = gen_wav_payload(5, 10)
    b = gen_bmp_payload(5)
    assert decode(w)["kind"] == "wav"
    assert decode(b)["kind"] == "bmp"
    with pytest.raises(NotImplementedError):
        decode(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_gen_wav_known_values():
    # doc_id=2, n_chars=1 -> 65 samples at rate 8000 + 2*4000 = 16000
    rate, s = decode_wav(gen_wav_payload(2, 1))
    assert rate == 16000 and len(s) == 65
    assert s[0] == (2 * 31) % 65536 - 32768 == 62 - 32768
    assert s[1] == (2 * 31 + 17) % 65536 - 32768


def test_gen_bmp_known_values():
    # doc_id=1 -> 5x4, pixel(r,c,ch) = (1 + 7r + 13c + 29ch) % 256
    w, h, px = decode_bmp(gen_bmp_payload(1))
    assert (w, h) == (5, 4)
    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    r, c, ch = np.indices((h, w, 3))
    np.testing.assert_array_equal(a, ((1 + 7 * r + 13 * c + 29 * ch) % 256))
