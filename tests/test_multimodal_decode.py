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
        decode(b"ID3\x04\x00 mp3-ish")


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


# --- PNG (r9: stdlib-zlib decoder; non-interlaced RGB8) ---------------------


def test_png_roundtrip_all_filters():
    from sim_spark.ops.multimodal import decode_png, encode_png

    # 10 rows: filter cycle r % 5 hits every predictor twice
    px = bytes(((i * 37 + 11) % 256) for i in range(10 * 6 * 3))
    payload = encode_png(6, 10, px)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert payload.count(b"IDAT") == 2  # multi-IDAT reassembly exercised
    assert decode_png(payload) == (6, 10, px)


def test_png_crc_is_verified():
    from sim_spark.ops.multimodal import decode_png, encode_png

    p = bytearray(encode_png(4, 4, bytes(48)))
    idat = p.index(b"IDAT")
    p[idat + 5] ^= 0xFF  # corrupt one IDAT byte; CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))


def test_png_rejects_unsupported_shapes():
    """Adam7 decodes since r12, so the lying-header probe (sequential
    scanlines labeled interlaced) now fails the pass-layout length
    check rather than a fence; 16-bit decodes since r12 too, so a
    LYING 16-bit header over 8-bit-packed scanlines likewise fails the
    length check, and only spec-INVALID depth/color combinations stay
    typed-fenced."""
    from sim_spark.ops.multimodal import decode_png, encode_png

    import zlib

    p = bytearray(encode_png(2, 2, bytes(12)))
    # IHDR data starts at offset 16 (8 sig + 4 len + 4 type);
    # interlace byte is IHDR data[12]
    p[16 + 12] = 1  # claim Adam7 over sequential scanline bytes
    crc = zlib.crc32(bytes(p[12:16]) + bytes(p[16 : 16 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", p, 16 + 13, crc)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bytes(p))
    p = bytearray(encode_png(2, 2, bytes(12)))
    p[16 + 8] = 16  # lying depth byte over 8-bit scanline bytes
    crc = zlib.crc32(bytes(p[12:16]) + bytes(p[16 : 16 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", p, 16 + 13, crc)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(bytes(p))
    p = bytearray(encode_png(2, 2, bytes(12)))
    p[16 + 8] = 4  # depth 4 is spec-invalid for color type 2 (RGB)
    crc = zlib.crc32(bytes(p[12:16]) + bytes(p[16 : 16 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", p, 16 + 13, crc)
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(p))


def test_png_truncated_chunk_raises_valueerror():
    """A truncated payload or an oversized chunk length must raise the
    documented ValueError, not struct.error, and must not let a
    silently-truncated data slice reach the CRC check (r9 ADVICE)."""
    from sim_spark.ops.multimodal import decode_png, encode_png

    p = encode_png(4, 4, bytes(48))
    # cut mid-IDAT: the chunk header promises more bytes than remain
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(p[: p.index(b"IDAT") + 7])
    # inflate the IDAT length field far beyond the payload end
    q = bytearray(p)
    struct.pack_into(">I", q, q.index(b"IDAT") - 4, 1 << 20)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(bytes(q))


def test_png_container_independence():
    """The BMP payload and its PNG twin decode to identical pixel
    arrays — the invariant dedup_image_dhash_png pins end-to-end."""
    from sim_spark.ops.multimodal import gen_png_twin_payload
    from sim_spark.ops.multimodal import decode_png

    for d in (0, 1, 12, 91, 400):
        assert decode_png(gen_png_twin_payload(d)) == decode_bmp(
            gen_bmp_payload(d)
        )


def test_png_dispatch_and_remaining_fence():
    from sim_spark.ops.jpeg import gen_jpeg_payload
    from sim_spark.ops.multimodal import decode, gen_png_payload

    out = decode(gen_png_payload(7))
    assert out["kind"] == "png" and out["width"] == 5 + 7 % 11
    out = decode(gen_jpeg_payload(7))  # JPEG dispatches for real since r11
    assert out["kind"] == "jpeg" and out["width"] == (2 + 7 % 4) * 8
    from sim_spark.ops.gif import encode_gif  # GIF dispatches since r12

    out = decode(encode_gif(3, 2, bytes([0, 1] * 3), [(9, 9, 9), (1, 2, 3)],
                            transparent=1))
    assert out["kind"] == "gif" and out["width"] == 3
    assert out["transparent"] == 1 and len(out["pixels"]) == 3 * 2 * 3
    with pytest.raises(NotImplementedError):  # MP3/video samples stay fenced
        decode(b"ID3\x04\x00 mp3-ish")


def test_png_all_color_types_roundtrip():
    """decode_png_any (r11): gray / gray+alpha / RGB / RGBA round-trip
    bit-exactly through every filter type; the RGB entry point keeps
    its 3-channel contract."""
    import numpy as np

    from sim_spark.ops.multimodal import decode_png_any, encode_png

    rng = np.random.default_rng(4)
    for ch in (1, 2, 3, 4):
        for _ in range(10):
            w, h = int(rng.integers(1, 12)), int(rng.integers(1, 11))
            px = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
            assert decode_png_any(encode_png(w, h, px, channels=ch)) == (
                w, h, ch, px
            )
    with pytest.raises(ValueError):  # RGB wrapper rejects other types
        from sim_spark.ops.multimodal import decode_png

        decode_png(encode_png(2, 2, bytes(16), channels=4))


# --- PNG palette + Adam7 (r12) -----------------------------------------------


def test_png_adam7_grid_covers_every_pixel_once():
    import numpy as np

    from sim_spark.ops.multimodal import _ADAM7

    cov = np.zeros((16, 16), dtype=int)
    for x0, y0, dx, dy in _ADAM7:
        cov[y0::dy, x0::dx] += 1
    assert (cov == 1).all()


def test_png_palette_and_adam7_roundtrip_all_shapes():
    import numpy as np

    from sim_spark.ops.multimodal import (
        decode_png_any,
        encode_png,
        encode_png_indexed,
    )

    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        for il in (False, True):
            for (w, h) in [(1, 1), (2, 3), (8, 8), (13, 11), (1, 9), (9, 1)]:
                px = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
                w2, h2, c2, px2 = decode_png_any(
                    encode_png(w, h, px, channels=ch, interlace=il)
                )
                assert (w2, h2, c2) == (w, h, ch) and px2 == px
    for il in (False, True):
        for trns in (None, [0, 128, 255]):
            pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(5)]
            idx = rng.integers(0, 5, 13 * 7, dtype=np.uint8).tobytes()
            w2, h2, c2, px2 = decode_png_any(
                encode_png_indexed(13, 7, idx, pal, trns=trns, interlace=il)
            )
            assert (w2, h2) == (13, 7) and c2 == (4 if trns else 3)
            a = np.frombuffer(px2, dtype=np.uint8).reshape(7, 13, c2)
            ii = np.frombuffer(idx, dtype=np.uint8).reshape(7, 13)
            assert np.array_equal(a[..., :3], np.array(pal, dtype=np.uint8)[ii])


def test_png_palette_malformed_typed_errors():
    import struct
    import zlib

    import numpy as np
    import pytest

    from sim_spark.ops.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png_any,
        encode_png_indexed,
    )

    pal = [(1, 2, 3), (4, 5, 6)]
    good = encode_png_indexed(4, 3, bytes([0, 1] * 6), pal)
    # out-of-range palette index
    z = zlib.compress(bytes([0, 0, 1, 5, 0]) + bytes([0, 1, 0, 1]) + bytes([0, 0, 0, 1, 0]))
    bad = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x01\x07\x00" * 3))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_any(bad)
    # missing PLTE
    no_plte = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00" * 3))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_any(no_plte)
    # malformed PLTE length
    bad_plte = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes([1, 2, 3, 4]))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00" * 3))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_any(bad_plte)
    # truncations of a valid palette+interlace stream stay typed
    full = encode_png_indexed(5, 4, bytes(range(20)), [(i, i, i) for i in range(20)], interlace=True)
    for k in range(9, len(full), 2):
        try:
            decode_png_any(full[:k])
        except (ValueError, zlib.error):
            pass


# --- MP3 frame-header parse (r12) --------------------------------------------


def test_mp3_parse_roundtrip_and_xing_consistency():
    from sim_spark.ops.mp3 import (
        BITRATES_V1L3,
        SAMPLE_RATES_V1,
        _frame_len,
        formula_mp3_params,
        gen_mp3_payload,
        parse_mp3,
    )

    for doc in (0, 1, 2, 3, 4, 5, 6, 7, 11, 12, 401, 4999):
        sr_idx, mode, frames = formula_mp3_params(doc)
        d = parse_mp3(gen_mp3_payload(doc))
        sr = SAMPLE_RATES_V1[sr_idx]
        total = sum(_frame_len(BITRATES_V1L3[bi], sr, p) for bi, p in frames)
        assert d["n_frames"] == len(frames) == d["xing_frames"]
        assert d["sample_rate"] == sr and d["mode"] == mode
        assert d["total_bytes"] == total == d["xing_bytes"]
        assert d["duration_us"] == len(frames) * 1152 * 1000000 // sr


def test_mp3_parse_typed_errors_on_malformed_streams():
    import numpy as np

    from sim_spark.ops.mp3 import gen_mp3_payload, parse_mp3

    rng = np.random.default_rng(0)
    for _ in range(100):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_mp3(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    base = gen_mp3_payload(7)
    for k in range(1, len(base)):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_mp3(base[:k])
    # flipped version bits -> MPEG-2 fence, typed
    p = bytearray(base)
    p[1] &= ~0b00011000  # version 00 (MPEG-2.5)
    with pytest.raises((ValueError, NotImplementedError)):
        parse_mp3(bytes(p))
    # reserved sample-rate index
    p = bytearray(base)
    p[2] = (p[2] & ~0b1100) | 0b1100
    with pytest.raises(ValueError):
        parse_mp3(bytes(p))


def test_png_deep_roundtrip_16bit_and_subbyte():
    """decode_png_deep (r12): 16-bit gray/GA/RGB/RGBA and 1/2/4-bit
    grayscale round-trip exactly, sequential and Adam7; sub-byte
    palette expands through PLTE/tRNS."""
    import numpy as np

    from sim_spark.ops.multimodal import (
        decode_png_deep,
        encode_png_deep,
        encode_png_indexed,
    )

    rng = np.random.default_rng(42)
    for ch in (1, 2, 3, 4):
        for inter in (False, True):
            w, h = int(rng.integers(1, 20)), int(rng.integers(1, 20))
            s = rng.integers(0, 65536, w * h * ch)
            g = encode_png_deep(w, h, s, channels=ch, depth=16, interlace=inter)
            w2, h2, ch2, d2, img = decode_png_deep(g)
            assert (w2, h2, ch2, d2) == (w, h, ch, 16)
            assert np.array_equal(img.ravel(), s)
    for d in (1, 2, 4):
        for inter in (False, True):
            w, h = int(rng.integers(1, 30)), int(rng.integers(1, 30))
            s = rng.integers(0, 1 << d, w * h)
            g = encode_png_deep(w, h, s, channels=1, depth=d, interlace=inter)
            w2, h2, ch2, d2, img = decode_png_deep(g)
            assert (w2, h2, ch2, d2) == (w, h, 1, d)
            assert np.array_equal(img.ravel(), s)
    # 2-bit palette with tRNS, interlaced
    w, h, P = 9, 7, 4
    pal = [(e, 2 * e, 3 * e) for e in range(P)]
    trns = [10 * e for e in range(P)]
    idx = (np.arange(w * h) % P).astype(np.uint8)
    g = encode_png_indexed(
        w, h, idx.tobytes(), pal, trns=trns, interlace=True, depth=2
    )
    w2, h2, ch2, d2, img = decode_png_deep(g)
    assert (w2, h2, ch2, d2) == (w, h, 4, 2)
    assert np.array_equal(img[..., :3], np.array(pal)[idx].reshape(h, w, 3))
    assert np.array_equal(img[..., 3], np.array(trns)[idx].reshape(h, w))


def test_png_deep_typed_fences():
    """Byte-oriented decode_png_any refuses non-8-bit with a pointer;
    invalid depth/color combos and out-of-range samples are typed."""
    import numpy as np

    import pytest as _pytest

    from sim_spark.ops.multimodal import (
        decode_png_any,
        encode_png_deep,
        encode_png_indexed,
    )

    g16 = encode_png_deep(4, 4, np.arange(16) * 97 % 65536, channels=1,
                          depth=16)
    with _pytest.raises(ValueError, match="decode_png_deep"):
        decode_png_any(g16)
    with _pytest.raises(ValueError):
        encode_png_deep(4, 4, np.zeros(16), channels=3, depth=4)  # sub-8 RGB
    with _pytest.raises(ValueError):
        encode_png_deep(4, 4, np.full(16, 99), channels=1, depth=4)  # range
    with _pytest.raises(ValueError):
        encode_png_indexed(2, 2, bytes([0, 1, 2, 3]), [(0, 0, 0)] * 4,
                           depth=1)  # index 3 does not fit 1 bit


def test_id3v2_roundtrip_and_walk_continues():
    """ID3v2.3/2.4 tags round-trip (syncsafe vs plain frame sizes,
    latin-1 vs utf-8), the MP3 frame walk resumes after the declared
    tag size, and the Xing byte check excludes the tag."""
    from sim_spark.ops.mp3 import (
        encode_id3v2,
        formula_id3_fields,
        gen_mp3_id3_payload,
        gen_mp3_payload,
        parse_id3v2,
        parse_mp3,
    )

    for d in (0, 1, 2, 3, 5, 12, 97, 196, 399):
        prof = parse_mp3(gen_mp3_id3_payload(d))
        version, _utf8, frames, pad = formula_id3_fields(d)
        assert prof["id3"]["_version"] == version
        assert prof["id3"]["TIT2"] == f"doc-{d}"
        assert prof["id3_bytes"] == 10 + sum(
            10 + 1 + len(t) for _f, t in frames
        ) + pad
        assert int(prof["id3"]["TLEN"]) == prof["duration_us"] // 1000
    # untagged stream: empty id3, zero tag bytes
    prof = parse_mp3(gen_mp3_payload(7))
    assert prof["id3"] == {} and prof["id3_bytes"] == 0
    # typed errors
    t = encode_id3v2([("TIT2", "x")], version=4, utf8=True)
    with pytest.raises(ValueError):
        parse_id3v2(t[:5])
    with pytest.raises(ValueError):
        parse_id3v2(t[:12])
    with pytest.raises(ValueError):
        parse_id3v2(b"ID3\x05\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        encode_id3v2([("TIT2", "x")], version=3, utf8=True)


def test_gzip_member_walk_roundtrip_and_integrity():
    """RFC 1952 multi-member walk: member boundaries, optional header
    fields, and per-member CRC32/ISIZE verification; stdlib gzip agrees
    on the concatenated content."""
    import gzip as _gzip

    from sim_spark.ops.gzf import encode_gzip_members, parse_gzip_members

    members = [("a.txt", b"hello"), (None, b"world" * 100), ("c", b"")]
    p = encode_gzip_members(members)
    recs = parse_gzip_members(p)
    assert [(r["name"], r["content"]) for r in recs] == members
    assert _gzip.decompress(p) == b"".join(c for _n, c in members)
    with pytest.raises(ValueError):
        parse_gzip_members(p[:-1])  # truncated trailer
    with pytest.raises(ValueError):
        parse_gzip_members(p + b"junk")  # trailing garbage
    q = bytearray(p)
    q[30] ^= 0xFF  # flip one deflate byte
    with pytest.raises(ValueError):
        parse_gzip_members(bytes(q))
    with pytest.raises(ValueError):
        parse_gzip_members(b"\x1f\x8b\x09" + p[3:])  # bad method


def test_tar_walk_roundtrip_stdlib_crosscheck():
    """ustar members round-trip; stdlib tarfile reads our archives;
    header checksum and EOF trailer are enforced."""
    import io
    import tarfile

    from sim_spark.ops.tarwalk import encode_tar, parse_tar

    members = [("a.txt", b"hello world", 1234), ("a.cls", b"7", 1234),
               ("big.bin", bytes(range(256)) * 5, 0)]
    p = encode_tar(members)
    recs = parse_tar(p)
    assert [(r["name"], r["content"], r["mtime"]) for r in recs] == members
    with tarfile.open(fileobj=io.BytesIO(p)) as tf:
        assert [t.name for t in tf.getmembers()] == [m[0] for m in members]
        assert tf.extractfile("big.bin").read() == members[2][1]
    with pytest.raises(ValueError):
        parse_tar(p[:-512])  # only one EOF block
    with pytest.raises(ValueError):
        parse_tar(p[:700])  # truncated member data
    q = bytearray(p)
    q[0] ^= 1  # name byte flip -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(q))


def test_tiff_roundtrip_both_lzw_dialects_and_endianness():
    """TIFF container round-trips across compression x endianness x
    channels; the TIFF-LZW early-change rule is exercised at every
    width boundary by constant streams; PackBits edge shapes hold."""
    import numpy as np

    from sim_spark.ops.tiff import (
        decode_tiff,
        encode_tiff,
        packbits_decode,
        packbits_encode,
        tiff_lzw_decode,
        tiff_lzw_encode,
    )

    for n in list(range(0, 600, 53)) + [5000]:
        d = bytes(n)  # constant stream walks every width bump exactly
        assert tiff_lzw_decode(tiff_lzw_encode(d), n) == d
    rng = np.random.default_rng(8)
    d = bytes(rng.integers(0, 256, 50_000).astype(np.uint8))
    assert tiff_lzw_decode(tiff_lzw_encode(d), len(d)) == d  # CLEAR reset
    assert packbits_decode(packbits_encode(b"\x00" * 300), 300) == b"\x00" * 300
    assert packbits_decode(packbits_encode(b""), 0) == b""
    for comp in (1, 5, 32773):
        for be in (False, True):
            for ch in (1, 3):
                w, h = 7, 5
                px = bytes(rng.integers(0, 256, w * h * ch).astype(np.uint8))
                t = encode_tiff(w, h, px, channels=ch, compression=comp,
                                big_endian=be, rows_per_strip=2)
                assert decode_tiff(t) == (w, h, ch, px)
    t = encode_tiff(3, 3, bytes(9), compression=5)
    for bad in (b"XX", t[:6], t[:30], t[:-3]):
        with pytest.raises(ValueError):
            decode_tiff(bad)


def test_gif_and_tiff_lzw_dialects_differ():
    """The two LZW variants must NOT be interchangeable: GIF packs
    LSB-first with the late width change, TIFF MSB-first with early
    change — feeding one stream to the other decoder fails."""
    from sim_spark.ops.gif import lzw_decode as gif_decode
    from sim_spark.ops.gif import lzw_encode as gif_encode
    from sim_spark.ops.tiff import tiff_lzw_decode, tiff_lzw_encode

    data = bytes(range(200)) * 3
    gif_stream = gif_encode(data, 8)
    tiff_stream = tiff_lzw_encode(data)
    assert gif_stream != tiff_stream
    with pytest.raises(ValueError):
        tiff_lzw_decode(gif_stream, len(data))
    with pytest.raises(ValueError):
        gif_decode(tiff_stream, 8, len(data))


def test_zip_walk_interop_both_directions():
    """EOCD backward scan, central-directory authority, local-header
    cross-check, CRC/size verification; stdlib zipfile reads our
    archives AND we read stdlib's (archive comment included)."""
    import io
    import zipfile

    from sim_spark.ops.zipwalk import encode_zip, parse_zip

    members = [("a.txt", b"hello" * 100, True), ("b.bin", bytes(range(256)), False)]
    p = encode_zip(members)
    recs = parse_zip(p)
    assert [(r["name"], r["content"]) for r in recs] == [
        (n, c) for n, c, _d in members
    ]
    with zipfile.ZipFile(io.BytesIO(p)) as z:
        for name, content, _d in members:
            assert z.read(name) == content
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("c.txt", b"stdlib-written")
        z.comment = b"a trailing archive comment"
    assert parse_zip(buf.getvalue())[0]["content"] == b"stdlib-written"
    with pytest.raises(ValueError):
        parse_zip(p[:-1])
    with pytest.raises(ValueError):
        parse_zip(p[:10])
    q = bytearray(p)
    q[35] ^= 0xFF  # flip a deflate byte -> CRC/deflate error
    with pytest.raises(ValueError):
        parse_zip(bytes(q))


def test_warc_record_grammar_roundtrip_and_typed_errors():
    """WARC/1.0 records round-trip; Content-Length framing is
    authoritative (blocks may embed 'WARC/1.0'); continuation lines
    fold; every malformed shape is a typed ValueError."""
    from sim_spark.ops.warc import encode_warc_records, parse_warc_records

    recs = [
        dict(type="response", record_id="<urn:uuid:1>", target_uri="http://a/",
             date="2024-01-01T00:00:00Z", content=b"WARC/1.0\r\nnot a record",
             content_type="application/http"),
        dict(type="metadata", record_id="<urn:uuid:2>",
             date="2024-01-01T00:00:01Z", content=b"",
             extra=[("WARC-Concurrent-To", "<urn:uuid:1>")]),
    ]
    p = encode_warc_records(recs)
    out = parse_warc_records(p)
    assert [r["type"] for r in out] == ["response", "metadata"]
    assert out[0]["content"] == b"WARC/1.0\r\nnot a record"  # framing by CL
    assert out[0]["target_uri"] == "http://a/"
    assert out[1]["target_uri"] is None
    assert out[1]["fields"]["WARC-Concurrent-To"] == "<urn:uuid:1>"
    assert out[0]["header_bytes"] + out[0]["content_length"] + 4 + \
        out[1]["header_bytes"] + out[1]["content_length"] + 4 == len(p)
    # continuation folding
    folded = p.replace(b"WARC-Target-URI: http://a/\r\n",
                       b"WARC-Target-URI: http://\r\n a/\r\n", 1)
    assert parse_warc_records(folded)[0]["target_uri"] == "http:// a/"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="version"):
        parse_warc_records(b"HTTP/1.0\r\n" + p[10:])
    p1 = encode_warc_records(recs[:1])
    with _pytest.raises(ValueError, match="truncated WARC block"):
        parse_warc_records(p1[:-10])
    with _pytest.raises(ValueError, match="trailer"):
        parse_warc_records(p[:-1] + b"X")
    with _pytest.raises(ValueError, match="mandatory"):
        parse_warc_records(p.replace(b"WARC-Date", b"XARC-Date", 1))
    with _pytest.raises(ValueError, match="duplicate"):
        parse_warc_records(p.replace(
            b"WARC-Date: ", b"WARC-Type: response\r\nWARC-Date: ", 1))
    with _pytest.raises(ValueError, match="non-numeric"):
        parse_warc_records(p.replace(b"Content-Length: 22",
                                     b"Content-Length: 2x", 1))
    with _pytest.raises(ValueError, match="Target-URI"):
        parse_warc_records(p.replace(b"WARC-Target-URI", b"WARC-Targat-URI", 1))
    with _pytest.raises(ValueError, match="continuation"):
        parse_warc_records(p[:10] + b" folded\r\n" + p[10:])
    with _pytest.raises(ValueError, match="whitespace"):
        parse_warc_records(p.replace(b"WARC-Date: ", b"WARC-Date ", 1))
    with _pytest.raises(ValueError, match="unknown WARC-Type"):
        parse_warc_records(p.replace(b"WARC-Type: metadata",
                                     b"WARC-Type: metadatb", 1))
    with _pytest.raises(ValueError, match="empty"):
        parse_warc_records(b"")
    with _pytest.raises(ValueError):
        encode_warc_records([dict(type="response", record_id="<u:1>",
                                  date="2024-01-01T00:00:00Z", content=b"")])


def test_mp4_box_walk_roundtrip_and_typed_errors():
    """ISO-BMFF metadata round-trips across 32/64-bit box sizes and
    mvhd versions; unknown boxes are skipped at every level; malformed
    shapes are typed ValueErrors."""
    import struct as _struct

    from sim_spark.ops.mp4 import encode_mp4_meta, parse_mp4_meta

    tracks = [
        dict(handler="vide", timescale=90000, duration=900000,
             sample_sizes=[100, 200, 300], width=640, height=480),
        dict(handler="soun", timescale=48000, duration=480000,
             sample_sizes=[10] * 7),
    ]
    for v1, large in [(False, False), (True, True)]:
        p = encode_mp4_meta("isom", 512, ["mp41", "mp42"], 600, 120000,
                            tracks, mdat=b"\x01\x02\x03",
                            mvhd_v1=v1, mdat_large=large)
        m = parse_mp4_meta(p)
        assert (m["timescale"], m["duration"]) == (600, 120000)
        assert m["major_brand"] == "isom" and m["minor_version"] == 512
        assert m["compatible_brands"] == ["mp41", "mp42"]
        assert [t["handler"] for t in m["tracks"]] == ["vide", "soun"]
        assert m["tracks"][0]["width"] == 640  # 16.16 fixed-point read
        assert m["tracks"][0]["sample_bytes"] == 600
        assert m["tracks"][1]["n_samples"] == 7
        assert m["mdat_bytes"] == 3
    # size==0 ("to end of file") accepted for the final top-level box
    q = bytearray(p)
    mdat_at = q.rindex(b"mdat") - 4  # fourcc sits after the u32 size field
    q2 = q[:mdat_at] + _struct.pack(">I", 0) + b"mdat" + b"\x01\x02\x03"
    assert parse_mp4_meta(bytes(q2))["mdat_bytes"] == 3
    with pytest.raises(ValueError, match="truncated box"):
        parse_mp4_meta(p[:-2])
    with pytest.raises(ValueError, match="expected ftyp"):
        parse_mp4_meta(p[-11:] + p[:-11])  # mdat first
    with pytest.raises(ValueError, match="missing mvhd"):
        parse_mp4_meta(p.replace(b"mvhd", b"xvhd"))
    with pytest.raises(ValueError, match="missing moov"):
        parse_mp4_meta(p.replace(b"moov", b"xoov"))
    with pytest.raises(ValueError, match="smaller than header"):
        bad = bytearray(p)
        _struct.pack_into(">I", bad, 0, 4)  # ftyp size 4 < 8
        parse_mp4_meta(bytes(bad))
    with pytest.raises(ValueError, match="unsupported mvhd version"):
        parse_mp4_meta(p.replace(b"mvhd\x01", b"mvhd\x02")
                       if b"mvhd\x01" in p
                       else p.replace(b"mvhd\x00", b"mvhd\x02"))
    with pytest.raises(ValueError, match="stsz table truncated"):
        stsz_at = p.index(b"stsz")
        bad = bytearray(p)
        _struct.pack_into(">I", bad, stsz_at + 12, 1 << 20)  # lying count
        parse_mp4_meta(bytes(bad))
    with pytest.raises(ValueError, match="sample-count mismatch"):
        stts_at = p.index(b"stts")
        bad = bytearray(p)
        _struct.pack_into(">I", bad, stts_at + 12, 99)  # stts says 99
        parse_mp4_meta(bytes(bad))


def test_tiff_rgb_bitspersample_is_out_of_line():
    """TIFF 6.0: a count-3 SHORT BitsPerSample exceeds the 4-byte IFD
    value field, so the value must be an OFFSET to a 3-SHORT array
    (not two 8s packed inline, which spec-correct readers follow as an
    offset). No libtiff in this environment, so pin the wire layout
    structurally in both byte orders and both compressions."""
    import struct as _struct

    from sim_spark.ops.tiff import decode_tiff, encode_tiff

    for be in (False, True):
        for comp in (1, 5):
            e = ">" if be else "<"
            px = bytes((i * 7 + 3) % 256 for i in range(4 * 3 * 3))
            p = encode_tiff(4, 3, px, channels=3, compression=comp,
                            big_endian=be)
            (n_tags,) = _struct.unpack_from(e + "H", p, 8)
            found = False
            for i in range(n_tags):
                base = 10 + i * 12
                tid, ttype, count = _struct.unpack_from(e + "HHI", p, base)
                if tid == 258:  # BitsPerSample
                    (off,) = _struct.unpack_from(e + "I", p, base + 8)
                    assert (ttype, count) == (3, 3)
                    assert off >= 10 + n_tags * 12 + 4  # beyond the IFD
                    assert _struct.unpack_from(e + "HHH", p, off) == (8, 8, 8)
                    found = True
            assert found
            assert decode_tiff(p) == (4, 3, 3, px)


def test_container_decompression_bounds():
    """Untrusted-bytes hardening (r13): a crafted tiny member may not
    inflate unboundedly. gzip (no declared size before the trailer)
    enforces a hard budget; ZIP bounds by the central directory's
    declared size and types the overrun."""
    import struct as _struct

    from sim_spark.ops.gzf import encode_gzip_members, parse_gzip_members
    from sim_spark.ops.zipwalk import encode_zip, parse_zip

    bomb = encode_gzip_members([("z", b"\x00" * (8 << 20))])
    assert len(bomb) < 20000  # it IS a bomb: ~1000x expansion
    with pytest.raises(ValueError, match="budget"):
        parse_gzip_members(bomb, max_member_bytes=1 << 20)
    # within budget the same member parses fine
    assert parse_gzip_members(bomb)[0]["content"] == b"\x00" * (8 << 20)

    zp = bytearray(encode_zip([("a.txt", b"q" * 10000, True)]))
    eocd = zp.rindex(b"PK\x05\x06")
    cd_off = _struct.unpack_from("<I", zp, eocd + 16)[0]
    _struct.pack_into("<I", zp, cd_off + 24, 10)  # central raw_len lies
    _struct.pack_into("<I", zp, 22, 10)           # local raw_len lies
    with pytest.raises(ValueError, match="inflates past"):
        parse_zip(bytes(zp))
    with pytest.raises(ValueError, match="name too long"):
        encode_zip([("n" * 65536, b"", False)])


def test_id3v2_unsync_apic_footer_extended_header():
    """ID3v2 features real files carry (r13): v2.3 tag-wide
    unsynchronisation round-trips hostile (0xFF-dense) APIC bytes;
    extended headers are skipped by each version's size rule; the
    v2.4 footer's 10 bytes are counted and its magic verified; flag
    misuse is a NAMED error, not a downstream 'lost sync'."""
    from sim_spark.ops.mp3 import (
        encode_id3v2,
        parse_id3v2,
        unsync_stuff,
        unsync_unstuff,
    )

    art = bytes(range(256)) * 4  # plenty of 0xFF and FF-Ex pairs
    frames = [("TIT2", "x"), ("APIC", ("image/png", 3, "c", art))]
    t = encode_id3v2(frames, version=3, unsync=True, ext_header=True)
    assert t[5] & 0xC0 == 0xC0  # both flags set
    assert b"\xff\xe0" not in t[10:]  # no false sync survives in the body
    tags, total = parse_id3v2(t + b"\xff\xfb audio")
    assert total == len(t)
    assert tags["APIC"]["data"] == art  # unstuff restored every byte
    assert tags["APIC"]["mime"] == "image/png"
    t4 = encode_id3v2(frames, version=4, ext_header=True, footer=True)
    tags4, total4 = parse_id3v2(t4)
    assert total4 == len(t4) and t4[-10:-7] == b"3DI"
    assert tags4["APIC"]["data"] == art and tags4["TIT2"] == "x"
    assert unsync_unstuff(unsync_stuff(art)) == art
    with pytest.raises(ValueError, match="per-frame unsynchronisation"):
        parse_id3v2(b"ID3\x04\x00\x80" + bytes(4))
    with pytest.raises(ValueError, match="v2.4-only footer"):
        parse_id3v2(b"ID3\x03\x00\x10" + bytes(4))
    with pytest.raises(ValueError, match="unknown ID3v2 header flags"):
        parse_id3v2(b"ID3\x04\x00\x01" + bytes(4))
    with pytest.raises(ValueError, match="bad ID3v2.4 footer"):
        bad = bytearray(t4)
        bad[-10] ^= 0xFF
        parse_id3v2(bytes(bad))
    with pytest.raises(ValueError, match="v2.3-only"):
        encode_id3v2(frames, version=4, unsync=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_id3v2(frames, version=4, footer=True, padding=3)
    with pytest.raises(ValueError, match="APIC description encoding"):
        t3 = encode_id3v2([("APIC", ("m", 0, "d", b"z"))], version=3)
        bad = bytearray(t3)
        bad[20] = 9  # first APIC data byte = bogus text encoding
        parse_id3v2(bytes(bad))


def test_zip64_interop_both_directions():
    """ZIP64 (r13): the shape every >4 GiB / >65535-member dataset
    shard takes. Forced-small and auto-engaged (>65535 members)
    archives round-trip; stdlib zipfile reads ours and we read its —
    including its force_zip64 local-header style (sentinel local
    sizes deferring to the 0x0001 extra); malformed ZIP64 shapes are
    typed errors."""
    import io
    import zipfile

    from sim_spark.ops.zipwalk import encode_zip, parse_zip

    members = [("a.txt", b"hello" * 100, True), ("b", b"stored", False)]
    p64 = encode_zip(members, zip64=True)
    assert b"PK\x06\x06" in p64 and b"PK\x06\x07" in p64
    assert [(r["name"], r["content"]) for r in parse_zip(p64)] == [
        (n, c) for n, c, _ in members
    ]
    with zipfile.ZipFile(io.BytesIO(p64)) as zf:
        assert zf.read("a.txt") == b"hello" * 100
    # classic stays classic: no ZIP64 records unless needed or forced
    assert b"PK\x06\x06" not in encode_zip(members)

    n = 65540  # auto-engage on the 16-bit member-count overflow
    big = encode_zip([(f"f{i}", b"", False) for i in range(n)])
    assert len(parse_zip(big)) == n
    with zipfile.ZipFile(io.BytesIO(big)) as zf:
        assert len(zf.namelist()) == n
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            zf.writestr(f"g{i}", "")
    assert len(parse_zip(buf.getvalue())) == n

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        with zf.open("x.bin", "w", force_zip64=True) as f:
            f.write(b"payload" * 1000)
    assert parse_zip(buf.getvalue())[0]["content"] == b"payload" * 1000

    # locator signature destroyed: the parser now falls back to the
    # classic EOCD fields (stdlib behavior, ADVICE r13) — here those
    # are forced-ZIP64 sentinels, so the walk still fails TYPED on the
    # nonsense classic offset rather than raising a bare struct.error
    with pytest.raises(ValueError, match="overruns"):
        parse_zip(p64.replace(b"PK\x06\x07", b"PK\x06\x08"))
    q = bytearray(p64)
    q[q.index(b"\x01\x00\x18\x00")] = 9  # corrupt the 0x0001 extra id
    with pytest.raises(ValueError, match="0x0001"):
        parse_zip(bytes(q))


def test_decode_dispatch_covers_every_container():
    """The generic decode() sniffer routes every format in the matrix
    (r13): sample decoders for images/audio, container walks for
    gzip/zip/tar/MP4/WARC; only MP3/video SAMPLE decode stays fenced."""
    from sim_spark.ops.gzf import encode_gzip_members
    from sim_spark.ops.mp4 import encode_mp4_meta
    from sim_spark.ops.multimodal import decode
    from sim_spark.ops.tarwalk import encode_tar
    from sim_spark.ops.tiff import encode_tiff
    from sim_spark.ops.warc import encode_warc_records
    from sim_spark.ops.zipwalk import encode_zip

    t = encode_tiff(4, 3, bytes(range(36)), channels=3, big_endian=True)
    assert decode(t)["kind"] == "tiff" and decode(t)["channels"] == 3
    g = encode_gzip_members([("a", b"x")])
    assert decode(g) == {"kind": "gzip", "members": decode(g)["members"]}
    assert decode(g)["members"][0]["content"] == b"x"
    z = encode_zip([("a", b"y", True)])
    assert decode(z)["kind"] == "zip"
    m = encode_mp4_meta("isom", 0, ["mp41"], 600, 600,
                        [dict(handler="vide", timescale=90000, duration=90,
                              sample_sizes=[5], width=16, height=16)])
    out = decode(m)
    assert out["kind"] == "mp4" and out["tracks"][0]["handler"] == "vide"
    w = encode_warc_records([dict(type="metadata", record_id="<u:1>",
                                  date="2024-01-01T00:00:00Z", content=b"")])
    assert decode(w)["kind"] == "warc"
    tar = encode_tar([("a.txt", b"z", 0)])
    assert decode(tar)["kind"] == "tar"


def test_warc_block_digest_verification():
    """WARC-Block-Digest (r13): sha256-labelled digests are VERIFIED
    on parse — a flipped content byte is a typed error; unknown
    algorithms pass through unverified (spec-legal)."""
    from sim_spark.ops.warc import encode_warc_records, parse_warc_records

    rec = dict(type="resource", record_id="<u:1>", target_uri="http://a/",
               date="2024-01-01T00:00:00Z", content=b"the block bytes",
               block_digest=True)
    p = encode_warc_records([rec])
    assert b"WARC-Block-Digest: sha256:" in p
    out = parse_warc_records(p)
    assert out[0]["fields"]["WARC-Block-Digest"].startswith("sha256:")
    q = bytearray(p)
    q[q.index(b"the block")] ^= 0x01
    with pytest.raises(ValueError, match="digest mismatch"):
        parse_warc_records(bytes(q))
    # unknown algorithm: surfaced, not verified
    p2 = p.replace(b"WARC-Block-Digest: sha256:",
                   b"WARC-Block-Digest: sha1xx:")
    assert parse_warc_records(p2)[0]["content"] == b"the block bytes"


def test_bz2_multistream_walk_roundtrip_and_bounds():
    """bzip2 multistream walk (the Wikipedia-dump shape): stream
    boundaries recovered, levels parsed, stdlib agrees on concatenated
    content; empty streams (sqrt-pi footer) handled; inflate is
    budget-bounded; malformed shapes are typed."""
    import bz2 as _bz2

    from sim_spark.ops.bz2walk import encode_bz2_streams, parse_bz2_streams
    from sim_spark.ops.multimodal import decode

    streams = [(9, b"hello world" * 100), (1, b""), (5, bytes(range(256)) * 40)]
    p = encode_bz2_streams(streams)
    recs = parse_bz2_streams(p)
    assert [(r["level"], r["content"]) for r in recs] == streams
    assert sum(r["stream_bytes"] for r in recs) == len(p)
    assert _bz2.decompress(p) == b"".join(c for _l, c in streams)
    assert decode(p)["kind"] == "bz2"
    bomb = encode_bz2_streams([(9, b"\x00" * (8 << 20))])
    assert len(bomb) < 100  # 48-byte bomb -> 8 MiB
    with pytest.raises(ValueError, match="budget"):
        parse_bz2_streams(bomb, max_stream_bytes=1 << 20)
    with pytest.raises(ValueError, match="truncated"):
        parse_bz2_streams(p[:-3])
    with pytest.raises(ValueError, match="magic"):
        parse_bz2_streams(b"XZh1" + p[4:])
    with pytest.raises(ValueError, match="level"):
        parse_bz2_streams(b"BZh0" + p[4:])
    with pytest.raises(ValueError, match="block magic"):
        parse_bz2_streams(p[:4] + b"\x00" + p[5:])
    q = bytearray(p)
    q[20] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt"):
        parse_bz2_streams(bytes(q))
    with pytest.raises(ValueError):
        encode_bz2_streams([(0, b"x")])


def test_zip64_exact_65535_member_boundary():
    """ADVICE r13 (medium): an archive with EXACTLY 65535 members sits
    ON the 16-bit sentinel. The encoder must engage ZIP64 at >= the
    sentinel (never emitting a literal 0xFFFF as a real count), and
    the parser must tolerate writers that DID store the plain value
    with no ZIP64 structures (stdlib-reader fallback behavior)."""
    import io
    import struct
    import zipfile

    from sim_spark.ops.zipwalk import encode_zip, parse_zip

    n = 0xFFFF
    members = [(f"f{i}", b"", False) for i in range(n)]
    p = encode_zip(members)
    # ZIP64 engaged AT the sentinel: real count lives in the EOCD64
    assert b"PK\x06\x06" in p and b"PK\x06\x07" in p
    assert len(parse_zip(p)) == n
    with zipfile.ZipFile(io.BytesIO(p)) as zf:
        assert len(zf.namelist()) == n

    # stdlib at the same boundary (whatever shape this stdlib writes,
    # plain 0xFFFF or ZIP64) must parse
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            zf.writestr(f"g{i}", "")
    assert len(parse_zip(buf.getvalue())) == n

    # synthetic fallback case: rewrite OUR archive's EOCD to the
    # classic plain-0xFFFF shape with the ZIP64 records cut out —
    # the parser must fall back to the classic fields, not reject
    eocd_pos = p.rindex(b"PK\x05\x06")
    e64_pos = p.rindex(b"PK\x06\x06")
    _d, _cd, _n1, _n2, cd_size, _off, _cl = struct.unpack_from(
        "<HHHHIIH", p, eocd_pos + 4
    )
    cd_off = e64_pos - cd_size
    classic = p[:e64_pos] + b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, cd_size, cd_off, 0
    )
    assert len(parse_zip(classic)) == n

    # 2**32-1 byte sizes cannot be built in-memory here, but the
    # trigger comparison itself is what the fix changes: verify via a
    # zero-offset archive that >= engages entry64 exactly at the
    # sentinel by checking the code path constants
    from sim_spark.ops import zipwalk as zw

    src = open(zw.__file__).read()
    assert ">= 0xFFFF" in src and ">= 0xFFFFFFFF" in src


def test_mp4_truncated_leaf_payloads_are_typed_errors():
    """ADVICE r13 (low): a crafted box with a valid full-box header
    but a short fixed-layout body must raise ValueError (the module
    contract), never struct.error."""
    import struct

    from sim_spark.ops.mp4 import encode_mp4_meta, parse_mp4_meta

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))

    # mvhd v1 header with a body too short for its 64-bit times
    for body in (b"\x01\x00\x00\x00" + b"\x00" * 8,
                 b"\x00\x00\x00\x00" + b"\x00" * 6):
        with pytest.raises(ValueError, match="truncated mvhd"):
            parse_mp4_meta(ftyp + box(b"moov", box(b"mvhd", body)))

    good = encode_mp4_meta(
        "isom", 0, [], 600, 600,
        [dict(handler="vide", timescale=90000, duration=90,
              sample_sizes=[5, 7], width=16, height=16)],
    )
    mvhd_ok = box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 600, 600))

    # stsz with a valid full-box header but a body short of its own
    # fixed header; same for stts; tkhd short of width/height; mdhd v1
    trunc_cases = [
        (b"stsz", b"\x00" * 4 + b"\x00\x00", "truncated stsz header"),
        (b"stts", b"\x00" * 4 + b"\x00", "truncated stts header"),
        (b"mdhd", b"\x01\x00\x00\x00" + b"\x00" * 10, "truncated mdhd v1"),
        (b"tkhd", b"\x00" * 4 + b"\x00" * 20, "truncated tkhd"),
    ]
    for btype, body, msg in trunc_cases:
        if btype in (b"stsz", b"stts"):
            inner = box(b"minf", box(b"stbl", box(btype, body)))
            trak = box(
                b"trak",
                box(b"mdia",
                    box(b"mdhd", b"\x00" * 4 + struct.pack(
                        ">IIII", 0, 0, 90000, 90) + b"\x00" * 4)
                    + box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 14)
                    + inner),
            )
        elif btype == b"mdhd":
            trak = box(
                b"trak",
                box(b"mdia",
                    box(btype, body)
                    + box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 14)),
            )
        else:  # tkhd
            trak = box(b"trak", box(btype, body))
        with pytest.raises(ValueError, match=msg):
            parse_mp4_meta(ftyp + box(b"moov", mvhd_ok + trak))

    # and the well-formed encoder output still parses after the fix
    out = parse_mp4_meta(good)
    assert out["tracks"][0]["sample_bytes"] == 12


def test_mediawiki_dump_grammar_and_typed_errors():
    """MediaWiki export grammar (r14, verdict task 3): multistream
    round-trip with escapes and unknown-element skip; the fragment
    (seek-one-stream) path; <text bytes> verification; and typed
    errors on every malformed shape."""
    from sim_spark.ops.bz2walk import encode_bz2_streams, parse_bz2_streams
    from sim_spark.ops.mediawiki import (
        encode_mediawiki_dump,
        parse_mediawiki_dump,
        parse_pages_fragment,
    )

    pages = [
        dict(title="A&B <odd> \"q\"", ns=0, page_id=11, revisions=[
            dict(rev_id=1101, timestamp="2024-01-01T00:00:00Z",
                 username="u&1", text="x < y && z > w; 100% \"sure\""),
            dict(rev_id=1102, timestamp="2024-01-02T00:00:00Z",
                 username="", text=""),
        ]),
        dict(title="Plain", ns=4, page_id=12, revisions=[
            dict(rev_id=1201, timestamp="2024-02-01T00:00:00Z",
                 username="v", text="t" * 200),
        ]),
        dict(title="Third", ns=10, page_id=13, revisions=[
            dict(rev_id=1301, timestamp="2024-03-01T00:00:00Z",
                 username="w", text="&<>'\""),
        ]),
    ]
    d = encode_mediawiki_dump("My Wiki", "mywiki_db", pages,
                              pages_per_stream=2, level=5)
    out = parse_mediawiki_dump(d)
    # head + ceil(3/2) page streams + footer
    assert out["n_streams"] == 4
    assert (out["sitename"], out["dbname"]) == ("My Wiki", "mywiki_db")
    assert out["version"] == "0.11" and out["lang"] == "en"
    got = out["pages"]
    assert [p["page_id"] for p in got] == [11, 12, 13]
    assert got[0]["title"] == "A&B <odd> \"q\""
    assert got[0]["revisions"][0]["text"] == "x < y && z > w; 100% \"sure\""
    assert got[0]["revisions"][0]["username"] == "u&1"
    assert got[0]["revisions"][1]["text"] == ""
    assert got[2]["revisions"][0]["text"] == "&<>'\""

    # the seek path: middle stream parses standalone as a fragment
    streams = parse_bz2_streams(d)
    frag = parse_pages_fragment(streams[1]["content"].decode())
    assert [p["page_id"] for p in frag] == [11, 12]

    # <text bytes> attribute is verified (WARC-digest stance)
    import re as _re

    xml = b"".join(s["content"] for s in streams).decode()
    bad = _re.sub(r'bytes="200"', 'bytes="199"', xml)
    with pytest.raises(ValueError, match="bytes"):
        parse_mediawiki_dump(encode_bz2_streams([(9, bad.encode())]))

    def frag_err(s, msg):
        with pytest.raises(ValueError, match=msg):
            parse_pages_fragment(s)

    rev = ("<revision><id>5</id><timestamp>t</timestamp>"
           "<text>x</text></revision>")
    frag_err("<page><ns>0</ns><id>1</id>" + rev + "</page>",
             "missing <title>")
    frag_err("<page><title>a</title><title>b</title><ns>0</ns><id>1</id>"
             + rev + "</page>", "duplicate <title>")
    frag_err("<page><title>a</title><ns>0</ns><id>1</id></page>",
             "no <revision>")
    frag_err("<page><title>a</title><ns>x</ns><id>1</id>" + rev + "</page>",
             "not an integer")
    frag_err("<page><title>a</title><ns>0</ns><id>1</id>" + rev + "</wrong>",
             "mismatched close")
    frag_err("<page><title>a</title><ns>0</ns><id>1</id>" + rev,
             "unclosed element")
    frag_err("<page><title>a&bogus;</title><ns>0</ns><id>1</id>" + rev
             + "</page>", "unknown XML entity")
    frag_err("<page><title>a&#xGG;</title><ns>0</ns><id>1</id>" + rev
             + "</page>", "bad numeric character reference")
    frag_err("loose text", "character data outside")
    frag_err("   ", "no <page>")
    frag_err("<page><page><title>a</title></page></page>", "nested <page>")

    # dump-level typed errors
    def dump_err(xml_text, msg):
        with pytest.raises(ValueError, match=msg):
            parse_mediawiki_dump(encode_bz2_streams([(1, xml_text.encode())]))

    dump_err("<notwiki></notwiki>", "expected <mediawiki>")
    dump_err("<mediawiki><siteinfo><sitename>s</sitename>"
             "<dbname>d</dbname></siteinfo>", "unclosed <mediawiki>")
    dump_err("<mediawiki></mediawiki>", "missing <siteinfo>")
    dump_err("<mediawiki><siteinfo><sitename>s</sitename><dbname>d"
             "</dbname></siteinfo></mediawiki><page>", "after </mediawiki>")

    # numeric character references and comments are honored
    ok = ("<?xml version=\"1.0\"?><mediawiki version=\"0.11\">"
          "<!-- c --><siteinfo><sitename>&#87;iki</sitename>"
          "<dbname>&#x64;b</dbname></siteinfo></mediawiki>")
    parsed = parse_mediawiki_dump(encode_bz2_streams([(1, ok.encode())]))
    assert parsed["sitename"] == "Wiki" and parsed["dbname"] == "db"


def test_heif_item_walk_roundtrip_and_typed_errors():
    """HEIF (ops/heif.py, r14): the full iloc/pitm/infe layout matrix
    round-trips; multi-extent data resolves against the real file
    bytes; ispe dims bind through ipma; typed errors on escaping
    extents, unsupported construction methods, missing boxes, bad
    property indices."""
    from sim_spark.ops.heif import encode_heif_meta, parse_heif_meta

    def mk_items():
        return [
            dict(item_id=1, item_type="hvc1", item_name="p",
                 data=b"MAIN" * 5, width=320, height=240),
            dict(item_id=2, item_type="hvc1", item_name="t",
                 extents=[b"AB", b"CDE", b"F"], width=32, height=24),
            dict(item_id=9, item_type="Exif", data=b"Exif\x00meta"),
        ]

    for ilv in (0, 1, 2):
        for osz, bsz in ((4, 0), (4, 4), (8, 8)):
            f = encode_heif_meta(
                "heic", mk_items(), 1, iloc_version=ilv,
                offset_size=osz, base_offset_size=bsz,
                pitm_version=ilv % 2, infe_version=2 + ilv % 2,
            )
            r = parse_heif_meta(f)
            assert r["primary_id"] == 1
            assert [i["data"] for i in r["items"]] == [
                b"MAIN" * 5, b"ABCDEF", b"Exif\x00meta"]
            assert len(r["items"][1]["extents"]) == 3
            assert (r["items"][0]["width"], r["items"][1]["height"],
                    r["items"][2]["width"]) == (320, 24, None)
            assert r["n_properties"] == 2

    # extent escaping the file (truncate the mdat tail)
    f = encode_heif_meta("heic", [dict(item_id=1, item_type="hvc1",
                                       data=b"XYZT")], 1)
    with pytest.raises(ValueError):
        parse_heif_meta(f[:-2])
    # construction_method != 0 rejected (patch the iloc v1 cm field)
    f = encode_heif_meta("heic", [dict(item_id=1, item_type="hvc1",
                                       data=b"XY")], 1, iloc_version=1)
    il_off = f.index(b"iloc") + 4
    # layout after fullbox(4) + sizes(2) + count(2): item_id(2), cm(2)
    raw = bytearray(f)
    raw[il_off + 4 + 2 + 2 + 2 + 1] = 1
    with pytest.raises(ValueError, match="construction_method"):
        parse_heif_meta(bytes(raw))
    # primary item absent from iinf
    with pytest.raises(ValueError, match="not in items"):
        encode_heif_meta("heic", [dict(item_id=2, item_type="hvc1",
                                       data=b"X")], 1)
    # duplicate ids
    with pytest.raises(ValueError, match="duplicate item_id"):
        encode_heif_meta("heic", [
            dict(item_id=1, item_type="hvc1", data=b"X"),
            dict(item_id=1, item_type="hvc1", data=b"Y")], 1)
    # ipma property index beyond ipco
    f = bytearray(encode_heif_meta(
        "heic", [dict(item_id=1, item_type="hvc1", data=b"X",
                      width=4, height=4)], 1))
    ap = f.index(b"ipma") + 4
    # fullbox(4) + count(4) + item_id(2) + assoc_count(1) -> assoc byte
    f[ap + 4 + 4 + 2 + 1] = 0x80 | 5
    with pytest.raises(ValueError, match="outside ipco"):
        parse_heif_meta(bytes(f))
    # handler must be pict
    f = bytearray(encode_heif_meta(
        "heic", [dict(item_id=1, item_type="hvc1", data=b"X")], 1))
    hp = f.index(b"pict")
    f[hp:hp + 4] = b"vide"
    with pytest.raises(ValueError, match="not 'pict'"):
        parse_heif_meta(bytes(f))


def test_crc32c_known_answer_vectors():
    """Published Castagnoli vectors (RFC 3720 / CRC catalog) pin the
    polynomial, reflection and init/xor conventions — an EXTERNAL
    oracle, unlike round-trips."""
    from sim_spark.ops.tfrecord import crc32c, masked_crc32c

    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    # TF mask is an involution-free transform; spot-check the formula
    c = crc32c(b"123456789")
    assert masked_crc32c(b"123456789") == (
        (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def test_tfrecord_example_roundtrip_and_typed_errors():
    from sim_spark.ops.tfrecord import (
        encode_example,
        encode_tfrecord_file,
        parse_example,
        parse_tfrecord_file,
    )

    ex = dict(
        ids=[0, 1, -1, 2**40, -(2**40)],
        text=[b"hello", b"", b"\xff\x00"],
        w=[0.5, -2.25, 1e10],
    )
    back = parse_example(encode_example(ex))
    assert back["ids"] == ("int64", ex["ids"])
    assert back["text"] == ("bytes", ex["text"])
    assert back["w"][0] == "float" and back["w"][1][:2] == [0.5, -2.25]
    # unpacked int64 encoding is also accepted (legal on the wire)
    from sim_spark.ops.tfrecord import _key, _ld, _varint

    unpacked = _ld(3, _key(1, 0) + _varint(7) + _key(1, 0) + _varint(9))
    feat = _ld(1, _ld(1, b"k") + _ld(2, unpacked))
    msg = _ld(1, feat)
    assert parse_example(msg)["k"] == ("int64", [7, 9])
    # framing + CRC verification
    recs = [encode_example(ex), b"", b"x" * 1000]
    f = encode_tfrecord_file(recs)
    assert parse_tfrecord_file(f) == recs
    bad = bytearray(f)
    bad[13] ^= 0x40  # flip a data byte in record 0
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_tfrecord_file(bytes(bad))
    bad = bytearray(f)
    bad[3] ^= 1  # flip a length byte -> length CRC fails first
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_tfrecord_file(bytes(bad))
    with pytest.raises(ValueError, match="truncated record"):
        parse_tfrecord_file(f[:-2])
    # oneof with two arms set is refused
    feat_two = _ld(1, _ld(1, b"x")) + _ld(3, b"")  # BytesList AND Int64List
    entry = _ld(1, b"k") + _ld(2, feat_two)
    with pytest.raises(ValueError, match="oneof"):
        parse_example(_ld(1, _ld(1, entry)))


def test_avro_ocf_roundtrip_and_typed_errors():
    import hashlib
    import json as _json

    from sim_spark.ops.avro import encode_avro_ocf, parse_avro_ocf

    schema = {"type": "record", "name": "T", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "ok", "type": "boolean"},
    ]}
    recs = [dict(id=(-1) ** i * (i ** 3), s=f"v{i}" * (i % 4),
                 b=bytes([i % 256]) * (i % 3), d=i + 0.25, f=float(i),
                 ok=bool(i % 2)) for i in range(40)]
    sync = hashlib.md5(b"s").digest()
    for codec in ("null", "deflate"):
        r = parse_avro_ocf(encode_avro_ocf(schema, recs, sync,
                                           codec=codec,
                                           records_per_block=6))
        assert r["records"] == recs
        assert r["n_blocks"] == 7
        assert r["schema"]["name"] == "T"
    f = encode_avro_ocf(schema, recs, sync, records_per_block=10)
    with pytest.raises(ValueError, match="bad avro magic"):
        parse_avro_ocf(b"Obj\x02" + f[4:])
    bad = bytearray(f)
    bad[f.index(sync, f.index(sync, 4) + 16)] ^= 1
    with pytest.raises(ValueError, match="sync marker mismatch"):
        parse_avro_ocf(bytes(bad))
    with pytest.raises(ValueError, match="unsupported avro codec"):
        encode_avro_ocf(schema, recs, sync, codec="snappy")
    nested = {"type": "record", "name": "N", "fields": [
        {"name": "x", "type": {"type": "array", "items": "long"}}]}
    with pytest.raises(ValueError, match="unsupported type"):
        encode_avro_ocf(nested, [], sync)
    with pytest.raises(ValueError, match="missing avro.schema"):
        # strip metadata: magic + empty map + sync, no schema entry
        parse_avro_ocf(b"Obj\x01" + b"\x00" + sync)


def test_parquet_footer_thrift_walk():
    """ops/parquet_meta.py (r14): the from-scratch thrift-compact
    footer parse agrees with pyarrow's own metadata reader field for
    field across compressions, and decodes exact INT32/INT64
    min/max statistics; typed errors on corrupt framing."""
    import io

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sim_spark.ops.parquet_meta import parse_parquet_footer

    rng = np.random.default_rng(5)
    for comp in ("snappy", "none", "zstd", "gzip"):
        n = 37
        ids = rng.integers(-10**12, 10**12, n)
        t = pa.table({
            "id": ids,
            "small": ids.astype(np.int32) % 1000,
            "name": [f"s{i}" for i in range(n)],
        })
        buf = io.BytesIO()
        pq.write_table(t, buf, row_group_size=8, compression=comp)
        data = buf.getvalue()
        r = parse_parquet_footer(data)
        md = pq.ParquetFile(io.BytesIO(data)).metadata
        assert r["num_rows"] == n
        assert len(r["row_groups"]) == md.num_row_groups == 5
        for g in range(md.num_row_groups):
            for ci in range(md.num_columns):
                pc = md.row_group(g).column(ci)
                mine = r["row_groups"][g]["columns"][ci]
                assert mine["path"] == pc.path_in_schema
                assert mine["num_values"] == pc.num_values
                assert mine["total_compressed_size"] == pc.total_compressed_size
                assert mine["data_page_offset"] == pc.data_page_offset
        # INT64 stats decode exactly
        for g in range(5):
            seg = ids[8 * g:8 * g + 8]
            st = r["row_groups"][g]["columns"][0]["stats"]
            assert st["min_value"] == seg.min()
            assert st["max_value"] == seg.max()
    with pytest.raises(ValueError, match="PAR1"):
        parse_parquet_footer(data[:-1])
    bad = bytearray(data)
    # absurd footer length
    bad[-8:-4] = (len(data) * 2).to_bytes(4, "little")
    with pytest.raises(ValueError, match="escapes the file"):
        parse_parquet_footer(bytes(bad))
