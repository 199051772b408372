"""Multi-member gzip container walk (round 12).

Web-crawl archives — WARC/WET/WAT, the raw material of every LLM
pretraining pipeline — are MULTI-MEMBER gzip files: one independently
compressed member per record, concatenated, so readers can split and
seek at member boundaries. Python's ``gzip`` module happily
concatenates on read but hides the member structure; a curation
pipeline needs the boundaries, per-member headers, and integrity
checks. This module implements the RFC 1952 container walk directly
(deflate itself via stdlib zlib, as the PNG codec does): FLG bit
parsing (FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT), optional-field walks,
per-member CRC32 + ISIZE verification, and member-boundary recovery
from the decompressor's unused tail.

Typed ValueError on every malformed shape: bad magic, reserved flags,
truncated optional fields, CRC mismatch, ISIZE mismatch, trailing
garbage.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_gzip_members", "parse_gzip_members"]

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def encode_gzip_members(members: list[tuple[str | None, bytes]]) -> bytes:
    """Concatenate RFC 1952 members: ``members`` is a list of
    (filename or None, content). A filename emits the FNAME field;
    every third member also carries an FEXTRA subfield (the shape
    WARC writers use for record lengths) and every second an FHCRC
    header checksum, so parsers must walk all optional fields."""
    out = bytearray()
    for i, (name, content) in enumerate(members):
        flg = 0
        extra = b""
        if name is not None:
            flg |= _FNAME
        if i % 3 == 0:
            flg |= _FEXTRA
            payload = struct.pack("<I", len(content))
            extra = b"SL" + struct.pack("<H", len(payload)) + payload
        if i % 2 == 0:
            flg |= _FHCRC
        hdr = bytearray()
        hdr += b"\x1f\x8b\x08"
        hdr.append(flg)
        hdr += struct.pack("<I", (i * 1000003) & 0xFFFFFFFF)  # MTIME
        hdr += b"\x00\xff"  # XFL, OS=unknown
        if flg & _FEXTRA:
            hdr += struct.pack("<H", len(extra)) + extra
        if flg & _FNAME:
            hdr += name.encode("latin-1") + b"\x00"
        if flg & _FHCRC:
            hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)
        out += hdr
        co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
        out += co.compress(content) + co.flush()
        out += struct.pack(
            "<II", zlib.crc32(content) & 0xFFFFFFFF, len(content) & 0xFFFFFFFF
        )
    return bytes(out)


#: per-member inflate budget: gzip's ISIZE trailer sits AFTER the
#: deflate stream (mod 2^32), so unlike ZIP there is no declared size
#: to bound by before inflating — a hard cap makes a crafted tiny
#: member a typed error instead of a decompression bomb (ADVICE r12).
MAX_MEMBER_BYTES = 1 << 28  # 256 MiB


def parse_gzip_members(
    payload: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> list[dict]:
    """Walk every member → [{"name": str|None, "content": bytes,
    "mtime": int, "header_bytes": int, "member_bytes": int}, ...] with
    CRC32 + ISIZE verified per member. A member inflating past
    ``max_member_bytes`` is a typed ValueError."""
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        start = pos
        if pos + 10 > n:
            raise ValueError("truncated gzip member header")
        if payload[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(f"bad gzip magic at byte {pos}")
        if payload[pos + 2] != 8:
            raise ValueError("unknown gzip compression method")
        flg = payload[pos + 3]
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        (mtime,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 10
        if flg & _FEXTRA:
            if pos + 2 > n:
                raise ValueError("truncated FEXTRA length")
            (xlen,) = struct.unpack_from("<H", payload, pos)
            pos += 2
            if pos + xlen > n:
                raise ValueError("truncated FEXTRA field")
            pos += xlen
        name = None
        if flg & _FNAME:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated FNAME")
            name = payload[pos:end].decode("latin-1")
            pos = end + 1
        if flg & _FCOMMENT:
            end = payload.find(b"\x00", pos)
            if end < 0:
                raise ValueError("unterminated FCOMMENT")
            pos = end + 1
        if flg & _FHCRC:
            if pos + 2 > n:
                raise ValueError("truncated FHCRC")
            (hcrc,) = struct.unpack_from("<H", payload, pos)
            if hcrc != (zlib.crc32(payload[start:pos]) & 0xFFFF):
                raise ValueError("gzip header CRC mismatch")
            pos += 2
        header_bytes = pos - start
        d = zlib.decompressobj(-15)
        chunks: list[bytes] = []
        total = 0
        buf = payload[pos:]
        try:
            while True:
                chunk = d.decompress(buf, 1 << 20)
                chunks.append(chunk)
                total += len(chunk)
                if total > max_member_bytes:
                    raise ValueError(
                        f"gzip member inflates past the "
                        f"{max_member_bytes}-byte budget"
                    )
                if d.eof or not d.unconsumed_tail:
                    break
                buf = d.unconsumed_tail
        except zlib.error as e:
            raise ValueError(f"corrupt deflate stream: {e}") from e
        if not d.eof:
            raise ValueError("truncated deflate stream")
        content = b"".join(chunks)
        # member boundary = everything the decompressor did not consume
        consumed = (n - pos) - len(d.unused_data)
        pos += consumed
        if pos + 8 > n:
            raise ValueError("truncated gzip member trailer")
        crc, isize = struct.unpack_from("<II", payload, pos)
        pos += 8
        if crc != (zlib.crc32(content) & 0xFFFFFFFF):
            raise ValueError("gzip CRC32 mismatch")
        if isize != (len(content) & 0xFFFFFFFF):
            raise ValueError("gzip ISIZE mismatch")
        out.append(
            dict(
                name=name,
                content=content,
                mtime=mtime,
                header_bytes=header_bytes,
                member_bytes=pos - start,
            )
        )
    if not out:
        raise ValueError("empty gzip payload")
    return out
