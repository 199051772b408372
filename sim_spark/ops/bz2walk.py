"""bzip2 MULTISTREAM container walk (round 13).

Wikipedia dumps — a canonical LLM pretraining corpus — ship as
``*-multistream.xml.bz2``: many independently-compressed bzip2 STREAMS
concatenated, so readers can seek to an offset from the companion
index and decompress one stream (typically 100 pages) without touching
the rest. Python's ``bz2`` module happily decompresses concatenations
but hides the stream structure; a curation pipeline needs the
boundaries, per-stream headers, and size accounting — the same gap
ops/gzf.py closes for gzip.

This module walks the container directly: per-stream ``BZh`` magic,
compression-level digit (1-9, the 100k-900k block size), the
``1AY&SY`` (pi) compressed-block magic, stream-boundary recovery from
``BZ2Decompressor.unused_data``, and a per-stream inflate budget
(bzip2's ~1.4% worst-case ratio makes tiny bombs cheap to craft).
Block-level entropy decode itself is stdlib ``bz2`` — the same stance
as zlib inside the PNG/gzip walks.

Typed ValueError on every malformed shape: bad stream magic, invalid
level digit, bad block magic, truncated stream, corrupt data (stdlib's
CRC check surfaces typed), budget overrun, empty payload.
"""

from __future__ import annotations

import bz2

__all__ = ["encode_bz2_streams", "parse_bz2_streams", "MAX_STREAM_BYTES"]

#: per-stream inflate budget (see ops/gzf.py MAX_MEMBER_BYTES)
MAX_STREAM_BYTES = 1 << 28  # 256 MiB

_BLOCK_MAGIC = b"\x31\x41\x59\x26\x53\x59"  # pi digits: "1AY&SY"
_EOS_MAGIC = b"\x17\x72\x45\x38\x50\x90"  # sqrt(pi): empty-stream footer


def encode_bz2_streams(streams: list[tuple[int, bytes]]) -> bytes:
    """Concatenate independent bzip2 streams: ``streams`` is a list of
    (compresslevel 1-9, content) — the multistream dump shape."""
    out = bytearray()
    for level, content in streams:
        if not 1 <= level <= 9:
            raise ValueError(f"bzip2 compresslevel {level} out of range")
        out += bz2.compress(content, compresslevel=level)
    return bytes(out)


def parse_bz2_streams(
    payload: bytes, max_stream_bytes: int = MAX_STREAM_BYTES
) -> list[dict]:
    """Walk every stream → [{"level": int, "content": bytes,
    "stream_bytes": int}, ...] with boundaries recovered from the
    decompressor's unused tail. A stream inflating past
    ``max_stream_bytes`` is a typed ValueError."""
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 10 > n:
            raise ValueError("truncated bzip2 stream header")
        if payload[pos : pos + 3] != b"BZh":
            raise ValueError(f"bad bzip2 magic at byte {pos}")
        level = payload[pos + 3] - 0x30
        if not 1 <= level <= 9:
            raise ValueError(f"invalid bzip2 level digit at byte {pos + 3}")
        if payload[pos + 4 : pos + 10] not in (_BLOCK_MAGIC, _EOS_MAGIC):
            # a stream opens with a compressed block (pi digits) or,
            # for an EMPTY stream, goes straight to the footer (sqrt pi)
            raise ValueError("bad bzip2 block magic (expected pi digits)")
        d = bz2.BZ2Decompressor()
        chunks: list[bytes] = []
        total = 0
        buf = payload[pos:]
        try:
            while True:
                chunk = d.decompress(buf, 1 << 20)
                chunks.append(chunk)
                total += len(chunk)
                if total > max_stream_bytes:
                    raise ValueError(
                        f"bzip2 stream inflates past the "
                        f"{max_stream_bytes}-byte budget"
                    )
                if d.eof or d.needs_input:
                    break
                buf = b""  # more output pending from internal buffer
        except OSError as e:  # stdlib's typed corrupt-data error
            raise ValueError(f"corrupt bzip2 stream: {e}") from e
        if not d.eof:
            raise ValueError("truncated bzip2 stream")
        consumed = (n - pos) - len(d.unused_data)
        out.append(
            dict(
                level=level,
                content=b"".join(chunks),
                stream_bytes=consumed,
            )
        )
        pos += consumed
    if not out:
        raise ValueError("empty bzip2 payload")
    return out
