"""ZIP container walk — dependency-free encoder + parser (round 12).

Datasets ship as .zip constantly; what a pipeline needs is the part
naive readers get wrong: a ZIP is defined by its END — the end-of-
central-directory record (EOCD) found by scanning BACKWARD past an
optional comment, then the central directory, whose entries (not the
local headers) are authoritative for member offsets and sizes
(APPNOTE.TXT, the public PKWARE spec). This module implements that
walk: EOCD discovery, central-directory entry parse, local-header
cross-validation, stored (method 0) and raw-deflate (method 8)
extraction via stdlib zlib, and per-member CRC32 + size verification.

EOCD discovery scans backward from the end, so when several EOCD
signatures appear (e.g. a ZIP embedded in a comment) the LAST one in
the file wins — the spec's own procedure; the comment-length check
then rejects records whose declared comment does not reach EOF.

Typed ValueError on every malformed shape: missing EOCD, EOCD
comment-length mismatch, entry-count or offset mismatch, local/central
header disagreement, CRC or size mismatch, unsupported compression
method, members that inflate past their declared size, and encode
inputs that exceed the 16/32-bit header fields (ZIP64 not supported).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_zip", "parse_zip"]

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"


def encode_zip(members: list[tuple[str, bytes, bool]]) -> bytes:
    """Build a ZIP: ``members`` is [(name, content, deflate?)]. Stored
    members keep content verbatim (method 0); deflated use raw deflate
    (method 8). Central directory + EOCD written per APPNOTE. The
    non-ZIP64 header fields are 16/32-bit; inputs that exceed them are
    a typed error, not a silent struct overflow."""
    if len(members) > 0xFFFF:
        raise ValueError(
            f"{len(members)} members exceed the 16-bit EOCD count "
            "(ZIP64 not supported)"
        )
    out = bytearray()
    central = bytearray()
    for i, (name, content, deflate) in enumerate(members):
        nb = name.encode("utf-8")
        if len(nb) > 0xFFFF:
            raise ValueError(f"ZIP member name too long ({len(nb)} bytes)")
        if len(content) > 0xFFFFFFFF:
            raise ValueError(
                f"ZIP member {name!r} exceeds 32-bit size field "
                "(ZIP64 not supported)"
            )
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(content) + co.flush()
            method = 8
        else:
            data = content
            method = 0
        offset = len(out)
        local = _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH",
            20,            # version needed
            0,             # flags
            method,
            0, 0,          # DOS time/date (fixed: determinism)
            crc,
            len(data),
            len(content),
            len(nb),
            0,             # extra len
        )
        out += local + nb + data
        central += _CENTRAL_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, method, 0, 0,
            crc, len(data), len(content),
            len(nb), 0, 0,    # name/extra/comment lens
            0, 0,             # disk no, internal attrs
            0,                # external attrs
            offset,
        ) + nb
    cd_off = len(out)
    out += central
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH",
        0, 0, len(members), len(members), len(central), cd_off, 0
    )
    return bytes(out)


def parse_zip(payload: bytes) -> list[dict]:
    """Walk a ZIP via EOCD → central directory → members. Returns
    [{"name", "content", "method", "comp_len"}, ...] in central-
    directory order with CRC32 and both sizes verified per member."""
    n = len(payload)
    # EOCD: fixed 22 bytes + variable comment; scan backward for the
    # signature (the spec's own discovery procedure)
    pos = -1
    scan_from = max(0, n - 22 - 0xFFFF)
    i = n - 22
    while i >= scan_from:
        if payload[i : i + 4] == _EOCD_SIG:
            pos = i
            break
        i -= 1
    if pos < 0:
        raise ValueError("ZIP end-of-central-directory record not found")
    (
        _disk, _cd_disk, n_here, n_total, cd_size, cd_off, comment_len
    ) = struct.unpack_from("<HHHHIIH", payload, pos + 4)
    if pos + 22 + comment_len != n:
        raise ValueError("ZIP EOCD comment length mismatch")
    if n_here != n_total:
        raise ValueError("multi-disk ZIP not supported")
    if cd_off + cd_size > pos:
        raise ValueError("ZIP central directory overruns EOCD")
    out: list[dict] = []
    p = cd_off
    for _ in range(n_total):
        if payload[p : p + 4] != _CENTRAL_SIG:
            raise ValueError("bad ZIP central-directory signature")
        (
            _vmade, _vneed, flags, method, _t, _d,
            crc, comp_len, raw_len, name_len, extra_len, comment_len2,
            _disk2, _iattr, _eattr, local_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", payload, p + 4)
        if flags & 0x1:
            raise ValueError("encrypted ZIP member")
        if method not in (0, 8):
            raise ValueError(f"unsupported ZIP compression method {method}")
        name = payload[p + 46 : p + 46 + name_len].decode("utf-8")
        p += 46 + name_len + extra_len + comment_len2
        # the LOCAL header must agree with the central entry
        if payload[local_off : local_off + 4] != _LOCAL_SIG:
            raise ValueError(f"bad ZIP local header for {name!r}")
        (
            _lv, lflags, lmethod, _lt, _ld, lcrc, lcomp, lraw, lname, lextra
        ) = struct.unpack_from("<HHHHHIIIHH", payload, local_off + 4)
        if (lmethod, lname) != (method, name_len) or (
            not (lflags & 0x8) and (lcrc, lcomp, lraw) != (crc, comp_len, raw_len)
        ):
            raise ValueError(f"ZIP local/central header mismatch for {name!r}")
        data_off = local_off + 30 + lname + lextra
        if data_off + comp_len > n:
            raise ValueError(f"ZIP member data overruns payload for {name!r}")
        data = payload[data_off : data_off + comp_len]
        if method == 8:
            # bound the inflate by the DECLARED size (+1 to detect
            # overrun): a small crafted member must not expand
            # unboundedly before the size check (ADVICE r12)
            d = zlib.decompressobj(-15)
            try:
                content = d.decompress(data, raw_len + 1)
            except zlib.error as e:
                raise ValueError(f"corrupt deflate in {name!r}: {e}") from e
            if len(content) > raw_len:
                raise ValueError(
                    f"ZIP member {name!r} inflates past its declared "
                    f"size {raw_len}"
                )
            if not d.eof:
                raise ValueError(f"truncated deflate in {name!r}")
        else:
            content = data
        if len(content) != raw_len:
            raise ValueError(f"ZIP size mismatch for {name!r}")
        if (zlib.crc32(content) & 0xFFFFFFFF) != crc:
            raise ValueError(f"ZIP CRC32 mismatch for {name!r}")
        out.append(
            dict(name=name, content=content, method=method, comp_len=comp_len)
        )
    if p != cd_off + cd_size:
        raise ValueError("ZIP central directory size mismatch")
    if not out:
        raise ValueError("empty ZIP archive")
    return out
