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

ZIP64 (r13): the shape every >4 GiB or >65535-member dataset shard
takes. The encoder auto-engages it on 16/32-bit field overflow (or
``zip64=True`` for testable small archives): sentinel classic fields,
per-entry 0x0001 extras, the ZIP64 EOCD record + locator. The parser
follows the sentinels back through the locator and resolves per-entry
sizes/offsets from the extras — interop is tested in BOTH directions
against stdlib zipfile, including its force_zip64 local-header style.

Typed ValueError on every malformed shape: missing EOCD, EOCD
comment-length mismatch, entry-count or offset mismatch, local/central
header disagreement, CRC or size mismatch, unsupported compression
method, members that inflate past their declared size, ZIP64 sentinels
without a locator/extra, and over-long names.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_zip", "parse_zip"]

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"


def encode_zip(
    members: list[tuple[str, bytes, bool]], zip64: bool | None = None
) -> bytes:
    """Build a ZIP: ``members`` is [(name, content, deflate?)]. Stored
    members keep content verbatim (method 0); deflated use raw deflate
    (method 8). Central directory + EOCD written per APPNOTE.

    ZIP64 (APPNOTE 4.5 — the shape every >4 GiB / >65535-member
    dataset shard takes, r13): engaged automatically when any count,
    size, or offset exceeds its 16/32-bit classic field, or forced
    with ``zip64=True`` for testable small archives. Overflowed
    classic fields carry the 0xFFFF/0xFFFFFFFF sentinels; real values
    move to the per-entry 0x0001 extra field, the ZIP64
    end-of-central-directory record, and its locator."""
    # >= — not > — on every trigger: an archive with EXACTLY 65535
    # members (or a size/offset of exactly 0xFFFFFFFF) would otherwise
    # store the literal sentinel value in the classic field, which
    # readers are required to treat as "consult the ZIP64 record"
    # (APPNOTE 4.4.1.4). Engaging ZIP64 at the sentinel value itself
    # means no real count/size/offset is ever emitted as a sentinel.
    need64 = bool(zip64) or len(members) >= 0xFFFF
    out = bytearray()
    central = bytearray()
    for i, (name, content, deflate) in enumerate(members):
        nb = name.encode("utf-8")
        if len(nb) > 0xFFFF:
            raise ValueError(f"ZIP member name too long ({len(nb)} bytes)")
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(content) + co.flush()
            method = 8
        else:
            data = content
            method = 0
        offset = len(out)
        entry64 = bool(zip64) or (
            len(data) >= 0xFFFFFFFF
            or len(content) >= 0xFFFFFFFF
            or offset >= 0xFFFFFFFF
        )
        need64 = need64 or entry64
        if entry64:
            # order per APPNOTE 4.5.3: raw, compressed, local offset
            extra64 = b"\x01\x00" + struct.pack(
                "<HQQQ", 24, len(content), len(data), offset
            )
            l_comp = l_raw = 0xFFFFFFFF
            c_off = 0xFFFFFFFF
            vneed = 45
        else:
            extra64 = b""
            l_comp, l_raw = len(data), len(content)
            c_off = offset
            vneed = 20
        # the LOCAL extra carries sizes only (no offset field)
        lextra64 = (
            b"\x01\x00" + struct.pack("<HQQ", 16, len(content), len(data))
            if entry64
            else b""
        )
        local = _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH",
            vneed,         # version needed
            0,             # flags
            method,
            0, 0,          # DOS time/date (fixed: determinism)
            crc,
            l_comp,
            l_raw,
            len(nb),
            len(lextra64),
        )
        out += local + nb + lextra64 + data
        central += _CENTRAL_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            45 if entry64 else 20, vneed, 0, method, 0, 0,
            crc, l_comp, l_raw,
            len(nb), len(extra64), 0,  # name/extra/comment lens
            0, 0,             # disk no, internal attrs
            0,                # external attrs
            c_off,
        ) + nb + extra64
    cd_off = len(out)
    out += central
    n = len(members)
    if need64 or cd_off > 0xFFFFFFFF:
        eocd64_off = len(out)
        out += _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ",
            44,            # size of remaining record
            45, 45,        # version made by / needed
            0, 0,          # disk numbers
            n, n,
            len(central),
            cd_off,
        )
        out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, eocd64_off, 1)
        n_16 = min(n, 0xFFFF)
        cd_off_32 = 0xFFFFFFFF  # readers must consult the ZIP64 record
    else:
        n_16 = n
        cd_off_32 = cd_off
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH",
        0, 0, n_16, n_16, len(central) & 0xFFFFFFFF, cd_off_32, 0
    )
    return bytes(out)


def _zip64_entry(
    payload: bytes,
    extra_at: int,
    extra_len: int,
    raw_len: int,
    comp_len: int,
    local_off: int,
    name: str,
) -> tuple[int, int, int]:
    """Resolve a central entry's sentinel fields from its 0x0001
    (ZIP64) extra field. Values appear ONLY for fields whose classic
    slot holds 0xFFFFFFFF, in the fixed order raw, comp, offset."""
    end = extra_at + extra_len
    q = extra_at
    while q + 4 <= end:
        eid, esz = struct.unpack_from("<HH", payload, q)
        q += 4
        if eid == 0x0001:
            r = q
            out = []
            for v in (raw_len, comp_len, local_off):
                if v == 0xFFFFFFFF:
                    if r + 8 > q + esz:
                        raise ValueError(
                            f"short ZIP64 extra field for {name!r}"
                        )
                    (v,) = struct.unpack_from("<Q", payload, r)
                    r += 8
                out.append(v)
            return out[0], out[1], out[2]
        q += esz
    raise ValueError(f"ZIP64 sentinel without 0x0001 extra for {name!r}")


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
    cd_end = pos
    if 0xFFFF in (n_here, n_total) or 0xFFFFFFFF in (cd_size, cd_off):
        # ZIP64 (APPNOTE 4.5): sentinel classic fields → locator
        # (fixed 20 bytes immediately before the EOCD) → ZIP64 EOCD.
        # Writers in the wild (old stdlib zipfile among them) have
        # emitted archives whose classic fields happen to EQUAL a
        # sentinel without writing any ZIP64 structures; stdlib's
        # reader tolerates that by falling back to the classic values
        # when no locator precedes the EOCD, and so do we (ADVICE r13).
        if pos >= 20 and payload[pos - 20 : pos - 16] == _EOCD64_LOC_SIG:
            _ld, e64_off, n_disks = struct.unpack_from(
                "<IQI", payload, pos - 16
            )
            if n_disks != 1:
                raise ValueError("multi-disk ZIP64 not supported")
            if (
                e64_off + 56 > n
                or payload[e64_off : e64_off + 4] != _EOCD64_SIG
            ):
                raise ValueError("bad ZIP64 EOCD record")
            (
                _rsz, _vm, _vn, _d1, _d2, n_here, n_total, cd_size, cd_off
            ) = struct.unpack_from("<QHHIIQQQQ", payload, e64_off + 4)
            cd_end = e64_off
    if n_here != n_total:
        raise ValueError("multi-disk ZIP not supported")
    if cd_off + cd_size > cd_end:
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
        if 0xFFFFFFFF in (comp_len, raw_len, local_off):
            # ZIP64 extra 0x0001: 8-byte values ONLY for the sentinel
            # fields, in fixed order raw, comp, offset (APPNOTE 4.5.3)
            raw_len, comp_len, local_off = _zip64_entry(
                payload, p + 46 + name_len, extra_len,
                raw_len, comp_len, local_off, name,
            )
        p += 46 + name_len + extra_len + comment_len2
        # the LOCAL header must agree with the central entry
        if payload[local_off : local_off + 4] != _LOCAL_SIG:
            raise ValueError(f"bad ZIP local header for {name!r}")
        (
            _lv, lflags, lmethod, _lt, _ld, lcrc, lcomp, lraw, lname, lextra
        ) = struct.unpack_from("<HHHHHIIIHH", payload, local_off + 4)
        sizes_ok = (lcomp, lraw) == (comp_len, raw_len) or (
            # zip64 locals carry sentinels and defer to their extra;
            # the central entry (already resolved) stays authoritative
            (lcomp, lraw) == (0xFFFFFFFF, 0xFFFFFFFF)
        )
        if (lmethod, lname) != (method, name_len) or (
            not (lflags & 0x8) and (lcrc != crc or not sizes_ok)
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
