"""POSIX ustar (tar) container walk (round 12).

WebDataset — the de-facto sharding format for large-scale multimodal
training — is plain tar: samples are consecutive members
(``sample-0001.jpg``, ``sample-0001.cls``, ...) read sequentially, so
a pipeline needs exactly this: the 512-byte ustar header walk (octal
size/mtime fields, header checksum verification, data padded to block
boundaries, two zero-block EOF trailer), not a filesystem extraction.
Implemented from the POSIX.1-1988 ustar layout (public spec).

Typed ValueError on every malformed shape: short header, bad magic,
non-octal size, checksum mismatch, truncated data, missing EOF blocks.
"""

from __future__ import annotations

__all__ = ["encode_tar", "parse_tar"]

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    """Zero-padded octal field, NUL-terminated (ustar convention)."""
    s = f"{n:0{width - 1}o}"
    if len(s) >= width:
        raise ValueError(f"value {n} overflows {width}-byte octal field")
    return s.encode("ascii") + b"\x00"


def encode_tar(members: list[tuple[str, bytes, int]]) -> bytes:
    """Build a ustar archive: ``members`` is [(name, content, mtime)].
    Regular files only (typeflag '0'), data padded to 512-byte blocks,
    two zero blocks at EOF — the exact shape WebDataset writers emit."""
    out = bytearray()
    for name, content, mtime in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("ustar name field is 100 bytes")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal(0o644, 8)
        hdr[108:116] = _octal(0, 8)
        hdr[116:124] = _octal(0, 8)
        hdr[124:136] = _octal(len(content), 12)
        hdr[136:148] = _octal(mtime, 12)
        hdr[148:156] = b" " * 8  # checksum computed over spaces
        hdr[156] = ord("0")  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:155] = f"{chk:06o}".encode("ascii") + b"\x00"
        hdr[155] = 0x20
        out += hdr
        out += content
        pad = (-len(content)) % _BLOCK
        out += bytes(pad)
    out += bytes(2 * _BLOCK)
    return bytes(out)


def parse_tar(payload: bytes) -> list[dict]:
    """Walk every member → [{"name", "content", "mtime", "size"}, ...]
    with the header checksum verified per member and the two-zero-block
    EOF trailer required."""
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while True:
        if pos + _BLOCK > n:
            raise ValueError("truncated tar: no EOF blocks")
        hdr = payload[pos : pos + _BLOCK]
        if hdr == bytes(_BLOCK):  # first zero block: require the second
            if payload[pos + _BLOCK : pos + 2 * _BLOCK] != bytes(_BLOCK):
                raise ValueError("tar EOF needs two zero blocks")
            break
        if hdr[257:262] != b"ustar":
            raise ValueError(f"bad ustar magic at byte {pos}")
        stored = hdr[148:156]
        try:
            chk = int(stored.rstrip(b"\x00 ").decode("ascii"), 8)
        except ValueError as e:
            raise ValueError("non-octal tar checksum field") from e
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if chk != calc:
            raise ValueError(f"tar header checksum mismatch at byte {pos}")

        def _field_octal(b: bytes, what: str) -> int:
            s = b.rstrip(b"\x00 ")
            if not s:
                return 0
            try:
                return int(s.decode("ascii"), 8)
            except ValueError as e:
                raise ValueError(f"non-octal tar {what} field") from e

        size = _field_octal(hdr[124:136], "size")
        mtime = _field_octal(hdr[136:148], "mtime")
        if hdr[156:157] not in (b"0", b"\x00"):
            raise ValueError(
                f"unsupported tar member type {hdr[156:157]!r}"
            )
        name = hdr[:100].rstrip(b"\x00").decode("utf-8")
        data_start = pos + _BLOCK
        if data_start + size > n:
            raise ValueError("truncated tar member data")
        content = payload[data_start : data_start + size]
        pos = data_start + size + ((-size) % _BLOCK)
        out.append(dict(name=name, content=content, mtime=mtime, size=size))
    if not out:
        raise ValueError("empty tar archive")
    return out
