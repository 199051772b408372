"""MP4 / ISO-BMFF box walk (round 13).

The one container family the multimodal layer did not cover was video.
A curation pipeline does not DECODE video samples (codec bitstreams are
behind the documented psychoacoustic/codec fence, ops/multimodal.py) —
it reads the CONTAINER metadata: brand, movie timescale and duration,
per-track handler type, sample counts and byte sizes, video resolution.
All of that lives in the ISO base-media-file-format box tree (public
ISO/IEC 14496-12 structure), which is pure big-endian integer parsing —
the same shape as ops/zipwalk.py's central-directory walk:

* boxes are ``[size:u32][type:4cc][payload]``; ``size == 1`` switches
  to a 64-bit ``largesize`` (the branch every >4 GiB shard takes);
  ``size == 0`` ("to end of file") is accepted for the LAST top-level
  box only;
* ``ftyp`` (major/minor brand + compatible-brand list) must come
  first; ``moov``/``trak``/``mdia``/``minf``/``stbl`` are pure
  containers; ``mvhd``/``mdhd``/``tkhd`` carry version-0 (32-bit) and
  version-1 (64-bit) time fields; ``hdlr`` names the track type
  (``vide``/``soun``/...); ``stsz`` is either fixed-size or a
  per-sample table; ``stts`` entries give the sample-delta runs;
* unknown boxes — at any level — are skipped by their declared size
  (the rule that makes the format forward-compatible and the thing
  naive parsers get wrong).

Typed ValueError on every malformed shape: truncated box header or
payload, size < header size, bad largesize, ftyp not first, missing
moov/mvhd/required leaf, unsupported full-box version, stsz table
truncation, trailing garbage after a sized top-level walk.
"""

from __future__ import annotations

import struct

__all__ = ["encode_mp4_meta", "parse_mp4_meta"]


def _box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, flags: int = 0) -> bytes:
    return struct.pack(">I", (version << 24) | (flags & 0xFFFFFF))


def encode_mp4_meta(
    major_brand: str,
    minor_version: int,
    compatible_brands: list[str],
    timescale: int,
    duration: int,
    tracks: list[dict],
    mdat: bytes = b"",
    mvhd_v1: bool = False,
    mdat_large: bool = False,
) -> bytes:
    """Serialize a metadata-faithful MP4: ftyp + moov(mvhd + trak*) +
    free + mdat. Each track dict: ``handler`` (4cc str), ``timescale``,
    ``duration``, ``sample_sizes`` (list[int]), optional ``width``/
    ``height`` (integer pixels, stored 16.16 fixed-point)."""
    ftyp = major_brand.encode("ascii") + struct.pack(">I", minor_version)
    for b in compatible_brands:
        ftyp += b.encode("ascii")
    out = _box(b"ftyp", ftyp)

    if mvhd_v1:
        mvhd = _full(1) + struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        mvhd = _full(0) + struct.pack(">IIII", 0, 0, timescale, duration)
    mvhd += struct.pack(">i", 0x00010000)  # rate 1.0
    mvhd += struct.pack(">h", 0x0100)  # volume 1.0
    mvhd += b"\x00" * 10  # reserved
    mvhd += struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd += b"\x00" * 24  # pre_defined
    mvhd += struct.pack(">I", len(tracks) + 1)  # next_track_ID
    moov = _box(b"mvhd", mvhd)

    for i, t in enumerate(tracks):
        w = int(t.get("width", 0)) << 16
        h = int(t.get("height", 0)) << 16
        tkhd = (
            _full(0, 7)
            + struct.pack(">IIII", 0, 0, i + 1, 0)
            + struct.pack(">I", t["duration"])
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">ii", w, h)
        )
        mdhd = _full(0) + struct.pack(
            ">IIII", 0, 0, t["timescale"], t["duration"]
        ) + struct.pack(">HH", 0x55C4, 0)  # language 'und'
        hdlr = _full(0) + struct.pack(">I", 0) + t["handler"].encode(
            "ascii"
        ) + b"\x00" * 12 + b"h\x00"
        sizes = t["sample_sizes"]
        stts = _full(0) + struct.pack(">I", 1) + struct.pack(
            ">II", len(sizes), 1
        )
        stsz = _full(0) + struct.pack(">II", 0, len(sizes))
        for s in sizes:
            stsz += struct.pack(">I", s)
        stco = _full(0) + struct.pack(">I", 0)
        stbl = (
            # stsd left as an UNKNOWN leaf (codec config is behind the
            # decode fence) — exercises unknown-box skip inside stbl
            _box(b"stsd", _full(0) + struct.pack(">I", 0))
            + _box(b"stts", stts)
            + _box(b"stsz", stsz)
            + _box(b"stco", stco)
        )
        minf = _box(b"stbl", stbl)
        mdia = _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + _box(
            b"minf", minf
        )
        moov += _box(
            b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
        )
    moov += _box(b"free", b"skip me")  # unknown-box skip inside moov
    out += _box(b"moov", moov)
    out += _box(b"mdat", mdat, large=mdat_large)
    return out


def _walk_children(payload: bytes) -> list[tuple[bytes, bytes]]:
    """Walk a container's child boxes → [(type, payload), ...]."""
    out = []
    pos, n = 0, len(payload)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("truncated box header")
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > n:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            hdr = 16
        elif size == 0:
            size = n - pos  # "to end of file": last box only
        if size < hdr:
            raise ValueError(f"box size {size} smaller than header")
        if pos + size > n:
            raise ValueError(
                f"truncated box {btype!r} (declared {size}, "
                f"available {n - pos})"
            )
        out.append((btype, payload[pos + hdr : pos + size]))
        pos += size
    return out


def _unpack(fmt: str, payload: bytes, off: int, what: str) -> tuple:
    """struct.unpack_from with the truncation check the docstring
    contract requires: a crafted box with a valid full-box header but
    a short fixed-layout body must raise ValueError, never let
    struct.error escape to callers (ADVICE r13)."""
    need = off + struct.calcsize(fmt)
    if need > len(payload):
        raise ValueError(
            f"truncated {what} payload (need {need} bytes, "
            f"have {len(payload)})"
        )
    return struct.unpack_from(fmt, payload, off)


def _fullbox(payload: bytes, name: str, versions: tuple[int, ...]) -> int:
    if len(payload) < 4:
        raise ValueError(f"truncated {name} full-box header")
    version = payload[0]
    if version not in versions:
        raise ValueError(f"unsupported {name} version {version}")
    return version


def _parse_trak(payload: bytes) -> dict:
    track: dict = dict(
        track_id=None, handler=None, timescale=None, duration=None,
        n_samples=0, sample_bytes=0, width=0, height=0,
    )
    for btype, body in _walk_children(payload):
        if btype == b"tkhd":
            v = _fullbox(body, "tkhd", (0, 1))
            off = 4 + (8 + 8 + 4 + 4 if v else 4 + 4 + 4 + 4)
            (track["track_id"],) = _unpack(
                ">I", body, 4 + (16 if v else 8), "tkhd"
            )
            off += 8 if v else 4  # duration
            off += 8 + 8 + 36  # reserved + layer/alt/vol/res + matrix
            w, h = _unpack(">ii", body, off, "tkhd width/height")
            track["width"], track["height"] = w >> 16, h >> 16
        elif btype == b"mdia":
            for mtype, mbody in _walk_children(body):
                if mtype == b"mdhd":
                    v = _fullbox(mbody, "mdhd", (0, 1))
                    if v:
                        ts, dur = _unpack(">IQ", mbody, 4 + 16, "mdhd v1")
                    else:
                        ts, dur = _unpack(">II", mbody, 4 + 8, "mdhd v0")
                    track["timescale"], track["duration"] = ts, dur
                elif mtype == b"hdlr":
                    _fullbox(mbody, "hdlr", (0,))
                    track["handler"] = mbody[8:12].decode("latin-1")
                elif mtype == b"minf":
                    for ntype, nbody in _walk_children(mbody):
                        if ntype == b"stbl":
                            _parse_stbl(nbody, track)
    for req in ("track_id", "handler", "timescale"):
        if track[req] is None:
            raise ValueError(f"trak missing {req}")
    return track


def _parse_stbl(payload: bytes, track: dict) -> None:
    for btype, body in _walk_children(payload):
        if btype == b"stsz":
            _fullbox(body, "stsz", (0,))
            fixed, count = _unpack(">II", body, 4, "stsz header")
            track["n_samples"] = count
            if fixed:
                track["sample_bytes"] = fixed * count
            else:
                if len(body) < 12 + 4 * count:
                    raise ValueError(
                        f"stsz table truncated ({count} declared)"
                    )
                track["sample_bytes"] = sum(
                    struct.unpack_from(f">{count}I", body, 12)
                ) if count else 0
        elif btype == b"stts":
            _fullbox(body, "stts", (0,))
            (n_ent,) = _unpack(">I", body, 4, "stts header")
            if len(body) < 8 + 8 * n_ent:
                raise ValueError("stts table truncated")
            track["stts_samples"] = sum(
                struct.unpack_from(">I", body, 8 + 8 * i)[0]
                for i in range(n_ent)
            )


def parse_mp4_meta(payload: bytes) -> dict:
    """Walk the box tree → {"major_brand", "minor_version",
    "compatible_brands", "timescale", "duration", "tracks": [...],
    "mdat_bytes", "n_top_boxes"}. Unknown boxes are skipped at every
    level; ftyp must be the first top-level box; moov + mvhd are
    mandatory."""
    top = _walk_children(payload)
    if not top:
        raise ValueError("empty MP4 payload")
    if top[0][0] != b"ftyp":
        raise ValueError(f"first box is {top[0][0]!r}, expected ftyp")
    fbody = top[0][1]
    if len(fbody) < 8 or len(fbody) % 4:
        raise ValueError("malformed ftyp payload")
    out: dict = dict(
        major_brand=fbody[:4].decode("latin-1"),
        minor_version=_unpack(">I", fbody, 4, "ftyp")[0],
        compatible_brands=[
            fbody[i : i + 4].decode("latin-1")
            for i in range(8, len(fbody), 4)
        ],
        timescale=None,
        duration=None,
        tracks=[],
        mdat_bytes=0,
        n_top_boxes=len(top),
    )
    moov = None
    for btype, body in top[1:]:
        if btype == b"moov":
            if moov is not None:
                raise ValueError("duplicate moov box")
            moov = body
        elif btype == b"mdat":
            out["mdat_bytes"] += len(body)
    if moov is None:
        raise ValueError("missing moov box")
    for btype, body in _walk_children(moov):
        if btype == b"mvhd":
            v = _fullbox(body, "mvhd", (0, 1))
            if v:
                ts, dur = _unpack(">IQ", body, 4 + 16, "mvhd v1")
            else:
                ts, dur = _unpack(">II", body, 4 + 8, "mvhd v0")
            out["timescale"], out["duration"] = ts, dur
        elif btype == b"trak":
            out["tracks"].append(_parse_trak(body))
    if out["timescale"] is None:
        raise ValueError("missing mvhd box")
    for t in out["tracks"]:
        if "stts_samples" in t and t["stts_samples"] != t["n_samples"]:
            raise ValueError(
                f"stts/stsz sample-count mismatch "
                f"({t.pop('stts_samples')} vs {t['n_samples']})"
            )
        t.pop("stts_samples", None)
    return out
