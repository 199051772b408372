"""HEIF/HEIC item-metadata walk (round 14, verdict task 6).

HEIF (ISO/IEC 23008-12) layers an ITEM model on the ISO-BMFF box
grammar ops/mp4.py already walks: instead of tracks and samples, a
``meta`` full-box carries a handler, a primary-item pointer, an item
inventory, an item-location table of byte extents into ``mdat``, and
an item-property container — this is what phones actually shoot, and
what a crawl-curation pipeline reads to inventory HEIC blobs without
touching the HEVC payload (codec bitstreams stay behind the
documented fence). Box surface implemented:

* ``meta`` (full box v0) → ``hdlr`` (handler ``pict``), ``pitm``
  (primary item, v0 u16 / v1 u32), ``iinf`` (v0 u16 count / v1+
  u32) with ``infe`` v2/v3 entries (item id, protection index,
  item_type 4cc, null-terminated item_name);
* ``iloc`` v0/v1/v2 with the nibble-coded offset/length/base-offset
  (+ v1/v2 index) field sizes, per-item construction_method (only 0,
  file-offset, is accepted — 1/2 raise typed errors), data-reference
  index, base_offset and per-extent offset/length — extents are
  RESOLVED against the actual file bytes and verified in-bounds, the
  WARC-digest stance: the parser proves the offset arithmetic by
  reading the data it addresses;
* ``iprp`` → ``ipco`` (property boxes in declaration order; ``ispe``
  v0 width/height parsed, others inventoried and skipped) and
  ``ipma`` (v0/v1 item ids, 7- or 15-bit property indices by flag
  bit 0, essential bit preserved) — each item's pixel dimensions are
  recovered by following its ipma association to the ispe property,
  1-based as the spec numbers them.

Typed ValueError on every malformed shape: ftyp not first, missing
meta/hdlr/pitm/iinf/iloc, wrong handler, unsupported versions or
construction methods, bad nibble sizes, extents escaping the file,
ipma pointing at a property index past ipco, duplicate item ids,
primary item missing from the inventory.

Encoder note: offsets in ``iloc`` are absolute file offsets, so the
``meta`` box is built twice — once with zeroed offsets to fix the
layout (every offset field is fixed-width), then again with the real
``mdat`` positions.
"""

from __future__ import annotations

import struct

from sim_spark.ops.mp4 import (
    _box,
    _full,
    _fullbox,
    _unpack,
    _walk_children,
)

__all__ = ["encode_heif_meta", "parse_heif_meta"]

_SIZES = (0, 4, 8)  # legal iloc field byte-widths we emit (spec: 0/4/8)


def _uint(value: int, nbytes: int) -> bytes:
    return value.to_bytes(nbytes, "big")


def _build_meta(
    items: list[dict],
    primary_id: int,
    data_offsets: dict[int, list[int]],
    iloc_version: int,
    offset_size: int,
    length_size: int,
    base_offset_size: int,
    infe_version: int,
    pitm_version: int,
) -> bytes:
    hdlr = _full(0) + struct.pack(">I", 0) + b"pict" + b"\x00" * 12
    pitm = (
        _full(1) + struct.pack(">I", primary_id)
        if pitm_version
        else _full(0) + struct.pack(">H", primary_id)
    )
    infes = b""
    for it in items:
        body = _full(infe_version)
        if infe_version == 2:
            body += struct.pack(">H", it["item_id"])
        else:
            body += struct.pack(">I", it["item_id"])
        body += struct.pack(">H", 0)  # protection index
        body += it["item_type"].encode("latin-1")
        body += it.get("item_name", "").encode("utf-8") + b"\x00"
        infes += _box(b"infe", body)
    iinf = _full(0) + struct.pack(">H", len(items)) + infes
    # iloc
    il = _full(iloc_version)
    index_size = 0  # we never emit extent indices
    il += bytes(
        [
            (offset_size << 4) | length_size,
            (base_offset_size << 4)
            | (index_size if iloc_version else 0),
        ]
    )
    if iloc_version < 2:
        il += struct.pack(">H", len(items))
    else:
        il += struct.pack(">I", len(items))
    for it in items:
        if iloc_version < 2:
            il += struct.pack(">H", it["item_id"])
        else:
            il += struct.pack(">I", it["item_id"])
        if iloc_version in (1, 2):
            il += struct.pack(">H", 0)  # construction_method 0
        il += struct.pack(">H", 0)  # data_reference_index
        il += _uint(0, base_offset_size)  # base_offset (offsets absolute)
        extents = it["_extents"]
        il += struct.pack(">H", len(extents))
        offs = data_offsets.get(it["item_id"], [0] * len(extents))
        for (off, (length, _)) in zip(offs, extents):
            il += _uint(off, offset_size)
            il += _uint(length, length_size)
    # iprp: one ispe per item that declares dims, in item order
    ipco = b""
    prop_index: dict[int, int] = {}
    next_idx = 1
    for it in items:
        if "width" in it:
            ipco += _box(
                b"ispe",
                _full(0) + struct.pack(">II", it["width"], it["height"]),
            )
            prop_index[it["item_id"]] = next_idx
            next_idx += 1
    ipma_entries = [it for it in items if it["item_id"] in prop_index]
    ipma = _full(0) + struct.pack(">I", len(ipma_entries))
    for it in ipma_entries:
        ipma += struct.pack(">H", it["item_id"])
        ipma += bytes([1])  # association_count
        # essential bit set, 7-bit property index (flags bit 0 clear)
        ipma += bytes([0x80 | prop_index[it["item_id"]]])
    iprp = _box(b"ipco", ipco) + _box(b"ipma", ipma)
    meta_body = (
        _full(0)
        + _box(b"hdlr", hdlr)
        + _box(b"pitm", pitm)
        + _box(b"iinf", iinf)
        + _box(b"iloc", il)
        + _box(b"iprp", iprp)
    )
    return _box(b"meta", meta_body)


def encode_heif_meta(
    major_brand: str,
    items: list[dict],
    primary_id: int,
    compatible_brands: list[str] | None = None,
    iloc_version: int = 0,
    offset_size: int = 4,
    length_size: int = 4,
    base_offset_size: int = 4,
    infe_version: int = 2,
    pitm_version: int = 0,
) -> bytes:
    """Build a HEIF file.

    ``items``: dicts with ``item_id``, ``item_type`` (4cc str),
    optional ``item_name``, ``data`` (bytes) or ``extents``
    (list[bytes] — split across multiple iloc extents), optional
    ``width``/``height`` (emitted as an ispe property associated via
    ipma). Item data lands in one ``mdat``; iloc offsets are
    absolute file offsets (construction_method 0).
    """
    if offset_size not in _SIZES[1:] or length_size not in _SIZES[1:]:
        raise ValueError("offset/length size must be 4 or 8")
    if base_offset_size not in _SIZES:
        raise ValueError("base_offset size must be 0, 4 or 8")
    seen = set()
    for it in items:
        if it["item_id"] in seen:
            raise ValueError(f"duplicate item_id {it['item_id']}")
        seen.add(it["item_id"])
        if len(it["item_type"]) != 4:
            raise ValueError(f"item_type {it['item_type']!r} not a 4cc")
        chunks = it.get("extents")
        if chunks is None:
            chunks = [it["data"]]
        it["_extents"] = [(len(c), c) for c in chunks]
    if primary_id not in seen:
        raise ValueError(f"primary item {primary_id} not in items")
    brands = compatible_brands if compatible_brands is not None else [
        major_brand, "mif1"]
    ftyp = _box(
        b"ftyp",
        major_brand.encode("latin-1")
        + struct.pack(">I", 0)
        + b"".join(b.encode("latin-1") for b in brands),
    )
    kw = dict(
        iloc_version=iloc_version,
        offset_size=offset_size,
        length_size=length_size,
        base_offset_size=base_offset_size,
        infe_version=infe_version,
        pitm_version=pitm_version,
    )
    # pass 1: zero offsets, fixes every length
    meta = _build_meta(items, primary_id, {}, **kw)
    mdat_payload = b"".join(
        c for it in items for (_, c) in it["_extents"]
    )
    data_start = len(ftyp) + len(meta) + 8  # mdat header is 8 bytes
    offsets: dict[int, list[int]] = {}
    pos = data_start
    for it in items:
        offs = []
        for (length, _) in it["_extents"]:
            offs.append(pos)
            pos += length
        offsets[it["item_id"]] = offs
    # pass 2: real offsets (identical layout)
    meta2 = _build_meta(items, primary_id, offsets, **kw)
    if len(meta2) != len(meta):  # pragma: no cover - fixed-width fields
        raise ValueError("meta relayout changed size")
    for it in items:
        del it["_extents"]
    return ftyp + meta2 + _box(b"mdat", mdat_payload)


def _parse_iloc(body: bytes) -> list[dict]:
    version = _fullbox(body, "iloc", (0, 1, 2))
    sizes = _unpack(">BB", body, 4, "iloc sizes")
    offset_size = sizes[0] >> 4
    length_size = sizes[0] & 0xF
    base_offset_size = sizes[1] >> 4
    index_size = (sizes[1] & 0xF) if version in (1, 2) else 0
    for nm, v in (("offset", offset_size), ("length", length_size),
                  ("base_offset", base_offset_size),
                  ("index", index_size)):
        if v not in _SIZES:
            raise ValueError(f"iloc {nm}_size {v} invalid (spec: 0/4/8)")
    if offset_size == 0 or length_size == 0:
        raise ValueError("iloc offset/length size 0 carries no location")
    pos = 6
    if version < 2:
        (item_count,) = _unpack(">H", body, pos, "iloc count")
        pos += 2
    else:
        (item_count,) = _unpack(">I", body, pos, "iloc count")
        pos += 4

    def read_uint(nbytes: int, what: str) -> int:
        nonlocal pos
        if nbytes == 0:
            return 0
        if pos + nbytes > len(body):
            raise ValueError(f"truncated iloc {what}")
        v = int.from_bytes(body[pos:pos + nbytes], "big")
        pos += nbytes
        return v

    out = []
    for _ in range(item_count):
        item_id = read_uint(2 if version < 2 else 4, "item_id")
        if version in (1, 2):
            cm = read_uint(2, "construction_method") & 0xF
            if cm != 0:
                raise ValueError(
                    f"iloc construction_method {cm} unsupported "
                    f"(only 0 = file offset)"
                )
        read_uint(2, "data_reference_index")
        base = read_uint(base_offset_size, "base_offset")
        n_ext = read_uint(2, "extent_count")
        extents = []
        for _ in range(n_ext):
            if index_size:
                read_uint(index_size, "extent_index")
            off = read_uint(offset_size, "extent_offset")
            ln = read_uint(length_size, "extent_length")
            extents.append((base + off, ln))
        out.append(dict(item_id=item_id, extents=extents))
    return out


def _parse_iinf(body: bytes) -> list[dict]:
    version = _fullbox(body, "iinf", (0, 1))
    if version == 0:
        (count,) = _unpack(">H", body, 4, "iinf count")
        pos = 6
    else:
        (count,) = _unpack(">I", body, 4, "iinf count")
        pos = 8
    entries = []
    for btype, ibody in _walk_children(body[pos:]):
        if btype != b"infe":
            continue
        v = _fullbox(ibody, "infe", (2, 3))
        p = 4
        if v == 2:
            (item_id,) = _unpack(">H", ibody, p, "infe item_id")
            p += 2
        else:
            (item_id,) = _unpack(">I", ibody, p, "infe item_id")
            p += 4
        _unpack(">H", ibody, p, "infe protection")
        p += 2
        if p + 4 > len(ibody):
            raise ValueError("truncated infe item_type")
        item_type = ibody[p:p + 4].decode("latin-1")
        p += 4
        end = ibody.find(b"\x00", p)
        name = ibody[p:end if end >= 0 else len(ibody)].decode("utf-8")
        entries.append(dict(item_id=item_id, item_type=item_type,
                            item_name=name))
    if len(entries) != count:
        raise ValueError(
            f"iinf declares {count} items, found {len(entries)} infe"
        )
    return entries


def parse_heif_meta(data: bytes) -> dict:
    """Walk a HEIF file → {"major_brand", "compatible_brands",
    "primary_id", "items": [{item_id, item_type, item_name, width,
    height, extents, data}], "n_properties"}. Item data is resolved
    from iloc extents against the file bytes and bounds-checked."""
    top = _walk_children(data)
    if not top or top[0][0] != b"ftyp":
        raise ValueError("first box is not ftyp")
    fbody = top[0][1]
    if len(fbody) < 8 or len(fbody) % 4:
        raise ValueError("malformed ftyp payload")
    meta = None
    for btype, body in top[1:]:
        if btype == b"meta":
            if meta is not None:
                raise ValueError("duplicate meta box")
            meta = body
    if meta is None:
        raise ValueError("missing meta box")
    _fullbox(meta, "meta", (0,))
    kids = dict()
    for btype, body in _walk_children(meta[4:]):
        kids.setdefault(btype, body)
    for req in (b"hdlr", b"pitm", b"iinf", b"iloc"):
        if req not in kids:
            raise ValueError(f"meta missing {req!r} box")
    h = kids[b"hdlr"]
    _fullbox(h, "hdlr", (0,))
    handler = h[8:12]
    if handler != b"pict":
        raise ValueError(f"meta handler {handler!r} is not 'pict'")
    p = kids[b"pitm"]
    pv = _fullbox(p, "pitm", (0, 1))
    primary_id = (_unpack(">I", p, 4, "pitm")[0] if pv
                  else _unpack(">H", p, 4, "pitm")[0])
    entries = _parse_iinf(kids[b"iinf"])
    ids = [e["item_id"] for e in entries]
    if len(set(ids)) != len(ids):
        raise ValueError("duplicate item_id in iinf")
    if primary_id not in set(ids):
        raise ValueError(f"primary item {primary_id} not in iinf")
    locs = {l["item_id"]: l["extents"] for l in _parse_iloc(kids[b"iloc"])}
    # properties
    props: list[tuple[str, bytes]] = []
    assoc: dict[int, list[int]] = {}
    if b"iprp" in kids:
        ip = dict()
        for btype, body in _walk_children(kids[b"iprp"]):
            ip.setdefault(btype, body)
        if b"ipco" in ip:
            props = [
                (t.decode("latin-1"), b)
                for t, b in _walk_children(ip[b"ipco"])
            ]
        if b"ipma" in ip:
            ab = ip[b"ipma"]
            av = _fullbox(ab, "ipma", (0, 1))
            aflags = int.from_bytes(ab[1:4], "big")
            (n_entries,) = _unpack(">I", ab, 4, "ipma count")
            pos = 8
            for _ in range(n_entries):
                if av == 0:
                    (iid,) = _unpack(">H", ab, pos, "ipma item_id")
                    pos += 2
                else:
                    (iid,) = _unpack(">I", ab, pos, "ipma item_id")
                    pos += 4
                (cnt,) = _unpack(">B", ab, pos, "ipma assoc count")
                pos += 1
                idxs = []
                for _ in range(cnt):
                    if aflags & 1:
                        (w,) = _unpack(">H", ab, pos, "ipma assoc")
                        pos += 2
                        idx = w & 0x7FFF
                    else:
                        (w,) = _unpack(">B", ab, pos, "ipma assoc")
                        pos += 1
                        idx = w & 0x7F
                    if idx == 0 or idx > len(props):
                        raise ValueError(
                            f"ipma property index {idx} outside ipco "
                            f"(1..{len(props)})"
                        )
                    idxs.append(idx)
                assoc[iid] = idxs
    items = []
    for e in entries:
        extents = locs.get(e["item_id"], [])
        chunks = []
        for off, ln in extents:
            if off + ln > len(data):
                raise ValueError(
                    f"item {e['item_id']} extent ({off}, {ln}) escapes "
                    f"the file ({len(data)} bytes)"
                )
            chunks.append(data[off:off + ln])
        width = height = None
        for idx in assoc.get(e["item_id"], []):
            ptype, pbody = props[idx - 1]
            if ptype == "ispe":
                _fullbox(pbody, "ispe", (0,))
                width, height = _unpack(">II", pbody, 4, "ispe")
        items.append(
            dict(
                item_id=e["item_id"], item_type=e["item_type"],
                item_name=e["item_name"], extents=extents,
                data=b"".join(chunks), width=width, height=height,
            )
        )
    return dict(
        major_brand=fbody[:4].decode("latin-1"),
        compatible_brands=[
            fbody[i:i + 4].decode("latin-1")
            for i in range(8, len(fbody), 4)
        ],
        primary_id=primary_id,
        items=items,
        n_properties=len(props),
    )
