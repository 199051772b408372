"""WARC/1.0 record grammar (round 13).

The first operator of every CommonCrawl-style curation run is not the
gzip walk (ops/gzf.py, round 12) but what sits INSIDE each member: a
WARC record — version line, named header fields, ``Content-Length``
framing of an opaque block, and a blank-line + double-CRLF trailer
(ISO 28500 / the public WARC 1.0 spec). This module implements that
grammar from scratch:

* version line ``WARC/1.0`` or ``WARC/1.1`` (anything else is typed);
* header fields ``Name: value`` terminated by CRLF, with RFC-822-style
  continuation lines (leading SP/HT folds into the previous value);
* mandatory fields ``WARC-Type``, ``WARC-Record-ID``, ``WARC-Date``,
  ``Content-Length`` (digits only) — each missing/duplicated/malformed
  shape is a distinct ValueError;
* the block is read by the DECLARED Content-Length (never by
  scanning for a separator — blocks may contain anything), then the
  record trailer ``CRLF CRLF`` is verified byte-exactly;
* record-type dispatch: the eight spec types are recognised;
  ``response``/``request``/``resource``/``revisit``/``conversion``
  require ``WARC-Target-URI`` (per the spec's applicability table),
  others carry it optionally.

Block digests (r13): real crawl records carry ``WARC-Block-Digest``
(and responses ``WARC-Payload-Digest``) — ``sha256:<hex>`` here (the
spec allows any labelled algorithm; CommonCrawl ships base32 sha1, but
sha1 is deprecated and sha256 is what both engines can recompute). The
encoder emits it on request; the parser VERIFIES any sha256-labelled
block digest it sees — a flipped content byte is a typed error — and
surfaces unknown-algorithm digests unverified (spec-legal).

Typed ValueError on every malformed shape: bad version line, missing
colon, empty field name, duplicate field, missing mandatory field,
non-numeric Content-Length, truncated block, bad record trailer,
trailing garbage, continuation line before any field, block-digest
mismatch.
"""

from __future__ import annotations

import hashlib

__all__ = ["encode_warc_records", "parse_warc_records", "RECORD_TYPES"]

#: the eight record types of WARC 1.0 §5 ("WARC-Type").
RECORD_TYPES = frozenset(
    [
        "warcinfo",
        "response",
        "request",
        "resource",
        "revisit",
        "conversion",
        "metadata",
        "continuation",
    ]
)

#: types for which WARC-Target-URI is mandatory (WARC 1.0 §5.12 table).
_URI_REQUIRED = frozenset(
    ["response", "request", "resource", "revisit", "conversion"]
)

_CRLF = b"\r\n"


def encode_warc_records(records: list[dict]) -> bytes:
    """Serialize records to concatenated WARC/1.0 wire form.

    Each record dict: ``type`` (one of RECORD_TYPES), ``record_id``,
    ``date`` (``YYYY-MM-DDThh:mm:ssZ``), ``content`` (bytes), optional
    ``target_uri``, optional ``content_type``, optional ``extra``
    (list of (name, value) additional header fields, in order).
    """
    out = bytearray()
    for rec in records:
        rtype = rec["type"]
        if rtype not in RECORD_TYPES:
            raise ValueError(f"unknown WARC-Type {rtype!r}")
        uri = rec.get("target_uri")
        if rtype in _URI_REQUIRED and uri is None:
            raise ValueError(f"WARC-Target-URI required for {rtype!r}")
        content = rec["content"]
        fields: list[tuple[str, str]] = [
            ("WARC-Type", rtype),
            ("WARC-Record-ID", rec["record_id"]),
            ("WARC-Date", rec["date"]),
        ]
        if uri is not None:
            fields.append(("WARC-Target-URI", uri))
        if rec.get("content_type") is not None:
            fields.append(("Content-Type", rec["content_type"]))
        if rec.get("block_digest"):
            fields.append((
                "WARC-Block-Digest",
                "sha256:" + hashlib.sha256(content).hexdigest(),
            ))
        fields.extend(rec.get("extra", []))
        fields.append(("Content-Length", str(len(content))))
        out += b"WARC/1.0" + _CRLF
        for name, value in fields:
            out += name.encode("latin-1") + b": "
            out += str(value).encode("latin-1") + _CRLF
        out += _CRLF
        out += content
        out += _CRLF + _CRLF
    return bytes(out)


def _parse_header(payload: bytes, pos: int) -> tuple[dict[str, str], int]:
    """Parse ``Name: value`` lines (with SP/HT continuation folding)
    up to and including the blank separator line; return (fields, pos
    after separator)."""
    fields: dict[str, str] = {}
    last_name: str | None = None
    n = len(payload)
    while True:
        end = payload.find(_CRLF, pos)
        if end < 0:
            raise ValueError("truncated WARC header (no CRLF)")
        line = payload[pos:end]
        pos = end + 2
        if line == b"":
            return fields, pos  # blank line ends the header
        if line[:1] in (b" ", b"\t"):
            # RFC-822 folding: continuation of the previous value
            if last_name is None:
                raise ValueError("WARC continuation line before any field")
            fields[last_name] += " " + line.strip().decode("latin-1")
            continue
        colon = line.find(b":")
        if colon <= 0:
            raise ValueError(
                f"malformed WARC header line {line[:40]!r} (no colon)"
            )
        name = line[:colon].decode("latin-1").strip()
        if not name:
            raise ValueError("empty WARC field name")
        if any(c in name for c in " \t"):
            # field-name is a token: a space before the colon means the
            # colon we found belongs to the VALUE (e.g. a timestamp)
            raise ValueError(
                f"malformed WARC field name {name[:40]!r} (whitespace)"
            )
        if name in fields:
            raise ValueError(f"duplicate WARC field {name!r}")
        fields[name] = line[colon + 1 :].strip().decode("latin-1")
        last_name = name
        if pos > n:
            raise ValueError("truncated WARC header")


def parse_warc_records(payload: bytes) -> list[dict]:
    """Walk every record → [{"type", "record_id", "date", "target_uri"
    (or None), "content_type" (or None), "content": bytes,
    "content_length": int, "header_bytes": int, "fields": {..}}, ...].

    Framing is by the declared Content-Length ONLY (spec rule — blocks
    are opaque and may embed anything, including ``WARC/1.0`` lines);
    the double-CRLF record trailer is then verified byte-exactly.
    """
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        start = pos
        end = payload.find(_CRLF, pos)
        if end < 0:
            raise ValueError("truncated WARC version line")
        version = payload[pos:end]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = end + 2
        fields, pos = _parse_header(payload, pos)
        for req in ("WARC-Type", "WARC-Record-ID", "WARC-Date",
                    "Content-Length"):
            if req not in fields:
                raise ValueError(f"missing mandatory WARC field {req!r}")
        rtype = fields["WARC-Type"]
        if rtype not in RECORD_TYPES:
            raise ValueError(f"unknown WARC-Type {rtype!r}")
        if rtype in _URI_REQUIRED and "WARC-Target-URI" not in fields:
            raise ValueError(
                f"WARC-Target-URI missing on {rtype!r} record"
            )
        cl_s = fields["Content-Length"]
        if not cl_s.isdigit():
            raise ValueError(f"non-numeric Content-Length {cl_s!r}")
        clen = int(cl_s)
        header_bytes = pos - start
        if pos + clen > n:
            raise ValueError(
                f"truncated WARC block (declared {clen}, "
                f"available {n - pos})"
            )
        content = payload[pos : pos + clen]
        pos += clen
        if payload[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("bad WARC record trailer (expected CRLFCRLF)")
        pos += 4
        digest = fields.get("WARC-Block-Digest")
        if digest and digest.startswith("sha256:"):
            if hashlib.sha256(content).hexdigest() != digest[7:]:
                raise ValueError(
                    f"WARC block digest mismatch on "
                    f"{fields['WARC-Record-ID']!r}"
                )
        out.append(
            dict(
                type=rtype,
                record_id=fields["WARC-Record-ID"],
                date=fields["WARC-Date"],
                target_uri=fields.get("WARC-Target-URI"),
                content_type=fields.get("Content-Type"),
                content=content,
                content_length=clen,
                header_bytes=header_bytes,
                fields=fields,
            )
        )
    if not out:
        raise ValueError("empty WARC payload")
    return out
