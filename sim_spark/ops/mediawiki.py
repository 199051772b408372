"""MediaWiki dump page/revision parse (round 14).

ops/bz2walk.py walks the ``*-multistream.xml.bz2`` CONTAINER; this
module parses what is inside the streams — the page/revision XML
grammar of the public MediaWiki export format (the shape of every
Wikipedia dump, a canonical LLM pretraining corpus):

* stream 0 carries the document head: the ``<mediawiki>`` root open
  tag (version + language attributes) and the ``<siteinfo>`` block;
* middle streams carry whole ``<page>`` elements — XML FRAGMENTS, not
  documents, which is exactly why readers can seek to a stream offset
  from the companion index and decode ~100 pages without the rest,
  and exactly why a naive per-stream XML-document parse fails;
* the final stream carries only the ``</mediawiki>`` close.

Each ``<page>`` carries ``<title>``, ``<ns>``, ``<id>`` and one or
more ``<revision>`` blocks (``<id>``, ``<timestamp>``,
``<contributor>``, ``<text bytes="N" xml:space="preserve">``). The
``bytes`` attribute is VERIFIED against the decoded text's UTF-8
length — the same trust-but-verify stance as ops/warc.py's
block-digest check. Unknown children (``<sha1>``, ``<comment>``,
``<redirect>``, ``<minor/>``, ...) are skipped at every level — the
forward-compatibility rule that keeps old readers working on new
dumps, same as the MP4 unknown-box skip.

The XML walk is a deliberately small hand-rolled pull parser for the
subset the export grammar uses (elements, attributes, character data,
comments, the five named entities + numeric references) — dependency-
free like every other container walk here, and streaming-shaped: pages
are yielded left-to-right off one forward scan, no DOM of the whole
dump is ever required.

Typed ValueError on every malformed shape: bad root, fragment text
outside elements, mismatched or unclosed tags, unterminated or unknown
entities, duplicate/missing required children, non-integer ids,
``bytes`` attribute mismatch, content after the root close, nesting
past the grammar's depth.
"""

from __future__ import annotations

from .bz2walk import parse_bz2_streams

__all__ = [
    "encode_mediawiki_dump",
    "parse_mediawiki_dump",
    "parse_pages_fragment",
]

_XMLNS = "http://www.mediawiki.org/xml/export-%s/"


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str, what: str) -> str:
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    while True:
        j = s.find("&", i)
        if j < 0:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i:j])
        k = s.find(";", j + 1, j + 12)
        if k < 0:
            raise ValueError(f"unterminated XML entity in {what}")
        ent = s[j + 1 : k]
        if ent == "amp":
            out.append("&")
        elif ent == "lt":
            out.append("<")
        elif ent == "gt":
            out.append(">")
        elif ent == "quot":
            out.append('"')
        elif ent == "apos":
            out.append("'")
        elif ent.startswith("#"):
            try:
                cp = (
                    int(ent[2:], 16)
                    if ent[1:2] in ("x", "X")
                    else int(ent[1:])
                )
                out.append(chr(cp))
            except (ValueError, OverflowError) as e:
                raise ValueError(
                    f"bad numeric character reference &{ent}; in {what}"
                ) from e
        else:
            raise ValueError(f"unknown XML entity &{ent}; in {what}")
        i = k + 1


def _read_tag(s: str, pos: int) -> tuple[str, dict, bool, bool, int]:
    """Parse ``<name a="v" ...>`` / ``</name>`` / ``<name .../>`` at
    ``pos`` → (name, attrs, is_closing, is_selfclosing, next_pos)."""
    end = s.find(">", pos)
    if end < 0:
        raise ValueError("unterminated XML tag")
    raw = s[pos + 1 : end]
    closing = raw.startswith("/")
    if closing:
        raw = raw[1:]
    selfclose = raw.endswith("/")
    if selfclose:
        raw = raw[:-1]
    raw = raw.strip()
    if not raw:
        raise ValueError("empty XML tag")
    # name runs to the first whitespace; the rest is attributes
    cut = len(raw)
    for i, c in enumerate(raw):
        if c in " \t\r\n":
            cut = i
            break
    name, rest = raw[:cut], raw[cut:].strip()
    if closing and (rest or selfclose):
        raise ValueError(f"malformed closing tag </{raw}>")
    attrs: dict[str, str] = {}
    i = 0
    n = len(rest)
    while i < n:
        while i < n and rest[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        eq = rest.find("=", i)
        if eq < 0:
            raise ValueError(f"attribute without value in <{name}>")
        aname = rest[i:eq].strip()
        v = eq + 1
        while v < n and rest[v] in " \t\r\n":
            v += 1
        if v >= n or rest[v] not in "\"'":
            raise ValueError(f"unquoted attribute {aname!r} in <{name}>")
        q = rest[v]
        vend = rest.find(q, v + 1)
        if vend < 0:
            raise ValueError(f"unterminated attribute {aname!r} in <{name}>")
        attrs[aname] = _unescape(rest[v + 1 : vend], f"<{name} {aname}>")
        i = vend + 1
    return name, attrs, closing, selfclose, end + 1


def _parse_element(s: str, pos: int, depth: int = 0):
    """Recursive element parse → (name, attrs, children, text, next).
    ``children`` holds the same 5-tuples; ``text`` is the element's
    own (unescaped, concatenated) character data."""
    if depth > 16:
        raise ValueError("XML nesting exceeds the export grammar depth")
    name, attrs, closing, selfclose, pos = _read_tag(s, pos)
    if closing:
        raise ValueError(f"unexpected closing tag </{name}>")
    if selfclose:
        return name, attrs, [], "", pos
    children = []
    text: list[str] = []
    while True:
        lt = s.find("<", pos)
        if lt < 0:
            raise ValueError(f"unclosed element <{name}>")
        if lt > pos:
            text.append(s[pos:lt])
        pos = lt
        if s.startswith("<!--", pos):
            e = s.find("-->", pos + 4)
            if e < 0:
                raise ValueError("unterminated XML comment")
            pos = e + 3
            continue
        if s.startswith("</", pos):
            cname, _a, _c, _sc, pos = _read_tag(s, pos)
            if cname != name:
                raise ValueError(
                    f"mismatched close </{cname}> for <{name}>"
                )
            return (
                name,
                attrs,
                children,
                _unescape("".join(text), f"<{name}>"),
                pos,
            )
        child = _parse_element(s, pos, depth + 1)
        children.append(child)
        pos = child[4]


def _skip_misc(s: str, pos: int) -> int:
    """Skip whitespace and comments between elements."""
    n = len(s)
    while True:
        while pos < n and s[pos] in " \t\r\n":
            pos += 1
        if s.startswith("<!--", pos):
            e = s.find("-->", pos + 4)
            if e < 0:
                raise ValueError("unterminated XML comment")
            pos = e + 3
        else:
            return pos


def _only_child(el, cname: str, where: str):
    hits = [c for c in el[2] if c[0] == cname]
    if not hits:
        raise ValueError(f"{where} missing <{cname}>")
    if len(hits) > 1:
        raise ValueError(f"{where} has duplicate <{cname}>")
    return hits[0]


def _int_child(el, cname: str, where: str) -> int:
    c = _only_child(el, cname, where)
    t = c[3].strip()
    if not t or t.lstrip("-").isdigit() is False:
        raise ValueError(f"{where} <{cname}> is not an integer: {t!r}")
    return int(t)


def _page_from_element(el) -> dict:
    """Validate + extract one <page>: required children, ≥1 revision,
    per-revision required children, and the <text bytes=""> check.
    Unknown children at both levels are skipped (forward compat)."""
    if el[0] != "page":
        raise ValueError(f"expected <page>, found <{el[0]}>")
    if any(c[0] == "page" for c in el[2]):
        raise ValueError("nested <page> elements")
    page = dict(
        title=_only_child(el, "title", "page")[3],
        ns=_int_child(el, "ns", "page"),
        page_id=_int_child(el, "id", "page"),
        revisions=[],
    )
    for c in el[2]:
        if c[0] != "revision":
            continue  # redirect/restrictions/... — skip unknown
        rev = dict(
            rev_id=_int_child(c, "id", "revision"),
            timestamp=_only_child(c, "timestamp", "revision")[3],
            username="",
        )
        contrib = [x for x in c[2] if x[0] == "contributor"]
        if len(contrib) > 1:
            raise ValueError("revision has duplicate <contributor>")
        if contrib:
            users = [x for x in contrib[0][2] if x[0] == "username"]
            if users:
                rev["username"] = users[0][3]
        tx = _only_child(c, "text", "revision")
        rev["text"] = tx[3]
        declared = tx[1].get("bytes")
        if declared is not None:
            actual = len(tx[3].encode("utf-8"))
            if not declared.isdigit() or int(declared) != actual:
                raise ValueError(
                    f"<text bytes={declared!r}> mismatch "
                    f"(actual {actual}) in page {page['page_id']}"
                )
        page["revisions"].append(rev)
    if not page["revisions"]:
        raise ValueError(f"page {page['page_id']} has no <revision>")
    return page


def _revision_xml(rev: dict, indent: str) -> str:
    text = rev["text"]
    nb = len(text.encode("utf-8"))
    parts = [
        f"{indent}<revision>",
        f"{indent}  <id>{rev['rev_id']}</id>",
        f"{indent}  <timestamp>{rev['timestamp']}</timestamp>",
        f"{indent}  <contributor>",
        f"{indent}    <username>{_escape(rev.get('username', ''))}"
        f"</username>",
        f"{indent}  </contributor>",
        f"{indent}  <model>wikitext</model>",
        f"{indent}  <format>text/x-wiki</format>",
        f"{indent}  <text bytes=\"{nb}\" xml:space=\"preserve\">"
        f"{_escape(text)}</text>",
        # a child the grammar above does not know — exercises the
        # unknown-skip rule on every parse
        f"{indent}  <sha1>unread</sha1>",
        f"{indent}</revision>",
    ]
    return "\n".join(parts)


def _page_xml(page: dict) -> str:
    parts = [
        "  <page>",
        f"    <title>{_escape(page['title'])}</title>",
        f"    <ns>{page['ns']}</ns>",
        f"    <id>{page['page_id']}</id>",
    ]
    for rev in page["revisions"]:
        parts.append(_revision_xml(rev, "    "))
    parts.append("  </page>")
    return "\n".join(parts) + "\n"


def encode_mediawiki_dump(
    sitename: str,
    dbname: str,
    pages: list[dict],
    pages_per_stream: int = 100,
    level: int = 9,
    version: str = "0.11",
    lang: str = "en",
) -> bytes:
    """Serialize a multistream dump: head stream (root open tag +
    siteinfo), one stream per ``pages_per_stream`` group of pages,
    footer stream (root close) — each an INDEPENDENT bzip2 stream,
    the layout that makes the companion index seekable."""
    import bz2

    if pages_per_stream < 1:
        raise ValueError("pages_per_stream must be >= 1")
    head = (
        f'<mediawiki xmlns="{_XMLNS % version}" version="{version}" '
        f'xml:lang="{lang}">\n'
        f"  <siteinfo>\n"
        f"    <sitename>{_escape(sitename)}</sitename>\n"
        f"    <dbname>{_escape(dbname)}</dbname>\n"
        f"    <generator>sim-spark dump writer</generator>\n"
        f"  </siteinfo>\n"
    )
    streams = [head]
    for i in range(0, len(pages), pages_per_stream):
        group = pages[i : i + pages_per_stream]
        streams.append("".join(_page_xml(p) for p in group))
    streams.append("</mediawiki>\n")
    return b"".join(
        bz2.compress(s.encode("utf-8"), compresslevel=level)
        for s in streams
    )


def parse_pages_fragment(fragment: str) -> list[dict]:
    """Parse ONE middle stream's content — a bare concatenation of
    ``<page>`` elements with no root. This is the seek path: decode a
    single stream at an index offset, parse its ~100 pages, touch
    nothing else."""
    pos = _skip_misc(fragment, 0)
    pages = []
    while pos < len(fragment):
        if fragment[pos] != "<":
            raise ValueError(
                f"character data outside <page> at offset {pos}"
            )
        el = _parse_element(fragment, pos)
        pages.append(_page_from_element(el))
        pos = _skip_misc(fragment, el[4])
    if not pages:
        raise ValueError("page fragment contains no <page>")
    return pages


def parse_mediawiki_dump(payload: bytes) -> dict:
    """bz2 multistream walk → page/revision grammar parse. Returns
    ``{"sitename", "dbname", "version", "lang", "n_streams",
    "pages": [...]}`` with every page's structure validated and every
    ``<text bytes>`` attribute verified."""
    streams = parse_bz2_streams(payload)
    doc = "".join(s["content"].decode("utf-8") for s in streams)
    pos = _skip_misc(doc, 0)
    if doc.startswith("<?xml", pos):  # optional prolog
        e = doc.find("?>", pos)
        if e < 0:
            raise ValueError("unterminated XML prolog")
        pos = _skip_misc(doc, e + 2)
    name, attrs, closing, selfclose, pos = _read_tag(doc, pos)
    if name != "mediawiki" or closing or selfclose:
        raise ValueError(f"root element is <{name}>, expected <mediawiki>")
    out = dict(
        sitename=None,
        dbname=None,
        version=attrs.get("version", ""),
        lang=attrs.get("xml:lang", ""),
        n_streams=len(streams),
        pages=[],
    )
    while True:
        pos = _skip_misc(doc, pos)
        if pos >= len(doc):
            raise ValueError("unclosed <mediawiki> root")
        if doc.startswith("</", pos):
            cname, _a, _c, _sc, pos = _read_tag(doc, pos)
            if cname != "mediawiki":
                raise ValueError(f"stray closing tag </{cname}>")
            break
        if doc[pos] != "<":
            raise ValueError(
                f"character data at dump top level (offset {pos})"
            )
        el = _parse_element(doc, pos)
        if el[0] == "siteinfo":
            if out["sitename"] is not None:
                raise ValueError("duplicate <siteinfo>")
            out["sitename"] = _only_child(el, "sitename", "siteinfo")[3]
            out["dbname"] = _only_child(el, "dbname", "siteinfo")[3]
        elif el[0] == "page":
            out["pages"].append(_page_from_element(el))
        # unknown top-level elements (logitem, ...): skipped
        pos = el[4]
    if _skip_misc(doc, pos) != len(doc):
        raise ValueError("content after </mediawiki>")
    if out["sitename"] is None:
        raise ValueError("dump missing <siteinfo>")
    return out
