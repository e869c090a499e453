"""From-scratch WARC writer/parser — the Common-Crawl ingest boundary.

The north rule's input is an Iceberg table of Common-Crawl-style pages
`(url, warc_ts, html, …)`; what actually lands on disk upstream of that
table is WARC — ISO 28500 / the public WARC 1.1 spec, laid out the way
Common Crawl ships it (each record its own gzip member, so a reader can
seek to any record without decompressing the file prefix).  This module
is that ingest boundary, written from the spec: serialize page rows into
WARC response records and parse WARC bytes back into page rows, with a
byte-identity roundtrip guarantee the driver oracle checks
(entry:warc_ingest).  The reference has no crawl/ingest concept (its
input boundary is image files, `main.py` path handling); this is a
beyond-reference source operator like the link graph.

Format, per the spec:

  WARC/1.1\r\n
  <name>: <value>\r\n ...            (required: WARC-Type, WARC-Date,
  \r\n                                WARC-Record-ID, Content-Length)
  <block: exactly Content-Length bytes>
  \r\n\r\n                           (record boundary)

For `WARC-Type: response` the block is an HTTP/1.1 response — status
line, headers (Content-Type lives here), blank line, payload.  Framing
is Content-Length-driven on BOTH envelopes, so payload bytes that
contain `WARC/1.1` or `\r\n\r\n` can never confuse the parser (tested).

Determinism: gzip members are written with mtime=0 and fixed compression
level, WARC-Record-ID is a urn:uuid derived from md5(url, ts), and
WARC-Date comes from the row's epoch seconds — byte-identical output for
identical input, no wallclock anywhere (the fixture discipline every
oracle here relies on).

Never-raise policy at the record level mirrors the page pipeline: a
record that fails to parse (bad header, short block, truncated gzip
member) ends parsing of that chunk and is reported via the `truncated`
flag rather than raising — a 100 TB ingest must quarantine a corrupt
segment tail, not kill the stage.
"""

from __future__ import annotations

import calendar
import hashlib
import time
import zlib
from typing import Dict, List, Optional, Tuple

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"
_WARC_MAGIC = b"WARC/"


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------
def _warc_date(ts_s: int) -> str:
    """Epoch seconds -> the spec's UTC ISO form (2024-01-01T00:00:00Z)."""
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(int(ts_s)))


def _parse_warc_date(s: str) -> int:
    """ISO form back to epoch seconds (calendar.timegm = inverse gmtime)."""
    return calendar.timegm(time.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ"))


def _record_id(url: str, ts_s: int) -> str:
    """Deterministic urn:uuid (md5-derived, fixture discipline — the spec
    requires global uniqueness, which (url, ts) gives within a corpus)."""
    h = hashlib.md5(f"{url}\x00{ts_s}".encode("utf-8")).hexdigest()
    return (
        f"urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    )


def build_response_record(
    url: str, ts_s: int, payload: bytes, content_type: str = "text/html"
) -> bytes:
    """One WARC response record: WARC envelope around an HTTP/1.1 response
    around the payload — the shape of every Common Crawl page capture."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + content_type.encode("ascii") + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        + _CRLF
        + payload
    )
    head = (
        b"WARC/1.1" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <" + _record_id(url, ts_s).encode("ascii") + b">" + _CRLF
        + b"WARC-Date: " + _warc_date(ts_s).encode("ascii") + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def build_warcinfo_record(ts_s: int, fields: Optional[Dict[str, str]] = None) -> bytes:
    """The segment-leading warcinfo record real WARC files carry (readers
    must skip it — ours does; it exists so the parser is tested against
    the real file shape, not only our own responses)."""
    body_lines = [f"{k}: {v}" for k, v in sorted((fields or {}).items())]
    body = ("\r\n".join(body_lines) + "\r\n").encode("utf-8") if body_lines else b""
    head = (
        b"WARC/1.1" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Record-ID: <" + _record_id("warcinfo", ts_s).encode("ascii") + b">" + _CRLF
        + b"WARC-Date: " + _warc_date(ts_s).encode("ascii") + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One record -> one deterministic gzip member (mtime=0, fixed level) —
    the Common Crawl layout: members concatenate into a seekable .warc.gz."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    # wbits 16+MAX -> gzip container; zlib writes mtime=0 (unlike gzip.compress,
    # which stamps wallclock and would break byte-determinism)
    return co.compress(record) + co.flush()


def build_warc_gz(records: List[bytes]) -> bytes:
    """Records -> concatenated per-record gzip members."""
    return b"".join(gzip_member(r) for r in records)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------
def _split_headers(block: bytes, start: int = 0) -> Tuple[Dict[str, str], int]:
    """Parse CRLF header lines from `block[start:]` up to the blank line,
    scanning IN PLACE (no tail copy — a per-record `data[eol+2:]` slice
    made a many-record chunk O(records × chunk_bytes) in memcpy); returns
    (lowercased name -> value, ABSOLUTE offset just past the blank line).
    Simple obs-fold continuations (leading SP/HT) append to the previous
    value.  Returns offset -1 if no blank line terminates the headers."""
    headers: Dict[str, str] = {}
    pos = start
    last: Optional[str] = None
    while True:
        eol = block.find(_CRLF, pos)
        if eol < 0:
            return headers, -1
        line = block[pos:eol]
        pos = eol + 2
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        sep = line.find(b":")
        if sep <= 0:
            last = None  # malformed line: ignore, keep scanning (never raise)
            continue
        name = line[:sep].strip().decode("latin-1").lower()
        headers[name] = line[sep + 1 :].strip().decode("latin-1")
        last = name
    # unreachable


def _gunzip_members(data: bytes) -> Tuple[bytes, bool]:
    """Concatenated gzip members -> (concatenated plaintext, clean).  A
    truncated final member contributes what it decoded and flips `clean`
    (never raises); `clean` is False too when trailing non-gzip bytes
    remain — a member cut exactly in its trailer can yield complete
    plaintext, so byte-level cleanliness must be reported independently
    of record-level parse success (tested)."""
    out: List[bytes] = []
    rest = data
    clean = True
    while rest[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            clean = False
            break
        if not d.eof:
            clean = False  # member cut mid-stream or mid-trailer
            break
        rest = d.unused_data
        if not rest:
            break
    else:
        clean = clean and not rest  # leftover bytes that aren't a member
    return b"".join(out), clean


def parse_warc(data: bytes) -> Dict[str, object]:
    """WARC bytes (plain or per-record-gzip) -> page records.

    Returns ``{"records": [...], "skipped": n, "truncated": bool}`` where
    each record is ``{"url", "warc_ts" (epoch s), "content_type",
    "payload" (bytes)}``.  Non-response records (warcinfo, request,
    metadata) count in ``skipped``; a malformed tail sets ``truncated``
    and ends the chunk — quarantine semantics, never raise.
    """
    truncated = False
    if data[:2] == _GZ_MAGIC:
        data, clean = _gunzip_members(data)
        truncated = not clean
    records: List[Dict[str, object]] = []
    skipped = 0
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs, then require the version line
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if data[pos : pos + 5] != _WARC_MAGIC:
            truncated = True
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            truncated = True
            break
        headers, hoff = _split_headers(data, eol + 2)
        if hoff < 0:
            truncated = True
            break
        body_start = hoff
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            truncated = True
            break
        if body_start + clen > n:
            truncated = True
            break
        block = data[body_start : body_start + clen]
        pos = body_start + clen
        if headers.get("warc-type") != "response":
            skipped += 1
            continue
        url = headers.get("warc-target-uri", "")
        try:
            ts = _parse_warc_date(headers.get("warc-date", ""))
        except ValueError:
            skipped += 1
            continue
        http_headers, boff = _split_headers(block)
        if boff < 0:
            skipped += 1
            continue
        # status line parsed as a "header" miss -> it has no colon form we
        # need; Content-Type/Length come from the real header lines
        ctype = http_headers.get("content-type", "").split(";")[0].strip()
        payload = block[boff:]
        try:
            plen = int(http_headers.get("content-length", ""))
            if 0 <= plen <= len(payload):
                payload = payload[:plen]
        except ValueError:
            pass  # no/odd HTTP Content-Length: WARC framing already bounds it
        records.append(
            {
                "url": url,
                "warc_ts": ts,
                "content_type": ctype or "application/octet-stream",
                "payload": payload,
            }
        )
    return {"records": records, "skipped": skipped, "truncated": truncated}
