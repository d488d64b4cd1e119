"""WARC source connector — the raw Common-Crawl container.

The pipeline's canonical input is an Iceberg/parquet pages table
(url, warc_ts, html, ...), but the upstream artifact a crawl actually
ships is WARC: concatenated records, each individually gzipped (the
member-per-record convention that makes *.warc.gz randomly seekable
by offset).  ``read_warc`` turns a directory of WARC files into that
pages DataFrame so the KG job can start from the raw dump:

- file-level parallelism (``binaryFile`` source, one task per WARC
  file) — the Common-Crawl layout is ~1 GB per file and tens of
  thousands of files per crawl, so file granularity IS the right
  partitioning at 100 TB; no shuffle, records fan out inside the
  Arrow batch;
- only ``WARC-Type: response`` records become rows (request /
  warcinfo / metadata records are skipped, like every CC consumer);
- the HTTP envelope is stripped: the row's ``html`` is the HTTP body.

Parsing is pure stdlib (gzip members via zlib, headers via bytes
splits).  A writer builds fixtures; corrupt members/records raise
ValueError so the caller can route through tolerant_map the way every
other decode surface does.
"""

from __future__ import annotations

import datetime as dt
import gzip
import zlib
from typing import Iterator, List, Tuple

_CRLF2 = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# writer (fixtures)
# ---------------------------------------------------------------------------

def encode_warc_gz(records: List[Tuple[str, dt.datetime, bytes]]) -> bytes:
    """(url, warc_ts, html_bytes) rows -> *.warc.gz bytes: one gzip
    MEMBER per record (the CC seekability convention), each record a
    WARC/1.0 response wrapping a minimal HTTP/1.1 200 response."""
    out = bytearray()
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + _CRLF2 + html
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + _CRLF2
        )
        out += gzip.compress(hdr + http + _CRLF2)
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _gzip_members(payload: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream."""
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(payload[pos:])
        except zlib.error as exc:
            raise ValueError(f"bad gzip member at offset {pos}: {exc}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield member
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def _parse_record(raw: bytes, pos: int) -> tuple[dict, bytes, int]:
    """One WARC record at raw[pos:] -> (headers, block, next_pos)."""
    if not raw.startswith(b"WARC/", pos):
        raise ValueError("missing WARC/ record header")
    head_end = raw.find(_CRLF2, pos)
    if head_end < 0:
        raise ValueError("unterminated WARC header block")
    headers: dict = {}
    for line in raw[pos:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1"
        )
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError) as exc:
        raise ValueError("WARC record missing Content-Length") from exc
    body_start = head_end + len(_CRLF2)
    if body_start + length > len(raw):
        raise ValueError("WARC record body overruns payload")
    block = raw[body_start : body_start + length]
    next_pos = body_start + length
    # per spec each record is followed by two CRLFs
    while raw.startswith(b"\r\n", next_pos):
        next_pos += 2
    return headers, block, next_pos


def _http_body(block: bytes) -> bytes:
    split = block.find(_CRLF2)
    return block[split + len(_CRLF2):] if split >= 0 else block


def parse_warc(payload: bytes) -> List[Tuple[str, dt.datetime, bytes]]:
    """*.warc(.gz) bytes -> [(url, warc_ts, html_bytes)] for every
    response record; non-response records are skipped."""
    if payload[:2] == b"\x1f\x8b":
        raw = b"".join(_gzip_members(payload))
    else:
        raw = payload
    rows = []
    pos = 0
    while pos < len(raw):
        headers, block, pos = _parse_record(raw, pos)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            raise ValueError("response record missing URI/Date")
        ts = dt.datetime.strptime(date[:19], "%Y-%m-%dT%H:%M:%S")
        rows.append((url, ts, _http_body(block)))
    return rows


def read_warc(spark, path: str):
    """Directory (or glob) of *.warc / *.warc.gz files -> DataFrame
    (url, warc_ts, html).  One input task per FILE (binaryFile
    source); records fan out inside the Arrow batch, so the only
    parallelism knob is the file count — exactly the Common-Crawl
    layout's contract.  html carries the HTTP response body bytes."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
        ]
    )
    files = spark.read.format("binaryFile").load(path).select("content")

    def expand(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc(bytes(content)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(expand, schema=schema)
