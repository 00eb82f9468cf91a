"""WARC (Web ARChive, ISO 28500 / WARC 1.0) source: the interchange
format real crawls arrive in (Common Crawl, Heritrix, wget --warc).

Two halves, both distributed:

* **synthesis** (`synth_warc_blobs`): deterministic WARC/1.0 blobs built
  from the documents table — each blob holds one ``warcinfo`` record plus
  a group of ``response`` records whose HTTP payload is the SAME
  synthesized page (`web/htmlgen.page_html`) the HTML stack parses, so
  every downstream law (main-text, spans, anchors) holds verbatim over
  the WARC path. A pure function of (doc_id, text): the oracle rebuilds
  expected outputs in closed form.
* **parsing** (`parse_warc`): a narrow mapInPandas that walks the WARC
  record framing (header block, CRLFCRLF, Content-Length payload,
  CRLFCRLF), parses the embedded HTTP response (status line, headers,
  body), and emits one row per record.

100 TB shape: blobs are opaque ``binary`` cells; parsing is narrow (no
shuffle) and each Arrow batch holds whole blobs, so framing state never
crosses batch or partition boundaries — exactly how a real WARC split
reader works (gzip members are record-aligned; splits snap to record
starts). The synthesis side's one shuffle is the groupBy(blob_id) that
packs records into files — the writer's shuffle, not the reader's.

Record framing per the public WARC 1.0 spec (ISO 28500:2009 §4): a
record is ``version line, named fields, CRLFCRLF, content block,
CRLFCRLF``; mandatory fields WARC-Record-ID, Content-Length, WARC-Date,
WARC-Type; response records carry Content-Type
``application/http;msgtype=response`` and WARC-Target-URI.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_DATE = "2026-01-01T00:00:00Z"
RECORDS_PER_BLOB = 4
CRLF = "\r\n"


def _uuid(kind: str, n: int) -> str:
    """Deterministic RFC-4122-shaped record id (the spec requires a
    globally unique URI; a content-derived digest keeps the fixture pure
    ACROSS processes — Python's builtin hash() is salted per interpreter
    and would make blobs differ between runs/executors)."""
    import hashlib

    h = hashlib.md5(f"{kind}:{n}".encode()).hexdigest()[:12]
    return f"<urn:uuid:00000000-0000-4000-8000-{h}>"


def doc_uri(doc_id: int) -> str:
    """Archive URI for a doc: domain follows web/extract's page law
    (_domain_of(_page_of(doc_id)) — the host a fetch of this doc would
    hit), while the PATH keys the raw doc_id so every archived fetch
    gets a unique WARC-Target-URI (html_to_documents uses it as the
    doc key; the page-collapsed /p/{doc_id//3} view would collide
    record ids). Joining against the URL analytics therefore goes
    through the page mapping, not string equality."""
    return f"https://site{(doc_id // 3) % 20}.example.com/p/{doc_id}"


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = "WARC/1.0" + CRLF
    head += "".join(f"{k}: {v}{CRLF}" for k, v in headers)
    head += f"Content-Length: {len(body)}{CRLF}"
    return head.encode("ascii") + CRLF.encode() + body + (CRLF * 2).encode()


def response_record(doc_id: int, html: str) -> bytes:
    body_b = html.encode("utf-8")
    http = (
        f"HTTP/1.1 200 OK{CRLF}"
        f"Content-Type: text/html; charset=utf-8{CRLF}"
        f"Content-Length: {len(body_b)}{CRLF}{CRLF}"
    ).encode("ascii") + body_b
    return _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", _uuid("response", doc_id)),
            ("WARC-Date", WARC_DATE),
            ("WARC-Target-URI", doc_uri(doc_id)),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        http,
    )


def warcinfo_record(blob_id: int) -> bytes:
    info = f"software: newocr_spark{CRLF}format: WARC file version 1.0{CRLF}"
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _uuid("warcinfo", blob_id)),
            ("WARC-Date", WARC_DATE),
            ("Content-Type", "application/warc-fields"),
        ],
        info.encode("ascii"),
    )


def synth_warc_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id:long, text) → (blob_id:long, data:binary): WARC blobs of
    ``RECORDS_PER_BLOB`` response records (doc_id order) prefixed by one
    warcinfo record — the writer side. One shuffle (groupBy blob_id)."""
    from ..web.htmlgen import page_html

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob_id = int(pdf["blob_id"].iloc[0])
        parts = [warcinfo_record(blob_id)]
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            parts.append(response_record(int(did), page_html(int(did), text)))
        return pd.DataFrame({"blob_id": [blob_id], "data": [b"".join(parts)]})

    return (
        docs.withColumn(
            "blob_id", F.floor(F.col("doc_id") / F.lit(RECORDS_PER_BLOB))
        )
        .groupBy("blob_id")
        .applyInPandas(pack, "blob_id long, data binary")
    )


def walk_records(data: bytes) -> list[tuple]:
    """Pure framing walk over one blob: Content-Length-delimited records
    (ISO 28500 §4) — the payload may legally contain CRLFCRLF or even a
    'WARC/1.0' line; only the length field delimits. Returns
    (warc_type, target_uri, http_status, content_type, payload) per
    record. Property-tested against adversarial payloads."""
    sep = (CRLF * 2).encode()
    rows, pos = [], 0
    while pos < len(data):
        hdr_end = data.find(sep, pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("ascii").split(CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # skip record-end CRLFCRLF
        wtype = fields.get("warc-type", "")
        status, ctype, payload = None, None, None
        if wtype == "response":
            he = body.find(sep)
            hlines = body[:he].decode("ascii").split(CRLF)
            status = int(hlines[0].split(" ")[1])
            for ln in hlines[1:]:
                k, _, v = ln.partition(":")
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
            payload = body[he + 4 :].decode("utf-8")
        rows.append(
            (wtype, fields.get("warc-target-uri"), status, ctype, payload)
        )
    return rows


def parse_warc(blobs: DataFrame) -> DataFrame:
    """(blob_id, data:binary) → one row per WARC record:
    (blob_id, rec_idx, warc_type, target_uri, http_status, content_type,
    payload). Narrow mapInPandas — framing never crosses a batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob_id, data in zip(pdf["blob_id"], pdf["data"]):
                for idx, rec in enumerate(walk_records(bytes(data))):
                    rows.append((int(blob_id), idx) + rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id", "rec_idx", "warc_type", "target_uri",
                    "http_status", "content_type", "payload",
                ],
            )

    return blobs.mapInPandas(
        run,
        "blob_id long, rec_idx int, warc_type string, target_uri string, "
        "http_status int, content_type string, payload string",
    )
