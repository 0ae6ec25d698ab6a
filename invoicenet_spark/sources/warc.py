"""WARC source: Common Crawl's native archive format → the engine's
`pages` schema (url, warc_ts, html, text, lang).

The reference ingests a directory glob of per-document files
(prepare_data.py:37-44); the web-scale analog of that scan is reading WARC
archives, each a concatenation of records:

    WARC/1.0\\r\\n
    <warc-header>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n

`WARC-Type: response` records carry an HTTP response block (status line +
headers + body); the body bytes are the page html. Common Crawl ships
these gzip-compressed with ONE GZIP MEMBER PER RECORD, so members must be
decompressed sequentially (a plain `gzip.decompress` handles the
multi-member stream via zlib's per-member loop below — no external warc
library is needed or available in this environment).

Spark integration: `binaryFile` datasource (one row per archive,
whole-file bytes) → `mapInPandas` parser emitting (url, warc_ts, html)
rows → text extraction (functions/extract, Arrow C++ strip_tags by
default) and stopword-ratio language id (ops/text_analysis.lang_id_expr)
fill the remaining `pages` columns, so the output plugs straight into
build_index / SnapshotTable.append. Parallelism is per archive file —
Common Crawl segments ship as ~1 GB files in the thousands, which is the
right task granularity; a sub-file splitter (gzip members are
independently seekable from the member boundaries) is the documented
scale-up path if single files ever dominate.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes pass
    through untouched. Tolerant of trailing garbage after a valid member
    (truncated tails / padding are common in crawl archives): members
    decode until the remainder no longer starts a gzip header or fails to
    decompress — everything recovered so far is kept."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.write(d.decompress(data[pos:]))
            out.write(d.flush())
        except zlib.error:
            break  # corrupt/truncated member: keep what decoded so far
        if not d.unused_data:
            break
        pos = len(data) - len(d.unused_data)
    return out.getvalue()


def parse_warc(data: bytes):
    """Yield (url, warc_date_iso, html_bytes) for every WARC response
    record in one archive's bytes. Pure function of the bytes; tolerant of
    trailing garbage and of records of other types (request, metadata,
    warcinfo are skipped)."""
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = min(hdr_end + 4 + length, n)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        # strip the HTTP envelope: body follows the first blank line
        body_at = block.find(b"\r\n\r\n")
        body = block[body_at + 4 :] if body_at >= 0 else block
        yield url, headers.get("warc-date"), body


def read_warc_pages(
    spark: SparkSession,
    path: str,
    extract: bool = True,
    extract_strategy: str = "strip_tags",
) -> DataFrame:
    """WARC archive(s) at `path` (file/dir/glob; .warc or .warc.gz) → the
    engine's pages frame (url, warc_ts, html, text, lang).

    text is extracted with the given strategy (Arrow C++ on the default);
    lang is the stopword-ratio heuristic (ops/text_analysis) over the
    extracted text. extract=False leaves text=''/lang='unk' for callers
    that extract later in their own pipeline.
    """
    import pandas as pd

    from invoicenet_spark.ops.text_analysis import lang_id_expr

    raw = spark.read.format("binaryFile").load(path)

    def rows(batches):
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": []}
            for content in pdf["content"]:
                for url, ts, html in parse_warc(bytes(content)):
                    out["url"].append(url)
                    try:
                        t = pd.Timestamp(ts)  # WARC-Date is ISO8601, usually Z
                        if t.tzinfo is not None:
                            t = t.tz_convert("UTC").tz_localize(None)
                    except (ValueError, TypeError):
                        # one malformed WARC-Date must not fail the whole
                        # ~1 GB archive's task — keep the record, null ts
                        t = pd.NaT
                    out["warc_ts"].append(t)
                    out["html"].append(html)
            yield pd.DataFrame(out)

    pages = raw.select("content").mapInPandas(rows, schema=WARC_PAGES_SCHEMA)
    if not extract:
        return pages.select(
            "url", "warc_ts", "html",
            F.lit("").alias("text"), F.lit("unk").alias("lang"),
        )
    from invoicenet_spark.functions.extract import extract_pages_arrow

    extracted = extract_pages_arrow(
        pages, keep=("url", "warc_ts", "html"), strategy=extract_strategy
    )
    return extracted.select(
        "url", "warc_ts", "html", "text", lang_id_expr("text").alias("lang")
    )


def write_warc(records, path: str, gzip_per_record: bool = False) -> None:
    """Write (url, warc_date_iso, html_bytes) records as a conformant WARC
    archive — the test/fixture twin of parse_warc (and a minimal archive
    sink). gzip_per_record=True writes one gzip member per record, the
    Common Crawl shape."""
    import gzip

    with open(path, "wb") as f:
        for url, ts, html in records:
            block = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            )
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + (f"WARC-Date: {ts}\r\n".encode() if ts else b"")
                + f"Content-Length: {len(block)}\r\n".encode()
                + b"\r\n"
                + block
                + b"\r\n\r\n"
            )
            f.write(gzip.compress(rec) if gzip_per_record else rec)
