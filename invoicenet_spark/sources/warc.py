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
build_index / SnapshotTable.append. Default parallelism is per archive
file — Common Crawl segments ship as ~1 GB files in the thousands, which
is the right task granularity when files are plentiful.

Sub-file splitting (read_warc_pages kwargs), for when single archives
dominate or exceed binaryFile's 2 GB row ceiling:
  - split_bytes: arbitrary-offset chunks; each task syncs on the first
    CRC-verified gzip-member boundary in its chunk (parse_warc_chunk) and
    parses the members starting there — NO serial pass, linear speedup
    (measured 6.6x at 8 cores on one archive; BENCH/BASELINE.md 3g).
  - records_per_task: exact member-index pass (warc_split_ranges — the
    CDX-index analog) then member ranges; the index pass is a sequential
    decompress, so use it only when the index is reused.
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


def index_warc_members(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every gzip member in a per-record-gzip archive —
    one sequential decompress pass (zlib's unused_data gives each member's
    exact end; scanning for magic bytes alone would false-positive inside
    compressed data). Non-gzip input yields one span covering everything."""
    if data[:2] != b"\x1f\x8b":
        return [(0, len(data))]
    spans = []
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            d.decompress(data[pos:])
            d.flush()
        except zlib.error:
            break  # truncated tail — everything indexed so far is valid
        end = len(data) - len(d.unused_data)
        spans.append((pos, end - pos))
        if not d.unused_data:
            break
        pos = end
    return spans


def _local_path(p: str) -> str:
    from urllib.parse import unquote, urlparse

    if p.startswith("file:"):
        return unquote(urlparse(p).path)
    return p


_GZ_MAGIC = b"\x1f\x8b\x08"


def _open_local(path: str):
    """Default byte-range reader: the local filesystem. Every ranged read
    below goes through an injectable `opener` seam — any callable
    path → file-like with read/seek qualifies, so an fsspec filesystem's
    ``lambda p: fs.open(p, "rb")`` (ranged GETs against an object store)
    drops in without touching the chunk-sync logic. Openers are shipped to
    executors inside the task closure (cloudpickle), so they must be
    picklable."""
    return open(path, "rb")


def _decompress_member(f, buf: bytearray, pos: int):
    """Decompress ONE gzip member starting at buf[pos:], extending buf from
    the open file when the member crosses the buffer end. Returns
    (payload, member_end_offset_in_buf, buf) or None (not a valid member /
    truncated). zlib verifies the member's CRC32+ISIZE trailer, so a
    successful return is a REAL member boundary — magic bytes occurring
    inside compressed data fail the decompress almost immediately."""
    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    out = []
    i = pos
    CHUNK = 1 << 20
    while True:
        chunk = bytes(buf[i : i + CHUNK])
        if not chunk:
            more = f.read(CHUNK)
            if not more:
                return None  # truncated member at EOF
            buf += more
            continue
        try:
            out.append(d.decompress(chunk))
        except zlib.error:
            return None
        i += len(chunk)
        if d.eof:
            end = i - len(d.unused_data)
            return b"".join(out), end, buf


def parse_warc_chunk(path: str, start: int, end: int, opener=None):
    """Parse the WARC records of every gzip member STARTING in [start, end)
    of a per-record-gzip archive — the task body of arbitrary-offset
    splitting. A task seeks to its chunk, SYNCS on the first verified
    member boundary at or after `start` (candidate = gzip magic, verified
    by a full member decompress incl. CRC), then walks members until one
    starts at or past `end`; the final member may extend past `end` (reads
    continue from the file). Every member is owned by exactly the task
    whose range contains its start, so the union over tasks is exactly the
    whole-archive parse. No serial indexing pass anywhere — this is what
    makes one N-GB archive cost N_tasks parallel chunks instead of a
    sequential decompress (the indexing-pass variant measured serial-bound:
    BENCH/BASELINE.md 3g).

    opener: byte-range reader seam (see _open_local) — this function only
    ever seeks to its chunk and reads forward, exactly the access pattern
    of an object-store ranged GET."""
    with (opener or _open_local)(path) as f:
        f.seek(start)
        # +2 bytes past the chunk end so a member whose 3-byte gzip magic
        # STARTS at limit-1/limit-2 (ownership: start < end) is still
        # findable by the scan — without the lookahead such a member's magic
        # straddles the window and no task parses it (silent record loss).
        buf = bytearray(f.read(max(end - start, 0) + 2))
        limit = end - start  # member must START inside the chunk
        pos = 0
        if start > 0:
            # sync: first verified member boundary in the chunk (search the
            # original chunk bytes once — probes may grow buf past `limit`).
            # CRC alone is NOT enough: a record whose gzipped body is stored
            # verbatim inside the outer member's deflate stored blocks also
            # decompresses cleanly; such an inner stream yields non-WARC
            # payload, so additionally require the payload to be a WARC
            # record before accepting the sync point.
            scan = bytes(buf[: limit + 2])
            pos = None
            i = scan.find(_GZ_MAGIC)
            while 0 <= i < limit:
                probe = _decompress_member(f, buf, i)
                if probe is not None and probe[0].startswith(b"WARC/"):
                    pos = i
                    break
                i = scan.find(_GZ_MAGIC, i + 1)
            if pos is None:
                return
        elif buf[:2] != b"\x1f\x8b":
            # non-gzip archive: not splittable — task 0 owns the whole file
            rest = f.read()
            yield from parse_warc(bytes(buf) + rest)
            return
        while pos is not None and pos < limit:
            res = _decompress_member(f, buf, pos)
            if res is None:
                return  # truncated tail
            payload, mend, buf = res
            yield from parse_warc(payload)
            pos = mend


def warc_split_ranges(
    spark: SparkSession, path: str, records_per_task: int
) -> DataFrame:
    """Explode WARC archives into byte-range tasks: one distributed indexing
    pass per archive finds gzip-member boundaries, groups every
    `records_per_task` consecutive members into one (path, start, length)
    range, and returns the (small — members/records_per_task rows per
    archive) range frame. Ranges are self-contained because Common Crawl
    gzips ONE RECORD PER MEMBER: any member boundary is a record boundary.

    The indexing pass is sequential per archive (gzip members only reveal
    their ends by decompression) but output-light; the expensive work —
    HTML parsing, text extraction — then fans out over the ranges. This is
    also how a >2 GB archive avoids the `binaryFile` single-row ceiling:
    range tasks read their slice straight from the file (a ranged GET on an
    object store), never materializing the whole archive in one row."""
    import pandas as pd

    paths = [
        r["path"]
        for r in spark.read.format("binaryFile").load(path).select("path").collect()
    ]

    def index_files(batches):
        for pdf in batches:
            out = {"path": [], "start": [], "length": []}
            for p in pdf["path"]:
                lp = _local_path(p)
                with open(lp, "rb") as f:
                    data = f.read()
                spans = index_warc_members(data)
                for i in range(0, len(spans), records_per_task):
                    group = spans[i : i + records_per_task]
                    out["path"].append(lp)
                    out["start"].append(group[0][0])
                    out["length"].append(group[-1][0] + group[-1][1] - group[0][0])
            yield pd.DataFrame(out)

    files_df = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(max(1, len(paths)))
    return files_df.mapInPandas(index_files, schema="path string, start long, length long")


def read_warc_pages(
    spark: SparkSession,
    path: str,
    extract: bool = True,
    extract_strategy: str = "strip_tags",
    records_per_task: int | None = None,
    split_bytes: int | None = None,
    opener=None,
) -> DataFrame:
    """WARC archive(s) at `path` (file/dir/glob; .warc or .warc.gz) → the
    engine's pages frame (url, warc_ts, html, text, lang).

    text is extracted with the given strategy (Arrow C++ on the default);
    lang is the stopword-ratio heuristic (ops/text_analysis) over the
    extracted text. extract=False leaves text=''/lang='unk' for callers
    that extract later in their own pipeline.

    Sub-file splitting (both bypass the 2 GB binaryFile row ceiling —
    chunk/range tasks read their slice straight from the file, a ranged GET
    on an object store; None keeps per-archive tasks, the Common-Crawl
    thousands-of-~1GB-files shape):

    split_bytes: arbitrary-offset chunks of this many bytes; each task
    SYNCS on the first CRC-verified gzip-member boundary in its chunk
    (parse_warc_chunk) — NO serial pass anywhere, so one huge archive
    parallelizes fully. Preferred.

    records_per_task: exact member-index pass first (warc_split_ranges),
    then ranges of this many members. The index pass is itself a full
    sequential decompress of each archive, so this only pays off when the
    index is reused (the CDX-file shape) — measured in BENCH/BASELINE.md 3g.

    opener: injectable byte-range reader for the chunk/range tasks (see
    _open_local) — an fsspec-style callable makes every ranged read an
    object-store GET; archive discovery/size listing still goes through
    Spark's binaryFile source.
    """
    import pandas as pd

    from invoicenet_spark.ops.text_analysis import lang_id_expr

    def _emit_records(out: dict, records) -> None:
        for url, ts, html in records:
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

    if split_bytes is not None:
        finfo = (
            spark.read.format("binaryFile").load(path)
            .select("path", "length").collect()
        )
        chunks = []
        for r in finfo:
            lp, size = _local_path(r["path"]), int(r["length"])
            for s in range(0, max(size, 1), int(split_bytes)):
                chunks.append((lp, s, min(s + int(split_bytes), size)))

        def chunk_rows(batches):
            for pdf in batches:
                out = {"url": [], "warc_ts": [], "html": []}
                for p, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                    _emit_records(
                        out, parse_warc_chunk(p, int(start), int(end), opener=opener)
                    )
                yield pd.DataFrame(out)

        pages = (
            spark.createDataFrame(chunks, "path string, start long, end long")
            .repartition(max(1, len(chunks)))
            .mapInPandas(chunk_rows, schema=WARC_PAGES_SCHEMA)
        )
    elif records_per_task is not None:
        # ONE distributed indexing job; the range list itself is tiny
        # (members/records_per_task rows) — collect it so the indexing pass
        # never re-runs as lineage of the parse job
        range_rows_list = warc_split_ranges(spark, path, records_per_task).collect()
        n_ranges = max(1, len(range_rows_list))

        def range_rows(batches):
            for pdf in batches:
                out = {"url": [], "warc_ts": [], "html": []}
                for p, start, length in zip(pdf["path"], pdf["start"], pdf["length"]):
                    with (opener or _open_local)(p) as f:
                        f.seek(int(start))
                        _emit_records(out, parse_warc(f.read(int(length))))
                yield pd.DataFrame(out)

        pages = (
            spark.createDataFrame(range_rows_list)
            .repartition(n_ranges)
            .mapInPandas(range_rows, schema=WARC_PAGES_SCHEMA)
        )
    else:
        raw = spark.read.format("binaryFile").load(path)

        def rows(batches):
            for pdf in batches:
                out = {"url": [], "warc_ts": [], "html": []}
                for content in pdf["content"]:
                    _emit_records(out, parse_warc(bytes(content)))
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
