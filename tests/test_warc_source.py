"""WARC source (sources/warc.py): Common Crawl's native format → pages.

Covers: plain + per-record-gzipped archives (the Common Crawl shape),
non-response records skipped, HTTP envelope stripped byte-exactly,
timestamps parsed, extraction + lang-id fill the pages schema, and an
end-to-end index build over WARC input answers queries.
"""

import os

import pytest
from pyspark.sql import functions as F

from invoicenet_spark.sources.warc import parse_warc, read_warc_pages, write_warc

HTML_EN = (
    "<html><head><title>T</title></head><body><p>the quick brown fox and the "
    "lazy dog that was with a cat in the house</p></body></html>"
).encode()
HTML_DE = (
    "<html><body><p>der hund und die katze sind das haus mit einem brief und "
    "nicht auf dem tisch</p></body></html>"
).encode()


def _records():
    return [
        ("https://a.example/1", "2024-01-01T00:00:00Z", HTML_EN),
        ("https://b.example/2", "2024-01-02T12:30:00Z", HTML_DE),
        ("https://c.example/3", None, b"<body><p>plain text body</p></body>"),
    ]


def test_parse_roundtrip_plain_and_gzip(tmp_path):
    for gz in (False, True):
        p = str(tmp_path / (f"t{'gz' if gz else ''}.warc" + (".gz" if gz else "")))
        write_warc(_records(), p, gzip_per_record=gz)
        got = list(parse_warc(open(p, "rb").read()))
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in _records()]
        assert got[0][1] == "2024-01-01T00:00:00Z"


def test_parse_skips_non_response_records(tmp_path):
    p = str(tmp_path / "mix.warc")
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a.example/1\r\nContent-Length: 10\r\n\r\n"
        b"GET / HTTP\r\n\r\n"
    )
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    with open(p, "wb") as f:
        f.write(info + req)
    write_warc(_records()[:1], str(tmp_path / "resp.warc"))
    with open(p, "ab") as f:
        f.write(open(str(tmp_path / "resp.warc"), "rb").read())
    got = list(parse_warc(open(p, "rb").read()))
    assert len(got) == 1 and got[0][0] == "https://a.example/1"
    assert got[0][2] == HTML_EN  # HTTP envelope stripped byte-exactly


def test_read_warc_pages_schema_and_langid(spark, tmp_path):
    d = str(tmp_path / "archives")
    os.makedirs(d)
    write_warc(_records()[:2], os.path.join(d, "a.warc.gz"), gzip_per_record=True)
    write_warc(_records()[2:], os.path.join(d, "b.warc"))
    pages = read_warc_pages(spark, d)
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://a.example/1", "https://b.example/2", "https://c.example/3"}
    assert rows["https://a.example/1"]["lang"] == "en"
    assert rows["https://b.example/2"]["lang"] == "de"
    assert rows["https://a.example/1"]["warc_ts"].year == 2024
    # strip_tags extraction: title + body text, tags gone
    assert "quick brown fox" in rows["https://a.example/1"]["text"]
    assert "<" not in rows["https://a.example/1"]["text"]
    assert bytes(rows["https://a.example/1"]["html"]) == HTML_EN


def test_build_index_over_warc(spark, tmp_path):
    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.query.exec import load_index, search

    d = str(tmp_path / "archives")
    os.makedirs(d)
    recs = [
        (f"https://site.example/{i}", "2024-01-01T00:00:00Z",
         f"<html><body><p>the common crawl page number {i} about the quick fox</p></body></html>".encode())
        for i in range(40)
    ]
    write_warc(recs, os.path.join(d, "seg.warc.gz"), gzip_per_record=True)
    pages = read_warc_pages(spark, d)
    from invoicenet_spark.index.build import build_index

    out = str(tmp_path / "idx")
    cfg = EngineConfig(shard_size=32, block_size=8, build_partitions=2)
    build_index(spark, pages, out, cfg, use_stored_text=True)
    import pandas as pd

    res = search(
        spark, load_index(spark, out),
        pd.DataFrame([{"query_id": 1, "terms": ["quick", "fox"], "mode": "AND", "k": 5}]),
    ).collect()
    assert len(res) == 5


def test_member_index_spans_cover_archive(tmp_path):
    from invoicenet_spark.sources.warc import index_warc_members

    p = str(tmp_path / "t.warc.gz")
    write_warc(_records() * 7, p, gzip_per_record=True)
    data = open(p, "rb").read()
    spans = index_warc_members(data)
    assert len(spans) == 21  # one member per record
    # contiguous, exhaustive cover
    pos = 0
    for start, length in spans:
        assert start == pos and length > 0
        pos += length
    assert pos == len(data)
    # any span group parses standalone (member boundary == record boundary)
    got = list(parse_warc(data[spans[3][0] : spans[5][0] + spans[5][1]]))
    assert [u for u, _, _ in got] == [u for u, _, _ in (_records() * 7)[3:6]]
    # non-gzip input: one whole-file span
    raw = str(tmp_path / "t.warc")
    write_warc(_records(), raw)
    assert index_warc_members(open(raw, "rb").read()) == [
        (0, os.path.getsize(raw))
    ]


def test_split_read_matches_whole_file_and_uses_many_tasks(spark, tmp_path):
    """Sub-file splitting (records_per_task): one big archive → many byte-
    range tasks, rows identical to the whole-file path, and the index built
    from the split read is byte-identical to the whole-file one."""
    from invoicenet_spark.sources.warc import warc_split_ranges

    d = str(tmp_path / "arch")
    os.makedirs(d)
    recs = [
        (f"https://site.example/{i}", "2024-01-01T00:00:00Z",
         f"<html><body><p>the common crawl page number {i} about the quick fox</p></body></html>".encode())
        for i in range(50)
    ]
    write_warc(recs, os.path.join(d, "seg.warc.gz"), gzip_per_record=True)

    ranges = warc_split_ranges(spark, d, records_per_task=8).collect()
    assert len(ranges) == 7  # ceil(50/8) byte-range tasks from ONE archive

    whole = read_warc_pages(spark, d).orderBy("url").collect()
    split = read_warc_pages(spark, d, records_per_task=8).orderBy("url").collect()
    assert [r.asDict() for r in split] == [r.asDict() for r in whole]

    # e2e: byte-identical postings from either read path
    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.index.build import build_index

    cfg = EngineConfig(shard_size=32, block_size=8, build_partitions=2)
    outs = []
    for label, rpt in (("whole", None), ("split", 8)):
        out = str(tmp_path / f"idx_{label}")
        build_index(
            spark, read_warc_pages(spark, d, records_per_task=rpt), out, cfg,
            use_stored_text=True,
        )
        outs.append(out)

    def postings_bytes(root):
        import pyarrow.dataset as ds

        t = ds.dataset(
            os.path.join(root, "postings"), format="parquet", partitioning="hive"
        ).to_table().sort_by([("shard", "ascending"), ("term_id", "ascending")])
        return t.to_pandas().to_csv(index=False)

    assert postings_bytes(outs[0]) == postings_bytes(outs[1])


def test_chunk_sync_split_matches_whole_file(spark, tmp_path):
    """Arbitrary-offset splitting (split_bytes): tasks sync on CRC-verified
    member boundaries, every member is owned by exactly one chunk, and the
    union equals the whole-archive parse — across many chunk sizes so
    boundaries land mid-member, mid-header, and exactly on members."""
    from invoicenet_spark.sources.warc import parse_warc_chunk

    d = str(tmp_path / "arch")
    os.makedirs(d)
    recs = [
        (f"https://site.example/{i}", "2024-01-01T00:00:00Z",
         (f"<html><body><p>page {i} " + "filler " * (i % 17) + "</p></body></html>").encode())
        for i in range(60)
    ]
    p = os.path.join(d, "seg.warc.gz")
    write_warc(recs, p, gzip_per_record=True)
    size = os.path.getsize(p)
    expect = [u for u, _, _ in recs]

    # pure-python chunk walk at several awkward chunk sizes
    for nchunks in (2, 3, 7, 13):
        step = max(1, size // nchunks)
        got = []
        for s in range(0, size, step):
            got += [u for u, _, _ in parse_warc_chunk(p, s, min(s + step, size))]
        assert sorted(got) == sorted(expect), f"nchunks={nchunks}"

    # through Spark: rows identical to the whole-file path
    whole = read_warc_pages(spark, d).orderBy("url").collect()
    split = read_warc_pages(spark, d, split_bytes=size // 5).orderBy("url").collect()
    assert [r.asDict() for r in split] == [r.asDict() for r in whole]

    # non-gzip archive: task 0 owns the file, other chunks contribute nothing
    raw_d = str(tmp_path / "raw")
    os.makedirs(raw_d)
    write_warc(recs[:10], os.path.join(raw_d, "seg.warc"))
    raw_rows = read_warc_pages(spark, raw_d, split_bytes=1024).orderBy("url").collect()
    assert [r["url"] for r in raw_rows] == sorted(u for u, _, _ in recs[:10])


def test_parse_tolerates_gzip_trailing_garbage_and_bad_dates(spark, tmp_path):
    """Crawl-data reality: trailing junk after gzip members and malformed
    WARC-Date headers must not fail the archive's task."""
    import gzip

    d = str(tmp_path / "arch")
    os.makedirs(d)
    p = os.path.join(d, "t.warc.gz")
    write_warc(_records()[:2], p, gzip_per_record=True)
    with open(p, "ab") as f:
        f.write(b"\x00garbage-after-members\xff\xfe")
    got = list(parse_warc(open(p, "rb").read()))
    assert [u for u, _, _ in got] == ["https://a.example/1", "https://b.example/2"]

    bad = os.path.join(d, "bad.warc")
    write_warc([("https://x.example/9", "not-a-date-at-all", b"<p>x</p>")], bad)
    rows = read_warc_pages(spark, d).collect()
    by_url = {r["url"]: r for r in rows}
    assert "https://x.example/9" in by_url
    assert by_url["https://x.example/9"]["warc_ts"] is None


def _raw_record(url: str, body: bytes) -> bytes:
    block = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"Content-Length: {len(block)}\r\n".encode()
        + b"\r\n" + block + b"\r\n\r\n"
    )


def test_chunk_sync_rejects_inner_gzip_stream(tmp_path):
    """A record whose HTTP body is itself a complete gzip stream
    (Content-Encoding: gzip bodies are common in crawls), stored verbatim
    inside the outer member's deflate STORED blocks (level 0): the inner
    stream decompresses cleanly with a valid CRC, so a CRC-only sync latches
    onto it and the task then walks from mid-member and drops its real
    records. The sync must additionally require a WARC payload."""
    import gzip

    from invoicenet_spark.sources.warc import parse_warc_chunk

    inner = gzip.compress(b"<html><body>compressed page body</body></html>")
    assert inner.startswith(b"\x1f\x8b\x08")
    recs = [
        ("https://s.example/0", b"<html><body>plain zero</body></html>"),
        ("https://s.example/1", inner),  # gzip body inside stored blocks
        ("https://s.example/2", b"<html><body>plain two</body></html>"),
        ("https://s.example/3", b"<html><body>plain three</body></html>"),
    ]
    p = str(tmp_path / "poison.warc.gz")
    with open(p, "wb") as f:
        for url, body in recs:
            # level 0 → stored deflate blocks → inner gzip bytes verbatim
            f.write(gzip.compress(_raw_record(url, body), compresslevel=0))
    data = open(p, "rb").read()
    assert inner in data  # the trap is actually present in the archive
    size = len(data)
    expect = sorted(u for u, _ in recs)

    for nchunks in (2, 3, 4, 5, 7):
        step = max(1, size // nchunks)
        got = []
        for s in range(0, size, step):
            got += [u for u, _, _ in parse_warc_chunk(p, s, min(s + step, size))]
        assert sorted(got) == expect, f"nchunks={nchunks}"

    # and a chunk starting just past the poisoned member's own magic, so the
    # FIRST candidate the scan sees is the inner stream: must skip it and
    # sync on the next real member instead of aborting mid-member
    from invoicenet_spark.sources.warc import index_warc_members

    spans = index_warc_members(data)
    s1 = spans[1][0]  # poisoned member start
    got = [u for u, _, _ in parse_warc_chunk(p, s1 + 1, size)]
    assert got == ["https://s.example/2", "https://s.example/3"]


def test_chunk_sync_finds_magic_straddling_chunk_end(tmp_path):
    """A member whose 3-byte gzip magic starts at limit-1 / limit-2 is owned
    by the chunk (start < end) but the magic straddles the scan window; the
    scan must look 2 bytes past the chunk end or the member is parsed by no
    task (silent record loss)."""
    from invoicenet_spark.sources.warc import index_warc_members, parse_warc_chunk

    recs = [
        (f"https://e.example/{i}", "2024-01-01T00:00:00Z",
         f"<html><body>page {i} body text</body></html>".encode())
        for i in range(4)
    ]
    p = str(tmp_path / "edge.warc.gz")
    write_warc(recs, p, gzip_per_record=True)
    data = open(p, "rb").read()
    size = len(data)
    spans = index_warc_members(data)
    assert len(spans) == 4
    s2 = spans[2][0]  # member 2: the straddled boundary
    a = spans[1][0] + 1  # chunk 2 starts inside member 1 → must sync by scan

    for e in (s2 + 1, s2 + 2):  # magic at limit-1 and limit-2
        chunks = [(0, a), (a, e), (e, size)]
        got = []
        for cs, ce in chunks:
            got += [u for u, _, _ in parse_warc_chunk(p, cs, ce)]
        assert sorted(got) == sorted(u for u, _, _ in recs), f"end={e}"



def _fake_store_opener(blob_dir):
    """A fake object-store reader: opens serve bytes through an in-memory
    BytesIO (as a ranged-GET client would materialize its response stream)
    and drop a marker file per open so the Spark-task path proves the seam
    was exercised."""
    import io as _io
    import uuid

    def opener(path):
        with open(path, "rb") as f:
            data = f.read()
        with open(os.path.join(blob_dir, f"open-{uuid.uuid4().hex}"), "w"):
            pass
        return _io.BytesIO(data)

    return opener


def test_injectable_byte_range_reader(spark, tmp_path):
    """The WARC chunk tasks read through an injectable opener (fsspec-style
    path → file-like): byte-identical results to the local-open default,
    and the Spark split path demonstrably routes every ranged read through
    the injected reader."""
    from invoicenet_spark.sources.warc import parse_warc_chunk

    d = str(tmp_path / "arch")
    os.makedirs(d)
    recs = [
        (f"https://r.example/{i}", "2024-01-01T00:00:00Z",
         (f"<html><body><p>page {i} " + "pad " * (i % 11) + "</p></body></html>").encode())
        for i in range(30)
    ]
    p = os.path.join(d, "seg.warc.gz")
    write_warc(recs, p, gzip_per_record=True)
    size = os.path.getsize(p)

    markers = str(tmp_path / "markers")
    os.makedirs(markers)
    opener = _fake_store_opener(markers)

    # pure chunk walk: injected reader ≡ default reader
    step = max(1, size // 5)
    for s in range(0, size, step):
        a = list(parse_warc_chunk(p, s, min(s + step, size)))
        b = list(parse_warc_chunk(p, s, min(s + step, size), opener=opener))
        assert a == b
    assert len(os.listdir(markers)) >= 5  # the fake reader actually served

    # through Spark: rows identical, every task's read went through the seam
    for f in os.listdir(markers):
        os.unlink(os.path.join(markers, f))
    whole = read_warc_pages(spark, d).orderBy("url").collect()
    split = (
        read_warc_pages(spark, d, split_bytes=size // 4, opener=opener)
        .orderBy("url").collect()
    )
    assert [r.asDict() for r in split] == [r.asDict() for r in whole]
    assert len(os.listdir(markers)) >= 4

    # records_per_task path honors the seam too
    for f in os.listdir(markers):
        os.unlink(os.path.join(markers, f))
    ranged = (
        read_warc_pages(spark, d, records_per_task=7, opener=opener)
        .orderBy("url").collect()
    )
    assert [r.asDict() for r in ranged] == [r.asDict() for r in whole]
    assert len(os.listdir(markers)) >= 1
