"""WARC / WARC.gz web-archive ingestion (sources/warc.py) — the Common
Crawl corpus shape: writer/parser roundtrip, HTML text extraction, the
distributed binaryFile→mapInPandas reader, corrupt-record resync, and
the BULKINSERT `.warc.gz` path into a collection."""

from __future__ import annotations

import gzip

import pytest

from vrod_spark.engine import Engine
from vrod_spark.sources.warc import (
    html_to_text,
    make_warc_bytes,
    parse_warc_bytes,
    read_warc,
)

@pytest.fixture()
def engine(spark, tmp_path):
    return Engine.create(spark, str(tmp_path), "warcdb")


HTML_A = """<html><head><title>T</title>
<style>body { color: red }</style>
<script type="text/javascript">var x = "<b>not text</b>";</script>
</head><body>
<!-- a comment -->
<h1>Hello &amp; welcome</h1>
<p>Line one.<br>Line&nbsp;two.</p>
</body></html>"""


def records_fixture() -> list[dict]:
    return [
        {
            "warc_type": "warcinfo",
            "body": "software: vrod-spark-tests\r\n",
            "content_type": "application/warc-fields",
        },
        {"url": "http://example.com/a", "body": HTML_A},
        {
            "url": "http://example.com/b",
            "body": '{"k": 1}',
            "content_type": "application/json",
        },
        {
            "url": "http://example.com/c",
            "body": b"\x00\x01\x02\xff",
            "content_type": "application/octet-stream",
        },
        {
            "url": "http://example.com/gone",
            "body": "<html><body>not found</body></html>",
            "status": 404,
        },
    ]


def test_warc_roundtrip_plain_and_gz():
    for gz in (False, True):
        blob = make_warc_bytes(records_fixture(), gzip_members=gz)
        recs = parse_warc_bytes(blob)
        assert len(recs) == 5
        types = [r["headers"]["warc-type"] for r in recs]
        assert types == ["warcinfo", "response", "response", "response", "response"]
        # Response payloads are full HTTP messages with the body intact.
        http = recs[1]["payload"]
        assert http.startswith(b"HTTP/1.1 200")
        assert HTML_A.encode() in http
        assert recs[1]["headers"]["warc-target-uri"] == "http://example.com/a"
        # Deterministic output (mtime=0 in the gzip members).
        assert blob == make_warc_bytes(records_fixture(), gzip_members=gz)


def test_warc_gz_members_are_concatenated_gzip():
    blob = make_warc_bytes(records_fixture()[:2], gzip_members=True)
    # Two members: stdlib decompress consumes both; the first member
    # alone ends before the full payload.
    assert blob.count(b"\x1f\x8b\x08") >= 2
    full = gzip.decompress(blob)
    assert full.count(b"WARC/1.0") == 2


def test_html_to_text_strips_script_style_entities():
    text = html_to_text(HTML_A)
    assert "Hello & welcome" in text
    assert "Line one. Line\xa0two." in text.replace("  ", " ") or "Line one." in text
    assert "color: red" not in text
    assert "not text" not in text  # script content dropped
    assert "a comment" not in text
    assert "<" not in text
    # Unknown charset label degrades to utf-8, never raises.
    assert "Hello" in html_to_text(HTML_A.encode(), charset="x-bogus-charset")


def test_parse_warc_skip_resyncs_after_corrupt_record():
    good = records_fixture()
    blob = make_warc_bytes(good, gzip_members=False)
    # Corrupt the middle: truncate record 2's Content-Length payload by
    # chopping bytes out of its body.
    marker = b'{"k": 1}'
    i = blob.index(marker)
    broken = blob[: i + 2] + blob[i + len(marker) :]
    with pytest.raises(Exception):
        parse_warc_bytes(broken)  # strict default raises
    recs = parse_warc_bytes(broken, on_error="skip")
    # The records before the corruption parse; the parser resyncs to a
    # later WARC/ line and keeps at least one trailing record.
    uris = [r["headers"].get("warc-target-uri") for r in recs]
    assert "http://example.com/a" in uris
    assert len(recs) >= 3


def test_read_warc_distributed(spark, tmp_path):
    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(make_warc_bytes(records_fixture()))
    df = read_warc(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    # warcinfo filtered by default; binary payload yields NULL text.
    assert set(rows) == {
        "http://example.com/a",
        "http://example.com/b",
        "http://example.com/c",
        "http://example.com/gone",
    }
    a = rows["http://example.com/a"]
    assert a["http_status"] == 200
    assert "Hello & welcome" in a["text"]
    assert a["payload"] is None  # raw bytes never leave the parse stage
    assert rows["http://example.com/b"]["text"] == '{"k": 1}'
    assert rows["http://example.com/c"]["text"] is None
    assert rows["http://example.com/gone"]["http_status"] == 404
    # payload="raw" carries the body bytes for downstream multimodal work.
    raw = {
        r["url"]: r
        for r in read_warc(spark, str(p), payload="raw").collect()
    }
    assert bytes(raw["http://example.com/c"]["payload"]) == b"\x00\x01\x02\xff"
    assert raw["http://example.com/c"]["text"] is None
    # warc_types widens to non-response records.
    all_types = {
        r["warc_type"]
        for r in read_warc(spark, str(p), warc_types=("response", "warcinfo")).collect()
    }
    assert all_types == {"response", "warcinfo"}


def test_read_warc_skip_tolerates_garbage_file(spark, tmp_path):
    (tmp_path / "good.warc.gz").write_bytes(make_warc_bytes(records_fixture()[:2]))
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8bnot really gzip at all")
    with pytest.raises(Exception):
        read_warc(spark, str(tmp_path) + "/*.warc.gz").collect()
    rows = read_warc(
        spark, str(tmp_path) + "/*.warc.gz", on_error="skip"
    ).collect()
    assert [r["url"] for r in rows] == ["http://example.com/a"]


def test_bulkinsert_warc_into_collection(engine, tmp_path):
    p = tmp_path / "shard.warc.gz"
    p.write_bytes(make_warc_bytes(records_fixture()))
    engine.execute("CREATE", collection="crawl")
    res = engine.execute("BULKINSERT", collection="crawl", arg=str(p))
    assert res.info["rows"] == 4
    hits = engine.execute(
        "SEARCH", collection="crawl", arg="meta['http_status'] = '404'"
    ).df.collect()
    assert len(hits) == 1
    assert hits[0]["meta"]["url"] == "http://example.com/gone"
    assert "not found" in hits[0]["payload"]


def test_bulkinsert_warc_then_url_dedup(engine, tmp_path):
    """The web-corpus curation path end-to-end: ingest a crawl shard with
    refetches of the same logical page (tracking params / case / fragment
    variants), then DEDUP strategy=url collapses them keep-first on the
    normalized meta['url']."""
    recs = [
        {"url": "http://Example.com/page?utm_source=tw", "body": HTML_A},
        {"url": "http://example.com/page", "body": HTML_A},          # refetch
        {"url": "http://example.com/page#frag", "body": HTML_A},     # refetch
        {"url": "http://example.com/other", "body": HTML_A},
    ]
    p = tmp_path / "refetch.warc.gz"
    p.write_bytes(make_warc_bytes(recs))
    engine.execute("CREATE", collection="crawl2")
    assert engine.execute("BULKINSERT", collection="crawl2", arg=str(p)).info["rows"] == 4

    info = engine.execute(
        "DEDUP", collection="crawl2", arg={"strategy": "url"}
    ).info
    assert info["removed"] == 2
    kept = engine.db.collection("crawl2").read().collect()
    # WARC ids are content-derived hashes (stable across retries and
    # ingests — r11), so keep-first keeps the smallest ID, which is a
    # deterministic but not ingest-ordered member of each url group:
    # assert the group invariant, not which raw variant survived.
    from pyspark.sql import functions as F

    from vrod_spark.functions.url import url_normalize

    norm = sorted(
        r["n"]
        for r in engine.db.collection("crawl2")
        .read()
        .select(url_normalize(F.col("meta")["url"]).alias("n"))
        .collect()
    )
    assert norm == ["http://example.com/other", "http://example.com/page"]
    # determinism: a second identical ingest+dedup keeps the SAME rows
    engine.execute("CREATE", collection="crawl2b")
    engine.execute("BULKINSERT", collection="crawl2b", arg=str(p))
    engine.execute("DEDUP", collection="crawl2b", arg={"strategy": "url"})
    kept2 = engine.db.collection("crawl2b").read().collect()
    assert sorted(r["id"] for r in kept) == sorted(r["id"] for r in kept2)
    assert sorted(r["meta"]["url"] for r in kept) == sorted(
        r["meta"]["url"] for r in kept2
    )


def test_negative_content_length_terminates(spark):
    """r11 review: a negative Content-Length moved the parse cursor
    BACKWARD — strict mode looped forever without raising; skip mode
    re-found the same record each resync, growing records unboundedly."""
    import pytest

    from vrod_spark.sources.warc import make_warc_bytes, parse_warc_bytes

    good = make_warc_bytes(
        [{"url": "http://a.example/", "body": "<p>ok</p>"}], gzip_members=False
    )
    evil = good.replace(
        b"Content-Length: ", b"Content-Length: -", 1
    )
    # two records: corrupt first, good second — skip yields the good one
    two = evil + make_warc_bytes(
        [{"url": "http://b.example/", "body": "<p>fine</p>"}],
        gzip_members=False,
    )
    with pytest.raises(ValueError, match="negative Content-Length"):
        parse_warc_bytes(two, on_error="raise")
    recs = parse_warc_bytes(two, on_error="skip")
    assert len(recs) == 1
    assert recs[0]["headers"]["warc-target-uri"] == "http://b.example/"
