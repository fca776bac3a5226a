"""WARC / WARC.gz web-archive ingestion — the Common Crawl corpus shape.

The reference ingests corpora as loose text files (BULKINSERT,
/root/reference/src/command/builder.rs:48-52); real LLM training corpora
arrive as WARC web archives (ISO 28500 / WARC/1.0, the Common Crawl
format): a concatenation of records, each a header block
(``WARC/1.0`` + ``Name: value`` lines + ``Content-Length``) followed by
the payload bytes and a blank-line terminator. ``.warc.gz`` files are
CONCATENATED gzip members — by convention one member per record, so an
index can seek to any record without decompressing the file prefix.

Scale shape: one archive file = one parse task. The distributed reader
is ``binaryFile`` scan → Arrow-batched ``mapInPandas`` — archives are
decompressed and parsed WHERE THEY SIT, and only the extracted text +
metadata rows ever shuffle (same contract as operators/multimodal.py:
blobs are never shuffle keys). Common Crawl shards archives at ~1 GB
precisely so file-granular parallelism saturates a cluster; at 100 TB
that is ~100k independent tasks with zero skew by construction. The
HTTP/HTML handling is pure per-record Python inside the Arrow batch —
no row-at-a-time UDF, no driver loop.

Decompression is stdlib ``gzip``/``zlib`` (always present — the same
rule as PNG's inflate); HTML → text is a deterministic tag stripper
(script/style/comment removal + ``html.unescape``), the cheap-and-
reproducible extraction a dedup/quality pipeline wants BEFORE any
model-based extraction.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "make_warc_bytes",
    "parse_warc_bytes",
    "html_to_text",
    "read_warc",
]

_CRLF = b"\r\n"

# Output schema of the distributed reader. `text` is the extracted
# payload text (HTML-stripped for HTML payloads); `payload` carries the
# raw bytes only in payload="raw" mode (NULL otherwise) so the default
# plan never moves blob bytes past the parse stage.
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, url string, "
    "warc_date string, http_status int, content_type string, "
    "text string, payload binary"
)


def make_warc_bytes(
    records: list[dict],
    *,
    gzip_members: bool = True,
) -> bytes:
    """Synthesize a WARC (or .warc.gz) archive (test/demo helper —
    deterministic, stdlib-only). Each record dict:

    - ``url``: WARC-Target-URI;
    - ``body``: payload text/bytes (HTML for response records);
    - ``warc_type``: default ``"response"`` (also ``"warcinfo"``,
      ``"request"``, ``"metadata"``...);
    - ``status``: HTTP status (default 200) — response records wrap the
      body in a full HTTP/1.1 response message per WARC convention;
    - ``content_type``: HTTP Content-Type (default ``text/html``);
    - ``date``: WARC-Date (default a fixed timestamp — deterministic);
    - ``record_id``: default a deterministic urn:uuid from the index.

    ``gzip_members=True`` writes ONE GZIP MEMBER PER RECORD — the
    Common Crawl layout that keeps records independently seekable."""
    import gzip

    out = bytearray()
    for i, rec in enumerate(records):
        body = rec["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        warc_type = rec.get("warc_type", "response")
        if warc_type == "response":
            status = int(rec.get("status", 200))
            ctype = rec.get("content_type", "text/html; charset=utf-8")
            http = (
                f"HTTP/1.1 {status} OK".encode()
                + _CRLF
                + f"Content-Type: {ctype}".encode()
                + _CRLF
                + f"Content-Length: {len(body)}".encode()
                + _CRLF + _CRLF
                + body
            )
            payload, block_ctype = http, "application/http; msgtype=response"
        else:
            payload, block_ctype = body, rec.get(
                "content_type", "application/warc-fields"
            )
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + warc_type.encode(),
            b"WARC-Record-ID: "
            + rec.get(
                "record_id", f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>"
            ).encode(),
            b"WARC-Date: " + rec.get("date", "2024-01-01T00:00:00Z").encode(),
            b"Content-Type: " + block_ctype.encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        if "url" in rec:
            headers.insert(3, b"WARC-Target-URI: " + rec["url"].encode())
        record = _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            # mtime=0: bit-reproducible output (gzip stamps wall time
            # otherwise, breaking any content-hash test).
            out.extend(gzip.compress(bytes(record), mtime=0))
        else:
            out.extend(record)
    return bytes(out)


def parse_warc_bytes(b: bytes, *, on_error: str = "raise") -> list[dict]:
    """Raw ``.warc``/``.warc.gz`` bytes → list of record dicts
    (``headers`` name→value with names lowercased, ``payload`` bytes).

    Gzip input (sniffed by the 1f 8b magic) may be multi-member —
    stdlib ``gzip.decompress`` consumes ALL concatenated members.
    ``on_error="skip"`` drops a malformed record and RESYNCS to the next
    ``WARC/`` version line (a truncated crawl shard yields its good
    prefix instead of nothing — the corrupt-blob tolerance every decoder
    in operators/multimodal.py also honors)."""
    import gzip

    strict = on_error != "skip"
    if b[:2] == b"\x1f\x8b":
        b = gzip.decompress(b)
    records: list[dict] = []
    pos = 0
    n = len(b)
    while pos < n:
        # Skip inter-record CRLFs (the record terminator is CRLFCRLF).
        while pos < n and b[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        try:
            if not b[pos:].startswith(b"WARC/"):
                raise ValueError("missing WARC version line")
            head_end = b.index(_CRLF + _CRLF, pos)
            head_lines = b[pos:head_end].split(_CRLF)
            headers: dict[str, str] = {}
            for line in head_lines[1:]:
                name, _, value = line.partition(b":")
                headers[name.decode("utf-8").strip().lower()] = (
                    value.decode("utf-8", "replace").strip()
                )
            length = int(headers["content-length"])
            if length < 0:
                # Without this check a negative length moves pos BACKWARD
                # past the record start: strict mode then loops forever
                # (no exception is ever raised), and skip mode re-finds
                # the same record on every resync while `records` grows
                # unboundedly (r11 review).
                raise ValueError("negative Content-Length")
            body_start = head_end + 4
            if body_start + length > n:
                raise ValueError("truncated record payload")
            records.append(
                {"headers": headers, "payload": b[body_start : body_start + length]}
            )
            pos = body_start + length
        except Exception:
            if strict:
                raise
            nxt = b.find(_CRLF + b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt + 2
    return records


_RE_SCRIPT = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_WS = re.compile(r"\s+")
_RE_CHARSET = re.compile(r"charset=([\w\-]+)", re.IGNORECASE)


def html_to_text(html: bytes | str, *, charset: str | None = None) -> str:
    """Deterministic HTML → text: drop <script>/<style> blocks and
    comments, break tags to spaces, decode entities, collapse
    whitespace. NOT a DOM parser — it is the cheap reproducible
    extraction used for dedup/quality scoring upstream of any
    model-based extraction (and it never throws on tag soup: every
    regex degrades to leaving text in place)."""
    import html as _html

    if isinstance(html, bytes):
        try:
            raw = html.decode(charset or "utf-8", "replace")
        except LookupError:  # unknown charset label in the wild
            raw = html.decode("utf-8", "replace")
    else:
        raw = html
    raw = _RE_TAG.sub(" ", _RE_COMMENT.sub(" ", _RE_SCRIPT.sub(" ", raw)))
    return _RE_WS.sub(" ", _html.unescape(raw)).strip()


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP/1.x response message → (status, content-type, body). A
    payload without a status line is passed through unchanged (some
    archives store the bare document as `resource` records)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, None, payload
    head = payload[:sep].split(_CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head[1:]:
        name, _, value = line.partition(b":")
        if name.decode("latin-1").strip().lower() == "content-type":
            ctype = value.decode("latin-1").strip()
            break
    return status, ctype, payload[sep + 4 :]


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    warc_types: tuple[str, ...] = ("response",),
    payload: str = "text",
    on_error: str = "raise",
) -> DataFrame:
    """Distributed WARC/WARC.gz scan → one row per record.

    ``binaryFile`` source (one archive = one task; Spark packs small
    archives into shared tasks via files.maxPartitionBytes) →
    ``mapInPandas`` parse. ``payload="text"`` (default) extracts text —
    HTML-stripped when the HTTP Content-Type says html, decoded verbatim
    for other text/* types, NULL for binary payloads — and leaves the
    ``payload`` column NULL so raw bytes never leave the parse stage;
    ``payload="raw"`` carries the body bytes for downstream multimodal
    decoding (operators/multimodal.py sniffing dispatcher).

    ``warc_types`` filters records at the parser (a crawl archive is
    ~1/3 request/metadata records — dropping them inside the task is
    free; shuffling them is not)."""
    if payload not in ("text", "raw"):
        raise ValueError("payload must be 'text' or 'raw'")
    want = {t.lower() for t in warc_types}
    keep_raw = payload == "raw"
    strict = on_error != "skip"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "warc_file", "record_id", "warc_type", "url", "warc_date",
                "http_status", "content_type", "text", "payload",
            )}
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                try:
                    records = parse_warc_bytes(bytes(blob), on_error=on_error)
                except Exception:
                    if strict:
                        raise
                    continue
                for rec in records:
                    h = rec["headers"]
                    wtype = h.get("warc-type", "")
                    if want and wtype.lower() not in want:
                        continue
                    status, http_ctype, body = _split_http(rec["payload"])
                    ctype = http_ctype or h.get("content-type")
                    text = None
                    if not keep_raw and ctype:
                        base = ctype.split(";")[0].strip().lower()
                        m = _RE_CHARSET.search(ctype)
                        cs = m.group(1) if m else None
                        try:
                            if base in ("text/html", "application/xhtml+xml"):
                                text = html_to_text(body, charset=cs)
                            elif base.startswith("text/") or base in (
                                "application/json", "application/warc-fields"
                            ):
                                try:
                                    text = body.decode(cs or "utf-8", "replace")
                                except LookupError:  # unknown charset label
                                    text = body.decode("utf-8", "replace")
                        except Exception:
                            if strict:
                                raise
                            continue
                    out["warc_file"].append(fpath)
                    out["record_id"].append(h.get("warc-record-id"))
                    out["warc_type"].append(wtype)
                    out["url"].append(h.get("warc-target-uri"))
                    out["warc_date"].append(h.get("warc-date"))
                    out["http_status"].append(status)
                    out["content_type"].append(ctype)
                    out["text"].append(text)
                    out["payload"].append(bytes(body) if keep_raw else None)
            # Arrow needs the binary column object-typed even when every
            # value is None (pandas would type an empty column float64).
            out["payload"] = pd.Series(out["payload"], dtype="object")
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)
