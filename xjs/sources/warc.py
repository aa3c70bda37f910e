"""WARC/WET crawl ingestion — the format Common-Crawl actually ships.

Everything upstream of this engine arrives as WARC (ISO 28500)
container files: raw crawls as ``.warc.gz`` response records, the
extracted-text sidecars (WET) as ``conversion`` records whose payload
is the page text and whose headers carry URI, capture date, and the
identified content language.  ``read_warc_wet`` turns a directory of
``.warc`` / ``.warc.gz`` shards into a records DataFrame, and
``split_clean_quarantine`` applies the same nothing-silently-dropped
ledger contract as the JSONL reader (sources/jsonl.py): every
conversion record lands in exactly one of

  clean        URI present, WARC-Date parses -> the webpages table shape
  quarantine   reason ('missing_uri' | 'bad_date') + record_id + the
               raw offending header value, so the row stays debuggable

Parsing is per-FILE, not per-row: ``spark.read.format("binaryFile")``
yields one row per shard, and a ``mapInPandas`` pass runs a single
linear scan over the shard's bytes (header block -> Content-Length ->
payload slice -> next record).  Gzip shards are the real Common-Crawl
layout — one gzip MEMBER per record, concatenated — which Python's
zlib/gzip multi-member decode reassembles in one streaming pass.

100 TB shape: Common-Crawl shards are ~1 GB each and a crawl is tens
of thousands of them, so FILE-grain parallelism saturates any cluster
without splitting inside a shard (binaryFile intentionally never
splits a file; gzip members make mid-file splits useless anyway).
The parse is one narrow pass, the clean/quarantine split is two
filters over one projection — zero shuffles end to end.  Per-task
memory is one shard (~1 GB decompressed) — the same boundedness class
as any WARC consumer, and why crawl pipelines keep shards ~1 GB.

Fixture + constructive oracle: ``write_warc_fixture`` derives WET
shards deterministically from the driver's ``documents`` table
(url/warc_ts formulas shared with sources/jsonl.py), with corruption
at fixed residues (%13==5: WARC-Target-URI header omitted; %13==9:
WARC-Date unparseable).  The DuckDB oracles restate the generator
over ``documents`` directly — no WARC parsing in the oracle — so the
green rows prove reader + splitter invert the generator exactly.
"""

from __future__ import annotations

import gzip
import os
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = "2024-01-01 00:00:00"
CORRUPT_MOD = 13
RES_NO_URI = 5    # doc_id % 13 == 5 -> WARC-Target-URI omitted
RES_BAD_DATE = 9  # doc_id % 13 == 9 -> WARC-Date unparseable
WARC_VERSION = 1  # bump to rebuild cached fixtures
N_SHARDS = 8

RECORD_SCHEMA = (
    "record_id string, warc_type string, url string, date_raw string, "
    "lang string, content_type string, text string"
)

_GZIP_MAGIC = b"\x1f\x8b"
CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# record-stream parser (one linear pass per shard)
# ---------------------------------------------------------------------------


def parse_warc_records(buf: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record from a decompressed shard.

    Single forward scan: header block ends at the first blank line
    (CRLFCRLF), ``Content-Length`` sizes the payload slice, and the
    spec's two-CRLF record separator positions the next record.  A
    shard whose framing breaks (no Content-Length / bad integer)
    cannot be advanced safely past the break, so the remainder is
    surfaced as one ``warc_type='__frame_error__'`` record rather
    than silently truncated — the ledger contract at file grain.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate separator CRLFs between records
        while buf.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0 or not buf.startswith(b"WARC/", pos):
            yield {"warc_type": "__frame_error__",
                   "payload": f"unframed bytes at offset {pos}".encode()}
            return
        headers: dict[str, str] = {}
        head = buf[pos:head_end].decode("utf-8", errors="replace")
        for line in head.split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield {"warc_type": "__frame_error__",
                   "payload": f"bad Content-Length at offset {pos}".encode()}
            return
        body_start = head_end + 4
        if body_start + length > n:
            # a shard cut mid-payload must be a ledger row, never a
            # silently short record (upload/copy truncation is the
            # common real-world corruption for 1 GB shards)
            yield {"warc_type": "__frame_error__",
                   "payload": (f"truncated payload at offset {pos}: "
                               f"declared {length}, "
                               f"{n - body_start} remain").encode()}
            return
        payload = buf[body_start:body_start + length]
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "date_raw": headers.get("warc-date"),
            "lang": headers.get("warc-identified-content-language"),
            "content_type": headers.get("content-type"),
            "payload": payload,
        }
        pos = body_start + length


def _decompress(content: bytes, chunk: int = 1 << 18) -> bytes:
    """Concatenated per-record gzip members (the Common-Crawl layout)
    decoded with a chunk-fed zlib loop.

    NOT ``gzip.decompress``: its multi-member loop — and a naive
    ``decompressobj`` + ``unused_data`` loop — copies the whole
    remaining buffer once PER MEMBER, which is O(n^2) on a shard with
    tens of thousands of members (measured 12 s / 8 MB shard; this
    form: 0.18 s, byte-identical, test-pinned)."""
    if content[:2] != _GZIP_MAGIC:
        return content
    out = []
    view = memoryview(content)
    pos = 0
    d = zlib.decompressobj(31)
    pending: bytes | memoryview = b""
    while True:
        if not pending:
            if pos >= len(view):
                break
            pending = view[pos:pos + chunk]
            pos += chunk
        piece = d.decompress(pending)
        if piece:
            out.append(piece)
        if d.eof:
            pending = d.unused_data  # bounded by the feed chunk size
            d = zlib.decompressobj(31)
        else:
            pending = b""
    return b"".join(out)


def parse_wet_files(files: DataFrame) -> DataFrame:
    """(content binary) rows -> one row per WARC record; works on both
    batch and STREAMING frames (mapInPandas is stateless per file), so
    the availableNow ingest twin routes through this exact plan."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_id", "warc_type", "url", "date_raw", "lang",
                "content_type"]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_records(_decompress(bytes(content))):
                    p = rec.get("payload")
                    rows.append(
                        [rec.get(c) for c in cols]
                        + [p.decode("utf-8", errors="replace")
                           if p is not None else None])
            yield pd.DataFrame(rows, columns=cols + ["text"])

    return files.select("content").mapInPandas(parse, RECORD_SCHEMA)


def read_warc_wet(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .warc/.warc.gz shards -> one row per WARC record.

    File-grain tasks (binaryFile), one linear parse per shard inside
    mapInPandas — Arrow-batched, no shuffle, no per-row Python UDF.
    """
    return parse_wet_files(spark.read.format("binaryFile").load(path))


RESPONSE_SCHEMA = (
    "record_id string, warc_type string, url string, date_raw string, "
    "status int, mime string, html binary"
)


def _response_row(rec: dict) -> list | None:
    """A parsed 'response' record -> the RESPONSE_SCHEMA row, splitting
    the HTTP/1.1 message at the first CRLFCRLF: status + Content-Type
    surfaced, body passed through UNDECODED (charset handling belongs
    to the extraction stage, not the framing reader)."""
    if rec.get("warc_type") != "response":
        return None
    head, _, body = rec["payload"].partition(CRLF + CRLF)
    status = None
    mime = None
    lines = head.decode("utf-8", errors="replace").split("\r\n")
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    for line in lines[1:]:
        k, sep, v = line.partition(":")
        if sep and k.strip().lower() == "content-type":
            mime = v.strip()
    return [rec.get("record_id"), "response", rec.get("url"),
            rec.get("date_raw"), status, mime, body]


def read_warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """Directory of RAW-crawl shards -> one row per ``response`` record
    with the html payload kept as BINARY (the input_hint's html:binary
    column, exactly as a crawler hands it over)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_id", "warc_type", "url", "date_raw",
                "status", "mime", "html"]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_records(_decompress(bytes(content))):
                    row = _response_row(rec)
                    if row is not None:
                        rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return files.select("content").mapInPandas(parse, RESPONSE_SCHEMA)


def split_clean_quarantine(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Conversion records -> (clean, quarantine); nothing dropped.

    clean:      record_id, url, warc_ts (timestamp), text, lang
    quarantine: record_id, reason ('missing_uri' | 'bad_date'), raw
    """
    conv = records.filter(F.col("warc_type") == "conversion")
    ts = F.try_to_timestamp(
        F.col("date_raw"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    parsed = conv.select(
        "record_id", "url", ts.alias("_ts"), "text", "lang", "date_raw"
    )
    clean = parsed.filter(
        F.col("url").isNotNull() & F.col("_ts").isNotNull()
    ).select("record_id", "url", F.col("_ts").alias("warc_ts"),
             "text", "lang")
    quarantine = parsed.filter(
        F.col("url").isNull() | F.col("_ts").isNull()
    ).select(
        "record_id",
        F.when(F.col("url").isNull(), F.lit("missing_uri"))
        .otherwise(F.lit("bad_date")).alias("reason"),
        F.when(F.col("url").isNull(), F.lit("<no WARC-Target-URI>"))
        .otherwise(F.col("date_raw")).alias("raw"),
    )
    return clean, quarantine


# ---------------------------------------------------------------------------
# split-within-shard reader (byte-range tasks over one big .warc.gz)
# ---------------------------------------------------------------------------
#
# File-grain parallelism is right for ~1 GB Common-Crawl shards; if a
# producer ships 10-100 GB shards instead, one file = one task stops
# bounding task size.  The CC layout (one gzip MEMBER per record) is
# what makes mid-file splits possible at all: member starts are
# resynchronizable marks.  The reader plans (path, start, end) byte
# ranges from file METADATA only (no content read), and each task:
#
#   1. SYNCs to the first gzip-member start >= its range start by
#      scanning for the member magic and VERIFYING each candidate —
#      a full-member decompress whose payload must start with
#      b"WARC/" — so a magic byte-sequence occurring by chance inside
#      compressed data can never misalign the walk (test-pinned).
#   2. WALKs exact member boundaries from the sync point: zlib's
#      ``unused_data`` gives the consumed length, so after the one
#      verified sync every boundary is authoritative, not scanned.
#   3. OWNs exactly the members whose start offset lies in
#      [start, end) — a member start belongs to exactly one range, so
#      the union over tasks parses every record exactly once with no
#      coordination (the same ownership rule as Hadoop text splits).
#
# Memory per task is one readahead window + one decompressed member
# (one page), NOT one shard — the boundedness claim at 10x shard
# growth.  Frame corruption inside a range surfaces as the same
# ``__frame_error__`` ledger row as the whole-file reader.  Plain
# (uncompressed) .warc shards have no resync marks, so they fall back
# to a single full-file range.

_MEMBER_MAGIC = b"\x1f\x8b\x08"   # gzip magic + deflate method
_FEED = 1 << 16                   # zlib feed granularity (bounds unused_data)
_SCAN_CHUNK = 1 << 22             # readahead granularity


def _open_input(path: str):
    """Open a (possibly URI-form) file for random access via
    pyarrow.fs — the same call works for file:/, hdfs://, s3:// when
    the filesystem is available to the worker."""
    from pyarrow import fs as pafs

    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):
            local = local[1:]
        return pafs.LocalFileSystem().open_input_file(local)
    if "://" in path:
        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_file(p)
    return pafs.LocalFileSystem().open_input_file(path)


class _Window:
    """Growing, front-trimmable byte window over a file from ``base``."""

    def __init__(self, f, base: int, file_len: int):
        self.f = f
        self.base = base  # absolute file offset of buf[0]
        self.file_len = file_len
        self.buf = b""
        f.seek(base)

    def extend(self) -> bool:
        got = self.f.read(_SCAN_CHUNK)
        if not got:
            return False
        self.buf += got
        return True

    def end(self) -> int:
        return self.base + len(self.buf)

    def at(self, abs_pos: int) -> int:
        return abs_pos - self.base

    def trim(self, abs_pos: int) -> None:
        rel = self.at(abs_pos)
        if rel > _SCAN_CHUNK:  # amortize: only drop >=1 chunk at a time
            self.buf = self.buf[rel:]
            self.base += rel


def _member_at(win: _Window, s: int):
    """Decompress ONE complete gzip member starting at absolute ``s``.
    Returns (payload, next_member_abs) or None if ``s`` is not a valid
    member start (bad header / corrupt stream / truncated at EOF)."""
    d = zlib.decompressobj(31)
    out = []
    fed_end = s
    while True:
        rel = win.at(fed_end)
        if rel >= len(win.buf) and not win.extend():
            return None  # truncated member
        piece = win.buf[win.at(fed_end):win.at(fed_end) + _FEED]
        try:
            out.append(d.decompress(piece))
        except zlib.error:
            return None
        fed_end += len(piece)
        if d.eof:
            return b"".join(out), fed_end - len(d.unused_data)


def iter_range_members(f, file_len: int, start: int, end: int):
    """Yield (member_start_abs, payload) for every gzip member whose
    start offset lies in [start, end); a mid-walk corrupt member
    yields (offset, None) once and stops (ledger contract)."""
    win = _Window(f, start, file_len)
    if start == 0:
        s = 0  # offset 0 is a member start by construction
    else:
        s = None
        pos = start
        while s is None:
            rel = win.buf.find(_MEMBER_MAGIC, win.at(pos))
            while rel < 0 and win.end() < min(end + len(_MEMBER_MAGIC),
                                              file_len):
                if not win.extend():
                    break
                rel = win.buf.find(_MEMBER_MAGIC, win.at(pos))
            if rel < 0 or win.base + rel >= end:
                return  # no member starts in this range
            cand = win.base + rel
            m = _member_at(win, cand)
            if m is not None and m[0][:5] == b"WARC/":
                s = cand  # verified sync point
            else:
                pos = cand + 1
    while s < end:
        m = _member_at(win, s)
        if m is None:
            yield s, None
            return
        payload, nxt = m
        yield s, payload
        if nxt <= s:
            return
        win.trim(nxt)
        s = nxt


def plan_warc_splits(spark: SparkSession, path: str,
                     target_split_bytes: int = 32 << 20) -> list[tuple]:
    """(path, start, end, file_len) ranges from file metadata only.

    The binaryFile listing is column-pruned to (path, length) — file
    STATUS, no bytes read — and the collect is bounded by the shard
    count (the same bounded class as the checkpoint manifest).  Plain
    .warc files get one full-file range (no resync marks)."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "length").collect())
    rows = []
    for r in sorted(files, key=lambda x: x.path):
        if r.length <= 0:
            continue
        if r.path.endswith(".gz"):
            n = max(1, -(-int(r.length) // target_split_bytes))
        else:
            n = 1
        step = -(-int(r.length) // n)
        for i in range(n):
            lo = i * step
            hi = min((i + 1) * step, int(r.length))
            if lo < hi:
                rows.append((r.path, lo, hi, int(r.length)))
    return rows


def read_warc_wet_split(
    spark: SparkSession, path: str, target_split_bytes: int = 32 << 20,
) -> DataFrame:
    """Directory of .warc/.warc.gz shards -> one row per WARC record,
    parallelized WITHIN shards by byte range (exactly-once per record:
    a member start belongs to exactly one range).

    Same output frame as ``read_warc_wet``; use when shards are large
    relative to (file count / cluster cores)."""
    rows = plan_warc_splits(spark, path, target_split_bytes)
    splits = spark.createDataFrame(
        rows, "path string, start long, end long, file_len long")
    # one tiny row per range; spread ranges round-robin across tasks
    splits = splits.repartition(max(1, len(rows)))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_id", "warc_type", "url", "date_raw", "lang",
                "content_type"]
        for pdf in batches:
            out = []
            for path_, start, end, flen in zip(
                    pdf["path"], pdf["start"], pdf["end"], pdf["file_len"]):
                f = _open_input(path_)
                try:
                    if not path_.endswith(".gz"):
                        # plain shard: single full-file range, existing parse
                        blob = f.read()
                        members = [(0, blob)]
                    else:
                        members = iter_range_members(
                            f, int(flen), int(start), int(end))
                    for off, payload in members:
                        if payload is None:
                            out.append([None, "__frame_error__", None, None,
                                        None, None,
                                        f"corrupt gzip member at offset "
                                        f"{off} of {path_}"])
                            continue
                        for rec in parse_warc_records(payload):
                            p = rec.get("payload")
                            out.append(
                                [rec.get(c) for c in cols]
                                + [p.decode("utf-8", errors="replace")
                                   if p is not None else None])
                finally:
                    f.close()
            yield pd.DataFrame(out, columns=cols + ["text"])

    return splits.mapInPandas(parse, RECORD_SCHEMA)


def read_warc_responses_split(
    spark: SparkSession, path: str, target_split_bytes: int = 32 << 20,
) -> DataFrame:
    """``read_warc_responses`` through the byte-range splitter — the
    RAW-crawl (html:binary) twin of ``read_warc_wet_split`` for
    oversized response shards; same exactly-once range ownership."""
    rows = plan_warc_splits(spark, path, target_split_bytes)
    splits = spark.createDataFrame(
        rows, "path string, start long, end long, file_len long")
    splits = splits.repartition(max(1, len(rows)))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["record_id", "warc_type", "url", "date_raw",
                "status", "mime", "html"]
        for pdf in batches:
            out = []
            for path_, start, end, flen in zip(
                    pdf["path"], pdf["start"], pdf["end"], pdf["file_len"]):
                f = _open_input(path_)
                try:
                    if not path_.endswith(".gz"):
                        members = [(0, f.read())]
                    else:
                        members = iter_range_members(
                            f, int(flen), int(start), int(end))
                    for off, payload in members:
                        if payload is None:
                            out.append([None, "__frame_error__", None,
                                        None, None, None,
                                        f"corrupt gzip member at offset "
                                        f"{off} of {path_}".encode()])
                            continue
                        for rec in parse_warc_records(payload):
                            row = _response_row(rec)
                            if row is not None:
                                out.append(row)
                finally:
                    f.close()
            yield pd.DataFrame(out, columns=cols)

    return splits.mapInPandas(parse, RESPONSE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic fixture (WET shards derived from the documents table)
# ---------------------------------------------------------------------------


def _record_bytes(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("utf-8") for k, v in headers
    )
    return (head + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + CRLF + CRLF)


def _doc_record(doc_id: int, source: str, text: str, lang: str,
                kind: str = "wet", html: str | None = None) -> bytes:
    headers = [("WARC-Type", "conversion" if kind == "wet" else "response"),
               ("WARC-Record-ID", f"<urn:xjs:doc:{doc_id}>")]
    if doc_id % CORRUPT_MOD != RES_NO_URI:
        headers.append(
            ("WARC-Target-URI",
             f"https://{source}.example.com/doc/{doc_id}"))
    if doc_id % CORRUPT_MOD == RES_BAD_DATE:
        date = "not-a-date"
    else:
        ts = pd.Timestamp(EPOCH) + pd.Timedelta(seconds=int(doc_id))
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    headers.append(("WARC-Date", date))
    if kind == "wet":
        payload = (text or "").encode("utf-8")
        headers += [("WARC-Identified-Content-Language", lang or ""),
                    ("Content-Type", "text/plain")]
    else:  # raw-crawl response: HTTP/1.1 message wrapping the html
        if isinstance(html, (bytes, bytearray)):
            body = bytes(html)
        else:
            body = (html or "").encode("utf-8")
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   + f"Content-Length: {len(body)}\r\n\r\n".encode()
                   + body)
        headers.append(
            ("Content-Type", "application/http; msgtype=response"))
    return _record_bytes(headers, payload)


def _warcinfo(shard: int) -> bytes:
    payload = b"software: xjs-fixture\r\nformat: WARC File Format 1.0\r\n"
    return _record_bytes(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", f"<urn:xjs:warcinfo:{shard}>"),
         ("WARC-Date", "2024-01-01T00:00:00Z"),
         ("Content-Type", "application/warc-fields")],
        payload,
    )


def write_warc_fixture(
    spark: SparkSession, sf_dir: str, out_path: str, compress: bool = False,
    df: DataFrame | None = None, n_shards: int = N_SHARDS,
    kind: str = "wet",
) -> str:
    """(doc_id, source, text, lang[, html]) rows -> n_shards WARC files
    (cached; _SUCCESS guard); default source is documents.parquet —
    for kind='response' the default corpus is pipeline.html's
    page_corpus, so the raw-crawl fixture wraps the SAME pages the
    html-extraction oracle is stated against.

    Shard assignment/content are pure functions of doc_id, so rebuilds
    are byte-deterministic.  Each shard is written by its own group
    task (applyInPandas at shard grain — the writer parallelism IS the
    shard count, exactly how crawl exporters shape their output); with
    ``compress`` each record is its own gzip member (mtime pinned) —
    the real Common-Crawl layout.
    """
    done = os.path.join(out_path, "_SUCCESS")
    if os.path.exists(done):
        return out_path
    os.makedirs(out_path, exist_ok=True)
    if df is None:
        if kind == "response":
            from xjs.pipeline.html import page_corpus

            df = page_corpus(spark, sf_dir).withColumn("lang", F.lit(""))
        else:
            df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = ["doc_id", "source", "text", "lang"]
    if kind == "response":
        cols.append("html")
    d = df.select(
        *cols, F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard"),
    )
    ext = ".warc.gz" if compress else ".warc"

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        recs = [_warcinfo(shard)] + [
            _doc_record(int(r.doc_id), r.source, r.text, r.lang, kind=kind,
                        html=getattr(r, "html", None))
            for r in pdf.itertuples()
        ]
        if compress:
            blob = b"".join(
                gzip.compress(r, compresslevel=1, mtime=0) for r in recs
            )
        else:
            blob = b"".join(recs)
        with open(os.path.join(out_path, f"shard-{shard:04d}{ext}"),
                  "wb") as fh:
            fh.write(blob)
        return pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

    d.groupBy("shard").applyInPandas(
        write_shard, "shard int, n long"
    ).collect()  # bounded: N_SHARDS rows — fixture tooling, not a hot path
    with open(done, "w") as fh:
        fh.write("")
    return out_path


# ---------------------------------------------------------------------------
# queries + constructive oracles
# ---------------------------------------------------------------------------


def _fixture_path(sf_dir: str, compress: bool, kind: str = "wet") -> str:
    import re

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    tag = re.sub(r"\W+", "_", sf_dir.strip("/").split("/")[-1])
    gz = "gz" if compress else "plain"
    k = "" if kind == "wet" else f"-{kind}"
    os.makedirs(os.path.join(repo, ".tmp"), exist_ok=True)
    return os.path.join(repo, ".tmp", f"warc-{tag}-{gz}{k}-v{WARC_VERSION}")


def _ingest(spark: SparkSession, sf_dir: str,
            compress: bool) -> tuple[DataFrame, DataFrame]:
    path = write_warc_fixture(
        spark, sf_dir, _fixture_path(sf_dir, compress),
        compress=compress)
    return split_clean_quarantine(read_warc_wet(spark, path))


def q_warc_ingest_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean WET rows with doc_id recovered from the fixture's
    record-id convention (<urn:xjs:doc:{id}>) — gzip path, the real
    Common-Crawl layout."""
    clean, _ = _ingest(spark, sf_dir, compress=True)
    return clean.select(
        F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1)
        .cast("long").alias("doc_id"),
        "url", "warc_ts", "text", "lang",
    )


def q_warc_ingest_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same clean rows as ``q_warc_ingest_clean`` but through the
    split-within-shard reader at a 64 KiB target split, so every
    fixture shard fans out into many byte-range tasks — the oracle
    (identical to the whole-file reader's) proves the range ownership
    rule loses and duplicates nothing across split boundaries."""
    path = write_warc_fixture(
        spark, sf_dir, _fixture_path(sf_dir, True), compress=True)
    clean, _ = split_clean_quarantine(
        read_warc_wet_split(spark, path, target_split_bytes=64 << 10))
    return clean.select(
        F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1)
        .cast("long").alias("doc_id"),
        "url", "warc_ts", "text", "lang",
    )


def q_warc_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, quarantine = _ingest(spark, sf_dir, compress=True)
    return quarantine.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))


def q_warc_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAW-crawl path end to end: response records (html as
    BINARY inside an HTTP/1.1 message) -> framing reader -> HTTP
    header strip -> html_extract_text — the north-star invariant
    (byte-identical extracted text per url) from the crawl's actual
    arrival shape.  Empty bodies (the generator's null-html residue)
    are dropped the way any crawl consumer drops empty responses."""
    from xjs.pipeline.html import html_extract_text

    path = write_warc_fixture(
        spark, sf_dir, _fixture_path(sf_dir, True, kind="response"),
        compress=True, kind="response")
    recs = read_warc_responses(spark, path)
    ts = F.try_to_timestamp(
        F.col("date_raw"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
    clean = recs.filter(
        F.col("url").isNotNull() & ts.isNotNull()
        & (F.col("status") == 200) & (F.octet_length("html") > 0))
    return html_extract_text(clean).select(
        F.regexp_extract("record_id", r"urn:xjs:doc:(\d+)", 1)
        .cast("long").alias("doc_id"),
        "url", "extracted_text",
    )


def oracle_warc_html_extract_sql() -> str:
    """CONSTRUCTIVE twice over: the expected text is stated from the
    page-synthesis formula (pipeline/html.py's oracle), the row set
    from the WARC corruption residues — so a green row proves framing
    + HTTP strip + extraction jointly invert the whole generator."""
    from xjs.pipeline.html import _EXPECT_TAIL

    tail = _EXPECT_TAIL.replace("'", "''")
    return f"""
SELECT doc_id,
       'https://' || source || '.example.com/doc/' || doc_id AS url,
       source || ' ' || source || ' daily ' || trim(text)
           || ' ' || '{tail}' || ' page ' || doc_id AS extracted_text
FROM documents
WHERE doc_id % {CORRUPT_MOD} NOT IN ({RES_NO_URI}, {RES_BAD_DATE})
  AND doc_id % 211 != 0
"""


def oracle_warc_clean_sql() -> str:
    # the generator restated over documents: rows outside the two
    # corruption residues, url/warc_ts by the shared formulas
    return f"""
SELECT doc_id,
       'https://' || source || '.example.com/doc/' || doc_id AS url,
       TIMESTAMP '{EPOCH}' + doc_id * INTERVAL 1 SECOND AS warc_ts,
       text,
       lang
FROM documents
WHERE doc_id % {CORRUPT_MOD} NOT IN ({RES_NO_URI}, {RES_BAD_DATE})
"""


def oracle_warc_quarantine_sql() -> str:
    return f"""
SELECT reason, COUNT(*) AS n FROM (
    SELECT CASE WHEN doc_id % {CORRUPT_MOD} = {RES_NO_URI}
                THEN 'missing_uri' ELSE 'bad_date' END AS reason
    FROM documents
    WHERE doc_id % {CORRUPT_MOD} IN ({RES_NO_URI}, {RES_BAD_DATE})
) GROUP BY reason
"""
