"""Property-based tests for the WARC record-stream parser (pure
Python, no Spark): Content-Length framing must round-trip ARBITRARY
payload bytes — including payloads that contain the record separator
(CRLFCRLF) or a fake 'WARC/1.0' header — and truncation at ANY byte
offset must never crash, never yield a record that wasn't written,
and never silently lose framed bytes without a ledger row."""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from xjs.sources.warc import CRLF, _decompress, _record_bytes, parse_warc_records

#: payload alphabet deliberately includes framing bytes
_PAYLOAD = st.binary(min_size=0, max_size=120).flatmap(
    lambda b: st.sampled_from([
        b,
        b + b"\r\n\r\n" + b,          # separator inside payload
        b"WARC/1.0\r\n" + b,          # fake header inside payload
        b + b"Content-Length: 3\r\n",
    ])
)


def _shard(payloads, gz=False):
    recs = [
        _record_bytes(
            [("WARC-Type", "conversion"),
             ("WARC-Record-ID", f"<urn:x:{i}>")],
            p,
        )
        for i, p in enumerate(payloads)
    ]
    if gz:
        return b"".join(gzip.compress(r, 1, mtime=0) for r in recs)
    return b"".join(recs)


@settings(max_examples=60, deadline=None)
@given(st.lists(_PAYLOAD, min_size=0, max_size=6), st.booleans())
def test_arbitrary_payloads_roundtrip(payloads, gz):
    buf = _decompress(_shard(payloads, gz=gz))
    recs = list(parse_warc_records(buf))
    assert [r["warc_type"] for r in recs] == ["conversion"] * len(payloads)
    assert [r["payload"] for r in recs] == list(payloads)
    assert [r["record_id"] for r in recs] == [
        f"<urn:x:{i}>" for i in range(len(payloads))]


@settings(max_examples=80, deadline=None)
@given(st.lists(_PAYLOAD, min_size=1, max_size=5), st.data())
def test_truncation_never_lies(payloads, data):
    """Cut the shard at any offset: parsed records are a strict PREFIX
    of what was written (no invented/reordered records), at most one
    trailing __frame_error__ ledger row, and bytes are only dropped
    when that ledger row says so (or the cut landed between records)."""
    full = _shard(payloads)
    cut = data.draw(st.integers(0, len(full) - 1))
    recs = list(parse_warc_records(full[:cut]))
    errors = [r for r in recs if r["warc_type"] == "__frame_error__"]
    clean = [r for r in recs if r["warc_type"] != "__frame_error__"]
    # at most one frame error, always last
    assert len(errors) <= 1
    if errors:
        assert recs[-1]["warc_type"] == "__frame_error__"
    # clean records are a prefix of the written sequence, byte-exact
    assert [r["payload"] for r in clean] == list(payloads[:len(clean)])
    # if no error was raised, the cut consumed only whole records
    # (possibly mid-separator: the tolerated trailing CRLF bytes)
    if not errors:
        consumed = _shard(payloads[:len(clean)])
        assert cut <= len(consumed)
        assert (full[:cut] == consumed[:cut]
                and consumed[cut:] in (b"", CRLF + CRLF, b"\r\n", b"\r",
                                       b"\n") or full[:cut] == consumed)
