"""Split-within-shard WARC reading: byte-range tasks over one big
.warc.gz must parse every record exactly once (a gzip member start
belongs to exactly one range), sync past false magic candidates, fall
back to whole-file for plain shards, and surface truncation as a
ledger row — never silent loss or duplication."""

import gzip
import io
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from xjs.sources.warc import (
    _doc_record,
    _open_input,
    iter_range_members,
    plan_warc_splits,
    read_warc_wet,
    read_warc_wet_split,
    split_clean_quarantine,
    write_warc_fixture,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def paths(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="t-warcsplit-",
                            dir=os.path.join(REPO, ".tmp"))
    gz = write_warc_fixture(
        spark, sf_dir, os.path.join(base, "gz"), compress=True)
    plain = write_warc_fixture(spark, sf_dir, os.path.join(base, "plain"))
    yield base, gz, plain
    shutil.rmtree(base, ignore_errors=True)


def _frame(df):
    return sorted((r.record_id, r.warc_type, r.url, r.date_raw, r.lang,
                   r.text) for r in df.collect())


def _member(doc_id: int, text: str = "hello world") -> bytes:
    return gzip.compress(
        _doc_record(doc_id, "src", text, "en"), compresslevel=1, mtime=0)


class _MemFile(io.BytesIO):
    """Seekable in-memory stand-in for pyarrow's input file."""


# ---------------------------------------------------------------------------
# end-to-end equality with the whole-file reader
# ---------------------------------------------------------------------------


def test_split_reader_equals_whole_file_reader(spark, paths):
    _, gz, _ = paths
    whole = _frame(read_warc_wet(spark, gz))
    split = _frame(read_warc_wet_split(spark, gz, target_split_bytes=4096))
    n_ranges = len(plan_warc_splits(spark, gz, 4096))
    n_files = len(plan_warc_splits(spark, gz, 1 << 40))
    assert n_ranges > n_files  # the tiny target really split shards
    assert split == whole


def test_oversized_target_degenerates_to_file_grain(spark, paths):
    _, gz, _ = paths
    ranges = plan_warc_splits(spark, gz, 1 << 40)
    assert all(r[1] == 0 and r[2] == r[3] for r in ranges)
    assert _frame(read_warc_wet_split(spark, gz, 1 << 40)) == _frame(
        read_warc_wet(spark, gz))


def test_plain_shards_fall_back_to_full_file_ranges(spark, paths):
    _, _, plain = paths
    ranges = plan_warc_splits(spark, plain, 4096)
    assert all(r[1] == 0 and r[2] == r[3] for r in ranges)
    assert _frame(read_warc_wet_split(spark, plain, 4096)) == _frame(
        read_warc_wet(spark, plain))


def test_exactly_once_per_record_at_tiny_splits(spark, paths):
    """Even with the split target far below typical member size, no
    record is parsed twice and none is lost."""
    _, gz, _ = paths
    recs = read_warc_wet_split(spark, gz, target_split_bytes=512)
    counts = (recs.filter(F.col("warc_type") != "__frame_error__")
              .groupBy("record_id").agg(F.count(F.lit(1)).alias("n")))
    assert counts.filter(F.col("n") != 1).count() == 0
    assert recs.filter(F.col("warc_type") == "__frame_error__").count() == 0


def test_clean_split_agrees_with_whole_file_clean(spark, paths):
    _, gz, _ = paths
    clean_w, quar_w = split_clean_quarantine(read_warc_wet(spark, gz))
    clean_s, quar_s = split_clean_quarantine(
        read_warc_wet_split(spark, gz, target_split_bytes=2048))
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(clean_s) == key(clean_w)
    assert key(quar_s) == key(quar_w)


# ---------------------------------------------------------------------------
# range-walker unit behavior (sync, ownership, corruption)
# ---------------------------------------------------------------------------


def test_range_union_is_exact_partition_of_members():
    """Cut a 50-member blob at arbitrary (mid-member) offsets: each
    member lands in exactly the range owning its start offset."""
    members = [_member(i, f"text for doc {i}") for i in range(50)]
    blob = b"".join(members)
    n = len(blob)
    cuts = [0, 7, n // 3, n // 3 + 1, n // 2, n - 5, n]
    seen = []
    for lo, hi in zip(cuts, cuts[1:]):
        got = list(iter_range_members(_MemFile(blob), n, lo, hi))
        assert all(p is not None for _, p in got)
        seen += [off for off, _ in got]
    starts, acc = [], 0
    for m in members:
        starts.append(acc)
        acc += len(m)
    assert sorted(seen) == starts  # exactly once each, none lost


def test_sync_skips_false_magic_candidates():
    """A gzip-magic byte sequence that is NOT a member start (junk
    prefix) must be rejected by the decompress-and-verify step and the
    walker must sync to the first real member instead."""
    junk = b"A" * 10 + b"\x1f\x8b\x08" + b"not really gzip" * 3
    members = [_member(1), _member(2)]
    blob = junk + b"".join(members)
    got = list(iter_range_members(_MemFile(blob), len(blob), 1, len(blob)))
    assert [off for off, _ in got] == [len(junk),
                                       len(junk) + len(members[0])]
    assert all(p.startswith(b"WARC/") for _, p in got)


def test_truncated_member_surfaces_as_frame_error(spark, paths):
    base, _, _ = paths
    members = [_member(i) for i in range(5)]
    blob = b"".join(members)[:-20]  # cut mid final member
    trunc_dir = os.path.join(base, "trunc")
    os.makedirs(trunc_dir, exist_ok=True)
    with open(os.path.join(trunc_dir, "bad.warc.gz"), "wb") as fh:
        fh.write(blob)
    recs = read_warc_wet_split(spark, trunc_dir, target_split_bytes=1 << 20)
    by_type = {r.warc_type: r.n for r in recs.groupBy("warc_type")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_type.get("conversion") == 4
    assert by_type.get("__frame_error__") == 1


def test_many_tiny_members_single_range():
    """1000 members through one range exercises the window trim and
    the bounded zlib feed loop (the O(n) decode discipline)."""
    members = [_member(i, "t") for i in range(1000)]
    blob = b"".join(members)
    got = list(iter_range_members(_MemFile(blob), len(blob), 0, len(blob)))
    assert len(got) == 1000
    assert all(p is not None for _, p in got)


def test_response_split_equals_whole_file_responses(spark, sf_dir, paths):
    """The raw-crawl (html:binary) twin: byte-range reading of
    response shards matches the file-grain reader byte for byte."""
    from xjs.sources.warc import (
        read_warc_responses, read_warc_responses_split,
    )

    base, _, _ = paths
    gz = write_warc_fixture(
        spark, sf_dir, os.path.join(base, "resp"), compress=True,
        kind="response")

    def frame(df):
        return sorted(
            (r.record_id, r.url, r.status, r.mime,
             bytes(r.html) if r.html is not None else None)
            for r in df.collect())

    whole = frame(read_warc_responses(spark, gz))
    split = frame(read_warc_responses_split(spark, gz, 4096))
    assert len(whole) > 0
    assert split == whole


def test_open_input_handles_uri_and_plain_paths(paths):
    base, gz, _ = paths
    shard = sorted(f for f in os.listdir(gz) if f.endswith(".warc.gz"))[0]
    plain_path = os.path.join(gz, shard)
    for p in (plain_path, "file://" + plain_path, "file:" + plain_path):
        f = _open_input(p)
        assert f.read(3) == b"\x1f\x8b\x08"
        f.close()
