"""Cross-backend format equivalence: the static Catalyst translations
(rlike / split+forall expressions) must accept exactly the same
strings as the pinned Python checkers (xjs.formats) for all six
draft-04 formats."""

import pytest
from pyspark.sql import functions as F

from xjs import formats
from xjs.plan import compile_static
from xjs.runtime import violations

CORPUS = [
    # date-time
    "2024-01-02T03:04:05Z", "2024-01-02t03:04:05.123+01:30", "2024-01-02T03:04:05+0130",
    "2024-41-02T03:04:05Z", "2024-01-02 03:04:05Z", "2024-01-02T03:04:05", "x", "",
    # email
    "a@b.com", "a.b+c@my-host.org", "a b@c.d", "a..b@c.d", "@b.com", "a@", ".a@c.d",
    "a@-c.d", "nodomain", "a@b@c",
    # hostname
    "example.com", "a-b.c9", "bad..com", "bad_host", "-bad.com", ".x", "_x",
    # ipv4
    "1.2.3.4", "255.255.255.255", "0.0.0.0", "1.2.3", "1.2.3.4.5", "256.1.1.1",
    "01.2.3.4", "a.b.c.d", "1.2.3.04", "12.34.56.789",
    # ipv6
    "2001:db8:85a3:1:2:8a2e:370:7334", "::1", "fe80::1", "1:2:3:4:5:6:7:8:9",
    "02001::1", "g::1", "1::2::3::4", ":::::", "abcd:ef01::", "ABCD::",
    # uri
    "http://example.com", "ftp://h/p", "a+b://x", "example.com", "http:/x",
    "1http://x", "://x", "http:", "scheme-x.y://ok",
]


@pytest.mark.parametrize("fmt", sorted(formats.CHECKERS))
def test_static_matches_python_checker(spark, fmt):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "id long, s string"
    )
    plan = compile_static(
        {"properties": {"s": {"type": "string", "format": fmt}}},
        df.schema, id_col="id", partition_col=None,
    )
    static_fail = {r["id"] for r in violations(df, plan).collect()}
    python_fail = {
        i for i, s in enumerate(CORPUS) if not formats.CHECKERS[fmt](s)
    }
    assert static_fail == python_fail, (
        f"{fmt}: static-only={sorted(static_fail - python_fail)} "
        f"python-only={sorted(python_fail - static_fail)} "
        f"strings={[CORPUS[i] for i in static_fail ^ python_fail]}"
    )
