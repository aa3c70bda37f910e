"""Format checkers — the *intended* semantics of the reference's six
``format`` algorithms (reference schemas/draft_04/keywords.py:835-967).

The reference's ``format`` keyword is broken in v0.1.0 (its templates
use an unbound ``{value}`` placeholder ⇒ KeyError at compile time —
SURVEY.md §2.7), so these implement the obviously-intended behavior of
the same algorithms, pinned as golden semantics for both backends:

* pure-Python checkers here (dynamic mode + tests);
* equivalent Catalyst ``rlike``/expression translations in
  ``xjs.plan`` (static mode), kept in lock-step by
  ``tests/test_formats.py`` which cross-checks the two on a corpus.

All "bad-" regexes are used with ``re.match`` (prefix-anchored) just
like the reference's generated code.
"""

from __future__ import annotations

import re

# reference keywords.py:893-897 (date-time), translated \Z kept for re
DATETIME_RE = re.compile(
    r"^\d{4}-[01]\d-[0-3]\d(t|T)[0-2]\d:[0-5]\d:[0-5]\d(?:\.\d+)?"
    r"(?:[+-][0-2]\d:[0-5]\d|[+-][0-2]\d[0-5]\d|z|Z)\Z"
)
# reference keywords.py:940-950
BAD_EMAIL_NAME_RE = re.compile(
    r"(^[^a-zA-Z0-9]){1}|([^a-zA-Z0-9._+-])+|([._\-+]{2,})|([^a-zA-Z0-9]$){1}"
)
BAD_EMAIL_DOMAIN_RE = re.compile(
    r"(^[^a-zA-Z0-9]){1}|([^a-zA-Z0-9.-]+)|([.-]{2,})|([a-zA-Z0-9-]){65,}|([^a-zA-Z0-9.]$){1}"
)
# reference keywords.py:951-957 (same regex as email domain)
BAD_HOSTNAME_RE = BAD_EMAIL_DOMAIN_RE
# reference keywords.py:914-930
BAD_URI_SCHEME_RE = re.compile(r"(^[^a-zA-Z]){1}|([^a-zA-Z0-9.+-])+")


def check_datetime(s: str) -> bool:
    return bool(DATETIME_RE.match(s))


def check_email(s: str) -> bool:
    try:
        name, domain = s.split("@", 1)
    except ValueError:
        return False
    if not name or not domain:
        return False
    if BAD_EMAIL_NAME_RE.match(name) or BAD_EMAIL_DOMAIN_RE.match(domain):
        return False
    return True


def check_hostname(s: str) -> bool:
    if not s or BAD_HOSTNAME_RE.match(s):
        return False
    return True


def check_ipv4(s: str) -> bool:
    # reference keywords.py:868-885: exactly 4 dot-parts, each a
    # decimal 0..255 with no leading zeros; one error then break.
    parts = s.split(".")
    if len(parts) != 4:
        return False
    for part in parts:
        if len(part) == 0 or (part[0] == "0" and len(part) > 1):
            return False
        try:
            if not (-1 < int(part) < 256):
                return False
        except ValueError:
            return False
    return True


def check_ipv6(s: str) -> bool:
    # reference keywords.py:887-912: colon-parts, <9 groups, hex groups
    # with no leading zeros, bounded empty-group ('::') budget.
    parts = s.split(":")
    if len(parts) >= 9:
        return False
    empty = 0
    for part in parts:
        if not part:
            empty += 1
            continue
        if len(part) > 1 and part[0] == "0":
            return False
        try:
            if not (-1 < int(part, 16) < 65536):
                return False
        except ValueError:
            return False
    if empty > 3 or (empty > 1 and len(parts) > 4):
        return False
    return True


def check_uri(s: str) -> bool:
    # reference keywords.py:914-930: scheme:hier-part with non-empty
    # scheme matching [a-zA-Z][a-zA-Z0-9.+-]* and hier-part starting '//'.
    try:
        scheme, hier = s.split(":", 1)
    except ValueError:
        return False
    if not (scheme and hier and not BAD_URI_SCHEME_RE.match(scheme)):
        return False
    return hier.startswith("//")


CHECKERS = {
    "date-time": check_datetime,
    "email": check_email,
    "hostname": check_hostname,
    "ipv4": check_ipv4,
    "ipv6": check_ipv6,
    "uri": check_uri,
}

# --- Java-regex translations for the static (Catalyst rlike) backend ---
# re.match(p)  ⇔  rlike('^(?:p)');  Python \Z ⇔ Java \z.
# (?U): Python \d matches unicode digits; Java needs the flag for parity
JAVA_DATETIME_RLIKE = (
    r"(?U)^\d{4}-[01]\d-[0-3]\d(t|T)[0-2]\d:[0-5]\d:[0-5]\d(?:\.\d+)?"
    r"(?:[+-][0-2]\d:[0-5]\d|[+-][0-2]\d[0-5]\d|z|Z)$"
)
JAVA_BAD_EMAIL_NAME = r"^(?:(^[^a-zA-Z0-9]){1}|([^a-zA-Z0-9._+-])+|([._\-+]{2,})|([^a-zA-Z0-9]$){1})"
JAVA_BAD_EMAIL_DOMAIN = r"^(?:(^[^a-zA-Z0-9]){1}|([^a-zA-Z0-9.-]+)|([.-]{2,})|([a-zA-Z0-9-]){65,}|([^a-zA-Z0-9.]$){1})"
JAVA_BAD_HOSTNAME = JAVA_BAD_EMAIL_DOMAIN
# full-match ipv4: 4 octets, 0-255, no leading zeros (same accept-set
# as check_ipv4 above)
JAVA_IPV4_RLIKE = r"^(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]\d|\d)\.){3}(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]\d|\d)$"
# uri: scheme + '://'
JAVA_URI_RLIKE = r"^[a-zA-Z][a-zA-Z0-9.+-]*://"
