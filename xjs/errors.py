"""Error types.

Parity: the reference raises ``SchemaError(path, msg)`` whose str() is
``'<dotted.path>' - <msg>`` (reference errors.py:8-15). We keep the
same attributes (``path``, ``msg``) and rendering so parity tests can
compare driver-side schema validation 1:1.
"""

from __future__ import annotations

from typing import List, Union

PathType = List[Union[str, int]]


class XjsError(Exception):
    pass


class SchemaError(XjsError):
    """A schema (not data) problem, found at compile time."""

    def __init__(self, path: PathType, msg: str):
        super().__init__(f"'{'.'.join(str(p) for p in path)}' - {msg}")
        self.path = list(path)
        self.msg = msg

    def __repr__(self) -> str:
        return f"'{'.'.join(str(p) for p in self.path)}' - {self.msg}"


class ValidationError(XjsError):
    """Raised by strict APIs when data fails validation."""

    def __init__(self, errors):
        super().__init__(f"{len(errors)} validation error(s)")
        self.errors = errors


class PlanError(XjsError):
    """The schema cannot be compiled against the given Spark schema."""
