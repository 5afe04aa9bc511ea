"""Error types with source positions.

Parity target: the reference threads a ``?[A]`` result monad
(``Ok``/``Failure(message, column, line)``) through parse -> resolve
(fsql/package.scala:70-113; parse errors carry position,
fsql/parser.scala:14-17).  In Python we raise exceptions that carry the
same (message, line, column) triple, and offer a ``Result``-ish helper
for callers who want non-throwing behavior.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


class FsqlError(Exception):
    """Base error for the engine; carries 1-based line/column."""

    def __init__(self, message: str, line: int = -1, column: int = -1):
        self.message = message
        self.line = line
        self.column = column
        pos = f" (line {line}, column {column})" if line > 0 else ""
        super().__init__(f"{message}{pos}")


class ParseError(FsqlError):
    pass


class ResolutionError(FsqlError):
    pass


class PlanError(FsqlError):
    pass


class UnsupportedError(FsqlError):
    """Parsed but deliberately not executed (e.g. UPDATE/DELETE, which the
    reference also parses but never executes — SURVEY.md §7.0(5))."""


@dataclass
class Failure:
    """Non-throwing failure value (parity with fsql/package.scala:75)."""

    message: str
    line: int = -1
    column: int = -1

    @property
    def ok(self) -> bool:
        return False


@dataclass
class Ok:
    value: Any

    @property
    def ok(self) -> bool:
        return True


def as_result(fn, *args, **kwargs):
    """Run ``fn``; return Ok(value) or Failure(msg, line, col)."""
    try:
        return Ok(fn(*args, **kwargs))
    except FsqlError as e:
        return Failure(e.message, e.line, e.column)
