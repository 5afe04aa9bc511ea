"""X-surface: Flink-Table-API-style expression strings -> pyspark Columns.

Parity target: ``ExpressionParser.scala`` (the reference's clone of
Flink's Table-API expression parser).  Full surface per SURVEY.md §2.8-X:

  * literals — int, long (``L``/``l`` suffix, ExpressionParser.scala:34-46),
    float (``f``/``F``), double (decimal point), single- and double-quoted
    strings (:48-55), ``true``/``false`` (:57-59)
  * field reference -> ``UnresolvedFieldReference`` (:66-68) -> ``F.col``
  * suffix ops on an atom (:74-99): ``.isNull`` ``.isNotNull`` ``.abs``
    ``.sum`` ``.min`` ``.max`` ``.count`` ``.avg`` ``.as(name)``
    ``.substring(from[, to])`` (``to`` defaults to Integer.MAX_VALUE :98)
  * unary ``!`` ``-`` ``~`` (:109-115)
  * binary bitwise ``&`` ``|`` ``^`` — binding TIGHTER than arithmetic
    (:119-122; a deliberate quirk of the reference grammar, kept faithfully:
    ``a & 7 + 1`` == ``(a & 7) + 1``)
  * ``*`` ``/`` ``%`` then ``+`` ``-`` (:126-133)
  * comparisons ``===`` ``=`` ``!==`` ``>`` ``>=`` ``<`` ``<=`` (:137-168),
    non-chained (a single comparison per level, as in the reference)
  * ``&&`` ``||`` (:172-174)
  * trailing alias ``expr as name`` (:178-180)
  * entry points ``parse_expression`` / ``parse_expression_list`` (:186-203)

Superset notes (documented deviations, all strictly additive):
  * suffix ops may chain (``a.abs.sum``); the reference allows exactly one
    suffix per atom (``suffix`` at :101-104 wraps ``atom`` only).
  * ``.as(name)`` is usable as a suffix; the reference defines it (:85-87)
    but forgot to include it in its ``suffix`` alternative — author intent
    honored.

Everything compiles to built-in ``pyspark.sql.functions`` / Column
operators — JVM-side, whole-stage-codegen friendly; no Python UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import ParseError

__all__ = ["parse_expression", "parse_expression_list", "XTable"]


# ---------------------------------------------------------------------------
# Expression AST (mirrors ExpressionParser.scala's case classes)
# ---------------------------------------------------------------------------

_AGG_FN = {"sum": F.sum, "min": F.min, "max": F.max,
           "count": F.count, "avg": F.avg}


@dataclass
class Expr:
    def to_column(self) -> Column:
        raise NotImplementedError

    @property
    def has_agg(self) -> bool:
        return False

    def out_name(self, i: int) -> str:
        """Result-column name: alias > bare field name > positional."""
        return f"_c{i}"


@dataclass
class Literal(Expr):
    value: object

    def to_column(self) -> Column:
        return F.lit(self.value)


@dataclass
class FieldRef(Expr):
    """UnresolvedFieldReference (ExpressionParser.scala:66-68)."""
    name: str

    def to_column(self) -> Column:
        return F.col(self.name)

    def out_name(self, i: int) -> str:
        return self.name


@dataclass
class Naming(Expr):
    """``e.as(n)`` / trailing ``e as n`` (ExpressionParser.scala:85-87,
    178-180)."""
    child: Expr
    name: str

    def to_column(self) -> Column:
        return self.child.to_column().alias(self.name)

    @property
    def has_agg(self) -> bool:
        return self.child.has_agg

    def out_name(self, i: int) -> str:
        return self.name


@dataclass
class Suffix(Expr):
    """isNull/isNotNull/abs/sum/min/max/count/avg
    (ExpressionParser.scala:74-83)."""
    op: str
    child: Expr

    def to_column(self) -> Column:
        c = self.child.to_column()
        if self.op == "isNull":
            return c.isNull()
        if self.op == "isNotNull":
            return c.isNotNull()
        if self.op == "abs":
            return F.abs(c)
        return _AGG_FN[self.op](c)

    @property
    def has_agg(self) -> bool:
        return self.op in _AGG_FN or self.child.has_agg


@dataclass
class Substring(Expr):
    """``.substring(from[, to])`` — 1-based, ``to`` inclusive; missing
    ``to`` = end of string (Integer.MAX_VALUE sentinel,
    ExpressionParser.scala:89-99)."""
    child: Expr
    frm: Expr
    to: Optional[Expr] = None

    def to_column(self) -> Column:
        c = self.child.to_column()
        start = self.frm.to_column()
        if self.to is None:
            length = F.lit(2147483647)
        else:
            length = self.to.to_column() - start + F.lit(1)
        return c.substr(start, length)

    @property
    def has_agg(self) -> bool:
        return self.child.has_agg


@dataclass
class UnOp(Expr):
    """``!`` ``-`` ``~`` (ExpressionParser.scala:109-115)."""
    op: str
    child: Expr

    def to_column(self) -> Column:
        c = self.child.to_column()
        if self.op == "!":
            return ~c
        if self.op == "-":
            return -c
        return F.bitwise_not(c)

    @property
    def has_agg(self) -> bool:
        return self.child.has_agg


_BIN_COL = {
    "&": lambda a, b: a.bitwiseAND(b),
    "|": lambda a, b: a.bitwiseOR(b),
    "^": lambda a, b: a.bitwiseXOR(b),
    "*": lambda a, b: a * b,
    # NULL (not ANSI error) on zero divisor — reference division rule
    "/": lambda a, b: F.try_divide(a, b),
    "%": lambda a, b: F.try_mod(a, b),
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "===": lambda a, b: a == b,
    "=": lambda a, b: a == b,
    "!==": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "&&": lambda a, b: a & b,
    "||": lambda a, b: a | b,
}


@dataclass
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr

    def to_column(self) -> Column:
        return _BIN_COL[self.op](self.left.to_column(),
                                 self.right.to_column())

    @property
    def has_agg(self) -> bool:
        return self.left.has_agg or self.right.has_agg


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+[fF]?|\.\d+[fF]?|\d+[fFlL]?)
  | (?P<dqstr>"(?:[^"\\]|\\.)*")
  | (?P<sqstr>'(?:[^'\\]|\\.)*')
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>===|!==|&&|\|\||>=|<=|[().,+\-*/%&|^!~=<>])
""", re.VERBOSE)

_ESCAPES = {"\\\\": "\\", "\\'": "'", '\\"': '"', "\\b": "\b",
            "\\f": "\f", "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _unescape(s: str) -> str:
    return re.sub(r'\\u[0-9a-fA-F]{4}|\\[\\\'"bfnrt]',
                  lambda m: (chr(int(m.group(0)[2:], 16))
                             if m.group(0).startswith("\\u")
                             else _ESCAPES[m.group(0)]),
                  s)


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(s: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if m is None:
            raise ParseError(
                f"could not parse expression: unexpected char "
                f"{s[i]!r} at position {i}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append(_Tok(kind, m.group(0), m.start()))
    toks.append(_Tok("eof", "", len(s)))
    return toks


# ---------------------------------------------------------------------------
# Recursive-descent parser (grammar of ExpressionParser.scala:101-183)
# ---------------------------------------------------------------------------

_SUFFIX_OPS = ("isNull", "isNotNull", "abs",
               "sum", "min", "max", "count", "avg")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers --
    @property
    def cur(self) -> _Tok:
        return self.toks[self.i]

    def eat(self, kind: str, text: Optional[str] = None) -> bool:
        t = self.cur
        if t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, text: Optional[str] = None) -> _Tok:
        t = self.cur
        if not self.eat(kind, text):
            want = text or kind
            raise ParseError(
                f"could not parse expression: expected {want!r}, got "
                f"{t.text or 'end of input'!r} at position {t.pos}")
        return t

    # -- grammar, lowest to highest binding --
    def expression(self) -> Expr:
        e = self.logic()
        if self.cur.kind == "ident" and self.cur.text == "as":
            self.i += 1
            name = self.expect("ident")
            return Naming(e, name.text)
        return e

    def logic(self) -> Expr:
        e = self.comparison()
        while self.cur.kind == "op" and self.cur.text in ("&&", "||"):
            op = self.cur.text
            self.i += 1
            e = BinOp(op, e, self.comparison())
        return e

    def comparison(self) -> Expr:
        e = self.term()
        if self.cur.kind == "op" and self.cur.text in (
                "===", "=", "!==", ">", ">=", "<", "<="):
            op = self.cur.text
            self.i += 1
            return BinOp(op, e, self.term())
        return e

    def term(self) -> Expr:
        e = self.product()
        while self.cur.kind == "op" and self.cur.text in ("+", "-"):
            op = self.cur.text
            self.i += 1
            e = BinOp(op, e, self.product())
        return e

    def product(self) -> Expr:
        e = self.bitwise()
        while self.cur.kind == "op" and self.cur.text in ("*", "/", "%"):
            op = self.cur.text
            self.i += 1
            e = BinOp(op, e, self.bitwise())
        return e

    def bitwise(self) -> Expr:
        # tighter than arithmetic — reference quirk, see module docstring
        e = self.unary()
        while self.cur.kind == "op" and self.cur.text in ("&", "|", "^"):
            op = self.cur.text
            self.i += 1
            e = BinOp(op, e, self.unary())
        return e

    def unary(self) -> Expr:
        if self.cur.kind == "op" and self.cur.text in ("!", "-", "~"):
            op = self.cur.text
            self.i += 1
            return UnOp(op, self.suffix())
        return self.suffix()

    def suffix(self) -> Expr:
        e = self.atom()
        while self.eat("op", "."):
            name = self.expect("ident").text
            if name in _SUFFIX_OPS:
                e = Suffix(name, e)
            elif name == "as":
                self.expect("op", "(")
                alias = self.expect("ident")
                self.expect("op", ")")
                e = Naming(e, alias.text)
            elif name == "substring":
                self.expect("op", "(")
                frm = self.expression()
                to = None
                if self.eat("op", ","):
                    to = self.expression()
                self.expect("op", ")")
                e = Substring(e, frm, to)
            else:
                raise ParseError(
                    f"could not parse expression: unknown suffix op "
                    f".{name} at position {self.cur.pos}")
        return e

    def atom(self) -> Expr:
        t = self.cur
        if self.eat("op", "("):
            e = self.expression()
            self.expect("op", ")")
            return e
        if t.kind == "num":
            self.i += 1
            txt = t.text
            if txt[-1] in "lL":
                return Literal(int(txt[:-1]))
            if txt[-1] in "fF":
                return Literal(float(txt[:-1]))
            if "." in txt:
                return Literal(float(txt))
            return Literal(int(txt))
        if t.kind in ("dqstr", "sqstr"):
            self.i += 1
            return Literal(_unescape(t.text[1:-1]))
        if t.kind == "ident":
            if t.text in ("true", "false"):
                self.i += 1
                return Literal(t.text == "true")
            self.i += 1
            return FieldRef(t.text)
        raise ParseError(
            f"could not parse expression: unexpected "
            f"{t.text or 'end of input'!r} at position {t.pos}")


def parse_expression(text: str) -> Expr:
    """``ExpressionParser.parseExpression`` (:197-203)."""
    p = _Parser(text)
    e = p.expression()
    if p.cur.kind != "eof":
        raise ParseError(
            f"could not parse expression: trailing input "
            f"{p.cur.text!r} at position {p.cur.pos}")
    return e


def parse_expression_list(text: str) -> list[Expr]:
    """``ExpressionParser.parseExpressionList`` — ``rep1sep(expr, ',')``
    (:186-195)."""
    p = _Parser(text)
    out = [p.expression()]
    while p.eat("op", ","):
        out.append(p.expression())
    if p.cur.kind != "eof":
        raise ParseError(
            f"could not parse expression: trailing input "
            f"{p.cur.text!r} at position {p.cur.pos}")
    return out


# ---------------------------------------------------------------------------
# Fluent Table API consuming expression strings
# ---------------------------------------------------------------------------

def _columns(exprs: list[Expr]) -> list[Column]:
    return [e.to_column().alias(e.out_name(i)) for i, e in enumerate(exprs)]


class XTable:
    """Fluent Table-API layer over a DataFrame, consuming X-surface
    expression strings (``stream.select("a.sum as s, b")`` style).

    The reference snapshot contains only the expression parser — the
    consuming Table API was never committed (SURVEY.md §3.3); this is the
    natural Flink-0.9-style surface over it.  Every method is a thin
    declarative wrapper: plans stay inside Catalyst (no UDFs, no collect).
    """

    def __init__(self, df):
        self.df = df

    # -- projection / filter --
    def select(self, exprs: str) -> "XTable":
        parsed = parse_expression_list(exprs)
        if any(e.has_agg for e in parsed):
            # global aggregation (no grouping keys)
            return XTable(self.df.agg(*_columns(parsed)))
        return XTable(self.df.select(*_columns(parsed)))

    def filter(self, expr: str) -> "XTable":
        return XTable(self.df.filter(parse_expression(expr).to_column()))

    where = filter

    # -- grouping --
    def group_by(self, exprs: str) -> "XGroupedTable":
        return XGroupedTable(self.df, parse_expression_list(exprs))

    # -- joins / set ops / order --
    def join(self, other: "XTable", on: Optional[str] = None,
             how: str = "inner") -> "XTable":
        if on is None:
            return XTable(self.df.crossJoin(other.df))
        cond = parse_expression(on).to_column()
        return XTable(self.df.join(other.df, cond, how))

    def union_all(self, other: "XTable") -> "XTable":
        return XTable(self.df.union(other.df))

    def order_by(self, exprs: str) -> "XTable":
        """``order_by("a, b as desc")`` — a trailing ``as asc``/``as desc``
        marks sort direction (engine extension; the X grammar has no
        dedicated sort syntax)."""
        cols = []
        for e in parse_expression_list(exprs):
            if isinstance(e, Naming) and e.name in ("asc", "desc"):
                c = e.child.to_column()
                cols.append(c.asc() if e.name == "asc" else c.desc())
            else:
                cols.append(e.to_column())
        return XTable(self.df.orderBy(*cols))

    def limit(self, n: int) -> "XTable":
        return XTable(self.df.limit(n))

    def alias(self, name: str) -> "XTable":
        return XTable(self.df.alias(name))

    def distinct(self) -> "XTable":
        return XTable(self.df.distinct())

    def to_df(self):
        return self.df


class XGroupedTable:
    """Result of ``XTable.group_by`` — ``select`` runs the aggregation."""

    def __init__(self, df, keys: list[Expr]):
        self.df = df
        self.keys = keys

    def select(self, exprs: str) -> XTable:
        parsed = parse_expression_list(exprs)
        key_names = {k.out_name(i) for i, k in enumerate(self.keys)}
        key_cols = _columns(self.keys)
        aggs = []
        out_names = []
        for i, e in enumerate(parsed):
            name = e.out_name(i)
            out_names.append(name)
            if e.has_agg:
                aggs.append(e.to_column().alias(name))
            elif name not in key_names:
                raise ParseError(
                    f"expression {name!r} is neither an aggregate nor a "
                    f"grouping key")
        if aggs:
            agged = self.df.groupBy(*key_cols).agg(*aggs)
        else:
            agged = self.df.select(*key_cols).distinct()
        return XTable(agged.select(*out_names))
