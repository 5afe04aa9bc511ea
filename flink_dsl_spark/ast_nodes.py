"""Unified AST for the three reference language surfaces.

Covers, in one dataclass tree:
  * the FSQL streaming dialect  (reference fsql/Ast.scala:11-257)
  * the batch SQL dialect       (reference flinkdsl/ast.scala:20-241)
  * the expression-string DSL   (reference ExpressionParser.scala:14-183)

The reference keeps two parallel ASTs (plus a third in sqltyped/);
they differ only in window specs and a handful of clauses, so one tree
with optional fields is simpler and loses nothing (SURVEY.md §2).

Resolution state: the reference parameterizes ``Column[T]`` over the
qualifier type (Option[String] = unresolved, Stream = resolved,
fsql/Ast.scala:11-29).  Here ``Col.binding`` is ``None`` until the
resolver fills in the relation binding name.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union


# --------------------------------------------------------------------------
# Expressions
# --------------------------------------------------------------------------

class Expr:
    __slots__ = ()


@dataclass
class Lit(Expr):
    """Typed literal (fsql/parser.scala:344-371: string->VARCHAR,
    numeric-with-dot->DOUBLE, numeric->BIGINT, boolean, null)."""

    value: object            # str | int | float | bool | None
    type_name: str           # 'string' | 'long' | 'double' | 'boolean' | 'null'


@dataclass
class Param(Expr):
    """``?`` positional parameter (fsql/Ast.scala:164)."""

    index: int               # 0-based occurrence order


@dataclass
class Col(Expr):
    """Column reference, optionally qualified (fsql/Ast.scala:11-29)."""

    name: str
    qualifier: Optional[str] = None     # as written in the query
    binding: Optional[str] = None       # set by resolver: relation binding name


@dataclass
class Cast(Expr):
    """``CAST(expr AS type)`` — engine extension (the reference's only
    typing is the DDL palette, fsql/parser.scala:355; it has no cast
    expression).  ``type_name`` is a DDL palette name; decimal takes
    optional (precision, scale)."""

    expr: Expr
    type_name: str
    precision: Optional[int] = None
    scale: Optional[int] = None


@dataclass
class Subscript(Expr):
    """``expr[index]`` — 1-based array element access (engine
    extension for the array<float> embedding columns).  NULL out of
    range on both engines: Spark via try_element_at, DuckDB via its
    native list indexing."""

    expr: Expr
    index: Expr


@dataclass
class IntervalLit(Expr):
    """``INTERVAL n unit`` literal — engine extension for date/time
    arithmetic (``ts - interval 90 day``).  ``unit`` is stored
    singular-uppercase; the spelling is accepted verbatim by both
    Spark SQL and DuckDB."""

    value: int
    unit: str                # YEAR|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND


@dataclass
class Star(Expr):
    """``*`` or ``t.*`` (fsql/parser.scala:131-132)."""

    qualifier: Optional[str] = None


@dataclass
class FuncCall(Expr):
    """Generic function call; aggregate-ness decided by the registry
    (flinkdsl/typer.scala_:272-282).  ``distinct`` per-arg DISTINCT
    (flinkdsl/parser.scala:201)."""

    name: str
    args: list            # list[Expr]; count(*) -> [Star(None)]
    distinct: bool = False


@dataclass
class WindowFrame:
    """``ROWS|RANGE [BETWEEN] bound [AND bound]`` of an OVER clause.
    Bounds are tuples: ("unbounded_preceding",) | ("preceding", n) |
    ("current",) | ("following", n) | ("unbounded_following",)."""

    mode: str                       # "rows" | "range"
    start: tuple
    end: tuple


# the null-treatment applicability rule, shared by the batch compile,
# the streaming OVER planner, and sqlgen so the three paths can never
# drift (review finding, r11)
NULL_TREATMENT_FUNCS = ("lag", "lead", "first_value", "last_value",
                        "nth_value")


def null_treatment_error(name: str) -> str | None:
    """The scope message when ``name`` cannot take IGNORE/RESPECT
    NULLS, or None when it can (callers raise their own error type)."""
    if name.lower() in NULL_TREATMENT_FUNCS:
        return None
    return ("IGNORE NULLS applies to lag/lead/first_value/"
            f"last_value/nth_value, not {name}()")


@dataclass
class WindowFunc(Expr):
    """``func(args) OVER (PARTITION BY ... ORDER BY ... [frame])`` —
    engine extension (SURVEY.md §2.5: the reference has NO analytic
    OVER clause; its windows are stream policies).  ``func`` carries
    the call; ranking/value functions are compiled directly, aggregate
    names go through the registry and ``.over(...)``."""

    func: FuncCall
    partition_by: list = field(default_factory=list)   # list[Expr]
    order_by: list = field(default_factory=list)       # list[OrderItem]
    frame: Optional[WindowFrame] = None
    ignore_nulls: bool = False   # `func(...) IGNORE NULLS OVER ...`
                                 # (r11; lag/lead/first/last/nth_value)
    ref: Optional[str] = None    # `over w` named-window reference —
                                 # resolved (and cleared) at parse time
                                 # from the WINDOW clause


@dataclass
class Case(Expr):
    """Searched CASE (fsql/parser.scala:247-255)."""

    whens: list           # list[tuple[Expr, Expr]]
    else_: Optional[Expr] = None


@dataclass
class BinOp(Expr):
    """Binary op: arithmetic + - * / %, bitwise | & ^ << >>,
    comparisons = != <> < > <= >=, LIKE, AND, OR.
    NOTE: the reference's F/B grammars flatten + - * / % to one
    precedence level (fsql/parser.scala:108-116) — a parser-combinator
    accident; we use standard SQL precedence (SURVEY.md §7.0(1))."""

    op: str
    left: Expr
    right: Expr


@dataclass
class UnOp(Expr):
    """Unary NOT / - / ~ (ExpressionParser.scala:109-115)."""

    op: str
    operand: Expr


@dataclass
class Between(Expr):
    """[NOT] BETWEEN (fsql/Ast.scala:191-193,219)."""

    expr: Expr
    lo: Expr
    hi: Expr
    negated: bool = False


@dataclass
class IsNull(Expr):
    """IS [NOT] NULL (fsql/Ast.scala:174-178)."""

    expr: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    """[NOT] IN (v1, v2, ...) (flinkdsl/ast.scala:71)."""

    expr: Expr
    items: list
    negated: bool = False


@dataclass
class InSubquery(Expr):
    """[NOT] IN (select ...) (flinkdsl/parser.scala:138-139)."""

    expr: Expr
    query: "Select"
    negated: bool = False


@dataclass
class Exists(Expr):
    """[NOT] EXISTS (select ...) (flinkdsl/ast.scala:79-80)."""

    query: "Select"
    negated: bool = False


@dataclass
class QuantifiedCmp(Expr):
    """``expr cmp ALL|ANY|SOME (select ...)`` — quantified comparison
    (engine extension; ANSI SQL:1999 <quantified comparison predicate>).
    ``quant`` is normalized to "all" | "any" (SOME ≡ ANY).  Spark SQL
    has no native form, so SqlGen rewrites to EXISTS / NOT EXISTS —
    exact in truth-demanding contexts; NOT over it flips via the 3VL
    quantifier duality (¬∀ ≡ ∃¬), which is exact at any depth."""

    op: str                      # =  !=  <  <=  >  >=
    expr: Expr
    quant: str                   # "all" | "any"
    query: "Select"


@dataclass
class ScalarSubquery(Expr):
    """(select ...) in expression position; forced nullable in the
    reference's typer (flinkdsl/typer.scala_:259-260)."""

    query: "Select"


# --------------------------------------------------------------------------
# Relations / FROM clause
# --------------------------------------------------------------------------

@dataclass
class Policy:
    """Window extent policy: ``N [unit] [on col]``
    (fsql/Ast.scala:136 PolicyBased).  unit None => count-based (rows);
    time units: microsec|milisec|sec|min|h|d (fsql/parser.scala:356)."""

    value: int
    unit: Optional[str] = None
    on_col: Optional[Col] = None


@dataclass
class WindowSpec:
    """``[size N [unit] [on c] [every M [unit] [on c]] [partitioned on c]]``
    (fsql/parser.scala:157-176, fsql/Ast.scala:132-136).

    ``kind`` extends the reference grammar with gap-based session
    windows: ``[session N unit [on c] [partitioned on c]]`` (extension;
    the reference has no session windows)."""

    size: Policy
    every: Optional[Policy] = None
    partition: Optional[Col] = None
    kind: str = "size"


@dataclass
class TableRef:
    """Named stream/table with optional alias + window
    (fsql/Ast.scala:105-106, flinkdsl/ast.scala:74)."""

    name: str
    alias: Optional[str] = None
    window: Optional[WindowSpec] = None
    sample: Optional[tuple] = None     # (id_col, permille) — engine
                                       # extension: TABLESAMPLE suffix

    @property
    def binding(self) -> str:
        return self.alias or self.name


@dataclass
class DerivedTable:
    """(select ...) as alias in FROM (fsql/parser.scala:180-185).
    ``lateral`` marks a LATERAL subquery (engine extension): the body
    may reference columns of relations earlier in the same FROM —
    resolved against the in-progress scope and always compiled on the
    SQL path (Spark and DuckDB both evaluate LATERAL natively)."""

    query: "Select"
    alias: str
    window: Optional[WindowSpec] = None
    lateral: bool = False
    sample: Optional[tuple] = None     # (id_col, permille) — engine
                                       # extension: TABLESAMPLE suffix

    @property
    def binding(self) -> str:
        return self.alias


@dataclass
class Join:
    """Join tree node.  kind: inner|left|right|full|cross
    (flinkdsl/ast.scala:205-216; fsql/Ast.scala:143-151).
    Exactly one of (on, using) may be set; cross joins have neither."""

    left: object          # TableRef | DerivedTable | Join
    right: object
    kind: str
    on: Optional[Expr] = None
    using: Optional[list] = None       # list[str]


Relation = Union[TableRef, DerivedTable, Join]


# --------------------------------------------------------------------------
# Statements
# --------------------------------------------------------------------------

@dataclass
class SelectItem:
    """Projection item (``Named`` in fsql/Ast.scala:107-109)."""

    expr: Expr
    alias: Optional[str] = None


@dataclass
class OrderItem:
    expr: Expr
    ascending: bool = True
    collate: Optional[str] = None      # parsed, no-op (flinkdsl/parser.scala:250-256)
    nulls: Optional[str] = None        # "first" | "last" | None (engine
                                       # default: Spark's asc=NULLS FIRST)


@dataclass
class Hint:
    """Optimizer hint from a ``/*+ name(arg, ...) */`` block after
    SELECT (engine extension beyond the reference grammar — the
    scale-tuning surface for the skew/bucketing helpers).  Args are
    plain strings/numbers; semantics are the planner's concern."""

    name: str
    args: list


# Row hints that APPEND a score column to the select's input rows
# (rather than filtering them): hint name -> the column it adds.  The
# resolver (scope binding, WHERE-hide, star columns) and the planner
# (_expand_star, collision checks) all iterate this ONE map, so a new
# score-adding hint needs no per-site special cases (the r13 bm25
# lesson: the column has three resolution touch points).
SCORE_HINTS = {"bm25": "bm25_score", "hybrid_rrf": "rrf_score"}


@dataclass
class Select:
    """SELECT core (both dialects).  ``rollup`` per flinkdsl/ast.scala:218-220;
    streaming dialect has no order/limit (fsql/parser.scala:67-68)."""

    items: list                                  # list[SelectItem]
    from_: Optional[Relation] = None             # None => dual (typer.scala_:355-357)
    where: Optional[Expr] = None
    group_by: list = field(default_factory=list) # list[Expr]
    rollup: bool = False
    having: Optional[Expr] = None
    order_by: list = field(default_factory=list) # list[OrderItem]
    limit: Optional[Expr] = None                 # Lit or Param
    offset: Optional[Expr] = None
    distinct: bool = False
    hints: list = field(default_factory=list)    # list[Hint]
    qualify: Optional[Expr] = None               # engine extension:
                                                 # filter on window results
    cube: bool = False                           # engine extension:
                                                 # GROUP BY CUBE(...)
    grouping_sets: Optional[list] = None         # engine extension:
                                                 # list[list[int]] — index
                                                 # lists into group_by (the
                                                 # union of all sets' exprs)


@dataclass
class SetOp:
    """UNION [ALL] / EXCEPT / INTERSECT (flinkdsl/parser.scala:32-40).
    The reference parses-then-drops ALL; we honor it (SURVEY.md §7.0(3))."""

    op: str                                      # union|union_all|except|intersect
    left: object                                 # Select | SetOp
    right: object
    order_by: list = field(default_factory=list)
    limit: Optional[Expr] = None
    offset: Optional[Expr] = None


@dataclass
class RecursiveWith:
    """``WITH RECURSIVE name [(cols)] AS (anchor UNION ALL step), …
    body`` (engine extension).  Unlike plain WITH (parse-time
    inlining), the tree is kept intact and rendered as native
    WITH RECURSIVE SQL — Spark ≥4.0 and DuckDB both evaluate the
    fixpoint themselves, with their own recursion-depth guards.
    Statement-level only (cannot appear as a subquery)."""

    ctes: list          # [(name, cols|None, Select|SetOp), ...]
    body: object        # Select | SetOp


@dataclass
class ColumnDef:
    """``name type`` in DDL (fsql/Ast.scala:54-61; types fsql/parser.scala:355)."""

    name: str
    type_name: str


@dataclass
class CreateSchema:
    """CREATE SCHEMA name (cols) [EXTENDS parent] (fsql/Ast.scala:49-51)."""

    name: str
    columns: list                                # list[ColumnDef]
    extends: Optional[str] = None


# --- stream sources (fsql/Ast.scala:77-87) ---

@dataclass
class HostSource:
    host: str
    port: int


@dataclass
class FileSource:
    path: str
    format: Optional[str] = None   # engine extension; reference has bare file('p')


@dataclass
class RateSource:
    """Engine extension: Spark's rate source for demos/tests."""

    rows_per_second: int = 1


@dataclass
class DerivedSource:
    query: Union[Select, SetOp]


@dataclass
class CreateStream:
    """CREATE STREAM name (cols)|schemaName [source ...]
    (fsql/Ast.scala:70-87, fsql/parser.scala:47-62)."""

    name: str
    schema: Union[str, list, None]   # named schema ref | list[ColumnDef] | None (derived)
    source: Union[HostSource, FileSource, RateSource, DerivedSource, None] = None


@dataclass
class CreateBucketedTable:
    """CREATE TABLE name BUCKETED BY (cols) INTO n BUCKETS
    [SORTED BY (cols)] AS select — engine extension (the reference has
    no table DDL); executes bucketing.write_bucketed so the dialect can
    pre-pay a join/agg shuffle at write time."""

    name: str
    bucket_cols: list                            # list[str]
    num_buckets: int
    query: object                                # Select | SetOp
    sort_cols: Optional[list] = None             # list[str]


@dataclass
class DropRelation:
    """DROP STREAM|TABLE [IF EXISTS] name — engine extension closing
    the CREATE lifecycle (the reference has no DROP): unregisters the
    relation from the FSQL catalog, drops the temp view, and for
    bucketed tables removes the catalog table + its data."""

    name: str
    kind: str                                    # "stream" | "table"
    if_exists: bool = False


@dataclass
class Insert:
    """INSERT INTO t [(cols)] VALUES (...)|select
    (flinkdsl/ast.scala:154-161; fsql/parser.scala:268-277)."""

    table: str
    columns: Optional[list] = None               # list[str]
    values: Optional[list] = None                # list[list[Expr]]
    query: Union[Select, SetOp, None] = None
    # F dialect: INSERT INTO stream <source> (fsql/parser.scala:268-277;
    # parsed there but excluded from stmt at :23 — we wire it up)
    source: object = None                        # FileSource|HostSource|...


@dataclass
class Assignment:
    col: Col
    value: Expr


@dataclass
class Update:
    """UPDATE t SET c = e [WHERE p] — executes against the session
    catalog (planner.plan_update re-registers the transformed
    relation).  The reference only parses it (flinkdsl/parser.scala:
    55-59)."""

    tables: list                                 # list[TableRef]
    assignments: list                            # list[Assignment]
    where: Optional[Expr] = None
    order_by: list = field(default_factory=list)
    limit: Optional[Expr] = None


@dataclass
class Delete:
    """DELETE FROM t [WHERE p] — executes against the session catalog
    (planner.plan_delete).  The reference only parses it."""

    tables: list                                 # list[TableRef]
    where: Optional[Expr] = None


@dataclass
class Merge:
    """MERGE INTO t [AS a] USING src [AS b] ON cond
    (WHEN MATCHED [AND c] THEN UPDATE SET ... | DELETE)*
    (WHEN NOT MATCHED [AND c] THEN INSERT [(cols)] VALUES (...))*
    (WHEN NOT MATCHED BY SOURCE [AND c] THEN ...)* —
    engine extension (r11, multi-clause r12) completing the
    executable-DML family (UPDATE/DELETE, SURVEY §7.0(5)
    session-relation semantics).  Each kind holds an ORDERED clause
    list; per row the FIRST clause of the applicable kind whose
    condition is true fires (ANSI); a conditionless clause must be
    the last of its kind (later ones would be unreachable).  At
    least one clause overall."""

    target: object                               # TableRef
    source: object                               # TableRef | DerivedTable
    on: Expr = None
    # ordered lists; empty = kind absent
    matched: list = field(default_factory=list)
    # each: ("update", [Assignment], cond) | ("delete", None, cond)
    not_matched: list = field(default_factory=list)
    # each: (cols|None, [Expr], cond)
    by_source: list = field(default_factory=list)
    # WHEN NOT MATCHED BY SOURCE: same shapes as `matched`,
    # target-side refs only


@dataclass
class Explain:
    """EXPLAIN [FORMATTED|EXTENDED|CODEGEN|COST] <query> — engine
    diagnostic extension (the reference has no explain; this surfaces
    the Catalyst physical plan the query compiles to)."""

    query: object                                # Select | SetOp
    mode: str = "simple"


Statement = Union[Select, SetOp, CreateSchema, CreateStream, Insert,
                  Update, Delete, Merge, Explain]


# --------------------------------------------------------------------------
# Traversal helpers
# --------------------------------------------------------------------------

def expr_children(e: Expr) -> list:
    """Direct child expressions (skips subquery bodies)."""
    if isinstance(e, BinOp):
        return [e.left, e.right]
    if isinstance(e, UnOp):
        return [e.operand]
    if isinstance(e, FuncCall):
        return list(e.args)
    if isinstance(e, WindowFunc):
        # deliberately yields the inner call's ARGS, not the FuncCall
        # node itself: `sum(x) over (...)` is an analytic computation,
        # and must not trip aggregate-context detection (_expr_has_agg)
        return list(e.func.args) + list(e.partition_by) \
            + [o.expr for o in e.order_by]
    if isinstance(e, Cast):
        return [e.expr]
    if isinstance(e, Subscript):
        return [e.expr, e.index]
    if isinstance(e, Case):
        out = []
        for c, v in e.whens:
            out.extend((c, v))
        if e.else_ is not None:
            out.append(e.else_)
        return out
    if isinstance(e, Between):
        return [e.expr, e.lo, e.hi]
    if isinstance(e, IsNull):
        return [e.expr]
    if isinstance(e, InList):
        return [e.expr] + list(e.items)
    if isinstance(e, InSubquery):
        return [e.expr]
    if isinstance(e, QuantifiedCmp):
        return [e.expr]          # subquery body skipped, like InSubquery
    return []


def walk_expr(e: Expr):
    """Yield e and all descendants, pre-order (Predicate.find parity,
    fsql/Ast.scala:199-209)."""
    yield e
    for c in expr_children(e):
        yield from walk_expr(c)


def visible_leaves(rel):
    """Leaves whose columns appear in the join OUTPUT: like
    relation_leaves, but the right side of a SEMI/ANTI join is an
    existence probe only — its columns are visible to the ON
    condition, never to the select list or star expansion."""
    if rel is None:
        return
    if isinstance(rel, Join):
        yield from visible_leaves(rel.left)
        if rel.kind not in ("semi", "anti"):
            yield from visible_leaves(rel.right)
        return
    yield from relation_leaves(rel)


def relation_leaves(rel: Relation):
    """All TableRef/DerivedTable leaves of a relation tree, left-to-right
    (parity: stmt.streams collection, fsql/Ast.scala:95-103)."""
    if rel is None:
        return
    if isinstance(rel, Join):
        yield from relation_leaves(rel.left)
        yield from relation_leaves(rel.right)
    else:
        yield rel
