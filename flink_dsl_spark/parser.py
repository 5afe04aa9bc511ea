"""Hand-written tokenizer + recursive-descent parser for the unified dialect.

Grammar parity targets:
  * FSQL streaming statements: CREATE SCHEMA / CREATE STREAM / SELECT with
    ``[size .. every .. partitioned on ..]`` window specs
    (reference fsql/parser.scala:23-277).
  * Batch dialect: SELECT w/ set-ops, joins incl. USING, GROUP BY
    [WITH ROLLUP], HAVING, ORDER BY [collate], LIMIT/OFFSET, IN/EXISTS/
    scalar subselects, INSERT/UPDATE/DELETE (flinkdsl/parser.scala:24-289).

Deliberate divergences (recorded in SURVEY.md §7.0):
  * standard SQL operator precedence (the reference's F/B grammars flatten
    ``+ - * / %`` to one level — fsql/parser.scala:108-116 — by accident);
  * ``UNION ALL`` honored (reference parses-then-drops ALL,
    flinkdsl/parser.scala:35-40);
  * parse errors raise ParseError with 1-based line/column (parity with
    Failure(msg, column, line), fsql/package.scala:75).
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass

from .ast_nodes import (
    Assignment, Between, BinOp, Case, Cast, Col, ColumnDef, CreateSchema,
    CreateStream, Delete, DerivedSource, DerivedTable, Exists, FileSource,
    FuncCall, HostSource, InList, InSubquery, Insert, IntervalLit,
    IsNull, Join, Lit,
    OrderItem, Param, Policy, QuantifiedCmp, RateSource, RecursiveWith,
    ScalarSubquery, Select, SelectItem,
    SetOp, Star, Subscript, TableRef, UnOp, Update, WindowFrame,
    WindowFunc,
    WindowSpec, relation_leaves, walk_expr,
)
from .errors import ParseError

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

# Reserved words (union of fsql/parser.scala:309-319 and
# flinkdsl/parser.scala:284-289).  Words that are only meaningful in one
# syntactic position (stream/schema/size/every/partitioned/source/host/
# file/rate/extends/collate/rollup) are CONTEXTUAL, not reserved — the
# reference's own test corpus uses ``stream`` as a stream name
# (test/parserTest.scala:50-54).
RESERVED = {
    "select", "distinct", "from", "where", "as", "and", "or", "not",
    "join", "inner", "outer", "left", "right", "full", "cross", "on",
    "using", "group", "by", "having", "order", "asc", "desc", "limit",
    "offset", "union", "except", "intersect", "all", "insert", "into",
    "values", "update", "set", "delete", "create", "between", "like",
    "in", "exists", "is", "null", "case", "when", "then", "else", "end",
    "true", "false", "with",
}

# DDL type names (fsql/parser.scala:355)
TYPE_NAMES = {
    "int", "string", "double", "date", "byte", "short", "long", "float",
    "character", "boolean",
    # engine extensions so driver testdata round-trips:
    "timestamp", "decimal", "binary",
}

TIME_UNITS = {"microsec", "milisec", "millisec", "sec", "min", "h", "d"}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*)
  | (?P<hint>/\*\+(?:[^*]|\*(?!/))*\*/)
  | (?P<blockcomment>/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<number>\d+\.\d*([eE][+-]?\d+)?|\d+[eE][+-]?\d+|\.\d+([eE][+-]?\d+)?|\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qident>"[^"]+"|`[^`]+`)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op>===|!==|<>|!=|<=|>=|<<|>>|\|\||&&|[=<>+\-*/%(),.?\[\]|&^~;!])
    """,
    re.VERBOSE,
)


@dataclass
class Token:
    kind: str        # 'number' | 'string' | 'ident' | 'qident' | 'op' | 'eof'
    text: str
    line: int
    col: int

    @property
    def lower(self) -> str:
        return self.text.lower()


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    pos, line, line_start = 0, 1, 0
    n = len(sql)
    while pos < n:
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise ParseError(
                f"unexpected character {sql[pos]!r}", line, pos - line_start + 1
            )
        kind = m.lastgroup
        text = m.group(0)
        # dotted-number lastgroup fix: named groups inside number
        if kind not in ("ws", "comment", "blockcomment"):
            for k in ("hint", "number", "string", "qident", "ident", "op"):
                if m.group(k) is not None:
                    kind = k
                    break
            tokens.append(Token(kind, text, line, pos - line_start + 1))
        nl = text.count("\n")
        if nl:
            line += nl
            line_start = pos + text.rfind("\n") + 1
        pos = m.end()
    tokens.append(Token("eof", "<eof>", line, n - line_start + 1))
    return tokens


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

_AGG_HINT = {"count", "sum", "avg", "min", "max"}


class Parser:
    def __init__(self, sql: str):
        self.sql = sql
        self.tokens = tokenize(sql)
        self.i = 0
        self.n_params = 0
        self._pivot_srcs = 0     # synthesized aliasless-rotation names

    # --- token helpers ---

    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        t = self.cur
        if t.kind != "eof":
            self.i += 1
        return t

    def error(self, msg: str, tok: Token | None = None):
        t = tok or self.cur
        raise ParseError(f"{msg} (got {t.text!r})", t.line, t.col)

    def at_kw(self, *words: str) -> bool:
        t = self.cur
        return t.kind == "ident" and t.lower in words

    def eat_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.advance()
            return True
        return False

    def expect_kw(self, word: str):
        if not self.eat_kw(word):
            self.error(f"expected {word.upper()}")

    def at_op(self, *ops: str) -> bool:
        t = self.cur
        return t.kind == "op" and t.text in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.advance()
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            self.error(f"expected {op!r}")

    def ident(self, what: str = "identifier") -> str:
        t = self.cur
        if t.kind == "qident":
            self.advance()
            return t.text[1:-1]
        if t.kind == "ident" and t.lower not in RESERVED:
            self.advance()
            return t.text
        self.error(f"expected {what}")

    # contextual keywords that must not be swallowed as an IMPLICIT
    # alias (a bare ``from t qualify rank() ...`` starts a QUALIFY
    # clause, ``from t window w as (...)`` a WINDOW clause, and
    # ``from t pivot (...)`` a PIVOT tail, not an alias).  ``AS
    # qualify`` / quoted forms still work as aliases.
    _NON_ALIAS = {"qualify", "window", "pivot", "unpivot",
                  "tablesample"}

    def alias_ident(self) -> str | None:
        """Optional [AS] alias."""
        if self.eat_kw("as"):
            return self.ident("alias")
        t = self.cur
        if t.kind == "ident" and t.lower == "for" \
                and self.peek().kind == "ident" \
                and self.peek().lower == "update":
            # ``from t for update`` — the FOR UPDATE suffix, not an
            # implicit alias named 'for'.  (Alias a relation "for" by
            # quoting it or using AS.)
            return None
        if t.kind == "qident" or (t.kind == "ident"
                                  and t.lower not in RESERVED
                                  and t.lower not in self._NON_ALIAS):
            self.advance()
            return t.text[1:-1] if t.kind == "qident" else t.text
        return None

    # --- entry points ---

    def parse_statement(self):
        """stmt := createSchema | createStream | insert | update | delete
        | selectStmt  (fsql/parser.scala:23 + flinkdsl/parser.scala:24)."""
        if self.at_kw("create"):
            if self.peek().lower == "schema":
                return self.parse_create_schema()
            if self.peek().lower == "stream":
                return self.parse_create_stream()
            if self.peek().lower == "table":
                return self.parse_create_table()
            self.error("expected SCHEMA, STREAM or TABLE after CREATE",
                       self.peek())
        if self.at_kw("drop"):
            return self.parse_drop()
        if self.at_kw("insert"):
            return self.parse_insert()
        if self.at_kw("update"):
            return self.parse_update()
        if self.at_kw("delete"):
            return self.parse_delete()
        if self.at_kw("merge"):
            return self.parse_merge()
        if self.at_kw("explain"):
            return self.parse_explain()
        if self.at_kw("select") or self.at_kw("with") or self.at_op("("):
            return self.parse_select_statement(allow_recursive=True)
        self.error("expected a statement")

    def parse_explain(self):
        """explain [formatted|extended|codegen|cost] <select>
        (engine diagnostic extension)."""
        from .ast_nodes import Explain
        self.expect_kw("explain")
        mode = "simple"
        t = self.cur
        if t.kind == "ident" and t.lower in ("formatted", "extended",
                                             "codegen", "cost"):
            mode = t.lower
            self.advance()
        query = self.parse_select_statement(allow_recursive=True)
        return Explain(query, mode)

    def parse(self):
        stmt = self.parse_statement()
        self.eat_op(";")
        if self.cur.kind != "eof":
            self.error("unexpected trailing input")
        return stmt

    # --- DDL ---

    def parse_create_schema(self) -> CreateSchema:
        """create schema <id> (<col type>,...) [extends <id>]
        (fsql/parser.scala:31-39)."""
        self.expect_kw("create")
        self.expect_kw("schema")
        name = self.ident("schema name")
        self.expect_op("(")
        cols = self.parse_column_defs()
        self.expect_op(")")
        parent = None
        if self.eat_kw("extends"):
            parent = self.ident("parent schema name")
        return CreateSchema(name, cols, parent)

    def parse_column_defs(self) -> list[ColumnDef]:
        cols = [self.parse_column_def()]
        while self.eat_op(","):
            cols.append(self.parse_column_def())
        return cols

    def parse_column_def(self) -> ColumnDef:
        name = self.ident("column name")
        t = self.cur
        if t.kind == "ident" and t.lower in TYPE_NAMES:
            self.advance()
            return ColumnDef(name, t.lower)
        self.error("expected a type name")

    def parse_create_stream(self) -> CreateStream:
        """create stream name ((cols) | schemaName) [source ...] |
        create stream name[(cols)] as (select ...)
        (fsql/parser.scala:47-62)."""
        self.expect_kw("create")
        self.expect_kw("stream")
        name = self.ident("stream name")
        schema = None
        if self.eat_op("("):
            schema = self.parse_column_defs()
            self.expect_op(")")
        elif not self.at_kw("source", "as"):
            schema = self.ident("schema name")   # named schema ref
        if self.eat_kw("as"):
            self.expect_op("(")
            q = self.parse_select_statement()
            self.expect_op(")")
            return CreateStream(name, schema, DerivedSource(q))
        if self.eat_kw("source"):
            return CreateStream(name, schema, self.parse_source())
        return CreateStream(name, schema, None)

    def parse_source(self):
        if self.eat_kw("host"):
            self.expect_op("(")
            host = self.string_lit()
            self.expect_op(",")
            port = self.int_lit("port")
            self.expect_op(")")
            return HostSource(host, port)
        if self.eat_kw("file"):
            self.expect_op("(")
            path = self.string_lit()
            fmt = None
            if self.eat_op(","):
                fmt = self.string_lit()
            self.expect_op(")")
            return FileSource(path, fmt)
        if self.eat_kw("rate"):
            self.expect_op("(")
            rps = self.int_lit("rate")
            self.expect_op(")")
            return RateSource(rps)
        self.error("expected HOST, FILE or RATE source")

    def string_lit(self) -> str:
        t = self.cur
        if t.kind != "string":
            self.error("expected string literal")
        self.advance()
        return t.text[1:-1].replace("''", "'")

    def number_lit(self) -> str:
        t = self.cur
        if t.kind != "number":
            self.error("expected numeric literal")
        self.advance()
        return t.text

    def int_lit(self, what: str) -> int:
        """Integer-only numeric literal — digit-run tokens only:
        `99.` (a valid double literal since the r14 trailing-dot
        form) and exponent forms like `2e1` must fail HERE with a
        positioned parse error, not a raw ValueError from int()."""
        t = self.cur
        if t.kind != "number" or not t.text.isdigit():
            self.error(f"expected integer {what}", t)
        self.advance()
        return int(t.text)

    # --- DML ---

    def parse_drop(self):
        """drop (stream | table) [if exists] <id> — engine extension
        (the reference's grammar has no DROP; pairs with CREATE
        STREAM / CREATE TABLE)."""
        from .ast_nodes import DropRelation
        self.expect_kw("drop")
        if self.eat_kw("stream"):
            kind = "stream"
        elif self.eat_kw("table"):
            kind = "table"
        else:
            self.error("expected STREAM or TABLE after DROP")
        if_exists = False
        if self.eat_kw("if"):
            self.expect_kw("exists")
            if_exists = True
        return DropRelation(self.ident("relation name"), kind, if_exists)

    def parse_create_table(self):
        """create table <id> bucketed by (<col>,...) into <n> buckets
        [sorted by (<col>,...)] as <select> — engine extension: the
        write-once shuffle surface (bucketing.write_bucketed) reachable
        from the dialect."""
        from .ast_nodes import CreateBucketedTable
        self.expect_kw("create")
        self.expect_kw("table")
        name = self.ident("table name")
        self.expect_kw("bucketed")
        self.expect_kw("by")
        bucket_cols = self._parse_paren_name_list("bucket column")
        self.expect_kw("into")
        t = self.cur
        num_buckets = self.int_lit("bucket count")
        if num_buckets < 1:
            self.error("bucket count must be >= 1", t)
        self.expect_kw("buckets")
        sort_cols = None
        if self.eat_kw("sorted"):
            self.expect_kw("by")
            sort_cols = self._parse_paren_name_list("sort column")
        self.expect_kw("as")
        query = self.parse_select_statement()
        return CreateBucketedTable(name, bucket_cols, num_buckets,
                                   query, sort_cols)

    def _parse_paren_name_list(self, what: str) -> list[str]:
        self.expect_op("(")
        names = [self.ident(what)]
        while self.eat_op(","):
            names.append(self.ident(what))
        self.expect_op(")")
        return names

    def parse_insert(self) -> Insert:
        """insert into t [(cols)] values (...),... | select ...
        (flinkdsl/parser.scala:44-51)."""
        self.expect_kw("insert")
        self.expect_kw("into")
        table = self.ident("table name")
        cols = None
        if self.at_op("(") and not self._paren_starts_select():
            self.expect_op("(")
            cols = [self.ident("column")]
            while self.eat_op(","):
                cols.append(self.ident("column"))
            self.expect_op(")")
        if self.eat_kw("values"):
            rows = [self.parse_value_row()]
            while self.eat_op(","):
                rows.append(self.parse_value_row())
            return Insert(table, cols, values=rows)
        if self.eat_kw("source"):
            # F dialect: append a host/file/rate source into the stream
            # (fsql/parser.scala:268-277)
            return Insert(table, cols, source=self.parse_source())
        q = self.parse_select_statement()
        return Insert(table, cols, query=q)

    def parse_value_row(self) -> list:
        self.expect_op("(")
        row = [self.parse_expr()]
        while self.eat_op(","):
            row.append(self.parse_expr())
        self.expect_op(")")
        return row

    def parse_update(self) -> Update:
        self.expect_kw("update")
        tables = [self.parse_table_name_alias()]
        while self.eat_op(","):
            tables.append(self.parse_table_name_alias())
        self.expect_kw("set")
        assigns = [self.parse_assignment()]
        while self.eat_op(","):
            assigns.append(self.parse_assignment())
        where = self.parse_expr() if self.eat_kw("where") else None
        order = self.parse_order_by() if self.at_kw("order") else []
        limit = None
        if self.eat_kw("limit"):
            limit = self.parse_limit_term()
        return Update(tables, assigns, where, order, limit)

    def parse_assignment(self) -> Assignment:
        col = self.parse_column_ref()
        self.expect_op("=")
        return Assignment(col, self.parse_expr())

    def parse_delete(self) -> Delete:
        self.expect_kw("delete")
        if not self.at_kw("from"):
            # MySQL-style pre-FROM target list — parsed and DISCARDED,
            # exactly like the reference (flinkdsl/parser.scala:64
            # ``opt(repsep(ident, ","))``: its Delete AST drops the
            # list, `case _ ~ _ ~ t ~ w => Delete(t, w)`)
            self.ident("table name")
            while self.eat_op(","):
                self.ident("table name")
        self.expect_kw("from")
        tables = [self.parse_table_name_alias()]
        while self.eat_op(","):
            tables.append(self.parse_table_name_alias())
        where = self.parse_expr() if self.eat_kw("where") else None
        return Delete(tables, where)

    def parse_table_name_alias(self) -> TableRef:
        name = self.ident("table name")
        return TableRef(name, self.alias_ident())

    def parse_merge(self):
        """MERGE INTO t [AS a] USING (name [AS b] | (select) AS b)
        ON cond, then any number of clauses of each kind, in any
        interleaving: WHEN MATCHED [AND c] (UPDATE SET | DELETE),
        WHEN NOT MATCHED [BY TARGET] [AND c] (INSERT), and WHEN NOT
        MATCHED BY SOURCE [AND c] (UPDATE SET | DELETE — the
        full-table-sync clause).  Clauses of a kind are ORDERED:
        per row the first whose condition holds fires, so a
        conditionless clause must be the LAST of its kind (a later
        one could never fire — rejected here, not silently dead).
        At least one clause overall (engine extension, r11;
        multi-clause r12)."""
        from .ast_nodes import DerivedTable, Merge
        self.expect_kw("merge")
        self.expect_kw("into")
        target = self.parse_table_name_alias()
        if self.at_kw("tablesample"):
            # named rejection (the r13 LATERAL lesson): sampling the
            # merge TARGET would flip its unsampled rows into NOT
            # MATCHED BY SOURCE and delete/update them — never valid
            self.error(
                "TABLESAMPLE is not supported on the MERGE target "
                "(unsampled target rows would read as NOT MATCHED "
                "BY SOURCE)")
        self.expect_kw("using")
        if self.at_op("("):
            tok = self.cur
            self.advance()
            sub = self.parse_select_statement()
            self.expect_op(")")
            alias = self.alias_ident()
            if alias is None:
                self.error("MERGE USING (subquery) requires an alias",
                           tok)
            source = DerivedTable(sub, alias)
        else:
            source = self.parse_table_name_alias()
        if self.at_kw("tablesample"):
            # supported SPELLING for a sampled source: inside the
            # subquery — using (select * from s tablesample(id, p)) x
            # — which routes through the ordinary relation suffix and
            # is value-tested; the bare suffix here would need its own
            # plan_merge plumbing for no added power
            self.error(
                "TABLESAMPLE is not supported directly on the MERGE "
                "source — sample inside the subquery form instead: "
                "USING (select * from s tablesample(id, permille)) "
                "alias")
        self.expect_kw("on")
        on = self.parse_expr()
        matched: list = []
        not_matched: list = []
        by_source: list = []

        def check_reachable(lst, label, tok):
            if lst and lst[-1][-1] is None:
                self.error(
                    f"unreachable {label} clause: the previous "
                    f"{label} has no AND condition, so it fires for "
                    f"every row first", tok)

        def upd_or_del():
            if self.eat_kw("delete"):
                return ("delete", None)
            self.expect_kw("update")
            self.expect_kw("set")
            # UPDATE SET * (r12): assign every target column from its
            # same-named source column — must stand alone
            if self.at_op("*"):
                self.advance()
                return ("update", "*")
            assigns = [self.parse_assignment()]
            while self.eat_op(","):
                assigns.append(self.parse_assignment())
            return ("update", assigns)

        while self.at_kw("when"):
            tok = self.cur
            self.advance()
            negated = self.eat_kw("not")
            self.expect_kw("matched")
            src_side = False
            if negated and self.eat_kw("by"):
                if self.eat_kw("source"):
                    src_side = True
                else:
                    self.expect_kw("target")
            cond = self.parse_expr() if self.eat_kw("and") else None
            self.expect_kw("then")
            if negated and src_side:
                check_reachable(by_source,
                                "WHEN NOT MATCHED BY SOURCE", tok)
                kind, assigns = upd_or_del()
                by_source.append((kind, assigns, cond))
            elif negated:
                check_reachable(not_matched, "WHEN NOT MATCHED",
                                tok)
                self.expect_kw("insert")
                # INSERT * (r12): insert every source column into its
                # same-named target column, no VALUES list
                if self.at_op("*"):
                    self.advance()
                    not_matched.append(("*", None, cond))
                    continue
                cols = None
                if self.at_op("("):
                    self.advance()
                    cols = [self.ident("column")]
                    while self.eat_op(","):
                        cols.append(self.ident("column"))
                    self.expect_op(")")
                self.expect_kw("values")
                self.expect_op("(")
                exprs = [self.parse_expr()]
                while self.eat_op(","):
                    exprs.append(self.parse_expr())
                self.expect_op(")")
                not_matched.append((cols, exprs, cond))
            else:
                check_reachable(matched, "WHEN MATCHED", tok)
                kind, assigns = upd_or_del()
                matched.append((kind, assigns, cond))
        if not (matched or not_matched or by_source):
            self.error("MERGE requires at least one WHEN clause")
        return Merge(target, source, on, matched, not_matched,
                     by_source)

    # --- SELECT / set ops ---

    def parse_select_statement(self, allow_recursive: bool = False):
        """select (UNION [ALL]|EXCEPT|INTERSECT select)* [order] [limit]
        (flinkdsl/parser.scala:32-40).  A leading WITH (engine
        extension — the reference has no CTEs) is desugared here;
        WITH RECURSIVE (statement level only) is kept intact for
        native rendering."""
        if self.at_kw("with"):
            return self.parse_with_query(allow_recursive)
        left = self.parse_select_core()
        while self.at_kw("union", "except", "intersect"):
            if isinstance(left, Select) and left.order_by and \
                    getattr(left, "_distinct_on", False) and \
                    not getattr(left, "_parened", False):
                # same conflict as the right-arm case below, from the
                # other side: the first arm's ORDER BY fed the
                # DISTINCT ON pick but a set operation follows
                self.error(
                    "DISTINCT ON in a set-operation arm requires "
                    "parentheses around the arm (its ORDER BY would "
                    "otherwise apply to the whole set operation)")
            op = self.advance().lower
            if self.eat_kw("all"):
                op += "_all"
            right = self.parse_select_core()
            left = SetOp(op, left, right)
            # standard compound-select scoping: a trailing ORDER BY/LIMIT
            # parsed by an unparenthesized right operand applies to the
            # whole set operation (the reference grammar also hangs them
            # on the union node, flinkdsl/parser.scala:35-40)
            if isinstance(right, Select) and \
                    not getattr(right, "_parened", False):
                if right.order_by and \
                        getattr(right, "_distinct_on", False):
                    # the DISTINCT ON desugar already consumed this
                    # ORDER BY as the per-group pick, but standard
                    # scoping says it belongs to the whole set op —
                    # the two meanings conflict, so demand parens
                    self.error(
                        "DISTINCT ON in a set-operation arm requires "
                        "parentheses around the arm (its ORDER BY "
                        "would otherwise apply to the whole set "
                        "operation)")
                left.order_by, right.order_by = right.order_by, []
                left.limit, right.limit = right.limit, None
                left.offset, right.offset = right.offset, None
        if isinstance(left, SetOp):
            if self.at_kw("order"):
                lm = left
                while isinstance(lm, SetOp):
                    lm = lm.left
                left.order_by = self.parse_order_by(
                    len(lm.items),
                    any(isinstance(i.expr, Star) for i in lm.items))
            if self.eat_kw("limit"):
                left.limit = self.parse_limit_term()
                if self.eat_kw("offset"):
                    left.offset = self.parse_limit_term()
        # trailing ``FOR UPDATE`` — parsed and DISCARDED, exactly like
        # the reference (flinkdsl/parser.scala:27 ``<~ opt("for".i ~
        # "update".i)``): a JDBC-era row-lock suffix with no meaning in
        # an analytics engine.  Guarded on the following UPDATE so a
        # genuine stray ``for`` still reads as trailing input.
        if self.at_kw("for") and self.peek().kind == "ident" \
                and self.peek().lower == "update":
            self.advance()
            self.advance()
        return left

    def parse_with_query(self, allow_recursive: bool = False):
        """``WITH name AS (query) [, name2 AS (query2)]* query`` —
        non-recursive CTEs (engine extension; no reference grammar).

        Desugared AT PARSE TIME: every reference to a CTE name becomes
        a derived-table COPY of its query (later CTEs see earlier
        ones), so the resolver, both planner paths, and sqlgen all see
        plain relational ASTs they already handle.  A CTE referenced
        twice inlines twice — Catalyst's ReuseExchange dedups identical
        shuffle subplans at the physical layer, the same treatment
        Spark SQL's own default CTE inlining gets."""
        self.expect_kw("with")
        if self.cur.kind == "ident" and self.cur.lower == "recursive":
            if not allow_recursive:
                self.error("WITH RECURSIVE is only supported at "
                           "statement level (not in subqueries)")
            self.advance()
            return self._parse_recursive_with()
        cmap: dict[str, object] = {}
        while True:
            tok = self.cur
            name = self.ident("CTE name")
            if name.lower() in cmap:
                self.error(f"duplicate CTE name {name!r}", tok)
            if self.at_op("("):
                self.error(
                    "CTE column alias lists are not supported — alias "
                    "the columns in the CTE's select list", self.cur)
            self.expect_kw("as")
            self.expect_op("(")
            q = self.parse_select_statement()
            self.expect_op(")")
            if _query_references(q, {name.lower()}):
                self.error(f"recursive CTEs are not supported (CTE "
                           f"{name!r} references itself)", tok)
            _inline_ctes(q, cmap)
            cmap[name.lower()] = q
            if not self.eat_op(","):
                break
        body = self.parse_select_statement()
        _inline_ctes(body, cmap)
        return body

    def _parse_recursive_with(self) -> RecursiveWith:
        """Tail of ``WITH RECURSIVE`` (the keyword already consumed):
        CTEs are NOT inlined — self-references are the point — and the
        whole statement renders as native WITH RECURSIVE SQL on both
        executors (Spark ≥4.0 / DuckDB evaluate the fixpoint with
        their own depth guards).  Column alias lists are allowed here
        (``seq(n)``) because the anchor's names often differ."""
        ctes: list = []
        seen: set = set()
        while True:
            tok = self.cur
            name = self.ident("CTE name")
            if name.lower() in seen:
                self.error(f"duplicate CTE name {name!r}", tok)
            seen.add(name.lower())
            cols = None
            if self.at_op("("):
                self.advance()
                cols = [self.ident("column name")]
                while self.eat_op(","):
                    cols.append(self.ident("column name"))
                self.expect_op(")")
            self.expect_kw("as")
            self.expect_op("(")
            q = self.parse_select_statement()
            self.expect_op(")")
            ctes.append((name, cols, q))
            if not self.eat_op(","):
                break
        body = self.parse_select_statement()
        return RecursiveWith(ctes, body)

    def parse_select_core(self) -> Select:
        if self.eat_op("("):
            sel = self.parse_select_statement()
            self.expect_op(")")
            if isinstance(sel, Select):
                sel._parened = True
            return sel
        self.expect_kw("select")
        hints = []
        while self.cur.kind == "hint":
            hints.extend(self._parse_hint_block(self.advance()))
        distinct = bool(self.eat_kw("distinct"))
        # DISTINCT ON (k, ...) (engine extension, DuckDB/Postgres
        # style): keep ONE row per key group, picked by ORDER BY —
        # desugared below into a hidden row_number QUALIFY, so both
        # planner paths reuse the analytic machinery
        distinct_on: list | None = None
        if distinct and self.at_kw("on") and self.peek().text == "(":
            self.advance()
            self.expect_op("(")
            distinct_on = [self.parse_expr()]
            while self.eat_op(","):
                distinct_on.append(self.parse_expr())
            self.expect_op(")")
            distinct = False
        items = [self.parse_select_item()]
        while self.eat_op(","):
            items.append(self.parse_select_item())
        from_ = None
        if self.eat_kw("from"):
            from_ = self.parse_from()
        where = self.parse_expr() if self.eat_kw("where") else None
        group_by, rollup, having = [], False, None
        cube, grouping_sets = False, None
        if self.eat_kw("group"):
            self.expect_kw("by")
            # engine extensions beyond the reference's `WITH ROLLUP`:
            # function-style ROLLUP(...)/CUBE(...) and GROUPING SETS.
            # All contextual — only consumed in this exact position
            # with the right following tokens, so columns named cube/
            # rollup/grouping still group normally.
            if self.at_kw("rollup", "cube") and \
                    self.peek().kind == "op" and self.peek().text == "(":
                which = self.advance().lower
                group_by = self._parse_paren_expr_list()
                rollup, cube = which == "rollup", which == "cube"
            elif self.at_kw("grouping") and self.peek().kind == "ident" \
                    and self.peek().lower == "sets":
                self.advance()
                self.advance()
                group_by, grouping_sets = self._parse_grouping_sets()
            elif self.eat_kw("all"):
                # GROUP BY ALL (engine extension, DuckDB/Spark-style):
                # desugars at parse time to the ordinals of every
                # select item that contains no aggregate or window
                # function, so both planner paths reuse the r8 ordinal
                # machinery and DuckDB-oracle text stays identical
                from .functions import is_aggregate
                for i, it in enumerate(items):
                    e = it.expr
                    if isinstance(e, Star):
                        self.error("GROUP BY ALL cannot expand * "
                                   "(project explicit columns)")
                    plain = not any(
                        isinstance(x, WindowFunc)
                        or (isinstance(x, FuncCall)
                            and is_aggregate(x.name))
                        for x in walk_expr(e))
                    if plain:
                        group_by.append(Lit(i + 1, "long"))
            else:
                # collate is PER ITEM like the reference
                # (flinkdsl/parser.scala:258 ``rep1sep(term <~
                # opt(collate), ",")``) — parsed, no-op
                group_by = []
                while True:
                    group_by.append(self.parse_expr())
                    if self.eat_kw("collate"):
                        self.ident("collation")
                    if not self.eat_op(","):
                        break
                if self.eat_kw("with"):
                    self.expect_kw("rollup")
                    rollup = True
        # ANSI: HAVING may stand alone — the query becomes a single
        # global group (`select count(*) … having count(*) > 5`)
        if self.eat_kw("having"):
            having = self.parse_expr()
        # QUALIFY (engine extension, DuckDB/Snowflake-style filter on
        # window results) and the named WINDOW clause — accepted in
        # either order (PG puts WINDOW after HAVING; Snowflake puts
        # QUALIFY there too)
        qualify = None
        named_windows: dict[str, tuple] = {}
        while True:
            if qualify is None and self.eat_kw("qualify"):
                qualify = self.parse_expr()
                continue
            if not named_windows and self.at_kw("window") \
                    and self.peek().kind in ("ident", "qident"):
                self.advance()
                while True:
                    wtok = self.cur
                    wname = self.ident("window name")
                    if wname.lower() in named_windows:
                        self.error(f"duplicate window name {wname!r}",
                                   wtok)
                    self.expect_kw("as")
                    self.expect_op("(")
                    named_windows[wname.lower()] = \
                        self.parse_window_body()
                    self.expect_op(")")
                    if not self.eat_op(","):
                        break
                continue
            break
        order_by = self.parse_order_by(
            len(items), any(isinstance(i.expr, Star) for i in items)) \
            if self.at_kw("order") else []
        limit = offset = None
        if self.eat_kw("limit"):
            limit = self.parse_limit_term()
            if self.eat_kw("offset"):
                offset = self.parse_limit_term()
        if distinct_on is not None:
            # desugar: row_number() over (partition by keys order by
            # the query's ORDER BY) = 1.  ORDER BY is required (the
            # per-group pick would be nondeterministic without it) —
            # DuckDB accepts the identical text natively, so oracles
            # compare the same statement.  Ordinals and alias
            # references in ORDER BY are substituted with copies of
            # the item expressions (a window spec cannot see either).
            if not order_by:
                self.error("DISTINCT ON requires ORDER BY (the "
                           "per-group pick is nondeterministic "
                           "without it)")
            if qualify is not None:
                self.error("DISTINCT ON cannot combine with QUALIFY "
                           "(it desugars to one)")
            alias_map = {it.alias.lower(): it.expr
                         for it in items if it.alias}
            win_order = []
            for o in order_by:
                e = o.expr
                if isinstance(e, Lit) and isinstance(e.value, int) \
                        and not isinstance(e.value, bool):
                    pos = int(e.value)
                    if not 1 <= pos <= len(items) \
                            or isinstance(items[pos - 1].expr, Star):
                        self.error(f"ORDER BY position {pos} is not "
                                   "a select-list item")
                    e = items[pos - 1].expr
                elif isinstance(e, Col) and e.qualifier is None \
                        and e.name.lower() in alias_map:
                    e = alias_map[e.name.lower()]
                # pin explicit null placement to DuckDB's default —
                # NULLS LAST for BOTH directions (default_null_order,
                # unlike Postgres' NULLS-FIRST-on-DESC) — when the
                # user gave none: Spark's window default differs and
                # the PICK must match the native DISTINCT ON the
                # oracle runs (verified empirically on nullable keys
                # in both directions)
                nulls = o.nulls or "last"
                win_order.append(OrderItem(copy.deepcopy(e),
                                           o.ascending, None, nulls))
            qualify = BinOp(
                "=",
                WindowFunc(FuncCall("row_number", [], False),
                           partition_by=[copy.deepcopy(k)
                                         for k in distinct_on],
                           order_by=win_order),
                Lit(1, "long"))
        sel = Select(items, from_, where, group_by, rollup, having,
                     order_by, limit, offset, distinct, hints=hints,
                     qualify=qualify, cube=cube,
                     grouping_sets=grouping_sets)
        if distinct_on is not None:
            sel._distinct_on = True    # set-op arm guard marker
        self._resolve_named_windows(sel, named_windows)
        return sel

    def _resolve_named_windows(self, sel: Select, named: dict) -> None:
        """Fill `over w` references from the WINDOW clause, in place —
        after this, downstream stages only ever see inline OVER specs.
        Each reference gets its own COPY of the spec so the resolver's
        per-node binding writes can't alias across uses."""
        exprs = [i.expr for i in sel.items
                 if not isinstance(i.expr, Star)]
        if sel.qualify is not None:
            exprs.append(sel.qualify)
        for e in exprs:
            for x in walk_expr(e):
                if isinstance(x, WindowFunc) and x.ref is not None:
                    spec = named.get(x.ref.lower())
                    if spec is None:
                        self.error(
                            f"undefined window name {x.ref!r} "
                            "(declare it in a WINDOW clause)")
                    p, o, f = copy.deepcopy(spec)
                    x.partition_by, x.order_by, x.frame = p, o, f
                    x.ref = None

    def _parse_paren_expr_list(self) -> list:
        """``( expr [, expr]* )`` — ROLLUP/CUBE key lists."""
        self.expect_op("(")
        out = [self.parse_expr()]
        while self.eat_op(","):
            out.append(self.parse_expr())
        self.expect_op(")")
        return out

    def _parse_grouping_sets(self):
        """``GROUPING SETS ( set [, set]* )`` where a set is
        ``( [expr [, expr]*] )`` or a bare expression (standard SQL
        shorthand for a singleton set; ``()`` is the grand total).
        Returns (union_of_exprs_in_first_appearance_order,
        list_of_index_lists_into_that_union) — the planner feeds both
        straight to DataFrame.groupingSets."""
        self.expect_op("(")
        sets: list[list] = []
        while True:
            if self.eat_op("("):
                exprs = []
                if not self.at_op(")"):
                    exprs.append(self.parse_expr())
                    while self.eat_op(","):
                        exprs.append(self.parse_expr())
                self.expect_op(")")
                sets.append(exprs)
            else:
                sets.append([self.parse_expr()])
            if not self.eat_op(","):
                break
        self.expect_op(")")
        group_by: list = []
        set_idx: list[list[int]] = []
        for s in sets:
            idxs = []
            for e in s:
                for i, g in enumerate(group_by):
                    if g == e:
                        idxs.append(i)
                        break
                else:
                    group_by.append(e)
                    idxs.append(len(group_by) - 1)
            set_idx.append(idxs)
        return group_by, set_idx

    def _parse_hint_block(self, tok: Token) -> list:
        """``/*+ name(arg, ...) [, name(...)] */`` — args are
        identifiers, numbers, or strings; semantics are the planner's
        (engine extension; e.g. ``salt(key, n)`` routes the matching
        equi-join through skew.salted_join)."""
        from .ast_nodes import Hint
        inner = tok.text[3:-2]
        toks = tokenize(inner)
        hints: list = []
        j = 0

        def err(msg, t):
            raise ParseError(f"{msg} in hint (got {t.text!r})",
                             tok.line, tok.col)

        while toks[j].kind != "eof":
            t = toks[j]
            if t.kind != "ident":
                err("expected hint name", t)
            name = t.lower
            j += 1
            args: list = []
            if toks[j].kind == "op" and toks[j].text == "(":
                j += 1
                while not (toks[j].kind == "op" and toks[j].text == ")"):
                    a = toks[j]
                    if a.kind == "eof":
                        err("unclosed hint argument list", a)
                    if a.kind == "ident" or a.kind == "qident":
                        args.append(a.text.strip('"`'))
                    elif a.kind == "number":
                        # int only for digit-runs; '5.' / '2e1' are
                        # float args (planner validation rejects them
                        # where an int is required — hints like
                        # mixture_temperature take genuine floats)
                        args.append(int(a.text) if a.text.isdigit()
                                    else float(a.text))
                    elif a.kind == "string":
                        args.append(a.text[1:-1].replace("''", "'"))
                    else:
                        err("expected hint argument", a)
                    j += 1
                    if toks[j].kind == "op" and toks[j].text == ",":
                        j += 1
                j += 1
            hints.append(Hint(name, args))
            if toks[j].kind == "op" and toks[j].text == ",":
                j += 1
        return hints

    def parse_select_item(self) -> SelectItem:
        # per-item ``ALL`` prefix — parsed and DISCARDED, exactly like
        # the reference's projection grammar (flinkdsl/parser.scala:30
        # ``repsep((opt("all".i) ~> named), ",")``): ALL is the ANSI
        # no-op opposite of DISTINCT.  Safe to eat unconditionally —
        # ``all`` is RESERVED, so it can never start an expression.
        self.eat_kw("all")
        if self.at_op("*"):
            self.advance()
            return SelectItem(Star(None))
        # t.*
        if (self.cur.kind in ("ident", "qident")
                and self.cur.lower not in RESERVED
                and self.peek().kind == "op" and self.peek().text == "."
                and self.peek(2).kind == "op" and self.peek(2).text == "*"):
            qual = self.ident()
            self.advance()  # .
            self.advance()  # *
            return SelectItem(Star(qual))
        expr = self.parse_expr()
        return SelectItem(expr, self.alias_ident())

    def parse_order_by(self, n_items: int = 0,
                       has_star: bool = False) -> list[OrderItem]:
        self.expect_kw("order")
        self.expect_kw("by")
        # ORDER BY ALL [ASC|DESC] (engine extension, DuckDB-style):
        # desugars to the ordinals of every select item, left to right
        # — which is only meaningful when every item is a single named
        # column, so a star in the list is rejected (its expansion
        # width is unknown at parse time and the ordinals would land
        # on the wrong columns)
        if n_items and self.at_kw("all"):
            if has_star:
                self.error("ORDER BY ALL cannot expand * (project "
                           "explicit columns)")
            self.advance()
            asc = True
            if self.eat_kw("desc"):
                asc = False
            else:
                self.eat_kw("asc")
            return [OrderItem(Lit(i + 1, "long"), asc)
                    for i in range(n_items)]
        items = [self.parse_order_item()]
        while self.eat_op(","):
            items.append(self.parse_order_item())
        return items

    def parse_order_item(self) -> OrderItem:
        expr = self.parse_expr()
        collate = None
        if self.eat_kw("collate"):
            collate = self.ident("collation")
        asc = True
        if self.eat_kw("desc"):
            asc = False
        else:
            self.eat_kw("asc")
        nulls = None
        if self.eat_kw("nulls"):
            # explicit null placement (engine extension): the portable
            # escape hatch — Spark defaults asc=NULLS FIRST where most
            # warehouses default NULLS LAST
            if self.eat_kw("first"):
                nulls = "first"
            elif self.eat_kw("last"):
                nulls = "last"
            else:
                self.error("expected FIRST or LAST after NULLS")
        return OrderItem(expr, asc, collate, nulls)

    def parse_limit_term(self):
        if self.at_op("?"):
            self.advance()
            p = Param(self.n_params)
            self.n_params += 1
            return p
        return Lit(self.int_lit("LIMIT/OFFSET"), "long")

    # --- FROM / joins / windows ---

    def _parse_pivot_tail(self, source) -> DerivedTable:
        """``(subquery) PIVOT (agg [AS a], ... FOR col IN (lit [AS n],
        ...)) [alias]`` — desugared here to a CASE-aggregation derived
        table (the FILTER clause's desugar, once per IN value), so
        both planner paths and the DuckDB oracle execute ordinary
        grouped SQL and the output naming is the engine's own rule:
        one unaliased aggregate -> the value label; otherwise
        ``label_aggalias`` (aliases required on multiple aggregates).
        The source must be a subquery with an explicit projection —
        the group columns are everything it projects minus the FOR
        column and the aggregate inputs."""
        pivot_tok = self.cur
        self.advance()
        self.expect_op("(")
        if not isinstance(source, DerivedTable) \
                or not isinstance(source.query, Select):
            self.error("PIVOT requires a subquery source with an "
                       "explicit projection — (select ...) pivot (...)",
                       pivot_tok)
        src_names = []
        for it in source.query.items:
            e = it.expr
            if it.alias:
                src_names.append(it.alias)
            elif isinstance(e, Col):
                src_names.append(e.name)
            else:
                self.error("every PIVOT source column needs a name "
                           "(alias computed projections)", pivot_tok)
        from .functions import is_aggregate
        aggs: list[tuple] = []           # (expr-with-aggs, alias|None)
        while True:
            e = self.parse_expr()
            if not any(isinstance(x, FuncCall) and is_aggregate(x.name)
                       for x in walk_expr(e)):
                self.error("PIVOT expects aggregate expressions",
                           pivot_tok)
            alias = self.ident("aggregate alias") \
                if self.eat_kw("as") else None
            aggs.append((e, alias))
            if not self.eat_op(","):
                break
        if len(aggs) > 1 and any(a is None for _, a in aggs):
            self.error("PIVOT with multiple aggregates requires an "
                       "alias on each (agg(x) AS name)", pivot_tok)
        self.expect_kw("for")
        for_col = self.ident("pivot column")
        self.expect_kw("in")
        self.expect_op("(")
        vals: list[tuple] = []          # (Lit, label)
        while True:
            t = self.cur
            lit = self.parse_expr()
            if not isinstance(lit, Lit):
                self.error("PIVOT IN values must be literals", t)
            if self.eat_kw("as"):
                label = self.ident("value label")
            else:
                label = str(lit.value).lower()
                if not re.fullmatch(r"[a-z_][a-z_0-9]*", label):
                    self.error(
                        f"PIVOT value {lit.value!r} is not a valid "
                        "column label — add AS name", t)
            vals.append((lit, label))
            if not self.eat_op(","):
                break
        self.expect_op(")")
        self.expect_op(")")
        alias = self.alias_ident() or source.alias

        agg_inputs = set()
        for e, _ in aggs:
            for x in walk_expr(e):
                if isinstance(x, Col):
                    agg_inputs.add(x.name.lower())
        if for_col.lower() not in {n.lower() for n in src_names}:
            self.error(f"PIVOT column {for_col!r} is not projected by "
                       "the source subquery", pivot_tok)
        group_names = [n for n in src_names
                       if n.lower() != for_col.lower()
                       and n.lower() not in agg_inputs]
        items = [SelectItem(Col(n), None) for n in group_names]
        seen = {n.lower() for n in group_names}
        for lit, label in vals:
            for e, agg_alias in aggs:
                out = label if agg_alias is None \
                    else f"{label}_{agg_alias}"
                if out.lower() in seen:
                    self.error(f"duplicate PIVOT output column "
                               f"{out!r}", pivot_tok)
                seen.add(out.lower())
                ev = copy.deepcopy(e)
                for x in walk_expr(ev):
                    if isinstance(x, FuncCall) \
                            and is_aggregate(x.name):
                        cond = BinOp("=", Col(for_col),
                                     copy.deepcopy(lit))
                        x.args = [
                            Case([(copy.deepcopy(cond),
                                   Lit(1, "long")
                                   if isinstance(a, Star) else a)],
                                 None)
                            for a in (x.args or [Star(None)])]
                items.append(SelectItem(ev, out))
        inner = Select(items, source, None,
                       [Col(n) for n in group_names], False, None,
                       [], None, None, False)
        return DerivedTable(inner, alias)

    def _parse_unpivot_tail(self, source) -> DerivedTable:
        """``(subquery) UNPIVOT [INCLUDE NULLS] (val FOR name IN (c1
        [AS 'label'], ...)) [alias]`` — columns-to-rows rotation,
        desugared to a UNION ALL chain (one FROM-less-filtered select
        per IN column over the shared source), so both planner paths
        and the oracle execute ordinary SQL.  ANSI default EXCLUDEs
        NULL measure values; INCLUDE NULLS keeps them."""
        unpivot_tok = self.cur
        self.advance()
        include_nulls = False
        if self.eat_kw("include"):
            self.expect_kw("nulls")
            include_nulls = True
        self.expect_op("(")
        if not isinstance(source, DerivedTable) \
                or not isinstance(source.query, Select):
            self.error("UNPIVOT requires a subquery source with an "
                       "explicit projection — (select ...) unpivot "
                       "(...)", unpivot_tok)
        src_names = []
        for it in source.query.items:
            e = it.expr
            if it.alias:
                src_names.append(it.alias)
            elif isinstance(e, Col):
                src_names.append(e.name)
            else:
                self.error("every UNPIVOT source column needs a name "
                           "(alias computed projections)", unpivot_tok)
        val_col = self.ident("value column name")
        self.expect_kw("for")
        name_col = self.ident("name column name")
        self.expect_kw("in")
        self.expect_op("(")
        cols: list[tuple[str, str]] = []      # (source col, label)
        lower_src = {n.lower() for n in src_names}
        while True:
            t = self.cur
            c = self.ident("unpivot column")
            if c.lower() not in lower_src:
                self.error(f"UNPIVOT column {c!r} is not projected "
                           "by the source subquery", t)
            if self.eat_kw("as"):
                lt = self.cur
                if lt.kind != "string":
                    self.error("UNPIVOT label must be a string "
                               "literal", lt)
                self.advance()
                label = lt.text[1:-1].replace("''", "'")
            else:
                label = c
            cols.append((c, label))
            if not self.eat_op(","):
                break
        self.expect_op(")")
        self.expect_op(")")
        alias = self.alias_ident() or source.alias

        keep = [n for n in src_names
                if n.lower() not in {c.lower() for c, _ in cols}]
        legs = []
        for c, label in cols:
            items = [SelectItem(Col(n), None) for n in keep]
            items.append(SelectItem(Lit(label, "string"), name_col))
            items.append(SelectItem(Col(c), val_col))
            where = None if include_nulls \
                else IsNull(Col(c), negated=True)
            legs.append(Select(items, copy.deepcopy(source), where,
                               [], False, None, [], None, None, False))
        q = legs[0]
        for leg in legs[1:]:
            q = SetOp("union_all", q, leg)
        return DerivedTable(q, alias)

    def parse_from(self):
        """from t1 [, t2 ...] with joins; comma = implicit cross join
        (flinkdsl/parser.scala:31)."""
        rel = self.parse_joinable()
        while self.eat_op(","):
            rel = Join(rel, self.parse_joinable(), "cross")
        return rel

    def _attach_rotation_tail(self, rel):
        """PIVOT/UNPIVOT tails (engine extension): contextual, only
        consumed when followed by `(` (or INCLUDE for UNPIVOT) — and
        attachable to EITHER side of a join."""
        if self.at_kw("pivot") and self.peek().kind == "op" \
                and self.peek().text == "(":
            return self._parse_pivot_tail(rel)
        if self.at_kw("unpivot") and (
                (self.peek().kind == "op" and self.peek().text == "(")
                or self.peek().lower == "include"):
            return self._parse_unpivot_tail(rel)
        return rel

    def parse_joinable(self):
        rel = self._attach_rotation_tail(self.parse_relation_primary())
        while True:
            kind = self.peek_join_kind()
            if kind is None:
                return rel
            right = self._attach_rotation_tail(
                self.parse_relation_primary())
            on = using = None
            if kind != "cross":
                if self.eat_kw("on"):
                    on = self.parse_expr()
                elif self.eat_kw("using"):
                    # B dialect: USING (c1, ...); F dialect: USING col
                    # (fsql/parser.scala:199-202, flinkdsl/parser.scala:103-107)
                    if self.eat_op("("):
                        using = [self.ident("column")]
                        while self.eat_op(","):
                            using.append(self.ident("column"))
                        self.expect_op(")")
                    else:
                        using = [self.ident("column")]
            rel = Join(rel, right, kind, on, using)

    def peek_join_kind(self) -> str | None:
        """Consume join keywords and return kind, or None.
        Default INNER when bare JOIN (flinkdsl/parser.scala:98)."""
        if self.eat_kw("join"):
            return "inner"
        for kw, kind in (("inner", "inner"), ("left", "left"),
                         ("right", "right"), ("full", "full"),
                         ("cross", "cross")):
            if self.at_kw(kw):
                self.advance()
                # LEFT SEMI / LEFT ANTI (engine extension): existence
                # filtering with left-side output columns only
                if kind == "left" and self.at_kw("semi", "anti"):
                    kind = self.advance().lower
                elif kind in ("left", "right", "full"):
                    self.eat_kw("outer")
                self.expect_kw("join")
                return kind
        return None

    def parse_relation_primary(self):
        # LATERAL (select ...) alias — engine extension; contextual
        # (only consumed before a parenthesized subquery)
        if self.at_kw("lateral") and self.peek().kind == "op" \
                and self.peek().text == "(":
            self.advance()
            self.expect_op("(")
            q = self.parse_select_statement()
            self.expect_op(")")
            alias = self.alias_ident()
            if alias is None:
                self.error("LATERAL subquery requires an alias")
            # parse the suffix so the rejection is the CLEAR sqlgen
            # one (LATERAL always compiles on the SQL-text path,
            # where TABLESAMPLE has no form) instead of a generic
            # trailing-input parse error
            return DerivedTable(q, alias, None, lateral=True,
                                sample=self.parse_tablesample())
        if self.at_op("("):
            # lookahead: derived table (select/with/values) vs
            # parenthesized join
            if self._paren_starts_select():
                self.expect_op("(")
                if self.at_kw("values"):
                    return self._parse_values_table()
                q = self.parse_select_statement()
                self.expect_op(")")
                window = self.parse_window_spec() if self.at_op("[") else None
                alias = self.alias_ident()
                if alias is None:
                    # `(select ...) PIVOT/UNPIVOT (...)` may omit the
                    # source alias (the rotation output is what gets
                    # named); synthesize one so the tail desugars
                    # normally — mirror parse_joinable's tail guard
                    if self.at_kw("pivot", "unpivot") and (
                            (self.peek().kind == "op"
                             and self.peek().text == "(")
                            or (self.cur.lower == "unpivot"
                                and self.peek().lower == "include")):
                        # unique per statement: two aliasless rotated
                        # sources in one FROM must not collide in the
                        # resolver's binding map
                        self._pivot_srcs += 1
                        alias = f"_pivot_src{self._pivot_srcs}"
                    else:
                        self.error("derived table requires an alias")
                return DerivedTable(q, alias, window,
                                    sample=self.parse_tablesample())
            self.expect_op("(")
            rel = self.parse_from()
            self.expect_op(")")
            # mirror the LATERAL branch: consume a TABLESAMPLE suffix
            # so the user gets a CLEAR named rejection instead of a
            # generic trailing-input error — relation-level sampling
            # is defined on base relations and derived tables, not on
            # a parenthesized join (which relation's id column would
            # seed the hash?)
            if self.at_kw("tablesample"):
                self.error(
                    "TABLESAMPLE is not supported on a parenthesized "
                    "join — apply it to the base relation or wrap the "
                    "join in a derived table (select * from ...) t")
            return rel
        name = self.ident("stream/table name")
        window = self.parse_window_spec() if self.at_op("[") else None
        alias = self.alias_ident()
        if window is None and self.at_op("["):
            window = self.parse_window_spec()
        return TableRef(name, alias, window,
                        sample=self.parse_tablesample())

    def parse_tablesample(self):
        """``TABLESAMPLE(id_col, permille)`` relation suffix (engine
        extension): deterministic Bernoulli subsample of ONE relation
        — the seeded md5 hash-residue membership rule of the sample
        hint (q91), but applied at the RELATION, before any join or
        WHERE ("sample one side of a join").  Returns (col, permille)
        or None; the column resolves at plan time against the
        relation's own output."""
        if not self.at_kw("tablesample"):
            return None
        self.advance()
        self.expect_op("(")
        col = self.ident("tablesample id column")
        self.expect_op(",")
        t = self.cur
        permille = self.int_lit("permille in TABLESAMPLE")
        if not 1 <= permille <= 999:
            self.error("TABLESAMPLE permille must be between 1 and "
                       "999", t)
        self.expect_op(")")
        return (col, permille)

    def _paren_starts_select(self) -> bool:
        j = self.i
        depth = 0
        while j < len(self.tokens):
            t = self.tokens[j]
            if t.kind == "op" and t.text == "(":
                depth += 1
                j += 1
                continue
            if depth >= 1:
                return t.kind == "ident" and t.lower in (
                    "select", "with", "values")
            j += 1
        return False

    def _parse_values_table(self) -> DerivedTable:
        """``( VALUES (r1c1, …) [, …] ) [AS] alias [(col, …)]`` —
        inline literal relation (engine extension).  Desugared to a
        UNION ALL chain of FROM-less selects, so the resolver, both
        planner paths, and sqlgen reuse existing machinery (the same
        treatment WITH gets)."""
        self.expect_kw("values")
        rows: list[list] = []
        while True:
            self.expect_op("(")
            row = [self.parse_expr()]
            while self.eat_op(","):
                row.append(self.parse_expr())
            self.expect_op(")")
            rows.append(row)
            if not self.eat_op(","):
                break
        self.expect_op(")")
        alias = self.alias_ident()
        if alias is None:
            self.error("VALUES table requires an alias")
        cols = None
        if self.at_op("("):
            self.advance()
            cols = [self.ident("column alias")]
            while self.eat_op(","):
                cols.append(self.ident("column alias"))
            self.expect_op(")")
        n = len(rows[0])
        names = cols or [f"col{i + 1}" for i in range(n)]
        if len(names) != n:
            self.error(f"VALUES table has {n} columns but "
                       f"{len(names)} aliases")
        for r in rows:
            if len(r) != n:
                self.error(
                    f"VALUES rows must all have {n} expressions")
        q = None
        for r in rows:
            s = Select([SelectItem(e, names[i])
                        for i, e in enumerate(r)])
            q = s if q is None else SetOp("union_all", q, s)
        return DerivedTable(q, alias)

    def parse_window_spec(self) -> WindowSpec:
        """[size N [unit] [on col] [every M [unit] [on col]]
        [partitioned on col]]  (fsql/parser.scala:157-176)."""
        self.expect_op("[")
        kind = "session" if self.eat_kw("session") else "size"
        if kind == "size":
            self.expect_kw("size")
        size = self.parse_policy()
        every = None
        if self.eat_kw("every"):
            every = self.parse_policy()
        partition = None
        if self.eat_kw("partitioned"):
            self.expect_kw("on")
            partition = self.parse_column_ref()
        self.expect_op("]")
        return WindowSpec(size, every, partition, kind)

    def parse_policy(self) -> Policy:
        value = self.int_lit("window size")
        unit = None
        t = self.cur
        if t.kind == "ident" and t.lower in TIME_UNITS:
            self.advance()
            unit = {"millisec": "milisec"}.get(t.lower, t.lower)
        on_col = None
        if self.eat_kw("on"):
            on_col = self.parse_column_ref()
        return Policy(value, unit, on_col)

    def parse_column_ref(self) -> Col:
        a = self.ident("column")
        if self.at_op(".") and self.peek().kind in ("ident", "qident"):
            self.advance()
            b = self.ident("column")
            return Col(b, qualifier=a)
        return Col(a)

    # --- expressions (standard SQL precedence) ---

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at_kw("or") or self.at_op("||"):
            self.advance()
            left = BinOp("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_kw("and") or self.at_op("&&"):
            self.advance()
            left = BinOp("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.eat_kw("not") or self.eat_op("!"):
            return UnOp("not", self.parse_not())
        return self.parse_predicate()

    def parse_predicate(self):
        """Comparisons + LIKE/BETWEEN/IS NULL/IN/EXISTS
        (fsql/parser.scala:217-233, flinkdsl/parser.scala:125-150)."""
        if self.at_kw("exists"):
            self.advance()
            return Exists(self.parse_subquery())
        if self.at_kw("not") and self.peek().lower == "exists":
            self.advance()
            self.advance()
            return Exists(self.parse_subquery(), negated=True)
        left = self.parse_bitwise()
        while True:
            if self.at_op("=", "!=", "<>", "<", ">", "<=", ">=", "===", "!=="):
                op = self.advance().text
                op = {"<>": "!=", "===": "=", "!==": "!="}.get(op, op)
                # quantified comparison: cmp ALL|ANY|SOME (select ...)
                # — contextual keywords, only taken when a subquery
                # follows (so a column/function named "any" still
                # parses as the comparison's right operand)
                if self.at_kw("all", "any", "some"):
                    nxt, nxt2 = self.peek(), self.peek(2)
                    if nxt.kind == "op" and nxt.text == "(" \
                            and (nxt2.lower in ("select", "with")
                                 or (nxt2.kind == "op"
                                     and nxt2.text == "(")):
                        quant = "all" if self.cur.lower == "all" \
                            else "any"
                        self.advance()
                        q = self.parse_subquery()
                        left = QuantifiedCmp(op, left, quant, q)
                        continue
                left = BinOp(op, left, self.parse_bitwise())
                continue
            negated = False
            save = self.i
            if self.eat_kw("not"):
                negated = True
            if self.eat_kw("like"):
                left = BinOp("like", left, self.parse_bitwise())
                if negated:
                    left = UnOp("not", left)
                continue
            if self.eat_kw("ilike"):
                # case-insensitive LIKE (engine extension) — native
                # on Spark (>=3.3) and DuckDB
                left = BinOp("ilike", left, self.parse_bitwise())
                if negated:
                    left = UnOp("not", left)
                continue
            if self.eat_kw("between"):
                lo = self.parse_bitwise()
                self.expect_kw("and")
                hi = self.parse_bitwise()
                left = Between(left, lo, hi, negated)
                continue
            if self.eat_kw("in"):
                self.expect_op("(")
                if self.at_kw("select"):
                    q = self.parse_select_statement()
                    self.expect_op(")")
                    left = InSubquery(left, q, negated)
                else:
                    items = [self.parse_expr()]
                    while self.eat_op(","):
                        items.append(self.parse_expr())
                    self.expect_op(")")
                    left = InList(left, items, negated)
                continue
            if negated:
                self.i = save           # bare NOT belongs to parse_not
                return left
            if self.eat_kw("is"):
                neg = bool(self.eat_kw("not"))
                # IS [NOT] DISTINCT FROM — null-safe comparison
                # (engine extension; `distinct` is reserved so this
                # cannot collide with IS NULL)
                if self.eat_kw("distinct"):
                    self.expect_kw("from")
                    right = self.parse_bitwise()
                    left = BinOp("<=>", left, right)
                    if not neg:
                        left = UnOp("not", left)
                    continue
                self.expect_kw("null")
                left = IsNull(left, neg)
                continue
            return left

    def parse_subquery(self) -> Select:
        self.expect_op("(")
        q = self.parse_select_statement()
        self.expect_op(")")
        return q

    def parse_bitwise(self):
        """| & ^ << >> as infix (flinkdsl/parser.scala:220-228).  Placed
        below comparisons, above additive — matches B dialect."""
        left = self.parse_additive()
        while self.at_op("|", "&", "^", "<<", ">>"):
            op = self.advance().text
            left = BinOp(op, left, self.parse_additive())
        return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.at_op("+", "-"):
            op = self.advance().text
            left = BinOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.advance().text
            left = BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.eat_op("-"):
            return UnOp("-", self.parse_unary())
        if self.eat_op("+"):
            return self.parse_unary()
        if self.eat_op("~"):
            return UnOp("~", self.parse_unary())
        return self.parse_term()

    def parse_term(self):
        e = self._parse_term_core()
        # postfix subscript (engine extension): 1-based array element
        # access — `embedding[3]`, chainable.  Unambiguous here:
        # stream-window `[size …]` brackets attach to RELATIONS in
        # FROM, never to expressions.
        while self.at_op("["):
            self.advance()
            idx = self.parse_expr()
            self.expect_op("]")
            e = Subscript(e, idx)
        return e

    def _parse_term_core(self):
        t = self.cur
        if t.kind == "number":
            self.advance()
            txt = t.text.rstrip()
            if "." in txt or "e" in txt or "E" in txt:
                return Lit(float(txt), "double")
            return Lit(int(txt), "long")
        if t.kind == "string":
            self.advance()
            return Lit(t.text[1:-1].replace("''", "'"), "string")
        if self.at_op("?"):
            self.advance()
            p = Param(self.n_params)
            self.n_params += 1
            return p
        if self.at_kw("true"):
            self.advance()
            return Lit(True, "boolean")
        if self.at_kw("false"):
            self.advance()
            return Lit(False, "boolean")
        if self.at_kw("null"):
            self.advance()
            return Lit(None, "null")
        if self.at_kw("case"):
            return self.parse_case()
        if self.at_op("("):
            if self._paren_starts_select():
                return ScalarSubquery(self.parse_subquery())
            self.advance()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "ident" and t.lower == "interval" \
                and self.peek().kind in ("number", "string"):
            # `interval 90 day` / `interval '90' day` (engine
            # extension) — contextual like the typed literals
            self.advance()
            v = self.cur
            self.advance()
            txt = v.text[1:-1] if v.kind == "string" else v.text
            try:
                n = int(txt)
            except ValueError:
                self.error("interval value must be an integer", v)
            u = self.cur
            if u.kind != "ident" or u.lower.rstrip("s") not in (
                    "year", "month", "week", "day", "hour", "minute",
                    "second"):
                self.error("expected an interval unit "
                           "(year/month/week/day/hour/minute/second)")
            self.advance()
            return IntervalLit(n, u.lower.rstrip("s").upper())
        if t.kind == "ident" and t.lower in ("date", "timestamp") \
                and self.peek().kind == "string":
            # typed literal (engine extension): `date '1995-01-01'` /
            # `timestamp '1995-01-01 12:00:00'` — sugar for
            # CAST('...' AS date|timestamp), so both planner paths and
            # both executors get it for free.  Contextual: only an
            # immediately-following string literal triggers it, so a
            # column named date still parses.
            self.advance()
            s = self.cur
            self.advance()
            return Cast(Lit(s.text[1:-1].replace("''", "'"), "string"),
                        t.lower)
        if t.kind in ("ident", "qident"):
            return self.parse_name_or_call()
        self.error("expected an expression term")

    def parse_case(self) -> Case:
        self.expect_kw("case")
        whens = []
        while self.eat_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        if not whens:
            self.error("CASE requires at least one WHEN")
        else_ = self.parse_expr() if self.eat_kw("else") else None
        self.expect_kw("end")
        return Case(whens, else_)

    def parse_name_or_call(self):
        """ident | ident.ident | ident(args) — function names may be any
        identifier incl. agg names (fsql/parser.scala:239-242)."""
        t = self.cur
        name = self.ident("identifier")
        if self.at_op("("):
            self.advance()
            if name.lower() == "cast":
                return self.parse_cast_tail()
            if name.lower() == "extract":
                return self.parse_extract_tail()
            distinct = bool(self.eat_kw("distinct"))
            args: list = []
            if self.at_op("*"):
                self.advance()
                args = [Star(None)]
            elif not self.at_op(")"):
                args = [self.parse_expr()]
                while self.eat_op(","):
                    args.append(self.parse_expr())
            self.expect_op(")")
            call = FuncCall(name.lower(), args, distinct)
            # ANSI aggregate FILTER (engine extension).  Contextual:
            # only consumed when followed by `( where`.  Desugared to
            # CASE so both planner paths reuse existing machinery —
            # exact for null-IGNORING aggregates (count(*) counts a
            # literal 1 under the predicate); first/last/any_value are
            # order-sensitive null-keepers and are rejected.
            if self.at_kw("filter"):
                nxt, nxt2 = self.peek(), self.peek(2)
                if nxt.kind == "op" and nxt.text == "(" \
                        and nxt2.lower == "where":
                    from .functions import is_aggregate
                    if not is_aggregate(call.name):
                        self.error("FILTER is only valid on an "
                                   "aggregate function", t)
                    if call.name in ("first", "last", "any_value"):
                        self.error(
                            f"FILTER on {call.name}() is not supported "
                            "(it keeps nulls; filter in WHERE or a "
                            "derived table instead)", t)
                    self.advance()
                    self.expect_op("(")
                    self.expect_kw("where")
                    pred = self.parse_expr()
                    self.expect_op(")")
                    new_args = [
                        Case([(pred, Lit(1, "long")
                               if isinstance(a, Star) else a)], None)
                        for a in (call.args or [Star(None)])]
                    call = FuncCall(call.name, new_args, call.distinct)
            # null-treatment clause (r11): ``func(...) IGNORE NULLS
            # OVER ...`` — Spark's post-paren spelling (DuckDB puts it
            # inside the parens; sqlgen renders each engine's own).
            # RESPECT NULLS is the default and parses as a no-op.
            # Contextual like `over`: consumed only when NULLS
            # follows, so columns named ignore/respect still parse.
            ignore_nulls = False
            nt_seen = False
            if self.at_kw("ignore", "respect") \
                    and self.peek().kind == "ident" \
                    and self.peek().lower == "nulls":
                nt_tok = self.cur
                nt_seen = True
                ignore_nulls = self.cur.lower == "ignore"
                self.advance()
                self.advance()
                if not self.at_kw("over"):
                    self.error("IGNORE/RESPECT NULLS requires an OVER "
                               "clause", nt_tok)
            # engine extension (§2.5): analytic OVER clause.  `over` is
            # contextual — only consumed when followed by `(` or a
            # window NAME (a bare non-reserved ident), so a column
            # aliased "over" still parses.
            if self.at_kw("over"):
                nxt = self.peek()
                if nxt.kind == "op" and nxt.text == "(":
                    self.advance()
                    return self.parse_over_clause(call, ignore_nulls)
                if nxt.kind in ("ident", "qident") \
                        and nxt.lower not in RESERVED:
                    self.advance()
                    return WindowFunc(call, ignore_nulls=ignore_nulls,
                                      ref=self.ident("window name"))
            if nt_seen:
                # a parsed null treatment must not be silently dropped
                # when `over` is present but malformed (e.g. `over
                # from` — `over` would re-parse as a column alias)
                self.error("IGNORE/RESPECT NULLS requires an OVER "
                           "clause", nt_tok)
            return call
        if self.at_op(".") and self.peek().kind in ("ident", "qident") \
                and self.peek().lower not in RESERVED:
            self.advance()
            col = self.ident("column")
            return Col(col, qualifier=name)
        _ = t
        return Col(name)

    # ANSI spellings accepted in CAST and normalized to the DDL
    # palette (late r8 — `cast(x as bigint)` reads more portably
    # than `as long` and DuckDB oracle text uses them)
    _CAST_TYPE_SYNONYMS = {
        "bigint": "long", "integer": "int", "smallint": "short",
        "tinyint": "byte", "varchar": "string", "real": "float",
        "numeric": "decimal", "bool": "boolean",
    }

    def parse_cast_tail(self) -> Cast:
        """``CAST( expr AS type )`` with the opening paren already
        consumed (engine extension — the reference has no cast
        expression; the type palette is the DDL one,
        fsql/parser.scala:355, plus ``decimal(p, s)`` and the ANSI
        synonyms above)."""
        expr = self.parse_expr()
        self.expect_kw("as")
        t = self.cur
        if t.kind == "ident" and t.lower in self._CAST_TYPE_SYNONYMS:
            import dataclasses
            t = dataclasses.replace(
                t, text=self._CAST_TYPE_SYNONYMS[t.lower])
        if t.kind != "ident" or t.lower not in TYPE_NAMES:
            self.error("expected a type name")
        self.advance()
        precision = scale = None
        if t.lower == "decimal" and self.eat_op("("):
            precision = self.int_lit("decimal precision")
            scale = self.int_lit("decimal scale") if self.eat_op(",") \
                else 0
            self.expect_op(")")
        self.expect_op(")")
        return Cast(expr, t.lower, precision, scale)

    # fields whose extraction function exists under the SAME name in
    # both Spark and DuckDB, so EXTRACT desugars to a plain FuncCall
    # that each executor resolves natively
    _EXTRACT_FIELDS = {"year", "month", "day", "hour", "minute",
                       "second", "quarter"}

    def parse_extract_tail(self) -> FuncCall:
        """``EXTRACT( field FROM expr )`` with the opening paren
        consumed — sugar for ``field(expr)`` (engine extension)."""
        f = self.cur
        if f.kind != "ident" or f.lower not in self._EXTRACT_FIELDS:
            self.error("expected an extract field "
                       "(year/month/day/hour/minute/second/quarter)")
        self.advance()
        self.expect_kw("from")
        e = self.parse_expr()
        self.expect_op(")")
        return FuncCall(f.lower, [e])

    def parse_over_clause(self, call: FuncCall,
                          ignore_nulls: bool = False) -> WindowFunc:
        """``OVER ( [PARTITION BY e,...] [ORDER BY o,...] [frame] )``
        (engine extension; the reference grammar has no analytic
        windows — SURVEY.md §2.5)."""
        self.expect_op("(")
        partition, order, frame = self.parse_window_body()
        self.expect_op(")")
        return WindowFunc(call, partition, order, frame,
                          ignore_nulls=ignore_nulls)

    def parse_window_body(self):
        """The inside of an OVER ( ... ) or WINDOW w AS ( ... ) spec."""
        partition: list = []
        order: list = []
        frame = None
        if self.eat_kw("partition"):
            self.expect_kw("by")
            partition = [self.parse_expr()]
            while self.eat_op(","):
                partition.append(self.parse_expr())
        if self.at_kw("order"):
            order = self.parse_order_by()
        if self.at_kw("rows", "range"):
            frame = self.parse_window_frame()
        return partition, order, frame

    def parse_window_frame(self) -> WindowFrame:
        mode = self.cur.lower
        self.advance()
        if self.eat_kw("between"):
            start = self.parse_frame_bound()
            self.expect_kw("and")
            end = self.parse_frame_bound()
        else:
            # ANSI shorthand: a lone start bound implies CURRENT ROW
            # end — so only UNBOUNDED PRECEDING / n PRECEDING /
            # CURRENT ROW may stand alone (a lone FOLLOWING would be
            # an inverted, always-empty frame)
            start = self.parse_frame_bound()
            if start[0] in ("following", "unbounded_following"):
                self.error("a lone frame bound cannot be FOLLOWING "
                           "(use BETWEEN ... AND ...)")
            end = ("current",)
        return WindowFrame(mode, start, end)

    def parse_frame_bound(self) -> tuple:
        if self.eat_kw("unbounded"):
            if self.eat_kw("preceding"):
                return ("unbounded_preceding",)
            self.expect_kw("following")
            return ("unbounded_following",)
        if self.eat_kw("current"):
            self.expect_kw("row")
            return ("current",)
        t = self.cur
        txt = self.number_lit()
        try:
            n = int(txt)
        except ValueError:
            raise ParseError("frame bound must be an integer",
                             t.line, t.col)
        if self.eat_kw("preceding"):
            return ("preceding", n)
        self.expect_kw("following")
        return ("following", n)


# --------------------------------------------------------------------------
# CTE inlining (WITH desugar — see Parser.parse_with_query)
# --------------------------------------------------------------------------

def _query_exprs(q):
    """Every expression position of a Select that can hold a subquery
    (select items, WHERE/HAVING/QUALIFY, GROUP/ORDER keys, join
    conditions) — mirrors planner._expr_subqueries' position list."""
    exprs = [i.expr for i in q.items if not isinstance(i.expr, Star)] \
        + list(q.group_by) + [o.expr for o in q.order_by]
    for opt in (q.where, q.having, q.qualify):
        if opt is not None:
            exprs.append(opt)
    if q.from_ is not None:
        def join_conds(rel):
            if isinstance(rel, Join):
                yield from join_conds(rel.left)
                yield from join_conds(rel.right)
                if rel.on is not None:
                    yield rel.on
        exprs.extend(join_conds(q.from_))
    return exprs


def _inline_ctes(q, cmap: dict) -> None:
    """Replace every reference to a CTE name with a derived-table COPY
    of its query, in place — set-op branches, FROM trees, and
    expression-position subqueries included.  The inlined copy is NOT
    re-scanned: a CTE body's own table references were already
    resolved against the names visible when IT was parsed (standard
    non-recursive scoping)."""
    if not cmap:
        return
    if isinstance(q, SetOp):
        _inline_ctes(q.left, cmap)
        _inline_ctes(q.right, cmap)
        return
    if q.from_ is not None:
        q.from_ = _inline_rel(q.from_, cmap)
    for e in _query_exprs(q):
        for x in walk_expr(e):
            if isinstance(x, (InSubquery, Exists, ScalarSubquery, QuantifiedCmp)):
                _inline_ctes(x.query, cmap)


def _inline_rel(rel, cmap: dict):
    if isinstance(rel, Join):
        rel.left = _inline_rel(rel.left, cmap)
        rel.right = _inline_rel(rel.right, cmap)
        return rel
    if isinstance(rel, DerivedTable):
        _inline_ctes(rel.query, cmap)
        return rel
    if isinstance(rel, TableRef):
        hit = cmap.get(rel.name.lower())
        if hit is None:
            return rel
        # window specs and TABLESAMPLE suffixes ride through:
        # DerivedTable carries both (the derived-continuous-view
        # path, q33's shape; dropping `sample` here silently ran the
        # query UNSAMPLED — r13 review finding)
        return DerivedTable(copy.deepcopy(hit), rel.alias or rel.name,
                            rel.window, sample=rel.sample)
    return rel


def _query_references(q, names: set) -> bool:
    """True if any TableRef anywhere in the query tree names one of
    ``names`` (case-insensitive) — the recursive-CTE detector."""
    if isinstance(q, SetOp):
        return _query_references(q.left, names) \
            or _query_references(q.right, names)
    if q.from_ is not None:
        for leaf in relation_leaves(q.from_):
            if isinstance(leaf, TableRef) and leaf.name.lower() in names:
                return True
            if isinstance(leaf, DerivedTable) \
                    and _query_references(leaf.query, names):
                return True
    for e in _query_exprs(q):
        for x in walk_expr(e):
            if isinstance(x, (InSubquery, Exists, ScalarSubquery, QuantifiedCmp)) \
                    and _query_references(x.query, names):
                return True
    return False


def parse(sql: str):
    """Parse one statement (parity: FsqlParser.parseAllWith,
    fsql/parser.scala:12-17)."""
    return Parser(sql).parse()


def parse_many(sql: str) -> list:
    """Parse a ;-separated script."""
    out = []
    p = Parser(sql)
    while p.cur.kind != "eof":
        out.append(p.parse_statement())
        if not p.eat_op(";"):
            break
    if p.cur.kind != "eof":
        p.error("unexpected trailing input")
    return out
