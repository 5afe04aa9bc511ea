"""AST -> SQL text generation.

Used for (a) the subquery execution path — statements with IN/EXISTS/
scalar subqueries compile to Spark SQL text so Catalyst performs the
decorrelation (the documented Spark primitive, SURVEY.md §2.2/§3.2) —
and (b) round-trip debugging.  Supports the batch-relational subset;
stream window specs have no SQL-text form and raise.

``dialect``: 'spark' (backtick idents) or 'ansi' (double-quoted idents,
DuckDB-compatible) — the latter lets tests derive oracle SQL from the
same AST that the engine executes.
"""

from __future__ import annotations

from .ast_nodes import (
    Between, BinOp, Case, Cast, Col, DerivedTable, Exists, FuncCall,
    InList, InSubquery, IntervalLit, IsNull, Join, Lit, Param,
    QuantifiedCmp, RecursiveWith, ScalarSubquery, Select, SetOp, Star,
    Subscript, TableRef, UnOp, WindowFunc, expr_children,
    null_treatment_error, walk_expr,
)
from .errors import PlanError, UnsupportedError

# comparison-operator negations for the quantifier duality rewrite
# (¬(x cmp q S) ≡ x ¬cmp q̄ S — exact in 3VL)
_NEGATED_CMP = {"=": "!=", "!=": "=", "<": ">=", ">=": "<",
                ">": "<=", "<=": ">"}

_IDENT_SAFE = set("abcdefghijklmnopqrstuvwxyz0123456789_")

# CAST target spellings accepted by BOTH Spark SQL and DuckDB (STRING,
# TINYINT, and BINARY are DuckDB aliases of VARCHAR/INT1/BLOB).
# Parameterless decimal renders its (38, 18) default explicitly so the
# SQL path matches the native path's DecimalType(38, 18).
_CAST_SQL_TYPES = {
    "int": "INT", "string": "STRING", "character": "STRING",
    "double": "DOUBLE", "date": "DATE", "byte": "TINYINT",
    "short": "SMALLINT", "long": "BIGINT", "float": "FLOAT",
    "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
    "decimal": "DECIMAL(38, 18)", "binary": "BINARY",
}


class SqlGen:
    def __init__(self, params: list | None = None, dialect: str = "spark"):
        self.params = params or []
        self.dialect = dialect
        # QUALIFY alias substitution: lowercase projection alias ->
        # item expression AST, consulted in expr()'s Col branch while
        # the QUALIFY predicate renders (None otherwise)
        self._alias_subst: dict | None = None
        # quantified-comparison rewrite: unique alias counter for the
        # generated one-column derived tables
        self._qn = 0

    # --- identifiers / literals ---

    @staticmethod
    def _frame_bound(b: tuple) -> str:
        return {"unbounded_preceding": "UNBOUNDED PRECEDING",
                "unbounded_following": "UNBOUNDED FOLLOWING",
                "current": "CURRENT ROW"}.get(
            b[0], f"{b[1] if len(b) > 1 else 0} "
                  f"{'PRECEDING' if b[0] == 'preceding' else 'FOLLOWING'}")

    def ident(self, name: str) -> str:
        if name and all(ch in _IDENT_SAFE for ch in name.lower()):
            return name
        q = "`" if self.dialect == "spark" else '"'
        return f"{q}{name}{q}"

    def lit(self, v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    # --- statements ---

    def query(self, q) -> str:
        if isinstance(q, RecursiveWith):
            parts = []
            for name, cols, sub in q.ctes:
                col_sql = (" (" + ", ".join(self.ident(c)
                                            for c in cols) + ")"
                           if cols else "")
                parts.append(f"{self.ident(name)}{col_sql} AS "
                             f"({self.query(sub)})")
            return ("WITH RECURSIVE " + ", ".join(parts) + " "
                    + self.query(q.body))
        if isinstance(q, SetOp):
            op = {"union": "UNION", "union_all": "UNION ALL",
                  "except": "EXCEPT", "except_all": "EXCEPT ALL",
                  "intersect": "INTERSECT",
                  "intersect_all": "INTERSECT ALL"}[q.op]
            s = f"{self.query(q.left)} {op} {self.query(q.right)}"
            if q.order_by:
                # same restriction as Select-level ORDER BY keys: a
                # quantified comparison's rewrite can't live here
                for o in q.order_by:
                    if any(isinstance(x, QuantifiedCmp)
                           for x in walk_expr(o.expr)):
                        raise UnsupportedError(
                            "ALL/ANY subquery comparisons in ORDER "
                            "BY are not supported (project through "
                            "a derived table)")
                s += " ORDER BY " + ", ".join(self.order_item(o)
                                              for o in q.order_by)
            if q.limit is not None:
                s += f" LIMIT {self.expr(q.limit)}"
            if q.offset is not None:
                s += f" OFFSET {self.expr(q.offset)}"
            return s
        return self.select(q)

    def select(self, s: Select) -> str:
        self._check_quantified_positions(s)
        if s.qualify is not None:
            return self._select_qualify(s)
        parts = ["SELECT"]
        if s.distinct:
            parts.append("DISTINCT")
        items = []
        for i, it in enumerate(s.items):
            if isinstance(it.expr, Star):
                items.append(f"{self.ident(it.expr.qualifier)}.*"
                             if it.expr.qualifier else "*")
            else:
                e = self.expr(it.expr)
                if it.alias:
                    e += f" AS {self.ident(it.alias)}"
                items.append(e)
        parts.append(", ".join(items))
        if s.from_ is not None:
            parts.append("FROM " + self.relation(s.from_))
        if s.where is not None:
            parts.append("WHERE " + self.expr(s.where))
        gb = self._group_by_sql(s)
        if gb:
            parts.append(gb)
        if s.having is not None:
            parts.append("HAVING " + self.expr(s.having))
        if s.order_by:
            parts.append("ORDER BY " + ", ".join(self.order_item(o)
                                                 for o in s.order_by))
        if s.limit is not None:
            parts.append(f"LIMIT {self.expr(s.limit)}")
        if s.offset is not None:
            parts.append(f"OFFSET {self.expr(s.offset)}")
        return " ".join(parts)

    def _check_quantified_positions(self, s: Select) -> None:
        """The EXISTS rewrite of ALL/ANY (see _quantified) collapses
        the ANSI NULL outcome to FALSE, which is exact exactly where a
        predicate's truth is demanded: WHERE / HAVING / QUALIFY / join
        conditions, composed through AND/OR (monotone in that
        collapse), NOT directly over the comparison (flipped via the
        quantifier duality before it ever wraps the rewrite), an EVEN
        number of enclosing NOTs over a composition (they cancel, so
        the collapse surfaces unchanged), and CASE *condition*
        position (a NULL condition selects the next branch, same as
        FALSE — exact in ANY clause, which is what lets agg FILTER
        predicates desugar over a quantified comparison).  An ODD
        number of NOTs over a COMPOSITION containing the comparison
        is anti-monotone — NOT(UNKNOWN AND TRUE) is UNKNOWN but the
        collapse would make it TRUE — and is rejected (apply De
        Morgan by hand; NOT directly on the comparison stays exact).
        Any other enclosing position — bare projections, GROUP/ORDER
        keys, comparison or arithmetic operands, IS NULL, <=>,
        function arguments, CASE *result* position — can observe the
        third value and is rejected with a pointer to the
        derived-table workaround."""
        def check(e, in_cond: bool, in_having: bool = False,
                  case_cond_ok: bool = True, odd_not: bool = False):
            if isinstance(e, Star):
                return

            def q_leaf(q):
                if not in_cond:
                    raise UnsupportedError(
                        "ALL/ANY subquery comparisons are only "
                        "supported as predicates in WHERE/HAVING/"
                        "QUALIFY/join conditions (project through a "
                        "derived table for other positions)")
                if odd_not:
                    raise UnsupportedError(
                        "NOT over a composition containing an "
                        "ALL/ANY comparison is not supported (the "
                        "rewrite is only exact when NOT applies "
                        "directly to the comparison — distribute the "
                        "NOT with De Morgan first)")
                if in_having and self._has_aggregate(q.expr):
                    # the EXISTS rewrite moves the comparison into
                    # the subquery's WHERE, where an outer aggregate
                    # is illegal — no lossless rendering exists on
                    # this path
                    raise UnsupportedError(
                        "an aggregate on the left of ALL/ANY in "
                        "HAVING is not supported (project the "
                        "aggregate in a derived table and compare in "
                        "its WHERE)")
                check(q.expr, False)     # left operand is a value

            if isinstance(e, QuantifiedCmp):
                q_leaf(e)
                return
            if isinstance(e, BinOp) and e.op in ("and", "or"):
                check(e.left, in_cond, in_having, case_cond_ok,
                      odd_not)
                check(e.right, in_cond, in_having, case_cond_ok,
                      odd_not)
                return
            if isinstance(e, UnOp) and e.op == "not":
                if isinstance(e.operand, UnOp) \
                        and e.operand.op == "not":
                    # double NOT folds (3VL-identity; the renderer
                    # folds it too), keeping parity unchanged
                    check(e.operand.operand, in_cond, in_having,
                          case_cond_ok, odd_not)
                    return
                if isinstance(e.operand, QuantifiedCmp):
                    # duality consumes this NOT exactly (the renderer
                    # flips quantifier+operator before rewriting), so
                    # the pair behaves like a bare comparison leaf
                    q_leaf(e.operand)
                    return
                check(e.operand, in_cond, in_having, case_cond_ok,
                      not odd_not)
                return
            if isinstance(e, Case):
                # a CASE *condition* is truth-demanding in any clause
                # (NULL selects the next branch, exactly like FALSE),
                # so the rewrite stays exact even in projections —
                # e.g. agg FILTER predicates, which desugar to CASE.
                # Branch selection is also insensitive to enclosing
                # NOTs, so the parity resets.
                for c, v in e.whens:
                    check(c, in_cond or case_cond_ok, in_having,
                          case_cond_ok, False)
                    check(v, False, case_cond_ok=case_cond_ok)
                if e.else_ is not None:
                    check(e.else_, False, case_cond_ok=case_cond_ok)
                return
            for c in expr_children(e):
                check(c, False, case_cond_ok=case_cond_ok)

        # GROUP BY / ORDER BY keys: Spark cannot host a subquery there
        # at all, so CASE conditions get no exemption
        for e in list(s.group_by) + [o.expr for o in s.order_by]:
            check(e, False, case_cond_ok=False)
        for e in [i.expr for i in s.items]:
            check(e, False)
        for p in (s.where, s.qualify):
            if p is not None:
                check(p, True)
        if s.having is not None:
            check(s.having, True, in_having=True)

        def join_conds(rel):
            if isinstance(rel, Join):
                yield from join_conds(rel.left)
                yield from join_conds(rel.right)
                if rel.on is not None:
                    yield rel.on
        if s.from_ is not None:
            for cond in join_conds(s.from_):
                check(cond, True)

    @staticmethod
    def _has_aggregate(e) -> bool:
        from .functions import is_aggregate
        return any(isinstance(x, FuncCall) and is_aggregate(x.name)
                   for x in walk_expr(e))

    def _select_qualify(self, s: Select) -> str:
        """QUALIFY desugared to a nested select — Spark SQL has no
        QUALIFY keyword, so the predicate materializes as a hidden
        ``__qual`` item of an inner query and the outer query filters
        on it (windows still evaluate over the full pre-filter input,
        which is exactly QUALIFY's semantics).  Alias references in
        the predicate are inlined with the item's expression; ORDER BY
        expressions that are not select-list outputs ride along as
        hidden ``__ord{k}`` items."""
        win_aliases: set[str] = set()
        out_names: list[str] = []
        for i, it in enumerate(s.items):
            if isinstance(it.expr, Star):
                raise UnsupportedError(
                    "QUALIFY with * in the select list is not supported "
                    "on the subquery-compilation path (project explicit "
                    "columns)")
            out_names.append(self._item_name(it, i))
            if any(isinstance(x, WindowFunc) for x in walk_expr(it.expr)):
                win_aliases.add(out_names[-1].lower())
        if not (any(isinstance(x, WindowFunc)
                    for x in walk_expr(s.qualify))
                or any(isinstance(x, Col) and x.binding is None
                       and x.name.lower() in win_aliases
                       for x in walk_expr(s.qualify))):
            raise PlanError(
                "QUALIFY requires a window function in its predicate or "
                "a reference to a window-function select item (use WHERE "
                "or HAVING to filter non-window results)")

        items_sql = [f"{self.expr(it.expr)} AS {self.ident(out_names[i])}"
                     for i, it in enumerate(s.items)]
        subst = {}
        for i, it in enumerate(s.items):
            subst.setdefault(out_names[i].lower(), it.expr)
        prev = self._alias_subst
        self._alias_subst = subst
        try:
            items_sql.append(f"{self.expr(s.qualify)} AS __qual")
        finally:
            self._alias_subst = prev

        # ORDER BY: select-list outputs order in the outer query by
        # name; anything else becomes a hidden inner item
        order_sql: list[str] = []
        lower_names = {n.lower() for n in out_names}
        for k, o in enumerate(s.order_by):
            if isinstance(o.expr, Lit) and isinstance(o.expr.value, int) \
                    and not isinstance(o.expr.value, bool):
                # ordinal: position into the OUTER projection, where
                # both engines apply their ordinal defaults
                pos = int(o.expr.value)
                if not 1 <= pos <= len(out_names):
                    raise PlanError(
                        f"ORDER BY position {pos} is not in the select "
                        f"list (1..{len(out_names)})")
                key = str(pos)
            elif isinstance(o.expr, Col) and o.expr.qualifier is None \
                    and o.expr.name.lower() in lower_names:
                key = self.ident(o.expr.name)
            else:
                key = f"__ord{k}"
                items_sql.append(f"{self.expr(o.expr)} AS {key}")
            d = f"{key} {'ASC' if o.ascending else 'DESC'}"
            if o.nulls is not None:
                d += f" NULLS {o.nulls.upper()}"
            order_sql.append(d)

        inner = ["SELECT", ", ".join(items_sql)]
        if s.from_ is not None:
            inner.append("FROM " + self.relation(s.from_))
        if s.where is not None:
            inner.append("WHERE " + self.expr(s.where))
        gb = self._group_by_sql(s)
        if gb:
            inner.append(gb)
        if s.having is not None:
            inner.append("HAVING " + self.expr(s.having))

        parts = ["SELECT"]
        if s.distinct:
            parts.append("DISTINCT")
        parts.append(", ".join(self.ident(n) for n in out_names))
        parts.append(f"FROM ({' '.join(inner)}) __qualify_sub")
        parts.append("WHERE __qual")
        if order_sql:
            parts.append("ORDER BY " + ", ".join(order_sql))
        if s.limit is not None:
            parts.append(f"LIMIT {self.expr(s.limit)}")
        if s.offset is not None:
            parts.append(f"OFFSET {self.expr(s.offset)}")
        return " ".join(parts)

    @staticmethod
    def _item_name(it, i: int) -> str:
        """Output name of a select item (planner._item_name parity)."""
        if it.alias:
            return it.alias
        if isinstance(it.expr, Col):
            return it.expr.name
        if isinstance(it.expr, FuncCall):
            return it.expr.name
        if isinstance(it.expr, WindowFunc):
            return it.expr.func.name
        return f"_c{i}"

    def _group_by_sql(self, s: Select) -> str | None:
        """GROUP BY clause incl. ROLLUP/CUBE/GROUPING SETS (both Spark
        SQL and DuckDB accept all three forms verbatim)."""
        if s.grouping_sets is not None:
            sets = ", ".join(
                "(" + ", ".join(self.expr(s.group_by[i]) for i in idxs)
                + ")"
                for idxs in s.grouping_sets)
            return f"GROUP BY GROUPING SETS ({sets})"
        if not s.group_by:
            return None
        g = ", ".join(self.expr(e) for e in s.group_by)
        if s.rollup:
            return f"GROUP BY ROLLUP({g})"
        if s.cube:
            return f"GROUP BY CUBE({g})"
        return "GROUP BY " + g

    def order_item(self, o) -> str:
        s = f"{self.expr(o.expr)} {'ASC' if o.ascending else 'DESC'}"
        if o.nulls is not None:
            s += f" NULLS {o.nulls.upper()}"
        return s

    def relation(self, rel) -> str:
        if isinstance(rel, TableRef):
            if rel.window is not None:
                raise UnsupportedError(
                    "stream window specs have no SQL-text form")
            if getattr(rel, "sample", None) is not None:
                raise UnsupportedError(
                    "TABLESAMPLE is not supported in statements that "
                    "need the SQL-text path (subqueries) — sample in "
                    "a separate statement or use the sample hint")
            s = self.ident(rel.name)
            if rel.alias:
                s += f" AS {self.ident(rel.alias)}"
            return s
        if isinstance(rel, DerivedTable):
            if rel.window is not None:
                raise UnsupportedError(
                    "stream window specs have no SQL-text form")
            if getattr(rel, "sample", None) is not None:
                raise UnsupportedError(
                    "TABLESAMPLE is not supported in statements that "
                    "need the SQL-text path (subqueries) — sample in "
                    "a separate statement or use the sample hint")
            lat = "LATERAL " if rel.lateral else ""
            return (f"{lat}({self.query(rel.query)}) "
                    f"AS {self.ident(rel.alias)}")
        if isinstance(rel, Join):
            left = self.relation(rel.left)
            right = self.relation(rel.right)
            if rel.kind == "cross":
                return f"{left} CROSS JOIN {right}"
            if rel.kind in ("semi", "anti"):
                # Spark spells it LEFT SEMI/ANTI; DuckDB bare
                kw = (f"LEFT {rel.kind.upper()} JOIN"
                      if self.dialect == "spark"
                      else f"{rel.kind.upper()} JOIN")
            else:
                kw = {"inner": "JOIN", "left": "LEFT JOIN",
                      "right": "RIGHT JOIN", "full": "FULL JOIN"}[rel.kind]
            s = f"{left} {kw} {right}"
            if rel.using is not None:
                s += " USING (" + ", ".join(self.ident(c)
                                            for c in rel.using) + ")"
            elif rel.on is not None:
                s += " ON " + self.expr(rel.on)
            return s
        raise PlanError(f"cannot generate SQL for {type(rel).__name__}")

    # --- expressions ---

    def expr(self, e) -> str:
        if isinstance(e, Lit):
            return self.lit(e.value)
        if isinstance(e, Param):
            if e.index >= len(self.params):
                raise PlanError(
                    f"parameter ?#{e.index + 1} not supplied")
            return self.lit(self.params[e.index])
        if isinstance(e, Col):
            if self._alias_subst is not None and e.binding is None:
                sub = self._alias_subst.get(e.name.lower())
                if sub is not None:
                    # inline the aliased item's expression; cleared
                    # during the nested render (items cannot reference
                    # sibling aliases, so one level suffices — and an
                    # unresolved self-named column can't recurse)
                    saved = self._alias_subst
                    self._alias_subst = None
                    try:
                        return f"({self.expr(sub)})"
                    finally:
                        self._alias_subst = saved
            q = e.binding or e.qualifier
            return (f"{self.ident(q)}.{self.ident(e.name)}"
                    if q else self.ident(e.name))
        if isinstance(e, Star):
            return "*"
        if isinstance(e, BinOp):
            if e.op == "<=>":
                # null-safe equality: Spark SQL's operator vs the
                # ANSI/DuckDB spelling
                if self.dialect == "spark":
                    return (f"({self.expr(e.left)} <=> "
                            f"{self.expr(e.right)})")
                return (f"({self.expr(e.left)} IS NOT DISTINCT FROM "
                        f"{self.expr(e.right)})")
            op = {"and": "AND", "or": "OR", "like": "LIKE",
                  "ilike": "ILIKE",
                  "=": "=", "!=": "<>"}.get(e.op, e.op)
            return f"({self.expr(e.left)} {op} {self.expr(e.right)})"
        if isinstance(e, UnOp):
            if e.op == "not" and isinstance(e.operand, UnOp) \
                    and e.operand.op == "not":
                # fold NOT NOT x -> x (a 3VL identity), so NOT-chains
                # over quantified comparisons reduce to the exact
                # direct-duality case instead of wrapping the rewrite
                return self.expr(e.operand.operand)
            if e.op == "not" and isinstance(e.operand, QuantifiedCmp):
                # exact 3VL quantifier duality: NOT (x cmp ALL S) ≡
                # x ¬cmp ANY S (and vice versa) at any NOT depth —
                # this keeps the EXISTS rewrite truth-exact under
                # negation, where wrapping it in NOT would not be
                # (the rewrite maps NULL to FALSE; NOT would flip
                # that to TRUE)
                q = e.operand
                dual = QuantifiedCmp(
                    _NEGATED_CMP[q.op], q.expr,
                    "any" if q.quant == "all" else "all", q.query)
                return self.expr(dual)
            op = {"not": "NOT ", "-": "-", "~": "~"}[e.op]
            return f"({op}{self.expr(e.operand)})"
        if isinstance(e, FuncCall):
            if e.args and isinstance(e.args[0], Star):
                inner = "*"
            else:
                inner = ", ".join(self.expr(a) for a in e.args)
            d = "DISTINCT " if e.distinct else ""
            return f"{e.name}({d}{inner})"
        if isinstance(e, WindowFunc):
            parts = []
            if e.partition_by:
                parts.append("PARTITION BY " + ", ".join(
                    self.expr(p) for p in e.partition_by))
            if e.order_by:
                parts.append("ORDER BY " + ", ".join(
                    self.order_item(o) for o in e.order_by))
            if e.frame is not None:
                parts.append(
                    f"{e.frame.mode.upper()} BETWEEN "
                    f"{self._frame_bound(e.frame.start)} AND "
                    f"{self._frame_bound(e.frame.end)}")
            fn = self.expr(e.func)
            if e.ignore_nulls:
                # mirror the DataFrame path's applicability check so
                # the SQL path raises the same clean scope message
                # instead of Spark's raw AnalysisException (review
                # finding, r11; rule shared via ast_nodes)
                msg = null_treatment_error(e.func.name)
                if msg:
                    raise PlanError(msg)
                # Spark spells null treatment after the parens,
                # DuckDB inside them after the last argument
                if self.dialect == "spark":
                    fn = f"{fn} IGNORE NULLS"
                else:
                    assert fn.endswith(")")
                    fn = f"{fn[:-1]} IGNORE NULLS)"
            return (f"{fn} OVER ({' '.join(parts)})")
        if isinstance(e, IntervalLit):
            return f"INTERVAL {e.value} {e.unit}"
        if isinstance(e, Subscript):
            # 1-based, NULL out of range on both targets: Spark SQL
            # via try_element_at (its bare subscript is 0-based and
            # ANSI-throws), DuckDB via native list indexing
            if self.dialect == "spark":
                return (f"try_element_at({self.expr(e.expr)}, "
                        f"{self.expr(e.index)})")
            return f"({self.expr(e.expr)})[{self.expr(e.index)}]"
        if isinstance(e, Cast):
            if e.type_name == "decimal" and e.precision is not None:
                t = f"DECIMAL({e.precision}, {e.scale or 0})"
            else:
                t = _CAST_SQL_TYPES[e.type_name]
            return f"CAST({self.expr(e.expr)} AS {t})"
        if isinstance(e, Case):
            s = "CASE"
            for c, v in e.whens:
                s += f" WHEN {self.expr(c)} THEN {self.expr(v)}"
            if e.else_ is not None:
                s += f" ELSE {self.expr(e.else_)}"
            return s + " END"
        if isinstance(e, Between):
            neg = "NOT " if e.negated else ""
            return (f"({self.expr(e.expr)} {neg}BETWEEN "
                    f"{self.expr(e.lo)} AND {self.expr(e.hi)})")
        if isinstance(e, IsNull):
            neg = "NOT " if e.negated else ""
            return f"({self.expr(e.expr)} IS {neg}NULL)"
        if isinstance(e, InList):
            neg = "NOT " if e.negated else ""
            vals = ", ".join(self.expr(i) for i in e.items)
            return f"({self.expr(e.expr)} {neg}IN ({vals}))"
        if isinstance(e, InSubquery):
            neg = "NOT " if e.negated else ""
            return f"({self.expr(e.expr)} {neg}IN ({self.query(e.query)}))"
        if isinstance(e, Exists):
            neg = "NOT " if e.negated else ""
            return f"({neg}EXISTS ({self.query(e.query)}))"
        if isinstance(e, ScalarSubquery):
            return f"({self.query(e.query)})"
        if isinstance(e, QuantifiedCmp):
            return self._quantified(e)
        raise PlanError(f"cannot generate SQL for {type(e).__name__}")

    def _quantified(self, e) -> str:
        """``x cmp ALL|ANY (sub)`` — ANSI <quantified comparison>.

        DuckDB renders the native form.  Spark SQL has none, so the
        predicate rewrites to EXISTS / NOT EXISTS over the subquery
        wrapped in a one-column derived table:

          x cmp ANY S  →  EXISTS(SELECT 1 FROM S q(v) WHERE x cmp v)
          x cmp ALL S  →  NOT EXISTS(SELECT 1 FROM S q(v)
                            WHERE NOT(x cmp v) OR (x cmp v) IS NULL)

        Truth-table check (WHERE/HAVING/ON demand TRUE, so mapping
        the ANSI NULL outcome to FALSE is exact there): ANY is true
        iff some comparison is true — exactly the EXISTS; ALL is true
        iff S is empty or every comparison is definitely true — the
        NOT EXISTS catches every definite-false AND every unknown
        (null operand either side).  NOT over the node flips via the
        quantifier duality (see UnOp above), so any NOT depth stays
        exact; non-predicate positions are rejected in select()."""
        sub_items = e.query
        while isinstance(sub_items, SetOp):
            sub_items = sub_items.left
        if len(sub_items.items) != 1 \
                or isinstance(sub_items.items[0].expr, Star):
            raise PlanError(
                "ALL/ANY subquery must select exactly one column")
        n = self._qn
        self._qn += 1
        sub, left = self.query(e.query), self.expr(e.expr)
        op = {"=": "=", "!=": "<>"}.get(e.op, e.op)
        if self.dialect != "spark":
            return f"({left} {op} {e.quant.upper()} ({sub}))"
        t, v = f"__qs{n}", f"__qv{n}"
        cmp_sql = f"({left} {op} {t}.{v})"
        if e.quant == "any":
            return (f"(EXISTS (SELECT 1 FROM ({sub}) AS {t}({v}) "
                    f"WHERE {cmp_sql}))")
        return (f"(NOT EXISTS (SELECT 1 FROM ({sub}) AS {t}({v}) "
                f"WHERE NOT {cmp_sql} OR {cmp_sql} IS NULL))")


def to_sql(q, params: list | None = None, dialect: str = "spark") -> str:
    return SqlGen(params, dialect).query(q)
