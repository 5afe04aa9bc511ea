"""Name resolution: bind every column reference to a relation.

Parity target: ``Ast.resolvedStreams`` / ``ResolveEnv``
(fsql/Ast.scala:261-483) and ``Ast.resolveTables``
(flinkdsl/ast.scala:243-417).  The environment is the list of relations
collected syntactically from FROM/joins/sources; qualified columns match
by name-or-alias; subselects resolve recursively with their own env
(fsql/Ast.scala:388-391) extended by the outer env (for correlation).

Deliberate divergence (SURVEY.md §7.0(2)): the reference binds an
unqualified column to the FIRST stream even when ambiguous
(fsql/Ast.scala:316-327, with the author's own "not working" caveat);
we resolve against ALL relations and raise on ambiguity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .ast_nodes import (
    Between, BinOp, Case, Cast, Col, DerivedTable, Exists, FuncCall,
    InList, InSubquery, Insert, IntervalLit, IsNull, Join, Lit, Param,
    QuantifiedCmp, SCORE_HINTS,
    Policy, ScalarSubquery, Select, SelectItem, SetOp, Star, Subscript,
    TableRef,
    UnOp, WindowFunc, WindowSpec, relation_leaves, visible_leaves,
    walk_expr,
)
from .catalog import Catalog
from .errors import ResolutionError


@dataclass
class Scope:
    """One resolution environment level (ResolveEnv parity,
    fsql/Ast.scala:293-315)."""

    # binding name (alias or relation name, lower) -> column names
    bindings: dict = field(default_factory=dict)
    order: list = field(default_factory=list)     # binding names in FROM order
    parent: Optional["Scope"] = None

    def add(self, binding: str, columns: list[str]):
        key = binding.lower()
        if key in self.bindings:
            raise ResolutionError(
                f"duplicate relation binding {binding!r} in FROM")
        self.bindings[key] = [c for c in columns]
        self.order.append(key)

    def find_qualified(self, qual: str, name: str) -> Optional[str]:
        key = qual.lower()
        scope: Optional[Scope] = self
        while scope is not None:
            if key in scope.bindings:
                cols = {c.lower() for c in scope.bindings[key]}
                if name.lower() not in cols:
                    raise ResolutionError(
                        f"column {name!r} not found in relation {qual!r}")
                return key
            scope = scope.parent
        return None

    def find_qualified_binding(self, qual: str) -> Optional[str]:
        key = qual.lower()
        scope: Optional["Scope"] = self
        while scope is not None:
            if key in scope.bindings:
                return key
            scope = scope.parent
        return None

    def find_unqualified(self, name: str) -> Optional[str]:
        scope: Optional[Scope] = self
        while scope is not None:
            hits = [b for b in scope.order
                    if name.lower() in {c.lower() for c in scope.bindings[b]}]
            if len(hits) > 1:
                raise ResolutionError(
                    f"ambiguous column {name!r}: found in "
                    f"{', '.join(sorted(hits))}")
            if hits:
                return hits[0]
            scope = scope.parent
        return None


class Resolver:
    """Rewrites Col.binding in-place; validates stars, windows, inserts."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    # --- statement dispatch (resolvedStreams parity, fsql/Ast.scala:261-266)

    def resolve(self, stmt):
        if isinstance(stmt, Select):
            self.resolve_select(stmt, None)
        elif isinstance(stmt, SetOp):
            self.resolve_setop(stmt, None)
        elif isinstance(stmt, Insert):
            self.resolve_insert(stmt)
        else:
            from .ast_nodes import DerivedTable, Merge
            if isinstance(stmt, Merge) \
                    and isinstance(stmt.source, DerivedTable):
                # the USING subquery is an ordinary query — resolve it
                # here; the merge expressions themselves qualify at
                # plan time against the two named sides (plan_merge)
                q = stmt.source.query
                if isinstance(q, SetOp):
                    self.resolve_setop(q, None)
                else:
                    self.resolve_select(q, None)
        # CreateSchema/CreateStream/Update/Delete/Merge: resolved at
        # plan time
        return stmt

    def resolve_setop(self, s: SetOp, outer: Optional[Scope]):
        for side in (s.left, s.right):
            if isinstance(side, SetOp):
                self.resolve_setop(side, outer)
            else:
                self.resolve_select(side, outer)

    def resolve_insert(self, ins: Insert):
        cols = self.catalog.columns(ins.table)
        target = ins.columns or cols
        unknown = [c for c in target if c.lower() not in
                   {x.lower() for x in cols}]
        if unknown:
            raise ResolutionError(
                f"INSERT column(s) {unknown} not in table {ins.table!r}")
        # column-count validation (flinkdsl/ast.scala:367-376)
        if ins.values is not None:
            for row in ins.values:
                if len(row) != len(target):
                    raise ResolutionError(
                        f"INSERT expects {len(target)} values, got {len(row)}")
        if ins.query is not None:
            self.resolve_query(ins.query, None)
            n = len(self.output_names(ins.query))
            if n != len(target):
                raise ResolutionError(
                    f"INSERT expects {len(target)} columns, query has {n}")

    def resolve_query(self, q, outer: Optional[Scope]):
        if isinstance(q, SetOp):
            self.resolve_setop(q, outer)
        else:
            self.resolve_select(q, outer)

    # --- select ---

    @staticmethod
    def _probe_bindings(rel) -> set:
        """Binding names on the right of SEMI/ANTI joins — visible to
        the join's ON condition only, never to the select list, WHERE,
        grouping, or ordering (the join never outputs them)."""
        out: set = set()

        def walk(r):
            if isinstance(r, Join):
                walk(r.left)
                if r.kind in ("semi", "anti"):
                    for leaf in relation_leaves(r.right):
                        out.add(leaf.binding.lower())
                else:
                    walk(r.right)
        walk(rel)
        return out

    def resolve_select(self, sel: Select, outer: Optional[Scope]) -> Scope:
        scope = Scope(parent=outer)
        if sel.from_ is not None:
            self._bind_relations(sel.from_, scope)
            # ON conditions resolved above (inside _bind_relations);
            # drop semi/anti probe bindings before any output-position
            # expression resolves, so a probe-column reference fails
            # HERE with a resolution error instead of deep in Spark
            for b in self._probe_bindings(sel.from_):
                scope.bindings.pop(b, None)
                if b in scope.order:
                    scope.order.remove(b)
            # score-adding row hints (SCORE_HINTS: bm25, hybrid_rrf)
            # APPEND a column to the FROM rows — make it referencable
            # from the select list / ORDER BY at this level; a
            # same-named table column resolves ambiguous here,
            # matching the planner's collision rejection
            score_cols = [SCORE_HINTS[h.name]
                          for h in getattr(sel, "hints", [])
                          if getattr(h, "name", None) in SCORE_HINTS]
            if score_cols:
                scope.add("__score_hint__", score_cols)
        for item in sel.items:
            self._resolve_expr(item.expr, scope)
        if sel.where is not None:
            # score hints apply AFTER the WHERE filter, so their
            # score columns are NOT visible there — hide the synthetic
            # binding so the reference fails HERE with a resolution
            # error instead of deep in Spark (the probe-binding rule)
            hidden = scope.bindings.pop("__score_hint__", None)
            if hidden is not None:
                scope.order.remove("__score_hint__")
            try:
                self._resolve_expr(sel.where, scope)
            finally:
                if hidden is not None:
                    scope.add("__score_hint__", hidden)
        for g in sel.group_by:
            self._resolve_expr(g, scope)
        if sel.having is not None:
            self._resolve_expr(sel.having, scope)
        # ORDER BY may reference projection aliases (standard SQL scoping)
        out_aliases = {i.alias.lower() for i in sel.items if i.alias}
        for o in sel.order_by:
            if isinstance(o.expr, Col) and o.expr.qualifier is None and \
                    o.expr.name.lower() in out_aliases:
                continue
            self._resolve_expr(o.expr, scope)
        # QUALIFY may reference projection aliases anywhere in the
        # predicate (the planner substitutes them with the aliased
        # expression before compiling) — resolve every OTHER column
        if sel.qualify is not None:
            for x in walk_expr(sel.qualify):
                if isinstance(x, Col):
                    if x.qualifier is None and \
                            x.name.lower() in out_aliases:
                        continue
                    self._resolve_expr(x, scope)
                elif isinstance(x, (InSubquery, Exists, ScalarSubquery, QuantifiedCmp)):
                    self.resolve_query(x.query, scope)
        if sel.from_ is not None:
            self._resolve_windows(sel.from_, scope)
        return scope

    def _bind_relations(self, rel, scope: Scope):
        for leaf in relation_leaves(rel):
            if isinstance(leaf, TableRef):
                cols = self.catalog.columns(leaf.name)
                scope.add(leaf.binding, cols)
            elif isinstance(leaf, DerivedTable):
                # LATERAL sees relations earlier in the same FROM (the
                # in-progress scope — leaves bind left to right); a
                # plain derived table sees only the outer query's
                self.resolve_query(leaf.query,
                                   scope if leaf.lateral
                                   else scope.parent)
                scope.add(leaf.binding, self.output_names(leaf.query))
        # resolve join ON conditions after all leaves are bound (matches
        # SQL scoping; reference resolves the same env, fsql/Ast.scala:116-124)
        self._resolve_join_conds(rel, scope)

    def _resolve_join_conds(self, rel, scope: Scope):
        if not isinstance(rel, Join):
            return
        self._resolve_join_conds(rel.left, scope)
        self._resolve_join_conds(rel.right, scope)
        if rel.on is not None:
            self._resolve_expr(rel.on, scope)
        if rel.using is not None:
            # each USING column must exist on both sides
            left_binds = [l.binding.lower() for l in relation_leaves(rel.left)]
            right_binds = [l.binding.lower() for l in relation_leaves(rel.right)]
            for c in rel.using:
                for side, binds in (("left", left_binds), ("right", right_binds)):
                    found = any(
                        c.lower() in {x.lower() for x in scope.bindings[b]}
                        for b in binds if b in scope.bindings)
                    if not found:
                        raise ResolutionError(
                            f"USING column {c!r} missing on {side} side of join")

    def _resolve_windows(self, rel, scope: Scope):
        """Window on/partitioned-on columns resolve against their OWN
        stream (fsql/Ast.scala:420-445)."""
        for leaf in relation_leaves(rel):
            w = getattr(leaf, "window", None)
            if w is None:
                continue
            own_cols = {c.lower() for c in scope.bindings[leaf.binding.lower()]}
            for pol in (w.size, w.every):
                if pol is not None and pol.on_col is not None:
                    self._bind_window_col(pol.on_col, leaf, own_cols)
            if w.partition is not None:
                self._bind_window_col(w.partition, leaf, own_cols)

    def _bind_window_col(self, col: Col, leaf, own_cols: set):
        if col.qualifier is not None and \
                col.qualifier.lower() != leaf.binding.lower():
            raise ResolutionError(
                f"window column {col.qualifier}.{col.name} must belong to "
                f"stream {leaf.binding!r}")
        if col.name.lower() not in own_cols:
            raise ResolutionError(
                f"window column {col.name!r} not found in stream "
                f"{leaf.binding!r}")
        col.binding = leaf.binding.lower()

    # --- expressions ---

    def _resolve_expr(self, e, scope: Scope):
        if isinstance(e, Col):
            if e.qualifier is not None:
                b = scope.find_qualified(e.qualifier, e.name)
                if b is None:
                    raise ResolutionError(
                        f"unknown relation {e.qualifier!r} for column "
                        f"{e.qualifier}.{e.name}")
                e.binding = b
            else:
                b = scope.find_unqualified(e.name)
                if b is None:
                    raise ResolutionError(f"unknown column {e.name!r}")
                # hint-added columns (SCORE_HINTS) exist on the
                # post-hint DataFrame but belong to no relation —
                # compile UNQUALIFIED (binding None -> F.col(name))
                e.binding = None if b == "__score_hint__" else b
            return
        if isinstance(e, Star):
            if e.qualifier is not None and \
                    scope.find_qualified_binding(e.qualifier) is None:
                raise ResolutionError(
                    f"unknown relation {e.qualifier!r} for {e.qualifier}.*")
            return
        if isinstance(e, (Lit, Param, IntervalLit)):
            return
        if isinstance(e, BinOp):
            self._resolve_expr(e.left, scope)
            self._resolve_expr(e.right, scope)
            return
        if isinstance(e, UnOp):
            self._resolve_expr(e.operand, scope)
            return
        if isinstance(e, Cast):
            self._resolve_expr(e.expr, scope)
            return
        if isinstance(e, Subscript):
            self._resolve_expr(e.expr, scope)
            self._resolve_expr(e.index, scope)
            return
        if isinstance(e, FuncCall):
            for a in e.args:
                if not isinstance(a, Star):
                    self._resolve_expr(a, scope)
            return
        if isinstance(e, WindowFunc):
            self._resolve_expr(e.func, scope)
            for x in e.partition_by:
                self._resolve_expr(x, scope)
            for o in e.order_by:
                self._resolve_expr(o.expr, scope)
            return
        if isinstance(e, Case):
            for c, v in e.whens:
                self._resolve_expr(c, scope)
                self._resolve_expr(v, scope)
            if e.else_ is not None:
                self._resolve_expr(e.else_, scope)
            return
        if isinstance(e, Between):
            for x in (e.expr, e.lo, e.hi):
                self._resolve_expr(x, scope)
            return
        if isinstance(e, IsNull):
            self._resolve_expr(e.expr, scope)
            return
        if isinstance(e, InList):
            self._resolve_expr(e.expr, scope)
            for x in e.items:
                self._resolve_expr(x, scope)
            return
        if isinstance(e, InSubquery):
            self._resolve_expr(e.expr, scope)
            self.resolve_query(e.query, scope)
            return
        if isinstance(e, QuantifiedCmp):
            self._resolve_expr(e.expr, scope)
            self.resolve_query(e.query, scope)
            return
        if isinstance(e, Exists):
            self.resolve_query(e.query, scope)
            return
        if isinstance(e, ScalarSubquery):
            self.resolve_query(e.query, scope)
            return
        raise ResolutionError(f"cannot resolve expression node {type(e).__name__}")

    # --- output schema of a query (for derived tables / set ops) ---

    def output_names(self, q) -> list[str]:
        """Projection names; Star expands via the catalog (parity with
        expandStar, flinkdsl/typer.scala_:232-235)."""
        if isinstance(q, SetOp):
            return self.output_names(q.left)
        names: list[str] = []
        for i, item in enumerate(q.items):
            if isinstance(item.expr, Star):
                names.extend(self._star_columns(q, item.expr))
            elif item.alias:
                names.append(item.alias)
            elif isinstance(item.expr, Col):
                names.append(item.expr.name)
            elif isinstance(item.expr, FuncCall):
                names.append(item.expr.name)
            elif isinstance(item.expr, WindowFunc):
                names.append(item.expr.func.name)
            else:
                names.append(f"_c{i}")
        return names

    def _star_columns(self, q: Select, star: Star) -> list[str]:
        if q.from_ is None:
            raise ResolutionError("* requires a FROM clause")
        out = []
        for leaf in visible_leaves(q.from_):
            if star.qualifier is not None and \
                    leaf.binding.lower() != star.qualifier.lower():
                continue
            if isinstance(leaf, TableRef):
                out.extend(self.catalog.columns(leaf.name))
            else:
                out.extend(self.output_names(leaf.query))
        if not out:
            raise ResolutionError(
                f"unknown relation {star.qualifier!r} for {star.qualifier}.*")
        # mirror planner._expand_star: score-adding row hints append
        # their column to an unqualified * (last, in written hint
        # order), so a derived table around a hinted select exposes
        # it to the outer query
        if star.qualifier is None:
            out.extend(SCORE_HINTS[h.name]
                       for h in getattr(q, "hints", [])
                       if getattr(h, "name", None) in SCORE_HINTS)
        return out
