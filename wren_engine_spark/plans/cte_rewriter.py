"""CTE rewriter: expand an MDL manifest + user SQL into standalone
Spark SQL text.

Parity with the reference's dry-plan surface and its CTE-based rewrite
approach (wren/src/wren/mdl/cte_rewriter.py:41-288; dry-plan endpoint
v3/connector.py:250-341): each model referenced by the query becomes a
CTE whose SELECT carries the expression columns, RLS filters, and
calculated fields (to-one relationship chains as inline LEFT JOINs;
to-many aggregates as pre-aggregated LEFT-JOINed subqueries). The
produced text runs on any SparkSession with the physical sources
registered — no engine instance needed — and backs
``SemanticEngine.dry_plan``.

The SQL built here is the *text twin* of the DataFrame plan built by
engine.py; both derive joins from the same lineage paths so they cannot
drift structurally.
"""

from __future__ import annotations

import re

from wren_engine_spark.mdl.lineage import extract_paths, is_aggregate_expression
from wren_engine_spark.mdl.manifest import Manifest, Model
from wren_engine_spark.plans.sqltext import identifiers, rewrite_outside_literals


def bq(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _sq(expr: str) -> str:
    """Double-quoted idents -> backticks (Spark parser); quote-aware —
    single-quoted string literal content is never rewritten."""
    return rewrite_outside_literals(
        expr, lambda s: re.sub(r'"([^"]+)"', r"`\1`", s)
    )


class CteRewriter:
    def __init__(self, manifest: Manifest, properties: dict[str, str] | None = None,
                 source_sql: dict[str, str] | None = None):
        """``source_sql`` maps model name -> FROM-clause SQL for its
        physical source (default: the raw table_reference)."""
        self.manifest = manifest
        self.properties = {k.lower(): str(v) for k, v in (properties or {}).items()}
        self.source_sql = {k.lower(): v for k, v in (source_sql or {}).items()}

    # ----------------------------------------------------------- public

    def rewrite(self, sql: str) -> str:
        """Return ``WITH <model CTEs> <sql>`` for every model the query
        references (manifest-extractor trimming, wren-core-py/src/
        extractor.rs:19-46: only reachable models are expanded)."""
        used = self._used_models(sql)
        if not used:
            return _sq(sql)
        ctes = [f"{bq(m.name)} AS (\n{self.model_sql(m)}\n)" for m in used]
        return "WITH " + ",\n".join(ctes) + "\n" + _sq(sql)

    def model_sql(self, model: Model) -> str:
        """The expanded SELECT for one model (ModelSourceNode +
        calculated-field generation, model_generation.rs:133-285)."""
        base = self._base_sql(model)
        calcs = model.calculated_columns
        visible_phys = [
            f"__base.{bq(c.name)}"
            for c in model.columns
            if not c.is_relationship and not c.is_calculated and not c.is_hidden
        ]
        if not calcs:
            return f"  SELECT {', '.join(visible_phys)}\n  FROM ({base}) AS __base"

        joins: list[str] = []
        select_calcs: list[str] = []
        for ci, col in enumerate(calcs):
            expr = col.expression or ""
            paths = extract_paths(model, self.manifest, expr)
            if not paths:
                select_calcs.append(f"{_sq(expr)} AS {bq(col.name)}")
            elif is_aggregate_expression(expr):
                path = paths[0]
                alias = f"__agg{ci}"
                chain, base_key, first_far, term_ref = self._chain(model, path, alias)
                agg_expr = _sq(expr.replace(path.raw, term_ref))
                inner = "\n    ".join(chain)
                joins.append(
                    f"LEFT JOIN (\n    SELECT {first_far} AS __k, {agg_expr} AS __v\n"
                    f"    FROM {inner}\n    GROUP BY {first_far}\n  ) AS {alias}"
                    f" ON __base.{bq(base_key)} = {alias}.__k"
                )
                select_calcs.append(f"{alias}.__v AS {bq(col.name)}")
            else:
                for pi, path in enumerate(paths):
                    alias = f"__rel{ci}_{pi}"
                    chain, base_key, first_far, term_ref = self._chain(model, path, alias)
                    # hop-1 join keyed on the base model; later hops carry
                    # their ON clauses inside the chain
                    first, *rest = chain
                    joins.append(
                        f"LEFT JOIN {first} ON __base.{bq(base_key)} = {first_far}"
                    )
                    joins.extend(rest)
                    expr = expr.replace(path.raw, term_ref)
                select_calcs.append(f"{_sq(expr)} AS {bq(col.name)}")

        sel = ", ".join(visible_phys + select_calcs)
        join_sql = "\n  ".join(joins)
        return f"  SELECT {sel}\n  FROM ({base}) AS __base\n  {join_sql}"

    def dry_plan(self, sql: str) -> str:
        """Alias for rewrite() matching the reference endpoint name."""
        return self.rewrite(sql)

    # ---------------------------------------------------------- helpers

    def _source(self, model: Model) -> str:
        return self.source_sql.get(
            model.name.lower(),
            f"(SELECT * FROM {model.table_reference})"
            if model.table_reference
            else f"({model.ref_sql})",
        )

    def _base_sql(self, model: Model) -> str:
        """Expression projection + RLS filter over the physical source."""
        from wren_engine_spark.engine import _sanitize_rls, _substitute_vars

        base_exprs = ", ".join(
            f"{_sq(c.sql_expression)} AS {bq(c.name)}" for c in model.physical_columns
        )
        conds = []
        for rule in model.row_level_access_controls:
            _sanitize_rls(rule.condition, rule.name)
            conds.append(
                "(" + _sq(_substitute_vars(rule.condition, self.properties, rule)) + ")"
            )
        where = f" WHERE {' AND '.join(conds)}" if conds else ""
        return f"SELECT {base_exprs} FROM {self._source(model)} AS __source{where}"

    def _target_base_sql(self, model: Model) -> str:
        """Base projection of a hop target incl. its inline (non-path)
        calculated columns — PartialModelPlanNode parity
        (plan.rs:1149-1201)."""
        exprs = [
            f"{_sq(c.sql_expression)} AS {bq(c.name)}" for c in model.physical_columns
        ]
        for c in model.calculated_columns:
            if not extract_paths(model, self.manifest, c.expression or ""):
                exprs.append(f"{_sq(c.expression)} AS {bq(c.name)}")
        return f"SELECT {', '.join(exprs)} FROM {self._source(model)} AS __source"

    def _chain(self, model: Model, path, alias: str):
        """Join chain for a relationship path.

        Returns (chain, base_key, first_far_ref, terminal_ref) where
        ``chain[0]`` is ``(subquery) AS alias_h0`` (its ON clause is the
        caller's responsibility) and chain[1:] are full LEFT JOIN
        clauses; every hop gets its own alias so same-named columns in
        different hop models can never collide.
        """
        from wren_engine_spark.engine import _rel_keys

        cur = model
        chain: list[str] = []
        base_key = ""
        first_far = ""
        for hop_idx, hop in enumerate(path.hops):
            relcol = cur.column(hop)
            rel = self.manifest.relationship(relcol.relationship)
            near_key, far = _rel_keys(rel, cur.name)
            target = self.manifest.model(rel.other_model(cur.name))
            halias = f"{alias}_h{hop_idx}"
            tsql = self._target_base_sql(target)
            if hop_idx == 0:
                base_key = near_key
                first_far = f"{halias}.{bq(far)}"
                chain.append(f"(\n    {tsql}\n  ) AS {halias}")
            else:
                prev = f"{alias}_h{hop_idx - 1}"
                chain.append(
                    f"LEFT JOIN (\n    {tsql}\n  ) AS {halias} "
                    f"ON {prev}.{bq(near_key)} = {halias}.{bq(far)}"
                )
            cur = target
        last = f"{alias}_h{len(path.hops) - 1}"
        return chain, base_key, first_far, f"{last}.{bq(path.terminal)}"

    def _used_models(self, sql: str) -> list[Model]:
        """Models transitively referenced by the SQL (through views);
        identifier-token matching, so names inside string literals don't
        count as references."""
        idents = set(identifiers(sql))
        changed = True
        while changed:  # fixpoint: views may reference views in any order
            changed = False
            for v in self.manifest.views:
                if v.name.lower() in idents:
                    new = identifiers(v.statement) - idents
                    if new:
                        idents |= new
                        changed = True
        return [m for m in self.manifest.models if m.name.lower() in idents]
