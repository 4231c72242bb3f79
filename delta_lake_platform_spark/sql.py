"""SQL entry point for platform operations on managed tables.

The reference's third entry point is raw SQL strings through
``spark.sql`` (SURVEY.md §3: scd_handler.py:71 and every test
assertion). Plain relational SQL already works here the same way —
``sources/catalog.py`` registers the star schema as temp views. What
plain ``spark.sql`` cannot do on parquet-backed tables is the *platform*
surface Delta adds to the parser: MERGE INTO, UPDATE/DELETE DML,
DESCRIBE HISTORY/DETAIL, VACUUM, OPTIMIZE [ZORDER BY], RESTORE, and
``VERSION/TIMESTAMP AS OF`` time travel.

``PlatformSQL`` is that missing dialect: a thin dispatcher that
pattern-matches the platform statements, routes them to the
``ManagedTable`` implementations (one behavior, two surfaces — the SQL
path and the Python API run the exact same code), and hands everything
else to ``spark.sql`` after registering managed tables as temp views.
Every statement returns a DataFrame, like ``spark.sql``.

Deliberate scope limits (documented, not silent): statements are
dispatched on their leading keyword; table references inside string
literals of a SELECT are not protected from time-travel rewriting; the
MERGE source must be a named view/table (register a subquery as a temp
view first).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .sources.managed_table import ManagedTable, MergeClauses

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _qualify(expr: str, alias_map: dict[str, str]) -> str:
    """Rewrite user-chosen aliases to the merge engine's fixed
    ``target``/``updates`` qualifiers inside an expression string."""
    for user, fixed in alias_map.items():
        expr = re.sub(rf"\b{re.escape(user)}\s*\.", f"{fixed}.", expr)
    return expr


class PlatformSQL:
    """Dispatch platform SQL over registered managed tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, ManagedTable] = {}
        self._views: dict = {}  # name -> MaterializedAggView

    def register(self, name: str, table: ManagedTable) -> None:
        self.tables[name] = table

    _SQL_KEYWORDS = frozenset(
        "and or not in is null between like true false".split()
    )

    def _try_mv_rewrite(
        self,
        select_list: str,
        base_name: str,
        where: str | None,
        group_by: str | None,
        having: str | None = None,
        order_by: str | None = None,
        limit: str | None = None,
    ) -> DataFrame | None:
        """Answer an aggregate SELECT over ``base_name`` from a FRESH
        MaterializedAggView whose grain covers it, or return None.

        Soundness rules (each falls through to the scan, never
        guesses): the view must not be stale; the query's GROUP BY
        columns must be a subset of the view's; a WHERE may reference
        GROUP columns only (then filtering state rows == filtering
        base rows); every select item must be derivable from the
        maintained state — COUNT(*) re-aggregates as SUM(n_rows),
        SUM(c) as SUM(sum_c), MIN/MAX(c) as MIN(min_c)/MAX(max_c), and
        APPROX_COUNT_DISTINCT(c) by UNIONING the stored HLL sketches
        (hll_union_agg — estimates never re-aggregate, sketches do).
        At the view's exact grain the rewrite is a pure projection; at
        a coarser grain it re-aggregates the (tiny) state. Either way
        the 100 TB base is never read."""
        from .sources.materialized_view import MaterializedAggView

        base = self.tables[base_name]
        qcols = (
            [c.strip() for c in group_by.split(",")] if group_by else []
        )
        if any(not re.fullmatch(r"\w+", c) for c in qcols):
            return None
        for vname, mv in getattr(self, "_views", {}).items():
            if not isinstance(mv, MaterializedAggView):
                continue
            if os.path.abspath(mv.base.path) != os.path.abspath(base.path):
                continue
            if mv.is_stale():
                continue
            gset = set(mv.group_cols)
            if not set(qcols) <= gset:
                continue
            if where is not None:
                idents = {
                    i.lower()
                    for i in re.findall(
                        r"[A-Za-z_]\w*", re.sub(r"'[^']*'", "", where)
                    )
                }
                if not (idents - self._SQL_KEYWORDS) <= {
                    c.lower() for c in gset
                }:
                    continue
            plan: list[tuple[str, str, str]] = []  # (kind, col, alias)
            ok = True
            for item in _split_top_level(select_list):
                im = re.match(
                    rf"(?is)^\s*({_IDENT})\s*$|"
                    rf"^\s*COUNT\s*\(\s*\*\s*\)\s*(?:AS\s+({_IDENT}))?\s*$|"
                    rf"^\s*(SUM|MIN|MAX|APPROX_COUNT_DISTINCT)\s*\(\s*"
                    rf"({_IDENT})\s*\)\s*(?:AS\s+({_IDENT}))?\s*$",
                    item,
                )
                if not im:
                    ok = False
                    break
                ident, cnt_alias, fn, col, alias = im.groups()
                if ident is not None:
                    if ident not in qcols:
                        ok = False
                        break
                    plan.append(("group", ident, ident))
                elif fn is None:
                    plan.append(("count", "", cnt_alias or "count(1)"))
                else:
                    fn = fn.lower()
                    kind_ok = (
                        (fn == "sum" and col in mv.sum_cols)
                        or (fn in ("min", "max") and col in mv.minmax_cols)
                        or (
                            fn == "approx_count_distinct"
                            and col in mv.approx_distinct_cols
                        )
                    )
                    if not kind_ok:
                        ok = False
                        break
                    plan.append((fn, col, alias or f"{fn}({col})"))
            if not ok or not plan:
                continue
            # HAVING / ORDER BY may reference the OUTPUT aliases only
            # (selected group cols included) — a reference to anything
            # else (an unselected aggregate, a base column) falls
            # through to the scan rather than guessing.
            aliases = {alias.lower() for _k, _c, alias in plan}
            if having is not None:
                h_ids = {
                    i.lower()
                    for i in re.findall(
                        r"[A-Za-z_]\w*", re.sub(r"'[^']*'", "", having)
                    )
                }
                if not (h_ids - self._SQL_KEYWORDS) <= aliases:
                    continue
            order_items: list[tuple[str, str]] = []
            if order_by is not None:
                bad_order = False
                for it in order_by.split(","):
                    om = re.fullmatch(
                        r"(?is)\s*(\w+)(?:\s+(asc|desc))?\s*", it
                    )
                    if om is None or om.group(1).lower() not in aliases:
                        bad_order = True
                        break
                    order_items.append(
                        (om.group(1), (om.group(2) or "asc").lower())
                    )
                if bad_order:
                    continue
            df = mv.state.read()
            if where is not None:
                df = df.filter(where)
            exact = set(qcols) == gset
            if exact:
                sel = []
                for kind, col, alias in plan:
                    if kind == "group":
                        sel.append(F.col(col))
                    elif kind == "count":
                        sel.append(F.col("n_rows").alias(alias))
                    elif kind in ("sum", "min", "max"):
                        sel.append(F.col(f"{kind}_{col}").alias(alias))
                    else:
                        sel.append(
                            F.hll_sketch_estimate(F.col(f"hll_{col}")).alias(
                                alias
                            )
                        )
                out = df.select(*sel)
            else:
                aggs = []
                for kind, col, alias in plan:
                    if kind == "group":
                        continue
                    if kind == "count":
                        # COALESCE to 0: a global aggregate whose WHERE
                        # matches no state rows must return COUNT = 0
                        # exactly like the scan (SUM over zero rows is
                        # NULL; SQL COUNT never is).
                        aggs.append(
                            F.coalesce(F.sum("n_rows"), F.lit(0))
                            .cast("long")
                            .alias(alias)
                        )
                    elif kind == "sum":
                        aggs.append(F.sum(f"sum_{col}").alias(alias))
                    elif kind == "min":
                        aggs.append(F.min(f"min_{col}").alias(alias))
                    elif kind == "max":
                        aggs.append(F.max(f"max_{col}").alias(alias))
                    else:
                        aggs.append(
                            F.hll_sketch_estimate(
                                F.hll_union_agg(F.col(f"hll_{col}"))
                            ).alias(alias)
                        )
                if not aggs:  # plain DISTINCT-style projection: not ours
                    continue
                out = (
                    df.groupBy(*qcols).agg(*aggs) if qcols else df.agg(*aggs)
                )
                # restore the query's select-list column order
                out = out.select(*[alias for _k, _c, alias in plan])
            if having is not None:
                out = out.filter(having)
            if order_items:
                out = out.orderBy(
                    *[
                        F.col(c).desc() if d == "desc" else F.col(c).asc()
                        for c, d in order_items
                    ]
                )
            if limit is not None:
                out = out.limit(int(limit))
            self.last_select_rewrite = vname
            return out
        return None

    def _create_materialized_view(
        self, name: str, path: str, select_list: str, base_name: str,
        group_by: str,
    ) -> DataFrame:
        """``CREATE MATERIALIZED VIEW v LOCATION '<p>' AS SELECT
        <groups>, COUNT(*) AS n_rows, SUM(c) AS sum_c, MIN(c) AS
        min_c, MAX(c) AS max_c ... FROM t GROUP BY <groups>`` —
        restricted to the incrementally-maintainable aggregate shape
        (count + sums fold exactly; min/max refresh with the
        dirty-group rule — materialized_view.py). ``REFRESH
        MATERIALIZED VIEW v`` then folds the base's change feed;
        ``SELECT ... FROM v`` reads the maintained state. A MIN or MAX
        on a column maintains BOTH extrema (the state always carries
        the pair)."""
        from .sources.materialized_view import MaterializedAggView

        base = self.tables[base_name]
        group_cols = [c.strip() for c in group_by.split(",")]
        sum_cols = []
        minmax_cols: list[str] = []
        approx_cols: list[str] = []
        for item in _split_top_level(select_list):
            if item.strip() in group_cols:
                continue
            mm = re.fullmatch(
                r"(?is)\s*COUNT\s*\(\s*\*\s*\)\s+AS\s+n_rows\s*", item
            )
            if mm:
                continue
            mm = re.fullmatch(
                rf"(?is)\s*SUM\s*\(\s*({_IDENT})\s*\)\s+AS\s+sum_\1\s*",
                item,
            )
            if mm:
                sum_cols.append(mm.group(1))
                continue
            mm = re.fullmatch(
                rf"(?is)\s*(MIN|MAX)\s*\(\s*({_IDENT})\s*\)"
                rf"\s+AS\s+(?:min|max)_\2\s*",
                item,
            )
            if mm:
                if mm.group(2) not in minmax_cols:
                    minmax_cols.append(mm.group(2))
                continue
            mm = re.fullmatch(
                rf"(?is)\s*APPROX_COUNT_DISTINCT\s*\(\s*({_IDENT})\s*\)"
                rf"\s+AS\s+approx_distinct_\1\s*",
                item,
            )
            if mm:
                approx_cols.append(mm.group(1))
                continue
            raise ValueError(
                f"materialized view supports group cols, COUNT(*) AS "
                f"n_rows, SUM(c) AS sum_c, MIN/MAX(c) AS min_c/max_c, "
                f"and APPROX_COUNT_DISTINCT(c) AS approx_distinct_c "
                f"only; got {item!r}"
            )
        mv = MaterializedAggView(
            base, path, group_cols=group_cols, sum_cols=sum_cols,
            minmax_cols=minmax_cols, approx_distinct_cols=approx_cols,
        )
        v = mv.create()
        self._views[name] = mv
        # Persist the view definition beside its state so a NEW session
        # can re-attach it (ATTACH MATERIALIZED VIEW) — the registry is
        # otherwise in-memory only (ADVICE r3).
        import os

        with open(os.path.join(path, "_mv.json"), "w") as f:
            json.dump(
                {
                    "name": name,
                    "base": base_name,
                    "basePath": base.path,
                    "groupCols": group_cols,
                    "sumCols": sum_cols,
                    "minmaxCols": minmax_cols,
                    "approxDistinctCols": approx_cols,
                },
                f,
            )
        return self._df([{"version": v, "location": path}])

    def attach_materialized_view(self, name: str, path: str) -> None:
        """Re-attach a materialized view created by a previous session
        from the ``_mv.json`` definition persisted beside its state
        table."""
        import os

        from .sources.managed_table import ManagedTable
        from .sources.materialized_view import MaterializedAggView

        meta_path = os.path.join(path, "_mv.json")
        if not os.path.isfile(meta_path):
            raise ValueError(
                f"no materialized-view definition at {meta_path}"
            )
        with open(meta_path) as f:
            meta = json.load(f)
        # Bind by the persisted basePath, not the session name: a table
        # REGISTERED under the same name but living elsewhere is a
        # different base — refreshing against it would fold a stranger's
        # deltas into this view's state.
        registered = self.tables.get(meta["base"])
        if registered is not None and registered.path != meta["basePath"]:
            raise ValueError(
                f"attach_materialized_view: session table {meta['base']!r} "
                f"points at {registered.path}, but the view was defined "
                f"over {meta['basePath']}"
            )
        base = registered or ManagedTable(self.spark, meta["basePath"])
        self._views[name] = MaterializedAggView(
            base, path, group_cols=meta["groupCols"],
            sum_cols=meta["sumCols"],
            minmax_cols=meta.get("minmaxCols") or [],
            approx_distinct_cols=meta.get("approxDistinctCols") or [],
        )

    # -- statement handlers --------------------------------------------------

    def _df(self, rows: list[dict]) -> DataFrame:
        return self.spark.createDataFrame([Row(**r) for r in rows])

    def _history(self, name: str, limit: int | None = None) -> DataFrame:
        rows = [
            {
                "version": h["version"],
                "timestamp": h["timestamp"],
                "operation": h["operation"],
                "operationMetrics": json.dumps(
                    h.get("operationMetrics", {}), sort_keys=True
                ),
                # "" (not None) so type inference works on histories
                # with no tagged commit at all.
                "userMetadata": h.get("userMetadata") or "",
            }
            # history(limit) stops after the n newest entries — LIMIT 1
            # on a 10^5-commit table must not parse the whole log.
            for h in self.tables[name].history(limit)
        ]
        return self._df(rows)

    def _detail(self, name: str) -> DataFrame:
        d = dict(self.tables[name].detail())
        for k in ("constraints", "protocol", "properties"):
            d[k] = json.dumps(d.get(k, {}), sort_keys=True)
        return self._df([d])

    def _show_create(self, name: str) -> str:
        """Round-trippable DDL for a registered table: column list with
        IDENTITY / GENERATED clauses, LOCATION, PARTITIONED BY, then
        TBLPROPERTIES and ADD CONSTRAINT statements — everything this
        dialect needs to recreate the table's contract elsewhere."""
        t = self.tables[name]
        idents = t.identity_columns()
        gens = t.generated_columns()
        cols = []
        for f in t.read().schema.fields:
            line = f"  {f.name} {f.dataType.simpleString().upper()}"
            if f.name in idents:
                spec = idents[f.name]
                mode = (
                    "ALWAYS" if spec.get("always", True) else "BY DEFAULT"
                )
                line += (
                    f" GENERATED {mode} AS IDENTITY (START WITH "
                    f"{spec['start']} INCREMENT BY {spec['step']})"
                )
            elif f.name in gens:
                line += f" GENERATED ALWAYS AS ({gens[f.name]})"
            cols.append(line)
        stmt = (
            f"CREATE TABLE {name} (\n"
            + ",\n".join(cols)
            + f"\n) LOCATION '{t.path}'"
        )
        spec = t.partition_spec()
        if spec:
            stmt += f"\nPARTITIONED BY ({', '.join(spec)})"
        for k, v in sorted(t.properties().items()):
            # Quoted: property values may contain commas/spaces (e.g. a
            # multi-column bloomFilterColumns list) and must re-parse.
            vq = str(v).replace("'", "''")
            stmt += f";\nALTER TABLE {name} SET TBLPROPERTIES ({k} = '{vq}')"
        for cname, expr in sorted(t.constraints().items()):
            stmt += f";\nALTER TABLE {name} ADD CONSTRAINT {cname} CHECK ({expr})"
        return stmt

    def _version_at_timestamp(self, name: str, ts: str) -> int:
        """Latest version committed at or before ``ts`` (Delta's
        TIMESTAMP AS OF), from commit-log timestamps alone."""
        from .sources.managed_table import iso_to_epoch_utc

        cutoff = iso_to_epoch_utc(ts)
        versions = [
            h["version"]
            for h in self.tables[name].history()
            if h["timestamp"] <= cutoff
        ]
        if not versions:
            raise ValueError(f"no commit of {name} at or before {ts!r}")
        return max(versions)

    def _earliest_version_at_or_after(self, name: str, ts: str) -> int:
        """Earliest version committed at or after ``ts`` (Delta's CDF
        starting-timestamp rule)."""
        from .sources.managed_table import iso_to_epoch_utc

        cutoff = iso_to_epoch_utc(ts)
        versions = [
            h["version"]
            for h in self.tables[name].history()
            if h["timestamp"] >= cutoff
        ]
        if not versions:
            raise ValueError(f"no commit of {name} at or after {ts!r}")
        return min(versions)

    @staticmethod
    def _fold_matched_clauses(
        clauses: "MergeClauses",
        seq: list[tuple[str, str | None, dict | None]],
    ) -> None:
        """Fold an ORDERED list of WHEN MATCHED clauses into the
        engine's single-clause fields. One clause maps directly; for
        several, Delta's first-match-wins semantics compile to pure SQL
        — each clause's gate is its own condition AND NOT any earlier
        clause's, updates become per-column CASE chains, delete is the
        OR of gated delete terms — so the multi-clause form runs
        through the same driver-verified merge machinery with zero
        engine changes. Like Delta, every non-final clause must carry a
        condition (an unconditional one makes the rest unreachable)."""
        if not seq:
            return
        for kind, cond, _ in seq[:-1]:
            if cond is None:
                raise ValueError(
                    "when there are multiple WHEN MATCHED clauses, only "
                    f"the last may omit its condition (the {kind} clause "
                    "without one makes later clauses unreachable)"
                )
        if len(seq) == 1:
            kind, cond, assigns = seq[0]
            if kind == "delete":
                clauses.matched_delete_condition = cond or "true"
            else:
                clauses.matched_update = assigns
                clauses.matched_condition = cond
            return
        all_cols = sorted(
            {c for kind, _, a in seq if kind == "update" for c in a}
        )
        fired: list[str] = []
        delete_terms: list[str] = []
        update_terms: list[str] = []
        chains: dict[str, list[tuple[str, str]]] = {c: [] for c in all_cols}
        for kind, cond, assigns in seq:
            c = cond or "true"
            gate = f"({c})"
            if fired:
                # NOT(NULL) is NULL; a NULL earlier condition must read
                # as "not satisfied" (Delta falls through to the next
                # clause), so coalesce each negated term to false.
                gate += " AND " + " AND ".join(
                    f"NOT coalesce(({p}), false)" for p in fired
                )
            if kind == "delete":
                delete_terms.append(f"({gate})")
            else:
                update_terms.append(f"({gate})")
                for col in all_cols:
                    chains[col].append(
                        (gate, assigns.get(col, f"target.{col}"))
                    )
            fired.append(c)
        clauses.matched_delete_condition = (
            " OR ".join(delete_terms) if delete_terms else None
        )
        if update_terms:
            clauses.matched_condition = " OR ".join(update_terms)
            clauses.matched_update = {
                col: "CASE "
                + " ".join(
                    f"WHEN {g} THEN ({e})" for g, e in chains[col]
                )
                + f" ELSE target.{col} END"
                for col in all_cols
            }

    @staticmethod
    def _fold_insert_clauses(
        clauses: "MergeClauses",
        seq: list[tuple[str | None, dict]],
    ) -> None:
        """Fold ordered WHEN NOT MATCHED [AND <cond>] THEN INSERT
        clauses: one unconditional clause maps directly; conditional /
        multiple clauses compile first-match-wins to the engine's
        single insert (gate = own condition AND NOT earlier ones,
        values as per-column CASE chains, the overall condition ORs the
        gates — unmatched source rows failing every gate are ignored,
        Delta's rule). Only the last clause may omit its condition."""
        if not seq:
            return
        for cond, _ in seq[:-1]:
            if cond is None:
                raise ValueError(
                    "when there are multiple WHEN NOT MATCHED clauses, "
                    "only the last may omit its condition"
                )
        if len(seq) == 1:
            cond, assigns = seq[0]
            clauses.not_matched_insert = assigns
            clauses.not_matched_condition = cond
            return
        all_cols = sorted({c for _, a in seq for c in a})
        fired: list[str] = []
        gates: list[str] = []
        chains: dict[str, list[tuple[str, str]]] = {c: [] for c in all_cols}
        for cond, assigns in seq:
            c = cond or "true"
            gate = f"({c})"
            if fired:
                # See _fold_matched_clauses: NULL conditions fall through.
                gate += " AND " + " AND ".join(
                    f"NOT coalesce(({p}), false)" for p in fired
                )
            gates.append(f"({gate})")
            for col in all_cols:
                chains[col].append((gate, assigns.get(col, "NULL")))
            fired.append(c)
        clauses.not_matched_condition = " OR ".join(gates)
        clauses.not_matched_insert = {
            col: "CASE "
            + " ".join(f"WHEN {g} THEN ({e})" for g, e in chains[col])
            + " END"
            for col in all_cols
        }

    def _merge(self, text: str) -> DataFrame:
        m = re.match(
            rf"(?is)\s*MERGE\s+INTO\s+({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?"
            rf"\s+USING\s+({_IDENT})(?:\s+AS)?(?:\s+({_IDENT}))?"
            rf"\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            text,
        )
        if not m:
            raise ValueError(f"unsupported MERGE syntax: {text!r}")
        tname, talias, sname, salias, on_cond, when_part = m.groups()
        if tname not in self.tables:
            raise KeyError(f"unknown managed table {tname!r}")
        table = self.tables[tname]
        source = self.spark.table(sname)
        amap = {talias or tname: "target", salias or sname: "updates"}

        clauses = MergeClauses(condition=_qualify(on_cond, amap))
        matched_seq: list[tuple[str, str | None, dict | None]] = []
        insert_seq: list[tuple[str | None, dict]] = []
        for not_kw, by_kw, and_cond, action in re.findall(
            r"(?is)WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+(?:SOURCE|TARGET))?"
            r"(?:\s+AND\s+(.*?))?\s+THEN\s+"
            r"(UPDATE\s+SET\s+.*?|DELETE|INSERT\s+.*?)(?=\s+WHEN\s+|\s*$)",
            when_part,
        ):
            cond = _qualify(and_cond, amap) if and_cond.strip() else None
            act = action.strip()
            by_source = "source" in by_kw.lower()
            if by_source and not not_kw:
                raise ValueError("WHEN MATCHED BY SOURCE is not SQL")
            if not_kw and by_source:
                # Delta 2.3+: WHEN NOT MATCHED BY SOURCE THEN
                # UPDATE SET ... | DELETE (target-only expressions).
                if act.upper() == "DELETE":
                    clauses.by_source_delete_condition = cond or "true"
                    continue
                upd = re.match(r"(?is)UPDATE\s+SET\s+(.*)$", act)
                if not upd:
                    raise ValueError(
                        f"WHEN NOT MATCHED BY SOURCE needs UPDATE/DELETE: {act!r}"
                    )
                clauses.by_source_update = {}
                for assign in _split_top_level(upd.group(1).strip()):
                    lhs, rhs = assign.split("=", 1)
                    col = lhs.strip().split(".")[-1]
                    clauses.by_source_update[col] = _qualify(rhs.strip(), amap)
                clauses.by_source_update_condition = cond
                continue
            if not_kw:
                ins = re.match(r"(?is)INSERT\s+(.*)$", act)
                if not ins:
                    raise ValueError(f"WHEN NOT MATCHED needs INSERT: {act!r}")
                body = ins.group(1).strip()
                if body == "*":
                    assigns = {c: f"updates.{c}" for c in source.columns}
                else:
                    cv = re.match(
                        r"(?is)\((.*?)\)\s*VALUES\s*\((.*)\)\s*$", body
                    )
                    if not cv:
                        raise ValueError(f"bad INSERT clause: {body!r}")
                    cols = [c.strip() for c in cv.group(1).split(",")]
                    vals = [
                        _qualify(v.strip(), amap)
                        for v in _split_top_level(cv.group(2))
                    ]
                    assigns = dict(zip(cols, vals))
                insert_seq.append((cond, assigns))
            elif act.upper() == "DELETE":
                matched_seq.append(("delete", cond, None))
            else:
                upd = re.match(r"(?is)UPDATE\s+SET\s+(.*)$", act)
                if not upd:
                    raise ValueError(f"WHEN MATCHED needs UPDATE/DELETE: {act!r}")
                body = upd.group(1).strip()
                if body == "*":
                    tcols = set(self.tables[tname].read().columns)
                    assigns = {
                        c: f"updates.{c}" for c in source.columns if c in tcols
                    }
                else:
                    assigns = {}
                    for assign in _split_top_level(body):
                        lhs, rhs = assign.split("=", 1)
                        col = lhs.strip().split(".")[-1]
                        assigns[col] = _qualify(rhs.strip(), amap)
                matched_seq.append(("update", cond, assigns))
        self._fold_matched_clauses(clauses, matched_seq)
        self._fold_insert_clauses(clauses, insert_seq)
        v = table.merge(source, clauses)
        return self._df([{"version": v, **table.history(1)[0]["operationMetrics"]}])

    # -- dispatcher ----------------------------------------------------------

    def sql(self, text: str) -> DataFrame:
        t = text.strip().rstrip(";")
        # Which materialized view (if any) transparently answered the
        # last SELECT — observability for tests and EXPLAIN-style
        # debugging of the rewrite. last_select_strategy records the
        # routing decision: "mv_rewrite:<view>", "metadata_only", or
        # "scan" (None for non-SELECT statements).
        self.last_select_rewrite = None
        self.last_select_strategy = None

        m = re.match(r"(?is)^EXPLAIN\s+(.+)$", t)
        if m:
            # EXPLAIN <select>: run the normal SELECT routing (those
            # plans are lazy — no job executes) and report WHICH
            # engine path answers plus the physical plan: the
            # observability for the metadata-only and MV-rewrite fast
            # paths, which Spark's own EXPLAIN cannot see. SELECT
            # ONLY: explaining a DML/DDL statement would EXECUTE it
            # (commits and all), so anything else is refused.
            if not re.match(r"(?is)^\s*SELECT\b", m.group(1)):
                raise ValueError(
                    "EXPLAIN supports SELECT statements only (a DML/DDL "
                    "statement would execute, not plan)"
                )
            df = self.sql(m.group(1))
            from .plans.introspect import explain_str

            return self._df(
                [
                    {
                        "strategy": self.last_select_strategy
                        or "statement",
                        "plan": explain_str(df)[:4000],
                    }
                ]
            )

        m = re.match(
            rf"(?is)^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+({_IDENT})"
            rf"\s+LOCATION\s+'([^']+)'"
            rf"(?:\s+PARTITIONED\s+BY\s*\((.*?)\))?"
            rf"(?:\s+CLUSTER\s+BY\s*\((.*?)\))?\s+AS\s+(.*)$",
            t,
        )
        if m:
            replace, name, path, pcols, ccols, select = m.groups()
            df = self.sql(select)
            table = ManagedTable(self.spark, path)
            if replace and table.exists():
                new_spec = (
                    [c.strip() for c in pcols.split(",")] if pcols else []
                )
                if new_spec != (table.partition_spec() or []):
                    raise ValueError(
                        "CREATE OR REPLACE cannot change the partition "
                        f"spec of {name} (existing "
                        f"{table.partition_spec() or []}, requested "
                        f"{new_spec}); DROP and recreate instead"
                    )
                # Delta's CREATE OR REPLACE is also a metadata RESET:
                # specs the new definition does not re-declare
                # (clusterBy, CHECK constraints, identity, generated
                # columns) do not survive it — cleared BEFORE the write
                # so the old constraints cannot gate the new data. The
                # CLUSTER BY clause, when present, is re-applied below.
                # Delta's REPLACE is transactional, so a FAILED
                # overwrite (bad data, IO error) must leave the prior
                # definition intact: snapshot the metadata sidecars and
                # restore them if the commit does not land.
                sidecar_snapshot = {}
                for sp in (
                    table._properties_path(),
                    table._constraints_path(),
                    table._identity_path(),
                    table._generated_path(),
                    table._defaults_path(),
                ):
                    if os.path.isfile(sp):
                        with open(sp, "rb") as f:
                            sidecar_snapshot[sp] = f.read()
                table.set_cluster_by(None)
                for cname in list(table.constraints()):
                    table.drop_constraint(cname)
                table.clear_identity_columns()
                table.clear_generated_columns()
                table.clear_column_defaults()
                try:
                    # ... and a forward-written overwrite commit —
                    # prior versions stay time-travelable.
                    v = table.overwrite(
                        df,
                        overwrite_schema=True,
                        operation="REPLACE TABLE",
                    )
                except BaseException:
                    for sp in (
                        table._properties_path(),
                        table._constraints_path(),
                        table._identity_path(),
                        table._generated_path(),
                        table._defaults_path(),
                    ):
                        if sp in sidecar_snapshot:
                            with open(sp, "wb") as f:
                                f.write(sidecar_snapshot[sp])
                        elif os.path.isfile(sp):
                            os.remove(sp)
                    raise
            else:
                v = table.create(
                    df,
                    partition_by=(
                        [c.strip() for c in pcols.split(",")]
                        if pcols
                        else None
                    ),
                )
            if ccols:
                table.set_cluster_by([c.strip() for c in ccols.split(",")])
            self.register(name, table)
            return self._df([{"version": v, "location": path}])
        m = re.match(
            rf"(?is)^TRUNCATE\s+TABLE\s+({_IDENT})$", t
        )
        if m:
            name = m.group(1)
            table = self.tables[name]
            n = table.row_count() or table.read().count()
            v = table.delete("true")
            return self._df([{"version": v, "numRemovedRows": n}])
        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s*\((.*)\)\s+"
            rf"LOCATION\s+'([^']+)'(?:\s+PARTITIONED\s+BY\s*\((.*?)\))?"
            rf"(?:\s+CLUSTER\s+BY\s*\((.*?)\))?$",
            t,
        )
        if m:
            name, coldefs, path, pcols, ccols = m.groups()
            fields, idents, gens, notnulls = [], {}, {}, []
            defaults: dict[str, str] = {}
            for cd in _split_top_level(coldefs):
                cm = re.match(
                    rf"(?is)^\s*({_IDENT})\s+([A-Za-z0-9_]+"
                    r"(?:\([0-9, ]*\))?)\s*(.*?)\s*$",
                    cd,
                )
                if not cm:
                    raise ValueError(f"cannot parse column definition {cd!r}")
                cname, ctype, rest = cm.groups()
                fields.append(f"{cname} {ctype}")
                # Post-type clauses may appear in ANY order and combine
                # ('cents BIGINT DEFAULT 0 NOT NULL', 'NOT NULL DEFAULT
                # 0') — consume them one at a time rather than matching
                # the whole tail at once, so a DEFAULT expression stops
                # before a following clause keyword instead of
                # swallowing it.
                while rest:
                    nn = re.match(r"(?is)^NOT\s+NULL\b\s*(.*)$", rest)
                    if nn:
                        notnulls.append(cname)
                        rest = nn.group(1).strip()
                        continue
                    im = re.match(
                        r"(?is)^GENERATED\s+(ALWAYS|BY\s+DEFAULT)"
                        r"\s+AS\s+IDENTITY"
                        r"(?:\s*\(\s*START\s+WITH\s+(\d+)"
                        r"(?:\s+INCREMENT\s+BY\s+(\d+))?\s*\))?\s*(.*)$",
                        rest,
                    )
                    if im:
                        idents[cname] = (
                            int(im.group(2) or 1),
                            int(im.group(3) or 1),
                            im.group(1).upper() == "ALWAYS",
                        )
                        rest = im.group(4).strip()
                        continue
                    gm = re.match(
                        r"(?is)^GENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*$",
                        rest,
                    )
                    if gm:
                        gens[cname] = gm.group(1).strip()
                        rest = ""
                        continue
                    dm = re.match(
                        r"(?is)^DEFAULT\s+(.+?)"
                        r"(?=\s+NOT\s+NULL\b|\s+GENERATED\s+ALWAYS\b|$)"
                        r"\s*(.*)$",
                        rest,
                    )
                    if dm:
                        defaults[cname] = dm.group(1).strip()
                        rest = dm.group(2).strip()
                        continue
                    raise ValueError(
                        f"cannot parse column definition {cd!r}"
                    )
            empty = self.spark.createDataFrame([], ", ".join(fields))
            table = ManagedTable(self.spark, path)
            v = table.create(
                empty,
                partition_by=(
                    [c.strip() for c in pcols.split(",")] if pcols else None
                ),
            )
            for cname, (istart, istep, ialways) in idents.items():
                table.set_identity_column(
                    cname, start=istart, step=istep, always=ialways
                )
            for cname, gexpr in gens.items():
                table.set_generated_column(cname, gexpr)
            for cname, dexpr in defaults.items():
                table.set_column_default(cname, dexpr)
            for cname in notnulls:
                table.add_constraint(
                    f"{cname}_not_null", f"{cname} IS NOT NULL"
                )
            if ccols:
                table.set_cluster_by([c.strip() for c in ccols.split(",")])
            self.register(name, table)
            return self._df([{"version": v, "location": path}])
        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s+(SHALLOW|DEEP)\s+CLONE\s+"
            rf"({_IDENT})(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
            rf"\s+LOCATION\s+'([^']+)'$",
            t,
        )
        if m:
            name, kind, src, ver, path = m.groups()
            src_table = self.tables[src]
            v = int(ver) if ver is not None else None
            table = (
                src_table.deep_clone(path, version=v)
                if kind.upper() == "DEEP"
                else src_table.clone(path, version=v)
            )
            self.register(name, table)
            return self._df(
                [{"version": 0, "location": path, "source": src}]
            )
        m = re.match(
            rf"(?is)^CONVERT\s+TO\s+MANAGED\s+(?:PARQUET\s+)?'([^']+)'"
            rf"(?:\s+AS\s+({_IDENT}))?$",
            t,
        )
        if m:
            path, name = m.groups()
            table = ManagedTable.convert(self.spark, path)
            if name:
                self.register(name, table)
            met = table.history(1)[0]["operationMetrics"]
            return self._df(
                [{"location": path, **{k: v for k, v in met.items()}}]
            )
        m = re.match(
            rf"(?is)^INSERT\s+(?:INTO\s+({_IDENT})\s+REPLACE\s+WHERE\s+"
            rf"(.+?)|OVERWRITE\s+(?:TABLE\s+)?({_IDENT}))\s+"
            r"(SELECT\s+.*|VALUES\s*.*)$",
            t,
        )
        if m:
            # Delta's INSERT overwrite forms: `INSERT INTO t REPLACE
            # WHERE <cond> <query>` atomically replaces exactly the
            # matching slice (replace_where, validated); `INSERT
            # OVERWRITE [TABLE] t <query>` replaces the whole snapshot
            # (time travel keeps the history).
            rw_name, rw_cond, ow_name, body = m.groups()
            name = rw_name or ow_name
            table = self.tables[name]
            schema = table.read().schema
            cols = schema.fieldNames()
            if body.upper().startswith("VALUES"):
                df = self.spark.sql(body).toDF(*cols)
            else:
                df = self.sql(body).toDF(*cols)
            # VALUES literals infer narrow types (INT for a BIGINT
            # column); an overwrite must not read that as a schema
            # change — align to the table's declared types.
            df = df.select(
                *[F.col(c).cast(schema[c].dataType) for c in cols]
            )
            if rw_cond is not None:
                v = table.overwrite_where(df, rw_cond.strip())
            else:
                v = table.overwrite(df)
            met = table.history(1)[0]["operationMetrics"]
            return self._df(
                [
                    {
                        "version": v,
                        **{k: v2 for k, v2 in met.items() if v2 is not None},
                    }
                ]
            )
        m = re.match(
            rf"(?is)^INSERT\s+INTO\s+({_IDENT})\s*(?:\(([^)]*)\))?\s+"
            r"(SELECT\s+.*|VALUES\s*.*)$",
            t,
        )
        if m:
            name, col_list, body = m.groups()
            table = self.tables[name]
            # Positional binding follows the table's CURRENT column
            # order (hive layout puts partition columns last) — name
            # the columns explicitly to be order-independent.
            cols = (
                [c.strip() for c in col_list.split(",")]
                if col_list
                else table.read().columns
            )
            if body.upper().startswith("VALUES"):
                df = self.spark.sql(body).toDF(*cols)
            else:
                df = self.sql(body).toDF(*cols)
            v = table.append(df)
            met = table.history(1)[0]["operationMetrics"]
            return self._df([{"version": v, **{k: v2 for k, v2 in met.items() if v2 is not None}}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+SET\s+TBLPROPERTIES\s*"
            r"\(\s*'?([^'=,\s]+)'?\s*=\s*"
            r"(?:'((?:[^']|'')*)'|([^'),\s]+))\s*\)$",
            t,
        )
        if m:
            name, key, vq, vbare = m.groups()
            value = vq.replace("''", "'") if vq is not None else vbare
            self.tables[name].set_property(key, value)
            return self._df([{"key": key, "value": value}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+CLUSTER\s+BY\s+"
            r"(?:NONE|\((.*?)\))$",
            t,
        )
        if m:
            name, ccols = m.groups()
            cols = (
                [c.strip() for c in ccols.split(",")] if ccols else None
            )
            self.tables[name].set_cluster_by(cols)
            return self._df(
                [{"clusterBy": ",".join(cols) if cols else "NONE"}]
            )
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+"
            rf"({_IDENT})\s+CHECK\s*\((.+)\)$",
            t,
        )
        if m:
            name, cname, expr = m.groups()
            self.tables[name].add_constraint(cname, expr)
            return self._df([{"constraint": cname, "check": expr}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+(SET|DROP)\s+NOT\s+NULL$",
            t,
        )
        if m:
            name, col, action = m.groups()
            cname = f"{col}_not_null"
            if action.upper() == "SET":
                # Delta's NOT NULL: validated against the current
                # snapshot, enforced on every later write — sugar over
                # the CHECK machinery.
                self.tables[name].add_constraint(cname, f"{col} IS NOT NULL")
            else:
                self.tables[name].drop_constraint(cname)
            return self._df(
                [{"column": col, "notNull": action.upper() == "SET"}]
            )
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+SET\s+DEFAULT\s+(.+)$",
            t,
        )
        if m:
            name, col, expr = m.groups()
            self.tables[name].set_column_default(col, expr.strip())
            return self._df([{"column": col, "default": expr.strip()}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+DROP\s+DEFAULT$",
            t,
        )
        if m:
            name, col = m.groups()
            self.tables[name].drop_column_default(col)
            return self._df([{"column": col, "defaultDropped": True}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+"
            rf"({_IDENT})$",
            t,
        )
        if m:
            name, cname = m.groups()
            self.tables[name].drop_constraint(cname)
            return self._df([{"constraint": cname, "dropped": True}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMN\s*\(?\s*"
            rf"({_IDENT})\s+([A-Za-z0-9_]+(?:\([0-9, ]*\))?)\s*\)?$",
            t,
        )
        if m:
            name, col, dtype = m.groups()
            v = self.tables[name].alter_add_column(col, dtype)
            return self._df([{"version": v, "column": col, "type": dtype}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+TYPE\s+([A-Za-z0-9_]+(?:\([0-9, ]*\))?)$",
            t,
        )
        if m:
            name, col, dtype = m.groups()
            v = self.tables[name].alter_widen_column(col, dtype)
            return self._df([{"version": v, "column": col, "type": dtype}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+"
            rf"({_IDENT})\s+TO\s+({_IDENT})$",
            t,
        )
        if m:
            name, old, new = m.groups()
            v = self.tables[name].alter_rename_column(old, new)
            return self._df([{"version": v, "from": old, "to": new}])
        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+({_IDENT})$",
            t,
        )
        if m:
            name, col = m.groups()
            v = self.tables[name].alter_drop_column(col)
            return self._df([{"version": v, "dropped": col}])
        m = re.match(
            rf"(?is)^COPY\s+INTO\s+({_IDENT})\s+FROM\s+'([^']+)'"
            r"(?:\s+FILEFORMAT\s*=\s*(\w+))?(?:\s+PATTERN\s*=\s*'([^']+)')?$",
            t,
        )
        if m:
            name, src, fmt, pattern = m.groups()
            table = self.tables[name]
            before = table.latest_version()
            v = table.copy_into(src, format=(fmt or "parquet").lower(), pattern=pattern)
            loaded = (
                table.history(1)[0].get("copyIntoFiles", []) if v != before else []
            )
            return self._df([{"version": v, "numFiles": len(loaded)}])
        m = re.match(rf"(?is)^SHOW\s+PARTITIONS\s+({_IDENT})$", t)
        if m:
            table = self.tables[m.group(1)]
            spec = table.partition_spec()
            if not spec:
                raise ValueError(f"{m.group(1)} is not partitioned")
            return (
                table.read().select(*spec).distinct().orderBy(*spec)
            )
        m = re.match(
            rf"(?is)^DESCRIBE\s+HISTORY\s+({_IDENT})(?:\s+LIMIT\s+(\d+))?$", t
        )
        if m:
            return self._history(
                m.group(1), int(m.group(2)) if m.group(2) else None
            )
        m = re.match(rf"(?is)^DESCRIBE\s+DETAIL\s+({_IDENT})$", t)
        if m:
            return self._detail(m.group(1))
        m = re.match(
            rf"(?is)^ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS"
            rf"(?:\s+FOR\s+COLUMNS\s*\(([^)]*)\))?"
            rf"(\s+WITH\s+EXACT\s+NDV)?$",
            t,
        )
        if m:
            name, collist, exact = m.groups()
            table = self.tables[name]
            stats = table.analyze(
                columns=(
                    [c.strip() for c in collist.split(",")] if collist else None
                ),
                exact_ndv=bool(exact),
            )
            return self._df(
                [
                    {
                        "analyzed_version": stats["analyzedVersion"],
                        "row_count": stats["rowCount"],
                        "n_columns": len(stats["columns"]),
                        "exact_ndv": stats["exactNdv"],
                    }
                ]
            )
        m = re.match(rf"(?is)^SHOW\s+STATS\s+(?:FOR\s+)?({_IDENT})$", t)
        if m:
            table = self.tables[m.group(1)]
            st = table.column_stats()
            if st is None:
                raise ValueError(
                    f"{m.group(1)} has no statistics; run ANALYZE TABLE first"
                )
            rows = [
                {
                    "col_name": c,
                    "row_count": st["rowCount"],
                    "ndv": cs["ndv"],
                    "null_count": cs["nullCount"],
                    "min_val": cs["min"],
                    "max_val": cs["max"],
                    "avg_len": cs["avgLen"],
                    "stale": st["stale"],
                }
                for c, cs in sorted(st["columns"].items())
            ]
            return self._df(rows)
        m = re.match(rf"(?is)^DESCRIBE\s+(?:TABLE\s+)?({_IDENT})$", t)
        if m:
            name = m.group(1)
            table = self.tables[name]
            df = table.read()
            spec = set(table.partition_spec() or [])
            ccols = set(table.cluster_by())
            idents = set(table.identity_columns())
            gens = set(table.generated_columns() or {})
            rows = []
            for c, dt in df.dtypes:
                tags = [
                    tag
                    for tag, hit in (
                        ("partition", c in spec),
                        ("cluster", c in ccols),
                        ("identity", c in idents),
                        ("generated", c in gens),
                    )
                    if hit
                ]
                rows.append(
                    {
                        "col_name": c,
                        "data_type": dt,
                        "comment": ", ".join(tags),
                    }
                )
            return self._df(rows)
        m = re.match(
            rf"(?is)^VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+HOURS)?"
            r"(?:\s+KEEP\s+LAST\s+(\d+))?(\s+DRY\s+RUN)?$",
            t,
        )
        if m:
            name, hours, keep, dry = m.groups()
            removed = self.tables[name].vacuum(
                keep_last=int(keep) if keep else 2,
                older_than_s=float(hours) * 3600 if hours else None,
                dry_run=bool(dry),
            )
            return self._df(
                [
                    {
                        "removedVersions": json.dumps(removed),
                        "dryRun": bool(dry),
                    }
                ]
            )
        m = re.match(rf"(?is)^SHOW\s+TBLPROPERTIES\s+({_IDENT})$", t)
        if m:
            props = self.tables[m.group(1)].properties()
            return self.spark.createDataFrame(
                sorted((k, str(v)) for k, v in props.items()),
                "key string, value string",
            )
        m = re.match(rf"(?is)^SHOW\s+CREATE\s+TABLE\s+({_IDENT})$", t)
        if m:
            name = m.group(1)
            return self._df(
                [{"createtab_stmt": self._show_create(name)}]
            )
        m = re.match(
            rf"(?is)^OPTIMIZE\s+({_IDENT})(?:\s+(FULL))?(?:\s+WHERE\s+(.*?))?"
            r"(?:\s+ZORDER\s+BY\s*\((.*?)\))?$",
            t,
        )
        if m:
            name, full, where, zcols = m.groups()
            table = self.tables[name]
            if where and zcols:
                raise ValueError(
                    "OPTIMIZE ... WHERE and ZORDER BY cannot be combined"
                )
            if full:
                # Delta's OPTIMIZE FULL: re-cluster EVERYTHING (bare
                # OPTIMIZE on a clustered table is incremental — only
                # the small-file tier joins the clustered layout).
                ccols = table.cluster_by()
                if not ccols:
                    raise ValueError(
                        "OPTIMIZE FULL requires a CLUSTER BY spec"
                    )
                v = table.optimize_zorder(ccols)
            elif zcols:
                v = table.optimize_zorder([c.strip() for c in zcols.split(",")])
            elif where:
                # Predicate-scoped compaction: only files holding
                # matching rows are rewritten (file-level manifest).
                v = table.compact_where(where)
            else:
                # Delta semantics: bare OPTIMIZE bin-packs the small
                # files only; full rewrite only when there is nothing
                # to bin (single-file table) so the statement always
                # commits a version.
                v = table.optimize()
                if v is None:
                    v = table.compact()
            return self._df([{"version": v, "operation": table.history(1)[0]["operation"]}])
        m = re.match(
            rf"(?is)^REORG\s+TABLE\s+({_IDENT})\s+APPLY\s*\(\s*PURGE\s*\)$",
            t,
        )
        if m:
            name = m.group(1)
            v = self.tables[name].reorg_purge()
            met = (
                self.tables[name].history(1)[0].get("operationMetrics", {})
                if v is not None
                else {}
            )
            return self._df(
                [
                    {
                        # -1 = nothing to purge (no DV on the snapshot)
                        "version": -1 if v is None else v,
                        "purged": v is not None,
                        **{k: x for k, x in met.items() if x is not None},
                    }
                ]
            )
        m = re.match(
            rf"(?is)^RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+(?:TO\s+)?"
            r"VERSION\s+AS\s+OF\s+(\d+)$",
            t,
        )
        if m:
            name, ver = m.groups()
            v = self.tables[name].restore(int(ver))
            return self._df([{"version": v, "restoredVersion": int(ver)}])
        m = re.match(
            rf"(?is)^RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+(?:TO\s+)?"
            r"TIMESTAMP\s+AS\s+OF\s+'([^']+)'$",
            t,
        )
        if m:
            name, ts = m.groups()
            ver = self._version_at_timestamp(name, ts)
            v = self.tables[name].restore(ver)
            return self._df([{"version": v, "restoredVersion": ver}])
        m = re.match(
            rf"(?is)^DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.*)$", t
        )
        if m:
            name, cond = m.groups()
            v = self.tables[name].delete(cond)
            met = self.tables[name].history(1)[0]["operationMetrics"]
            # None-valued metrics (legacy chains without row accounting)
            # break createDataFrame's type inference.
            return self._df(
                [{"version": v, **{k: x for k, x in met.items() if x is not None}}]
            )
        m = re.match(
            rf"(?is)^UPDATE\s+({_IDENT})\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", t
        )
        if m:
            name, sets, cond = m.groups()
            set_exprs = {}
            for assign in _split_top_level(sets):
                lhs, rhs = assign.split("=", 1)
                set_exprs[lhs.strip()] = rhs.strip()
            v = self.tables[name].update(set_exprs, cond)
            met = self.tables[name].history(1)[0]["operationMetrics"]
            return self._df(
                [{"version": v, **{k: x for k, x in met.items() if x is not None}}]
            )
        if re.match(r"(?is)^MERGE\s+INTO\s", t):
            return self._merge(t)
        m = re.match(
            rf"(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+"
            rf"LOCATION\s+'([^']+)'\s+AS\s+SELECT\s+(.*?)\s+FROM\s+"
            rf"({_IDENT})\s+GROUP\s+BY\s+(.*)$",
            t,
        )
        if m:
            return self._create_materialized_view(*m.groups())
        m = re.match(
            rf"(?is)^ATTACH\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+"
            r"LOCATION\s+'([^']+)'$",
            t,
        )
        if m:
            name, path = m.groups()
            self.attach_materialized_view(name, path)
            return self._df([{"view": name, "location": path}])
        m = re.match(
            rf"(?is)^REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})$", t
        )
        if m:
            name = m.group(1)
            if name not in self._views:
                raise ValueError(
                    f"unknown materialized view {name!r} (known: "
                    f"{sorted(self._views) or 'none'}); a view created "
                    "by another session can be re-attached with ATTACH "
                    "MATERIALIZED VIEW <name> LOCATION '<path>'"
                )
            mv = self._views[name]
            v = mv.refresh()
            return self._df(
                [{"version": v, "stale": mv.is_stale()}]
            )

        # Metadata-only aggregates (Delta's OptimizeMetadataOnlyQuery):
        # a bare COUNT(*)/MIN(col)/MAX(col) list over a managed table is
        # answered from the commit log — row accounting for the count,
        # per-file footer stats for the extrema — O(log), zero files
        # opened, at any table size. Any WHERE/grouping/expression (or
        # a snapshot whose metadata can't PROVE the answer: live DVs,
        # stats gaps) falls through to the real scan.
        m = re.match(
            rf"(?is)^SELECT\s+(.+?)\s+FROM\s+({_IDENT})"
            rf"\s*(?:VERSION\s+AS\s+OF\s+(\d+))?"
            rf"(?:\s+WHERE\s+({_IDENT})\s*=\s*"
            rf"(?:'((?:[^']|'')*)'|(-?\d+(?:\.\d+)?)))?$",
            t,
        )
        if m and m.group(2) in self.tables:
            name, ver = m.group(2), m.group(3)
            wcol, wstr, wnum = m.group(4), m.group(5), m.group(6)
            wval = None
            if wcol is not None:
                wval = (
                    wstr.replace("''", "'")
                    if wstr is not None
                    else (float(wnum) if "." in wnum else int(wnum))
                )
            v = int(ver) if ver else None
            table = self.tables[name]
            parsed = []
            for item in _split_top_level(m.group(1)):
                am = re.match(
                    rf"(?is)^\s*(COUNT\s*\(\s*\*\s*\)|"
                    rf"(?:MIN|MAX)\s*\(\s*{_IDENT}\s*\))"
                    rf"\s*(?:AS\s+({_IDENT}))?\s*$",
                    item,
                )
                if not am:
                    parsed = None
                    break
                expr = re.sub(r"\s+", "", am.group(1)).lower()
                parsed.append((expr, am.group(2)))
            if parsed:
                state = table._state(
                    table.latest_version() if v is None else v
                )
                schema = table._schema_of(state)
                cols, ok = [], True
                minmax_cache: dict[str, tuple | None] = {}
                for expr, alias in parsed:
                    if expr == "count(*)":
                        # WHERE col = literal: countable when every
                        # file is provably pure or excluded for the
                        # value (hive partitions always are).
                        n = (
                            table.stats_count_where_eq(wcol, wval, v)
                            if wcol is not None
                            else table.row_count(v)
                        )
                        if n is None:
                            ok = False
                            break
                        cols.append(
                            F.lit(n)
                            .cast("long")  # COUNT(*) is BIGINT in SQL
                            .alias(alias or "count(1)")
                        )
                        continue
                    kind, col = expr[:3], expr[4:-1]
                    if wcol is not None:
                        ok = False  # filtered MIN/MAX needs a scan
                        break
                    if schema is None or col not in schema.fieldNames():
                        ok = False
                        break
                    if col not in minmax_cache:
                        minmax_cache[col] = table.stats_min_max(col, v)
                    mm = minmax_cache[col]
                    if mm is None:
                        ok = False
                        break
                    val = mm[0] if kind == "min" else mm[1]
                    cols.append(
                        F.lit(val)
                        .cast(schema[col].dataType)
                        .alias(alias or f"{kind}({col})")
                    )
                if ok:
                    self.last_select_strategy = "metadata_only"
                    return self.spark.range(1).select(*cols)

        # Transparent materialized-view query rewrite (the classic
        # warehouse optimization): an aggregate SELECT over a BASE
        # table is answered from a FRESH maintained view whose grain
        # covers it — zero base reads. Falls through to the real scan
        # on any shape the rewrite cannot PROVE equivalent.
        m = re.match(
            rf"(?is)^SELECT\s+(.+?)\s+FROM\s+({_IDENT})"
            rf"(?:\s+WHERE\s+(.+?))?"
            rf"(?:\s+GROUP\s+BY\s+([\w\s,]+?))?"
            rf"(?:\s+HAVING\s+(.+?))?"
            rf"(?:\s+ORDER\s+BY\s+([\w\s,]+?))?"
            rf"(?:\s+LIMIT\s+(\d+))?$",
            t,
        )
        if m and m.group(2) in self.tables:
            rewritten = self._try_mv_rewrite(*m.groups())
            if rewritten is not None:
                self.last_select_strategy = (
                    f"mv_rewrite:{self.last_select_rewrite}"
                )
                return rewritten

        # Per-commit CDC (Delta's actual table_changes shape): one row
        # per change per COMMIT with _commit_version/_commit_timestamp,
        # served from recorded cdc files / add actions / exact
        # per-commit diffs. Start version 0 = initial snapshot as
        # inserts, like Delta.
        def tc_pc(m2):
            name, v0, v1 = m2.group(1), int(m2.group(2)), m2.group(3)
            view = (
                f"{name}__cchanges_{v0}_"
                f"{'head' if v1 is None else v1}"
            )
            self.tables[name].table_changes_per_commit(
                v0, int(v1) if v1 else None
            ).createOrReplaceTempView(view)
            return view

        t = re.sub(
            rf"(?is)\btable_changes_per_commit\s*\(\s*'?({_IDENT})'?\s*,"
            r"\s*(\d+)(?:\s*,\s*(\d+))?\s*\)",
            tc_pc,
            t,
        )

        # Timestamp forms, same resolution rules as the net feed's:
        # start -> earliest commit at or after, end -> latest at or
        # before, both inclusive.
        def tc_pc_ts(m2):
            name, ts0, ts1 = m2.group(1), m2.group(2), m2.group(3)
            v0 = self._earliest_version_at_or_after(name, ts0)
            v1 = self._version_at_timestamp(name, ts1) if ts1 else None
            view = (
                f"{name}__cchanges_{v0}_"
                f"{'head' if v1 is None else v1}"
            )
            self.tables[name].table_changes_per_commit(
                v0, v1
            ).createOrReplaceTempView(view)
            return view

        t = re.sub(
            rf"(?is)\btable_changes_per_commit\s*\(\s*'?({_IDENT})'?\s*,"
            r"\s*'([^']+)'(?:\s*,\s*'([^']+)')?\s*\)",
            tc_pc_ts,
            t,
        )

        # Delta's CDF table-valued function: table_changes('t', v0[, v1])
        # becomes a temp view over ManagedTable.change_feed — usable
        # anywhere a relation is (joins, CTEs, aggregates). Delta
        # semantics: the start version is INCLUSIVE (the changes commit
        # v0 itself made are returned), so it maps to the snapshot diff
        # (v0-1) -> v1. Version 0 is the initial snapshot, not a
        # change — read the table (or time-travel) for it.
        def _tc_view(name: str, v0: int, v1: int | None) -> str:
            if v0 < 1:
                raise ValueError(
                    "table_changes: start version must be >= 1 (version "
                    "0 is the initial snapshot — read the table VERSION "
                    "AS OF 0 instead)"
                )
            view = f"{name}__changes_{v0}_{'head' if v1 is None else v1}"
            self.tables[name].change_feed(
                v0 - 1, v1
            ).createOrReplaceTempView(view)
            return view

        def tc(m2):
            name, v0, v1 = m2.group(1), int(m2.group(2)), m2.group(3)
            return _tc_view(name, v0, int(v1) if v1 else None)

        t = re.sub(
            rf"(?is)\btable_changes\s*\(\s*'?({_IDENT})'?\s*,\s*(\d+)"
            r"(?:\s*,\s*(\d+))?\s*\)",
            tc,
            t,
        )

        # Timestamp forms (Delta CDF): the start maps to the EARLIEST
        # commit at or after it, the end to the LATEST commit at or
        # before it — both inclusive, like the version form.
        def tc_ts(m2):
            name, ts0, ts1 = m2.group(1), m2.group(2), m2.group(3)
            v0 = self._earliest_version_at_or_after(name, ts0)
            v1 = self._version_at_timestamp(name, ts1) if ts1 else None
            return _tc_view(name, v0, v1)

        t = re.sub(
            rf"(?is)\btable_changes\s*\(\s*'?({_IDENT})'?\s*,\s*"
            r"'([^']+)'(?:\s*,\s*'([^']+)')?\s*\)",
            tc_ts,
            t,
        )

        # Plain SQL: resolve time travel, expose current snapshots as
        # temp views, delegate to Spark's parser/optimizer.
        for name, mv in getattr(self, "_views", {}).items():
            if re.search(rf"\b{re.escape(name)}\b", t):
                mv.read().createOrReplaceTempView(name)
        for name, table in self.tables.items():
            def tt(m2, table=table, name=name):
                if m2.group(1) is not None:
                    ver = int(m2.group(1))
                else:
                    ver = self._version_at_timestamp(name, m2.group(2))
                view = f"{name}__v{ver}"
                table.read(ver).createOrReplaceTempView(view)
                return view

            t = re.sub(
                rf"(?is)\b{re.escape(name)}\s+(?:VERSION\s+AS\s+OF\s+(\d+)"
                rf"|TIMESTAMP\s+AS\s+OF\s+'([^']+)')",
                tt,
                t,
            )
            if re.search(rf"\b{re.escape(name)}\b", t):
                table.read().createOrReplaceTempView(name)
        self.last_select_strategy = "scan"
        return self.spark.sql(t)


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses or quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts
