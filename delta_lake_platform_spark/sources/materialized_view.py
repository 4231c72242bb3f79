"""Incrementally-maintained aggregate views over a ManagedTable.

The platform analogue of a materialized view with delta-based refresh
(Databricks/Snowflake MVs, Materialize-style IVM): the view stores
per-group partial aggregates, and ``refresh()`` folds in only the rows
that changed since the last refresh — read from the base table's
change feed — instead of rescanning the base.

Maintainable aggregates come in two tiers:

- ``sum`` / ``count`` (``avg`` derived at read time): an abelian group
  under row insert/delete — an update (delete+insert in the feed) nets
  out exactly, refresh is pure delta folding.
- ``min`` / ``max`` (``minmax_cols``): NOT invertible under deletes,
  handled with the standard IVM dirty-group rule (Materialize/DBSP
  reduce-with-retractions, Snowflake partial recompute): inserts fold
  in monotonically (``least``/``greatest``); a delete marks its group
  DIRTY only when the deleted extremum ties-or-beats the stored one,
  and exactly the dirty groups are recomputed from the base through a
  broadcast semi-join — O(rows of dirty groups), never O(|base|). An
  insert-only or extremum-missing refresh recomputes nothing
  (``numDirtyGroups`` in the refresh metrics pins this).

Scale: refresh cost is O(|delta|) + a merge against the view state,
which is |groups|-sized — never O(|base|). At 100 TB the change feed
comes from the commit log (Delta CDF files), and the state merge —
state ∪ signed feed folded through ONE groupBy (``_union_agg_merge``)
— shuffles only group keys; the base table is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .managed_table import ManagedTable, _stats_zero_rows


def _ns_cond(lhs: str, rhs: str, cols) -> "F.Column":
    """NULL-safe equality join condition over ``cols`` between two
    aliased sides. ``groupBy`` treats NULL as a group of its own, so
    every state⟗delta merge and dirty-group join MUST match NULL keys
    to NULL keys (`<=>`), or a NULL-keyed group splits into duplicate
    state rows on refresh. Spark extracts ``eqNullSafe`` as an
    equi-join key (coalesced), so this stays a hash join — no
    nested-loop penalty."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(f"{lhs}.{c}").eqNullSafe(F.col(f"{rhs}.{c}"))
    return cond


def _literal_restrict(table, version, rows, cols) -> DataFrame:
    """Pruned scan of exactly the rows whose ``cols`` tuple appears in
    ``rows`` (collected dirty keys): per-column range stats and bloom
    sidecars skip every file that cannot contain a wanted key, and
    membership is a pushed-down literal predicate — no join. A NULL
    among a column's values disables pruning on that column (footer
    min/max ignore NULLs, so range skipping could drop the files
    holding the NULL-keyed rows)."""
    ranges, eq_values = {}, {}
    for c in cols:
        vals = [r[c] for r in rows]
        if any(v is None for v in vals):
            continue
        ranges[c] = (min(vals), max(vals))
        eq_values[c] = sorted(set(vals))
    base = (
        table.read_pruned_multi(ranges, eq_values, version=version)
        if ranges
        else table.read(version)
    )
    cond = None
    for r in rows:
        tup = None
        for c in cols:
            cl = (
                F.col(c).isNull()
                if r[c] is None
                else (F.col(c) == F.lit(r[c]))
            )
            tup = cl if tup is None else (tup & cl)
        cond = tup if cond is None else (cond | tup)
    return base.filter(cond)


def _union_agg_merge(
    old: DataFrame,
    signed_rows: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    minmax_cols: list[str],
    hll_cols: list[str] | None = None,
    hll_lg_k: int = 12,
) -> DataFrame:
    """Fold signed change-feed ROWS into the stored aggregate state
    with one union + one groupBy — the merge shape both MV tiers share.
    Versus the previous full-outer join: one exchange instead of three
    (no delta pre-aggregation, no join), and NULL group keys need no
    null-safe join keys because groupBy reunites them by construction.
    Emits the merged state plus ``__dirty`` (a delete removed a value
    tying-or-beating a stored extremum, or — for HLL columns — deleted
    ANY non-null value, since a sketch cannot subtract; NULL
    comparisons are false — no deletes / brand-new group => clean)."""
    hll_cols = hll_cols or []
    # A column may carry min/max AND a sketch: ship one __ins_/__del_
    # marker pair per distinct column.
    marker_cols = list(dict.fromkeys([*minmax_cols, *hll_cols]))
    o_src = old.select(
        *group_cols,
        F.col("n_rows").alias("__n"),
        *[F.col(f"sum_{c}").alias(f"__sum_{c}") for c in sum_cols],
        *[
            e
            for c in minmax_cols
            for e in (
                F.col(f"min_{c}").alias(f"__o_min_{c}"),
                F.col(f"max_{c}").alias(f"__o_max_{c}"),
            )
        ],
        *[F.col(f"hll_{c}").alias(f"__o_hll_{c}") for c in hll_cols],
    )
    sgn = F.col("__sign")
    d_src = signed_rows.select(
        *group_cols,
        sgn.cast("long").alias("__n"),
        *[(F.col(c) * sgn).alias(f"__sum_{c}") for c in sum_cols],
        *[
            e
            for c in marker_cols
            for e in (
                F.when(sgn == 1, F.col(c)).alias(f"__ins_{c}"),
                F.when(sgn == -1, F.col(c)).alias(f"__del_{c}"),
            )
        ],
    )
    u = o_src.unionByName(d_src, allowMissingColumns=True)
    aggs = [F.sum("__n").cast("long").alias("n_rows")]
    aggs += [F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    for c in minmax_cols:
        aggs += [
            F.min(f"__o_min_{c}").alias(f"__o_min_{c}"),
            F.max(f"__o_max_{c}").alias(f"__o_max_{c}"),
            F.min(f"__ins_{c}").alias(f"__ins_min_{c}"),
            F.max(f"__ins_{c}").alias(f"__ins_max_{c}"),
        ]
    for c in marker_cols:
        aggs += [
            F.min(f"__del_{c}").alias(f"__del_min_{c}"),
            F.max(f"__del_{c}").alias(f"__del_max_{c}"),
        ]
    for c in hll_cols:
        aggs += [
            # Each group holds at most ONE old-state row.
            F.first(f"__o_hll_{c}", ignorenulls=True).alias(f"__o_hll_{c}"),
            # hll_sketch_agg over an all-NULL slice yields the (non-
            # null) EMPTY sketch, so untouched groups union a no-op.
            F.hll_sketch_agg(F.col(f"__ins_{c}"), F.lit(hll_lg_k)).alias(
                f"__ins_hll_{c}"
            ),
        ]
    g = u.groupBy(*group_cols).agg(*aggs)
    dirty = F.lit(False)
    sel_mm = []
    for c in minmax_cols:
        sel_mm += [
            F.least(F.col(f"__o_min_{c}"), F.col(f"__ins_min_{c}")).alias(
                f"min_{c}"
            ),
            F.greatest(F.col(f"__o_max_{c}"), F.col(f"__ins_max_{c}")).alias(
                f"max_{c}"
            ),
        ]
        dirty = (
            dirty
            | (F.col(f"__del_min_{c}") <= F.col(f"__o_min_{c}"))
            | (F.col(f"__del_max_{c}") >= F.col(f"__o_max_{c}"))
        )
    sel_hll = []
    for c in hll_cols:
        o, ins = F.col(f"__o_hll_{c}"), F.col(f"__ins_hll_{c}")
        sel_hll.append(
            F.when(o.isNull(), ins)
            .when(ins.isNull(), o)
            .otherwise(F.hll_union(o, ins))
            .alias(f"hll_{c}")
        )
        # ANY deleted non-null value dirties the sketch: HLL cannot
        # subtract, and the deleted value may or may not survive in
        # other rows of the group — only a recompute can tell.
        dirty = dirty | F.col(f"__del_min_{c}").isNotNull()
    return (
        g.select(
            *group_cols,
            "n_rows",
            *[F.col(f"sum_{c}") for c in sum_cols],
            *sel_mm,
            *sel_hll,
            F.coalesce(dirty, F.lit(False)).alias("__dirty"),
        )
        .filter(F.col("n_rows") > 0)  # fully-deleted groups vanish
    )


class MaterializedAggView:
    """``group_cols``-keyed sums/counts (and optional min/max) over a
    base ManagedTable.

    ``sum_cols``: input columns to maintain sums for (stored as
    ``sum_<col>``); a row count is always maintained as ``n_rows``.
    ``minmax_cols``: input columns to maintain ``min_<col>`` /
    ``max_<col>`` for, refreshed with the dirty-group rule (module
    docstring).
    ``approx_distinct_cols``: input columns to maintain an
    APPROX COUNT DISTINCT for, as a stored HLL sketch column
    ``hll_<col>`` (Apache DataSketches via Spark's hll_sketch_agg /
    hll_union) with the estimate exposed as ``approx_distinct_<col>``
    on read. Insert-only windows fold MONOTONICALLY (sketch union —
    zero recomputes, like min/max inserts); any delete of a non-null
    value dirties the group (a sketch cannot subtract) and rides the
    same dirty-group recompute as min/max. ``hll_lg_k`` sizes the
    sketch: 12 (default, ~1.6% rel. error, 4 KB/group ceiling) for
    production scale; 20 makes estimates exact up to ~100k distincts
    (DataSketches set-mode) at a ~0.5 MB/group HLL-mode ceiling.
    """

    def __init__(
        self,
        base: ManagedTable,
        path: str,
        group_cols: list[str],
        sum_cols: list[str],
        minmax_cols: list[str] | None = None,
        broadcast_dirty_max: int = 100_000,
        literal_dirty_max: int = 1024,
        approx_distinct_cols: list[str] | None = None,
        hll_lg_k: int = 12,
    ):
        self.base = base
        self.state = ManagedTable(base.spark, path)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.minmax_cols = list(minmax_cols or [])
        self.approx_distinct_cols = list(approx_distinct_cols or [])
        self.hll_lg_k = hll_lg_k
        # Above this many dirty groups the recompute semi-join falls
        # back to a shuffle instead of broadcasting the key set — a
        # mass delete can dirty millions of groups, and broadcasting
        # an unbounded frame OOMs the driver/executors.
        self.broadcast_dirty_max = broadcast_dirty_max
        # Up to this many dirty groups their keys are COLLECTED and the
        # recompute becomes a file-pruned literal-predicate scan — the
        # common few-dirty-groups refresh reads only the files that can
        # contain the dirty keys, not the base.
        self.literal_dirty_max = literal_dirty_max

    # -- aggregation helpers ------------------------------------------------

    def _aggregate(self, df: DataFrame) -> DataFrame:
        """Full aggregation of ``df`` to the view grain (create() and
        the equivalence oracle; refresh folds deltas through
        ``_union_agg_merge`` instead)."""
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
        ]
        for c in self.minmax_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        for c in self.approx_distinct_cols:
            aggs.append(
                F.hll_sketch_agg(F.col(c), F.lit(self.hll_lg_k)).alias(
                    f"hll_{c}"
                )
            )
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _base_version(self) -> int:
        return self.state.history(1)[0]["operationMetrics"]["baseVersion"]

    def _window_may_change_rows(self, lo: int, hi: int) -> bool:
        """True when any base commit in [lo, hi] could have changed
        the table's logical rows. Log-only (no data read); an expired
        or unreadable entry counts as a possible change — the
        conservative answer for the straddle guard above."""
        nochange = type(self.base)._CDC_NOCHANGE_OPS
        for v in range(lo, hi + 1):
            try:
                entry = self.base._entry(v)
            except Exception:
                return True
            if entry is None or entry.get("operation") not in nochange:
                return True
        return False

    def _recompute_dirty(
        self, cur: int, dirty_keys: DataFrame, n_dirty: int
    ) -> DataFrame:
        """Exact min/max recompute of ONLY the dirty groups: the
        dirty-key set is BROADCAST (shuffle-free base scan) up to
        ``broadcast_dirty_max`` keys, past which it degrades to a
        shuffle semi-join — still O(rows of dirty groups), never a
        driver-side blowup. NULL group keys match null-safely.
        Plan-gated by tests/test_plans.py."""
        keys = dirty_keys.alias("k")
        if n_dirty <= self.broadcast_dirty_max:
            keys = F.broadcast(keys)
        return (
            self.base.read(cur)
            .alias("b")
            .join(keys, on=_ns_cond("b", "k", self.group_cols), how="leftsemi")
            .groupBy(*self.group_cols)
            .agg(*self._recompute_aggs())
        )

    def _recompute_aggs(self):
        return [
            a
            for c in self.minmax_cols
            for a in (
                F.min(c).alias(f"__r_min_{c}"),
                F.max(c).alias(f"__r_max_{c}"),
            )
        ] + [
            F.hll_sketch_agg(F.col(c), F.lit(self.hll_lg_k)).alias(
                f"__r_hll_{c}"
            )
            for c in self.approx_distinct_cols
        ]

    def _recompute_dirty_literal(self, cur: int, rows) -> DataFrame:
        """Exact min/max recompute of a SMALL dirty-group set with the
        collected keys as literals: the base read is FILE-PRUNED by the
        keys (``_literal_restrict``) — at 100 TB one dirty group reads
        the files that can contain it, not the table — and there is no
        key join at all."""
        return (
            _literal_restrict(self.base, cur, rows, self.group_cols)
            .groupBy(*self.group_cols)
            .agg(*self._recompute_aggs())
        )

    # -- lifecycle ----------------------------------------------------------

    def create(self) -> int:
        """Full initial computation at the base's current version."""
        v = self.base.latest_version()
        snap = self._aggregate(self.base.read(v))
        return self.state._commit(snap, "MV_CREATE", {"baseVersion": v})

    def refresh(self) -> int:
        """Fold the base's changes since the last refresh into the
        state. No-op (and no commit) when already current."""
        last, cur = self._base_version(), self.base.latest_version()
        if cur == last:
            return self.state.latest_version()
        feed = self.base.change_feed(last, cur)
        return self._fold_feed(feed, last, cur)

    def refresh_from_changes(
        self,
        feed: DataFrame,
        to_version: int,
        from_version: int | None = None,
    ) -> int:
        """Fold an externally-supplied change batch (per-commit CDF
        rows — ``_change_type`` in insert/delete/update_preimage/
        update_postimage) covering base versions ``(from_version,
        to_version]`` into the state. EXACTLY-ONCE effect: a replayed
        or stale batch (``to_version`` at or behind the state's
        recorded baseVersion) is skipped without a commit, and a
        STRADDLING batch (``from_version < baseVersion < to_version``
        — e.g. a stale or foreign checkpoint with a multi-commit
        window) is trimmed to the unapplied commits by the per-row
        ``_commit_version`` before folding. So an at-least-once
        delivery channel (ChangeFeedStream's offset protocol)
        maintains the view exactly once per commit window even when
        its windows do not align with the view's recorded base.

        A batch claiming to START beyond the recorded base
        (``from_version > baseVersion``) is rejected — folding it
        would silently skip commits. A straddling batch whose rows
        carry no ``_commit_version`` (so already-folded rows cannot be
        identified) is rejected too rather than double-applied."""
        last = self._base_version()
        if to_version <= last:
            return self.state.latest_version()
        if from_version is not None and from_version > last:
            raise ValueError(
                f"change batch covers ({from_version}, {to_version}] but "
                f"the view's recorded baseVersion is {last}: commits "
                f"{last + 1}..{from_version} would be skipped"
            )
        straddle = from_version is not None and from_version < last
        if straddle and "_commit_version" in feed.columns:
            # The trim below is only sound for PER-COMMIT rows. A NET
            # batch stamps every row with the window-end version, so
            # its rows LOOK post-base while still carrying pre-base
            # contributions — trimming would keep them all and
            # double-apply. Distinguish by the LOG, not the rows: when
            # some pre-base commit in the window could change data, a
            # per-commit feed must carry rows at or below the base (a
            # data-change commit emits its rows) while a net feed's
            # rows are all stamped at the window end. When EVERY
            # pre-base commit is a no-change op (OPTIMIZE, schema-only,
            # ...), zero pre-base rows is expected — and a net batch
            # over the window equals the net of the post-base commits,
            # so folding is safe for both shapes. The log read and the
            # aggregate job run only on straddles (crash / foreign
            # checkpoint), never on the aligned hot path.
            if self._window_may_change_rows(from_version + 1, last):
                lo = feed.agg(F.min("_commit_version")).first()[0]
                if lo is not None and lo > last:
                    raise ValueError(
                        f"change batch covers ({from_version}, "
                        f"{to_version}] — straddling the view's recorded "
                        f"baseVersion {last} — but every row is stamped "
                        "after the base (a NET batch, not per-commit "
                        "rows), so the already-folded contributions "
                        "cannot be trimmed; re-read the feed per-commit "
                        "or align the window"
                    )
        if "_commit_version" in feed.columns:
            # Per-commit rows at or below the recorded base are already
            # folded into the state — trimming them is what makes a
            # straddling window safe (and is a no-op for aligned ones).
            feed = feed.filter(F.col("_commit_version") > F.lit(last))
        elif straddle:
            raise ValueError(
                f"change batch covers ({from_version}, {to_version}] — "
                f"straddling the view's recorded baseVersion {last} — "
                "but carries no _commit_version column, so the "
                "already-folded rows cannot be trimmed; re-read the "
                "feed per-commit or align the window"
            )
        return self._fold_feed(feed, last, to_version)

    def _fold_feed(self, feed: DataFrame, last: int, cur: int) -> int:
        missing = [
            c
            for c in (
                self.group_cols
                + self.sum_cols
                + self.minmax_cols
                + self.approx_distinct_cols
            )
            if c not in feed.columns
        ]
        if missing:
            raise ValueError(
                f"materialized view columns {missing} no longer exist on "
                "the base (RENAME/DROP COLUMN since the view was "
                "created?); recreate the view against the new schema"
            )
        # Sign map covers BOTH feed shapes: the net diff (insert/delete
        # only) and per-commit CDF rows, where an update contributes a
        # +postimage/-preimage pair that nets correctly through the sum.
        signed = feed.withColumn(
            "__sign",
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        merged = _union_agg_merge(
            self.state.read(),
            signed,
            self.group_cols,
            self.sum_cols,
            self.minmax_cols,
            hll_cols=self.approx_distinct_cols,
            hll_lg_k=self.hll_lg_k,
        )
        from ..blocks import snapshot_persisted, unpersist_new_since

        n_dirty = 0
        pre_blocks = snapshot_persisted(self.state.spark)
        # Metadata short-circuit: when every commit in the span only
        # ADDED files (blind appends — the log proves it), the feed has
        # no deletes, no group can be dirty, and the checkpoint + count
        # job are skipped outright — the common streaming-ingest case.
        insert_only = self.base._adds_only_between(last + 1, cur)
        if (self.minmax_cols or self.approx_distinct_cols) and not insert_only:
            merged = merged.localCheckpoint(eager=False)  # reused 3×
            dirty_keys = merged.filter(F.col("__dirty")).select(
                *self.group_cols
            )
            # One bounded collect doubles as the dirty COUNT and, when
            # small, the literal key set for the pruned recompute; only
            # a mass-dirty refresh pays a separate count job.
            rows = dirty_keys.limit(self.literal_dirty_max + 1).collect()
            n_dirty = len(rows)
            if n_dirty > self.literal_dirty_max:
                n_dirty = dirty_keys.count()
            if n_dirty:
                recomputed = (
                    self._recompute_dirty_literal(cur, rows)
                    if len(rows) <= self.literal_dirty_max
                    else self._recompute_dirty(cur, dirty_keys, n_dirty)
                )
                m, r = merged.alias("m"), recomputed.alias("r")
                merged = m.join(
                    r, on=_ns_cond("m", "r", self.group_cols), how="left"
                ).select(
                    *[F.col(f"m.{c}").alias(c) for c in self.group_cols],
                    "m.n_rows",
                    *[F.col(f"m.sum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
                    *[
                        col
                        for c in self.minmax_cols
                        for col in (
                            F.when(
                                F.col("m.__dirty"), F.col(f"r.__r_min_{c}")
                            )
                            .otherwise(F.col(f"m.min_{c}"))
                            .alias(f"min_{c}"),
                            F.when(
                                F.col("m.__dirty"), F.col(f"r.__r_max_{c}")
                            )
                            .otherwise(F.col(f"m.max_{c}"))
                            .alias(f"max_{c}"),
                        )
                    ],
                    *[
                        F.when(F.col("m.__dirty"), F.col(f"r.__r_hll_{c}"))
                        .otherwise(F.col(f"m.hll_{c}"))
                        .alias(f"hll_{c}")
                        for c in self.approx_distinct_cols
                    ],
                )
        merged = merged.drop("__dirty")
        out = self.state._commit(
            merged,
            "MV_REFRESH",
            {"baseVersion": cur, "numDirtyGroups": n_dirty},
        )
        # refresh-scoped checkpoint blocks are dead once the state
        # commit landed; a long-lived maintainer must not retain one
        # block set per refresh (guide §5: unpersist when done)
        unpersist_new_since(self.state.spark, pre_blocks)
        return out

    def read(self) -> DataFrame:
        """View contents with derived ``avg_<col>`` /
        ``approx_distinct_<col>`` columns (the stored state keeps the
        raw sums and sketches; derivations are row-wise)."""
        df = self.state.read()
        for c in self.sum_cols:
            df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
        for c in self.approx_distinct_cols:
            df = df.withColumn(
                f"approx_distinct_{c}",
                F.hll_sketch_estimate(F.col(f"hll_{c}")),
            )
        return df

    def is_stale(self) -> bool:
        return self.base.latest_version() != self._base_version()


class MaterializedJoinAggView:
    """Incrementally-maintained aggregate over an equi-JOIN of two
    ManagedTables — the two-relation tier of incremental view
    maintenance (Materialize/DBSP delta-join rule):

        L1 ⋈ R1  =  L0 ⋈ R0  +  dL ⋈ R0  +  L1 ⋈ dR

    so a refresh computes only ``dL ⋈ R_old`` and ``L_new ⋈ dR`` with
    sign-weighted deltas (inserts +1, deletes -1) and folds them into
    the |groups|-sized state — never re-joining the two full bases.
    Both delta sides are broadcast (a refresh delta is small by
    definition; a huge delta means you wanted a full recompute anyway),
    so the base-side scans stay shuffle-free, and with manifest-pruned
    change feeds the deltas themselves cost O(changed files).

    Supported aggregates are the same as ``MaterializedAggView``:
    count + sums (avg derived at read), plus min/max via the same
    dirty-group rule — a dirty group's extrema are recomputed over the
    CURRENT join restricted to the dirty keys (each base side filtered
    by the group keys it carries before joining). Updates arrive as
    delete+insert pairs from the feed and net out exactly; a
    group-moving update dirties the source group and folds into the
    target group. Correctness is pinned against full recomputes in
    tests/test_materialized_view.py and the
    ``mv_join_orders_customers`` DuckDB-oracle query.
    """

    def __init__(
        self,
        left: ManagedTable,
        right: ManagedTable,
        path: str,
        on: list[str],
        group_cols: list[str],
        sum_cols: list[str],
        minmax_cols: list[str] | None = None,
        broadcast_dirty_max: int = 100_000,
        literal_dirty_max: int = 1024,
    ):
        self.left = left
        self.right = right
        self.state = ManagedTable(left.spark, path)
        self.on = list(on)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.minmax_cols = list(minmax_cols or [])
        self.broadcast_dirty_max = broadcast_dirty_max
        # Up to this many dirty groups their keys are collected and
        # each base carrying group columns is read through a
        # file-pruned literal predicate instead of a semi-join.
        self.literal_dirty_max = literal_dirty_max

    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
        ]
        for c in self.minmax_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _recompute_dirty(
        self, l1: int, r1: int, dirty_keys: DataFrame, n_dirty: int
    ) -> DataFrame:
        """Exact min/max recompute of ONLY the dirty groups, over the
        current join: each base is first restricted by the dirty group
        keys IT carries (null-safe semi-join — broadcast up to
        ``broadcast_dirty_max`` keys, shuffle past it). A side carrying
        no group column is scanned for the join only; its rows that
        don't reach a dirty group die in the join."""
        lbase = self.left.read(l1)
        rbase = self.right.read(r1)
        lkeys = [g for g in self.group_cols if g in lbase.columns]
        rkeys = [g for g in self.group_cols if g in rbase.columns]

        def restrict(base: DataFrame, keys: list[str]) -> DataFrame:
            ks = dirty_keys.select(*keys).distinct().alias("k")
            if n_dirty <= self.broadcast_dirty_max:
                ks = F.broadcast(ks)
            return base.alias("b").join(
                ks, on=_ns_cond("b", "k", keys), how="leftsemi"
            )

        if lkeys:
            lbase = restrict(lbase, lkeys)
        if rkeys:
            rbase = restrict(rbase, rkeys)
        return (
            lbase.join(rbase, on=self.on)
            .groupBy(*self.group_cols)
            .agg(
                *[
                    a
                    for c in self.minmax_cols
                    for a in (
                        F.min(c).alias(f"__r_min_{c}"),
                        F.max(c).alias(f"__r_max_{c}"),
                    )
                ]
            )
        )

    def _recompute_dirty_literal(self, l1: int, r1: int, rows) -> DataFrame:
        """Literal-key variant of the dirty recompute: each base
        carrying group columns is read through ``_literal_restrict``
        (file-pruned by the collected keys, no semi-join); a side with
        no group column is scanned for the join only — its rows that
        don't reach a dirty group die in the join."""
        lbase, rbase = self.left.read(l1), self.right.read(r1)
        lkeys = [g for g in self.group_cols if g in lbase.columns]
        rkeys = [g for g in self.group_cols if g in rbase.columns]

        def lit_restrict(table, version, keys):
            seen, proj = set(), []
            for r in rows:
                t = tuple(r[c] for c in keys)
                if t not in seen:
                    seen.add(t)
                    proj.append({c: r[c] for c in keys})
            return _literal_restrict(table, version, proj, keys)

        if lkeys:
            lbase = lit_restrict(self.left, l1, lkeys)
        if rkeys:
            rbase = lit_restrict(self.right, r1, rkeys)
        return (
            lbase.join(rbase, on=self.on)
            .groupBy(*self.group_cols)
            .agg(
                *[
                    a
                    for c in self.minmax_cols
                    for a in (
                        F.min(c).alias(f"__r_min_{c}"),
                        F.max(c).alias(f"__r_max_{c}"),
                    )
                ]
            )
        )

    def _versions_at_create(self) -> tuple[int, int]:
        m = self.state.history(1)[0]["operationMetrics"]
        return m["leftVersion"], m["rightVersion"]

    def create(self) -> int:
        lv, rv = self.left.latest_version(), self.right.latest_version()
        snap = self._aggregate(self.left.read(lv).join(self.right.read(rv), on=self.on))
        return self.state._commit(
            snap, "MV_CREATE", {"leftVersion": lv, "rightVersion": rv}
        )

    def _signed_feed(self, base: ManagedTable, v0: int, v1: int) -> DataFrame:
        return base.change_feed(v0, v1).withColumn(
            "__sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    def _feed_key_ranges(self, base: ManagedTable, v0: int, v1: int):
        """[lo, hi] per join key of the rows base's (v0, v1] change
        feed CAN contain — from the commit log's footer stats alone, no
        Spark job. Contributing files: the symmetric difference of the
        two manifests plus (when the DV pointer moved) the files the
        new DV names. Returns a ranges dict (superset bound — safe for
        pruning), the sentinel "EMPTY" when no file can contribute, or
        None when a contributing file lacks stats (caller falls back to
        the exact aggregation over the feed)."""
        st0, st1 = base._state(v0), base._state(v1)
        f0, f1 = st0["files"], st1["files"]
        contributing = set(f0) ^ set(f1)
        if st1.get("dv") != st0.get("dv") and st1.get("dv"):
            try:
                import pyarrow.parquet as pq
                from urllib.parse import urlparse

                # Driver-memory guard: the sidecar column read is fine
                # for normal DV sizes but a table drowning in deletes
                # should answer from the exact (distributed) path.
                n_dv = (
                    (base._entry(v1) or {}).get("operationMetrics") or {}
                ).get("numDeletionVectorRows")
                if isinstance(n_dv, int) and n_dv > 50_000_000:
                    return None
                dv_files = pq.read_table(
                    st1["dv"], columns=["__dv_file"]
                ).column("__dv_file").to_pylist()
                import os as _os

                for u in set(dv_files):
                    p = urlparse(u).path if ":" in u.split("/", 1)[0] else u
                    rel = _os.path.relpath(_os.path.abspath(p), base.path)
                    if rel in f1:
                        contributing.add(rel)
            except Exception:
                return None  # unreadable DV sidecar: exact path decides
        if not contributing:
            return "EMPTY"
        ranges = {}
        for k in self.on:
            pk0 = base._phys_col(st0, k)
            pk1 = base._phys_col(st1, k)
            lo = hi = None
            for rel in contributing:
                stats = f0[rel] if rel in f0 else f1[rel]
                if stats is None:
                    return None  # stats-less contributor: exact path
                if _stats_zero_rows(stats):
                    continue  # zero-row file: contributes no rows
                s = stats.get(pk0 if rel in f0 else pk1)
                if s is None:
                    return None
                lo = s[0] if lo is None else min(lo, s[0])
                hi = s[1] if hi is None else max(hi, s[1])
            if lo is None:
                return "EMPTY"  # only zero-row contributors
            ranges[k] = (lo, hi)
        return ranges

    def _pruned_base(
        self, base: ManagedTable, version: int, delta: DataFrame
    ) -> DataFrame | None:
        """Base side of a delta join, file-pruned by the delta's
        join-key ranges: ONE tiny agg on the (small, cached) delta
        gives [min, max] of EVERY join key, and the base read opens
        only files whose footer stats can intersect all of them — at
        100 TB the base SCAN, not the join shuffle, is the refresh
        cost, and a narrow delta prunes it to a handful of files
        (VERDICT r3 #3, composite-key intersection r4 #7). When the
        base carries a bloom index for this version, the delta's
        distinct key values (collected only if few) prune further.
        Returns None for an empty delta or one whose every row has a
        NULL join key (inner-join: contributes nothing)."""
        row = delta.agg(
            *[
                a
                for k in self.on
                for a in (F.min(k).alias(f"lo_{k}"), F.max(k).alias(f"hi_{k}"))
            ]
        ).first()
        ranges = {}
        for k in self.on:
            lo, hi = row[f"lo_{k}"], row[f"hi_{k}"]
            if lo is None:
                # All-NULL join key in the delta: no delta row can
                # match the inner join on this key.
                return None
            ranges[k] = (lo, hi)
        eq_values = None
        if base._bloom_index(version) is not None:
            # Only worth a Spark job when an index exists; cap the
            # collected set so a wide delta never floods the driver.
            # ONE job collects the distinct key TUPLES, probing blooms
            # on EVERY join key (r4 #7's remainder: first-key-only
            # probing left composite-key files unpruned).
            cap = 128
            rows = (
                delta.select(*self.on).distinct().limit(cap + 1).collect()
            )
            if len(rows) <= cap:  # provably the COMPLETE distinct set
                eq_values = {}
                for i, key in enumerate(self.on):
                    vals = list({r[i] for r in rows if r[i] is not None})
                    if vals:
                        eq_values[key] = vals
                eq_values = eq_values or None
        return base.read_pruned_multi(ranges, eq_values, version=version)

    def _delta_frame(
        self, l0: int, r0: int, l1: int, r1: int
    ) -> DataFrame | None:
        """The refresh's sign-weighted delta rows: dL ⋈ R_old plus
        L_new ⋈ dR, with the DELTA side of each join broadcast and the
        BASE side file-pruned to the delta's key range — exposed
        separately so the plan gate can pin that neither join shuffles
        a base table. None when both deltas are empty (metadata-only
        commits)."""
        def pruned_opposite(base, version, delta_table, v0, v1, delta):
            # Metadata first: the commit log's footer stats bound the
            # delta's key range with ZERO Spark jobs; the exact
            # aggregation over the feed is the fallback (stats-less
            # files), and also the only path that probes blooms with
            # exact value sets.
            meta = self._feed_key_ranges(delta_table, v0, v1)
            if meta == "EMPTY":
                return None
            if isinstance(meta, dict):
                return base.read_pruned_multi(meta, version=version)
            return self._pruned_base(base, version, delta)

        parts = []
        if l1 != l0:
            # Lazily checkpointed: the delta join (and the exact-prune
            # fallback) consume the feed; computed once.
            d_l = self._signed_feed(self.left, l0, l1).localCheckpoint(
                eager=False
            )
            r_base = pruned_opposite(self.right, r0, self.left, l0, l1, d_l)
            # dL ⋈ R_old: R rows carry weight +1, so the pair's sign is dL's.
            if r_base is not None:
                parts.append(F.broadcast(d_l).join(r_base, on=self.on))
        if r1 != r0:
            d_r = self._signed_feed(self.right, r0, r1).localCheckpoint(
                eager=False
            )
            l_base = pruned_opposite(self.left, l1, self.right, r0, r1, d_r)
            # L_new ⋈ dR
            if l_base is not None:
                parts.append(l_base.join(F.broadcast(d_r), on=self.on))
        if not parts:
            return None
        delta_rows = parts[0]
        for p in parts[1:]:
            delta_rows = delta_rows.unionByName(p, allowMissingColumns=True)
        return delta_rows

    def refresh(self) -> int:
        from ..blocks import snapshot_persisted, unpersist_new_since

        l0, r0 = self._versions_at_create()
        l1, r1 = self.left.latest_version(), self.right.latest_version()
        if (l0, r0) == (l1, r1):
            return self.state.latest_version()
        pre_blocks = snapshot_persisted(self.state.spark)
        delta_rows = self._delta_frame(l0, r0, l1, r1)
        if delta_rows is not None:
            missing = [
                c
                for c in (
                    self.group_cols + self.sum_cols + self.minmax_cols
                )
                if c not in delta_rows.columns
            ]
            if missing:
                raise ValueError(
                    f"materialized view columns {missing} no longer exist "
                    "on the bases (RENAME/DROP COLUMN since the view was "
                    "created?); recreate the view against the new schema"
                )
        if delta_rows is None:
            # Base versions moved but no rows changed (metadata-only
            # commits): re-commit the state at the new version marks.
            return self.state._commit(
                self.state.read(),
                "MV_REFRESH",
                {"leftVersion": l1, "rightVersion": r1},
            )
        # State ∪ signed-delta-rows → ONE groupBy (same union-aggregate
        # merge as the single-table tier: one exchange instead of the
        # full-outer join's three, NULL group keys reunited by groupBy
        # itself).
        merged = _union_agg_merge(
            self.state.read(),
            delta_rows,
            self.group_cols,
            self.sum_cols,
            self.minmax_cols,
        )
        n_dirty = 0
        insert_only = self.left._adds_only_between(
            l0 + 1, l1
        ) and self.right._adds_only_between(r0 + 1, r1)
        if self.minmax_cols and not insert_only:
            merged = merged.localCheckpoint(eager=False)
            dirty_keys = merged.filter(F.col("__dirty")).select(*self.group_cols)
            # One bounded collect doubles as the dirty COUNT and, when
            # small, the literal key set for the pruned recompute.
            rows = dirty_keys.limit(self.literal_dirty_max + 1).collect()
            n_dirty = len(rows)
            if n_dirty > self.literal_dirty_max:
                n_dirty = dirty_keys.count()
            if n_dirty:
                m = merged.alias("m")
                r = (
                    self._recompute_dirty_literal(l1, r1, rows)
                    if len(rows) <= self.literal_dirty_max
                    else self._recompute_dirty(l1, r1, dirty_keys, n_dirty)
                ).alias("r")
                merged = m.join(
                    r, on=_ns_cond("m", "r", self.group_cols), how="left"
                ).select(
                    *[F.col(f"m.{c}").alias(c) for c in self.group_cols],
                    "m.n_rows",
                    *[F.col(f"m.sum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
                    *[
                        col
                        for c in self.minmax_cols
                        for col in (
                            F.when(F.col("m.__dirty"), F.col(f"r.__r_min_{c}"))
                            .otherwise(F.col(f"m.min_{c}"))
                            .alias(f"min_{c}"),
                            F.when(F.col("m.__dirty"), F.col(f"r.__r_max_{c}"))
                            .otherwise(F.col(f"m.max_{c}"))
                            .alias(f"max_{c}"),
                        )
                    ],
                )
        merged = merged.drop("__dirty")
        out = self.state._commit(
            merged,
            "MV_REFRESH",
            {"leftVersion": l1, "rightVersion": r1, "numDirtyGroups": n_dirty},
        )
        # refresh-scoped checkpoint blocks (signed feeds + merged) are
        # dead once the state commit landed (guide §5)
        unpersist_new_since(self.state.spark, pre_blocks)
        return out

    def read(self) -> DataFrame:
        df = self.state.read()
        for c in self.sum_cols:
            df = df.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
        return df

    def is_stale(self) -> bool:
        return (
            self.left.latest_version(),
            self.right.latest_version(),
        ) != self._versions_at_create()
