"""Changelog (retract) stream-stream join — incremental view maintenance.

Reference parity: StreamingJoinOperator.java:36 /
MiniBatchStreamingJoinOperator.java — Flink's two-sided stateful equi
join over changelogs: both inputs are kept in keyed state, each incoming
±row joins the OTHER side's current state and emits ±result rows, so the
downstream sees a correct changelog of the join view (SURVEY.md §2.3,
§7 hard list item 3).

Spark-first design: this is textbook incremental view maintenance over
multiset (count-annotated) relations, expressed in DataFrames:

    Δ(L ⋈ R) = ΔL ⋈ R_new  ∪  L_old ⋈ ΔR

with per-row signed counts multiplying through the join (+·+ = +,
+·− = −, …). Rows carry a `__cnt` weight (+n inserts, −n retracts);
state = the running count per distinct row of each input. All operations
are joins/aggregations on DataFrames — Catalyst plans them, every step
shuffles only on the join key, and the state tables are themselves
DataFrames (persist to parquet between micro-batches via foreachBatch —
the engine-managed analogue of Flink's JoinRecordStateViews).

Batch inputs work identically (one "delta" = the whole input), which is
what the tests exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_1_20_spark.operators.changelog import DELETE, INSERT, UPDATE_AFTER, UPDATE_BEFORE

CNT_COL = "__cnt"


def changelog_to_counts(df: DataFrame, op_col: str = "op") -> DataFrame:
    """RowKind rows → signed count annotation: +I/+U contribute +1,
    -D/-U contribute −1 (the multiset encoding RetractableTopNFunction
    and the retract aggregates use internally)."""
    sign = (
        F.when(F.col(op_col).isin(INSERT, UPDATE_AFTER), F.lit(1))
        .when(F.col(op_col).isin(DELETE, UPDATE_BEFORE), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(CNT_COL, sign).drop(op_col)


def counts_to_changelog(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Signed counts → RowKind rows: net positive → +I, net negative →
    -D (repeated |cnt| times via explode, so consumers that expect one
    op per row — e.g. materialize_changelog — work unchanged)."""
    return (
        df.filter(F.col(CNT_COL) != 0)
        .withColumn(
            op_col, F.when(F.col(CNT_COL) > 0, F.lit(INSERT)).otherwise(F.lit(DELETE))
        )
        .withColumn("__dup", F.explode(F.sequence(F.lit(1), F.abs(F.col(CNT_COL)))))
        .drop(CNT_COL, "__dup")
    )


def _consolidate(df: DataFrame) -> DataFrame:
    """Sum counts per distinct row; drop rows whose net count is 0."""
    value_cols = [c for c in df.columns if c != CNT_COL]
    return (
        df.groupBy(*value_cols)
        .agg(F.sum(CNT_COL).cast("int").alias(CNT_COL))
        .filter(F.col(CNT_COL) != 0)
    )


class ChangelogJoin:
    """Incremental equi-join over two changelogs.

    Feed `process(delta_left, delta_right)` count-annotated deltas
    (see `changelog_to_counts`); it returns the join's output delta and
    folds the inputs into the retained state. Use from `foreachBatch`
    for streaming (persist `state_left`/`state_right` to parquet between
    batches and reload), or call once with full inputs for batch.

    Columns: join on `on` (equi keys present in both inputs); all other
    columns pass through (left's then right's, keys once).

    `how="left"` adds Flink's outer-join null-padding semantics
    (OuterJoinRecordStateViews.java): an unmatched left row emits a
    null-padded result, and the arrival of its first match RETRACTS the
    padded row while emitting the joined one — computed as the delta of
    the anti-join between consecutive states.

    `how="semi"` / `how="anti"` mirror StreamingSemiAntiJoinOperator.java:34
    (IN / NOT-EXISTS over changelogs). Output rows are left rows only; the
    right side contributes just a per-key existence bit. Delta rules:

        Δsemi = ΔL ⋉ e_new  +  L_old × (e_new − e_old)
        Δanti = ΔL ⋉ ¬e_new +  L_old × (e_old − e_new)

    where e = "key has net count > 0 in R". A right-side key's existence
    flipping 0→>0 emits +L rows (semi) / −L rows (anti) for that key —
    exactly the associated-records emit/retract the reference does when
    its right-state count crosses zero.
    """

    #: truncate state lineage every N process() calls (see process()).
    CHECKPOINT_INTERVAL = 4

    def __init__(self, on: list[str], how: str = "inner"):
        if how not in ("inner", "left", "semi", "anti"):
            raise ValueError("how must be 'inner', 'left', 'semi' or 'anti'")
        self.on = list(on)
        self.how = how
        self.state_left: DataFrame | None = None
        self.state_right: DataFrame | None = None
        self._batches = 0

    @staticmethod
    def _join_counts(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
        l = left.withColumnRenamed(CNT_COL, "__cl")
        r = right.withColumnRenamed(CNT_COL, "__cr")
        joined = l.join(r, on, "inner")
        out_cols = [c for c in joined.columns if c not in ("__cl", "__cr")]
        return joined.select(
            *out_cols, (F.col("__cl") * F.col("__cr")).alias(CNT_COL)
        )

    def process(self, delta_left: DataFrame | None, delta_right: DataFrame | None) -> DataFrame:
        """One micro-batch step: returns Δ(L ⋈ R) as count-annotated
        rows (consolidate with `counts_to_changelog` for ±I/±D ops)."""
        spark = (delta_left or delta_right).sparkSession
        on = self.on

        def empty_like(df: DataFrame) -> DataFrame:
            return spark.createDataFrame([], df.schema)

        dl = delta_left if delta_left is not None else empty_like(self.state_left)
        dr = delta_right if delta_right is not None else empty_like(self.state_right)
        l_old = self.state_left if self.state_left is not None else empty_like(dl)
        r_old = self.state_right if self.state_right is not None else empty_like(dr)

        # State-fold lineage is truncated every CHECKPOINT_INTERVAL
        # batches: each process() call's plan otherwise re-embeds the
        # whole input history (every consumer of the state — the delta
        # terms, the next fold, materialized() — re-runs the full
        # union+consolidate chain; the r13 plan audit measured 29
        # exchanges / 20 sort-merge joins for the TWO-batch driver
        # query, growing per batch without bound).  The interval is the
        # engine analogue of Flink's checkpoint interval over its
        # JoinRecordStateViews (materialized state, never a
        # recomputation recipe; the class docstring's production
        # contract persists state to parquet between micro-batches).
        # Not every batch: materializing the state blocks costs more
        # than one recompute at small state (r13 A/B at sf0.1,
        # checkpoint-every-batch vs never over the 2-batch driver
        # queries: semi 5.8 vs 4.5 s — so short drives stay
        # checkpoint-free and long streams get bounded plan depth).
        # Lazy: building the DataFrame must not run a job; the first
        # action materializes the state blocks.
        self._batches += 1
        r_new = _consolidate(r_old.unionByName(dr))
        l_new = _consolidate(l_old.unionByName(dl))
        if self._batches % self.CHECKPOINT_INTERVAL == 0:
            # single-node durability caveat (r13 ADVICE): localCheckpoint
            # truncates lineage into executor-local block storage — on
            # executor loss the state is unrecoverable mid-stream (no
            # lineage left to recompute).  Right for the single-box
            # drives here; a clustered deployment must swap this for
            # reliable .checkpoint() / the parquet state persistence the
            # class docstring describes.
            r_new = r_new.localCheckpoint(eager=False)
            l_new = l_new.localCheckpoint(eager=False)

        if self.how in ("semi", "anti"):
            delta_out = self._semi_anti_delta(dl, l_old, r_old, r_new)
            self.state_left = l_new
            self.state_right = r_new
            return delta_out

        # Δ(L⋈R) = ΔL ⋈ R_new ∪ L_old ⋈ ΔR  (no double count: ΔL⋈ΔR
        # appears exactly once, inside the first term)
        part1 = self._join_counts(dl, r_new, on)
        part2 = self._join_counts(l_old, dr, on)
        delta_out = _consolidate(part1.unionByName(part2))

        if self.how == "left":
            # null-padding delta: pad(L,R) = L ⋉̸ R (anti-join, counts
            # pass through); Δpad = pad(L_new,R_new) − pad(L_old,R_old)
            right_val_cols = [
                (c, t) for c, t in dr.dtypes if c not in on and c != CNT_COL
            ]

            def pad(l: DataFrame, r: DataFrame) -> DataFrame:
                unmatched = l.join(r.select(*on).distinct(), on, "left_anti")
                padded = unmatched.select(
                    *[c for c in unmatched.columns if c != CNT_COL],
                    *[F.lit(None).cast(t).alias(c) for c, t in right_val_cols],
                    F.col(CNT_COL),
                )
                return padded

            pad_new = pad(l_new, r_new)
            pad_old = pad(l_old, r_old).withColumn(CNT_COL, -F.col(CNT_COL))
            delta_pad = _consolidate(pad_new.unionByName(pad_old))
            delta_out = _consolidate(
                delta_out.unionByName(delta_pad.select(*delta_out.columns))
            )

        self.state_left = l_new
        self.state_right = r_new
        return delta_out

    @staticmethod
    def _present_keys(r: DataFrame, on: list[str]) -> DataFrame:
        """Keys whose net right-side count is positive — the existence
        bit the reference keeps per key in its right state view."""
        return (
            r.groupBy(*on)
            .agg(F.sum(CNT_COL).alias("__kc"))
            .filter(F.col("__kc") > 0)
            .select(*on)
        )

    def _semi_anti_delta(
        self, dl: DataFrame, l_old: DataFrame, r_old: DataFrame, r_new: DataFrame
    ) -> DataFrame:
        on = self.on
        keys_old = self._present_keys(r_old, on)
        keys_new = self._present_keys(r_new, on)
        appeared = keys_new.join(keys_old, on, "left_anti")  # e: 0 → 1
        vanished = keys_old.join(keys_new, on, "left_anti")  # e: 1 → 0
        if self.how == "semi":
            term1 = dl.join(keys_new, on, "left_semi")
            plus, minus = appeared, vanished
        else:
            term1 = dl.join(keys_new, on, "left_anti")
            plus, minus = vanished, appeared
        term2 = l_old.join(plus, on, "left_semi").unionByName(
            l_old.join(minus, on, "left_semi").withColumn(CNT_COL, -F.col(CNT_COL))
        )
        return _consolidate(term1.unionByName(term2))

    def materialized(self) -> DataFrame:
        """Current full join view (for tests / late consumers)."""
        if self.how in ("semi", "anti"):
            keys = self._present_keys(self.state_right, self.on)
            mode = "left_semi" if self.how == "semi" else "left_anti"
            return self.state_left.join(keys, self.on, mode)
        inner = self._join_counts(self.state_left, self.state_right, self.on)
        if self.how != "left":
            return inner
        right_val_cols = [
            (c, t)
            for c, t in self.state_right.dtypes
            if c not in self.on and c != CNT_COL
        ]
        unmatched = self.state_left.join(
            self.state_right.select(*self.on).distinct(), self.on, "left_anti"
        )
        padded = unmatched.select(
            *[c for c in unmatched.columns if c != CNT_COL],
            *[F.lit(None).cast(t).alias(c) for c, t in right_val_cols],
            F.col(CNT_COL),
        )
        return inner.unionByName(padded.select(*inner.columns))
