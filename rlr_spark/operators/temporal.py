"""Temporal operators over event streams — sessionization and as-of join.

Event analytics siblings of the ER pipeline: the same
partition-by-key / order-by-time window shape Spark executes as one
hash shuffle plus a per-partition sort, with no driver-side state.

Scale shape (100 TB): both operators are a single shuffle on the entity
key (user_id). Sessionization is the canonical gap-session construction
(lag → new-session flag → running sum); the as-of join is the
union-tag-window form — tag both sides, one window pass carrying the
most recent right-side value forward — which costs ONE shuffle over
rows_l + rows_r instead of a range join's quadratic-per-key explosion.
Skewed users (one bot account with 10^8 events) are a real concern at
crawl scale: both operators preserve the input's per-key ordering
semantics under AQE skew-split because windows never cross partition
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c: Column) -> Column:
    """Naive-timestamp epoch seconds: TIMESTAMP_NTZ can't cast straight
    to long; the NTZ->TIMESTAMP hop reinterprets the wall time in the
    session zone (this repo pins UTC), matching DuckDB's ``epoch()`` of
    a naive timestamp."""
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``. Ties order by
    ``id_col`` (fully deterministic). Returns one row per session:
    (user, session_idx, n_events, start_ts, end_ts, duration_sec).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = _epoch_s(F.col(ts_col)) - F.lag(_epoch_s(F.col(ts_col))).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.sum(new_sess).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_idx"),
    )
    return tagged.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.max(_epoch_s(F.col(ts_col))) - F.min(_epoch_s(F.col(ts_col)))
        ).alias("duration_sec"),
    )


def sessionize_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> str:
    """DuckDB oracle for :func:`sessionize` — identical window construction.

    ``epoch(ts)::BIGINT`` mirrors Spark's ``cast(ts as long)`` (both
    truncate sub-second micros toward negative infinity for the gap
    comparison — the synthetic events carry micros, so this matters)."""
    g = gap_minutes * 60
    return f"""
        WITH t AS (
          SELECT {user_col}, {ts_col}, {id_col},
                 floor(epoch({ts_col}))::BIGINT AS es
          FROM {table}),
        flagged AS (
          SELECT *, CASE WHEN es - lag(es) OVER w IS NULL
                           OR es - lag(es) OVER w > {g}
                         THEN 1 ELSE 0 END AS new_sess
          FROM t
          WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})),
        tagged AS (
          SELECT {user_col}, {ts_col}, {id_col}, es,
                 sum(new_sess) OVER (PARTITION BY {user_col}
                     ORDER BY {ts_col}, {id_col}
                     ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM flagged)
        SELECT {user_col}, session_idx, count(*) AS n_events,
               min({ts_col}) AS start_ts, max({ts_col}) AS end_ts,
               (max(es) - min(es)) AS duration_sec
        FROM tagged GROUP BY {user_col}, session_idx
    """


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """For each left row, attach the most recent right row (same key,
    right.ts <= left.ts) — the union-tag-window as-of join.

    Both sides are tagged and unioned; one window pass per key ordered
    by (ts, side, id) carries the latest right-side values forward with
    ``last(..., ignorenulls=True)``. Right rows sort BEFORE left rows at
    equal timestamps (side 0 < 1), so an exactly-simultaneous right row
    IS visible — the ``<=`` convention; among same-ts right rows the
    largest ``id_col`` wins (deterministic).

    Cost: one shuffle over \\|L\\|+\\|R\\| — never the per-key cross
    product a naive ``l.ts >= r.ts`` range join explodes into.

    Returns left's (key, ts, id) plus ``r_<v>`` for each value col and
    ``r_ts`` (NULL when no prior right row exists).
    """
    lt = left.select(
        F.col(on),
        F.col(ts_col),
        F.col(id_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_rv_{v}") for v in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    rt = right.select(
        F.col(on),
        F.col(ts_col),
        F.col(id_col),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_rv_{v}") for v in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        on,
        ts_col,
        id_col,
        "_side",
        *[
            F.last(f"_rv_{v}", ignorenulls=True).over(w).alias(f"r_{v}")
            for v in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("r_ts"),
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_cols: tuple[str, ...] = ("value",),
) -> str:
    """DuckDB oracle for :func:`asof_join` — the same union-tag-window
    construction (NOT DuckDB's ASOF JOIN, whose choice among duplicate
    right timestamps is unspecified; this form is deterministic)."""
    rv_null = ",\n                 ".join(
        f"NULL AS _rv_{v}" for v in value_cols
    )
    rv_col = ",\n                 ".join(f"{v} AS _rv_{v}" for v in value_cols)
    carry = ",\n               ".join(
        f"last_value(_rv_{v} IGNORE NULLS) OVER w AS r_{v}" for v in value_cols
    )
    return f"""
        WITH u AS (
          SELECT {on}, {ts_col}, {id_col}, 1 AS _side,
                 {rv_null},
                 NULL::TIMESTAMP AS _r_ts
          FROM ({left_sql})
          UNION ALL
          SELECT {on}, {ts_col}, {id_col}, 0 AS _side,
                 {rv_col},
                 {ts_col} AS _r_ts
          FROM ({right_sql})),
        carried AS (
          SELECT {on}, {ts_col}, {id_col}, _side,
               {carry},
               last_value(_r_ts IGNORE NULLS) OVER w AS r_ts
          FROM u
          WINDOW w AS (PARTITION BY {on} ORDER BY {ts_col}, _side, {id_col}
                       ROWS UNBOUNDED PRECEDING))
        SELECT {on}, {ts_col}, {id_col}, {", ".join(f"r_{v}" for v in value_cols)}, r_ts
        FROM carried WHERE _side = 1
    """


def track_history(
    observations: DataFrame,
    id_col: str = "url",
    state_col: str = "entity_id",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """SCD2-style validity intervals: collapse an observation log into
    per-id state runs with [valid_from, valid_to) bounds.

    A crawl observes each url at many ``warc_ts`` snapshots, and
    incremental ER may assign it to different entities over time (page
    content changes, clusters merge). The history table answers "which
    entity was this url, when" — the slowly-changing-dimension shape
    every warehouse models as SCD type 2.

    Gaps-and-islands in two window passes over ONE shuffle key:

    1. partitionBy(id) orderBy(ts): a row opens a new run iff its state
       differs from lag(state) — the first observation always opens;
    2. keep only run-opening rows; valid_to = lead(valid_from) within
       the same id (NULL = still current).

    Both windows and the filter share the hash-partitioning on
    ``id_col``, so the whole operator is one exchange; per-id work is
    a sort — the same shape as sessionize above, and skew-safe for the
    same reason. Rows per output = number of state CHANGES, not
    observations, so the result is usually orders of magnitude smaller
    than the log.

    Determinism: ties on (id, ts) are broken by the state value so
    re-runs produce identical histories on identical logs.
    """
    w = Window.partitionBy(id_col).orderBy(F.col(ts_col).asc(), F.col(state_col).asc())
    # null-safe change detection: a NULL state is a real state (one
    # run), not a run-per-row; IS DISTINCT FROM on both engines
    opens = observations.select(id_col, state_col, ts_col).withColumn(
        "_new_run",
        ~F.lag(F.col(state_col)).over(w).eqNullSafe(F.col(state_col))
        | (F.row_number().over(w) == 1),
    )
    runs = opens.where(F.col("_new_run")).select(
        F.col(id_col),
        F.col(state_col),
        F.col(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(id_col).orderBy(F.col("valid_from").asc())
    return runs.withColumn("valid_to", F.lead("valid_from").over(w2))


def track_history_sql(
    table: str,
    id_col: str = "url",
    state_col: str = "entity_id",
    ts_col: str = "warc_ts",
) -> str:
    """ANSI-SQL mirror of :func:`track_history` (oracle parity)."""
    return f"""
        WITH o AS (
          SELECT {id_col}, {state_col}, {ts_col},
                 ((lag({state_col}) OVER (
                     PARTITION BY {id_col}
                     ORDER BY {ts_col} ASC, {state_col} ASC
                  ) IS DISTINCT FROM {state_col})
                  OR row_number() OVER (
                     PARTITION BY {id_col}
                     ORDER BY {ts_col} ASC, {state_col} ASC
                  ) = 1) AS new_run
          FROM {table}),
        runs AS (
          SELECT {id_col}, {state_col}, {ts_col} AS valid_from
          FROM o WHERE new_run)
        SELECT {id_col}, {state_col}, valid_from,
               lead(valid_from) OVER (
                   PARTITION BY {id_col} ORDER BY valid_from ASC
               ) AS valid_to
        FROM runs
    """
