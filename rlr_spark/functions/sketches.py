"""Deterministic distributed cardinality sketches (HyperLogLog).

At 10^12 documents, "how many distinct tokens / urls / entities" is a
question exact `count(distinct)` answers only with a full shuffle of
every distinct value. HyperLogLog answers it with O(m) state per
group (m = 2^p buckets), fully map-side combinable: per partition,
each bucket keeps the max leading-zero rank seen; merge = elementwise
max — the textbook mergeable-sketch shape, so the shuffle carries at
most m rows per group instead of the distinct values themselves.

Spark ships `approx_count_distinct` (also HLL), but its hash and
internal layout are engine-private — no external system can verify or
merge its state. This implementation is **deterministic and
engine-portable by construction**: the hash is md5 (bucket = first 8
hex chars mod m; rank material = next 10 hex chars, a 40-bit value),
and every arithmetic step is exact-in-IEEE (the 2^-rank sum is a sum
of at most m exact powers of two with exponent spread < 52 bits, so
it is order-independent). The same sketch can therefore be built,
merged, and value-checked bit-for-bit by DuckDB SQL — which is
exactly how the oracle checks it (see __spark_entry__.py
`hll_distinct`).

Estimator: standard HLL (Flajolet et al. 2007):
  raw = alpha_m * m^2 / sum_j 2^(-M_j)   (empty bucket M_j = 0)
  small-range (raw <= 2.5m and empty buckets exist):
      linear counting  m * ln(m / V)     (V = empty-bucket count)
The 32-bit large-range correction is omitted: rank material here is
40 bits and the estimator is used far below 2^40.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    # Flajolet et al. 2007, section 4 (m >= 128 constant form is the
    # usual citation; the general formula below covers small m too and
    # is what both sides of the oracle use)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


RANK_BITS = 40  # 10 md5 hex chars


def hll_bucket(value: Column, p: int) -> Column:
    """Bucket index in [0, 2^p): first 8 md5 hex chars mod m."""
    h32 = F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")
    return (h32 % F.lit(1 << p)).alias("hll_bucket")


def hll_rank(value: Column) -> Column:
    """Leading-zero rank of the 40-bit hash chunk: (#leading zeros)+1.

    Computed as ``RANK_BITS - bitlength(v) + 1`` via the string length
    of ``bin(v)`` — `bin` has identical no-leading-zero semantics in
    Spark and DuckDB, so the oracle mirrors this exactly. v == 0 (all
    40 bits zero) gets the max rank RANK_BITS + 1.
    """
    v = F.conv(F.substring(F.md5(value), 9, 10), 16, 10).cast("long")
    return F.when(v == 0, F.lit(RANK_BITS + 1)).otherwise(
        F.lit(RANK_BITS) - F.length(F.bin(v)) + 1
    )


def hll_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Per-group bucket maxima: (key_cols..., hll_bucket, hll_max_rank).

    ONE map-side-combinable groupBy — the shuffle carries <= m rows
    per group. This table IS the sketch state: union two of them and
    re-aggregate with max to merge sketches (associative, idempotent).
    """
    return (
        df.select(
            *key_cols,
            hll_bucket(F.col(value_col), p),
            hll_rank(F.col(value_col)).alias("_rank"),
        )
        .groupBy(*key_cols, "hll_bucket")
        .agg(F.max("_rank").alias("hll_max_rank"))
    )


def hll_estimate(
    sketch: DataFrame, key_cols: list[str], p: int = 6, round_to: int = 4
) -> DataFrame:
    """Fold bucket maxima into the HLL cardinality estimate per group.

    Exact-in-IEEE: each 2^-rank term is an exact double, the per-group
    sum spans < 52 bits of exponent so addition never rounds, and the
    final alpha*m^2/sum is one multiply + one divide — the estimate is
    bit-identical across engines and partitionings (then rounded for
    the artifact).
    """
    m = 1 << p
    alpha = _alpha(m)
    # a bucket with any observation has rank >= 1, so "register = 0"
    # is exactly "bucket absent from the sketch table": empties = m - nb,
    # each contributing 2^0 = 1 to the harmonic sum
    agg = sketch.groupBy(*key_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("hll_max_rank"))).alias("_z_obs"),
        F.count(F.lit(1)).alias("_nb"),
    )
    z = F.col("_z_obs") + (F.lit(m) - F.col("_nb"))
    empties = F.lit(m) - F.col("_nb")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (empties > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empties),
    ).otherwise(raw)
    return agg.select(
        *key_cols, F.round(est, round_to).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Sketch + fold in one call: per-group approximate distinct count."""
    return hll_estimate(hll_sketch(df, key_cols, value_col, p), key_cols, p)


def hll_sql(
    table_expr: str, key_cols: list[str], value_col: str, p: int = 6
) -> str:
    """DuckDB SQL computing the identical estimate (the oracle side).

    Generated from the same constants as the Spark plan so the two
    sides cannot drift: same md5 chunks, same bin()-length rank, same
    alpha, same small-range branch.
    """
    m = 1 << p
    alpha = _alpha(m)
    keys = ", ".join(key_cols)
    keys_comma = f"{keys}, " if keys else ""
    return f"""
    WITH hashed AS (
      SELECT {keys_comma}
             ('0x' || substr(md5({value_col}), 1, 8))::BIGINT % {m} AS hll_bucket,
             ('0x' || substr(md5({value_col}), 9, 10))::BIGINT AS v
      FROM {table_expr}),
    sk AS (
      SELECT {keys_comma}hll_bucket,
             max(CASE WHEN v = 0 THEN {RANK_BITS + 1}
                      ELSE {RANK_BITS} - length(bin(v)) + 1 END) AS hll_max_rank
      FROM hashed GROUP BY {keys_comma}hll_bucket),
    agg AS (
      SELECT {keys_comma}
             sum(power(2.0, -hll_max_rank)) AS z_obs,
             count(*) AS nb
      FROM sk GROUP BY {keys or 'ALL'})
    SELECT {keys_comma}
           round(CASE WHEN {alpha} * {m} * {m} / (z_obs + ({m} - nb))
                           <= 2.5 * {m}
                       AND ({m} - nb) > 0
                 THEN {m}.0 * ln({m}.0 / ({m} - nb))
                 ELSE {alpha} * {m} * {m} / (z_obs + ({m} - nb))
                 END, 4) AS hll_estimate
    FROM agg
    """
