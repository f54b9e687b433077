"""Fellegi-Sunter weighted-agreement scoring → match/nonmatch/uncertain.

Pure column arithmetic (SURVEY.md C3): per group g with estimated
match/unmatch agreement probabilities (m_g, u_g),

    score = Σ_g  agree_g ? log2(m_g/u_g) : log2((1-m_g)/(1-u_g))

then two thresholds cut the score into the reference's label trichotomy
(default labels backend/rlr.py:26, uncertain example RLR_Home.py:117):

    score ≥ upper  → "Match"
    score ≤ lower  → "Not a Match"
    otherwise      → "Maybe a Match"

``agree_g`` is a similarity-threshold bit over any metric column, so the
same scorer serves the exact-bit-only reference parity path and the
similarity-vector pipeline path. m/u can be estimated from labeled pairs
(supervised) — one aggregation, no iteration.

Everything here is JVM-side column math inside whole-stage codegen — at
10^12 pairs this stage is shuffle-free given the comparison output.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rlr_spark import LABEL_MATCH, LABEL_NONMATCH, LABEL_UNCERTAIN

_EPS = 1e-6


@dataclass
class FSWeights:
    """Per-group (m, u) probabilities + agreement threshold per metric column."""

    groups: dict[str, tuple[float, float]]  # metric column -> (m, u)
    agree_threshold: float = 0.8
    upper: float = 2.0
    lower: float = 0.0
    labels: tuple[str, str, str] = field(
        default=(LABEL_MATCH, LABEL_NONMATCH, LABEL_UNCERTAIN)
    )

    def agreement_weight(self, col: str) -> float:
        m, u = self._clamped(col)
        return math.log2(m / u)

    def disagreement_weight(self, col: str) -> float:
        m, u = self._clamped(col)
        return math.log2((1 - m) / (1 - u))

    def _clamped(self, col: str) -> tuple[float, float]:
        m, u = self.groups[col]
        return (min(max(m, _EPS), 1 - _EPS), min(max(u, _EPS), 1 - _EPS))


def fs_score(df: DataFrame, weights: FSWeights, score_col: str = "fs_score") -> DataFrame:
    """Add the summed log-weight score over the configured metric columns."""
    terms: list[Column] = []
    for col in weights.groups:
        agree = F.col(col) >= F.lit(weights.agree_threshold)
        terms.append(
            F.when(agree, F.lit(weights.agreement_weight(col))).otherwise(
                F.lit(weights.disagreement_weight(col))
            )
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return df.withColumn(score_col, total)


def fs_label(
    df: DataFrame, weights: FSWeights, score_col: str = "fs_score", label_col: str = "rlr_label"
) -> DataFrame:
    """Threshold the score into the reference's label trichotomy.

    Also sets ``rlr_label_ind`` the way the reference does — 1 iff a
    non-empty label was assigned (backend/rlr.py:731-732).
    """
    match, nonmatch, uncertain = weights.labels
    return df.withColumn(
        label_col,
        F.when(F.col(score_col) >= weights.upper, F.lit(match))
        .when(F.col(score_col) <= weights.lower, F.lit(nonmatch))
        .otherwise(F.lit(uncertain)),
    ).withColumn("rlr_label_ind", F.when(F.col(label_col) != "", 1).otherwise(0))


def score_and_label(df: DataFrame, weights: FSWeights) -> DataFrame:
    return fs_label(fs_score(df, weights), weights)


def estimate_mu_em(
    pairs: DataFrame,
    metric_cols: list[str],
    agree_threshold: float = 0.8,
    n_iter: int = 20,
    init_p_match: float = 0.1,
    tol: float = 1e-6,
) -> tuple[dict[str, tuple[float, float]], float]:
    """Unsupervised m/u via EM over agreement *patterns* (Winkler 1988).

    The driver-side loop runs over the tiny pattern-contingency table
    (≤ 2^|fields| rows), not the pair table: one Spark aggregation
    compresses the pairs to pattern counts, then EM iterates in plain
    Python. Returns ({col: (m, u)}, p_match).
    """
    agree_cols = [
        (F.col(c) >= F.lit(agree_threshold)).cast("int").alias(f"_a_{c}")
        for c in metric_cols
    ]
    patterns = (
        pairs.select(*agree_cols)
        .groupBy(*[f"_a_{c}" for c in metric_cols])
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    rows = [([int(r[f"_a_{c}"]) for c in metric_cols], int(r["_n"])) for r in patterns]
    # canonical pattern order: collect() order is partition-dependent and
    # float summation below is order-sensitive — sort for determinism
    # (and so the SQL oracle can mirror the exact summation order)
    rows.sort(key=lambda t: t[0])
    total = sum(n for _, n in rows)

    k = len(metric_cols)
    m = [0.9] * k
    u = [0.1] * k
    p = init_p_match
    prev_ll = None
    for _ in range(n_iter):
        # E-step: P(match | pattern)
        resp = []
        ll = 0.0
        for bits, n in rows:
            pm = p
            pu = 1 - p
            for j in range(k):
                pm *= m[j] if bits[j] else (1 - m[j])
                pu *= u[j] if bits[j] else (1 - u[j])
            denom = pm + pu
            g = pm / denom if denom > 0 else 0.5
            resp.append(g)
            ll += n * math.log(max(denom, 1e-300))
        # M-step
        w_match = sum(g * n for g, (_, n) in zip(resp, rows))
        if w_match <= 0 or w_match >= total:
            break
        p = w_match / total
        for j in range(k):
            num_m = sum(g * n for g, (bits, n) in zip(resp, rows) if bits[j])
            num_u = sum((1 - g) * n for g, (bits, n) in zip(resp, rows) if bits[j])
            m[j] = min(max(num_m / w_match, _EPS), 1 - _EPS)
            u[j] = min(max(num_u / (total - w_match), _EPS), 1 - _EPS)
        if prev_ll is not None and abs(ll - prev_ll) < tol * abs(prev_ll):
            break
        prev_ll = ll

    # canonical orientation: agreement should indicate match (m > u);
    # EM's two-component labeling is symmetric, flip if it converged upside down
    if sum(m) < sum(u):
        m, u, p = u, m, 1 - p
    return {c: (m[j], u[j]) for j, c in enumerate(metric_cols)}, p


def estimate_mu(
    labeled: DataFrame,
    metric_cols: list[str],
    label_col: str = "rlr_label",
    agree_threshold: float = 0.8,
) -> dict[str, tuple[float, float]]:
    """Supervised m/u estimation: one aggregation over labeled pairs.

    m_g = P(agree_g | Match), u_g = P(agree_g | Not a Match). Returns the
    dict an :class:`FSWeights` wants. (EM over unlabeled agreement
    patterns is a possible extension; supervised estimation matches the
    reference's workflow, where labels come from human review.)
    """
    aggs = [
        F.avg((F.col(c) >= agree_threshold).cast("double")).alias(c) for c in metric_cols
    ]
    rows = (
        labeled.where(F.col(label_col).isin([LABEL_MATCH, LABEL_NONMATCH]))
        .groupBy(label_col)
        .agg(*aggs)
        .collect()
    )
    by_label = {r[label_col]: r for r in rows}
    out: dict[str, tuple[float, float]] = {}
    for c in metric_cols:
        m = float(by_label[LABEL_MATCH][c]) if LABEL_MATCH in by_label else 0.9
        u = float(by_label[LABEL_NONMATCH][c]) if LABEL_NONMATCH in by_label else 0.1
        out[c] = (m, u)
    return out


def review_queue(
    scored: DataFrame,
    k: int,
    score_col: str = "fs_score",
    upper: float = 2.0,
    lower: float = 0.0,
    order_cols: tuple[str, ...] = ("l_id", "r_id"),
    pattern_cols: tuple[str, ...] = (),
    margin_col: str = "margin",
) -> DataFrame:
    """Most-informative pairs for human review (uncertainty sampling).

    The reference's workflow is a human labeling pairs one at a time
    (backend/rlr.py navigation + label upsert); at web scale the pairs
    worth that human's minute are the ones the model is least sure
    about. Informativeness = distance of the FS score to the NEARER
    decision threshold — pairs deep inside the Match / Not-a-Match
    regions teach nothing, pairs at a boundary move it.

    Two shapes, both scale-safe:

    - global (``pattern_cols=()``): orderBy+limit compiles to
      TakeOrderedAndProject — per-partition top-k heaps merged on the
      driver, NO global sort, O(k) driver memory at 10^12 pairs.
    - stratified (``pattern_cols=(...)``): top-k per agreement pattern
      / blocking pass / stratum via one window shuffle, so a dominant
      easy stratum can't starve rare-pattern pairs out of the queue —
      the standard guard against sampling bias in active learning.

    Ties break on ``order_cols`` so the queue is deterministic (and the
    DuckDB oracle can mirror it exactly).
    """
    margin = F.round(
        F.least(
            F.abs(F.col(score_col) - F.lit(upper)),
            F.abs(F.col(score_col) - F.lit(lower)),
        ),
        6,
    )
    out = scored.withColumn(margin_col, margin)
    order = [F.col(margin_col).asc(), *[F.col(c).asc() for c in order_cols]]
    if not pattern_cols:
        return out.orderBy(*order).limit(k)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*pattern_cols).orderBy(*order)
    return (
        out.withColumn("queue_rank", F.row_number().over(w))
        .where(F.col("queue_rank") <= k)
    )


def fs_score_tf(
    pairs: DataFrame,
    records: DataFrame,
    fields: dict[str, tuple[float, float]],
    score_col: str = "fs_score_tf",
    min_tf: float = _EPS,
) -> DataFrame:
    """Fellegi-Sunter score with term-frequency-adjusted agreement
    weights (Fellegi & Sunter 1969 §3.3.2; Winkler 1989's frequency-
    based matching — the adjustment Splink ships as "term frequency
    adjustments").

    The plain scorer gives agreement on "smith" the same weight as
    agreement on "zabriskie"; but u — the chance two NON-matching
    records agree — is value-specific: it is (approximately) the
    value's relative frequency. So on agreement the per-field term
    becomes ``log2(m / tf(v))`` where ``tf(v)`` is the shared value's
    share of records, clamped to ``[min_tf, 1-eps]``; disagreement
    keeps the field-level ``log2((1-m)/(1-u))`` (disagreement evidence
    is not value-specific).

    ``pairs`` must carry ``l_<field>``/``r_<field>`` columns; ``records``
    carries ``<field>``. Values are compared on the reference
    comparator's normalization (strip -> lower,
    pages/02_Linkage_Review.py:139-140). NULL on either side counts as
    disagreement (no evidence of identity).

    Scale shape: one groupBy per field over the RECORDS (value
    frequency tables are field-cardinality-sized); each table joins to
    the pairs on the left value — Catalyst broadcasts the small ones,
    and AQE handles a genuinely huge vocabulary with a shuffle join.
    The scoring itself stays pure column arithmetic.
    """
    if not fields:
        raise ValueError("fields must name at least one (m, u) entry")
    norm = lambda c: F.lower(F.trim(c))  # noqa: E731
    n_rec = records.count()
    out = pairs
    total = None
    for f, (m, u) in fields.items():
        mc = min(max(m, _EPS), 1 - _EPS)
        uc = min(max(u, _EPS), 1 - _EPS)
        tf = (
            records.where(F.col(f).isNotNull())
            .groupBy(norm(F.col(f)).alias(f"_v_{f}"))
            .agg((F.count("*") / F.lit(float(n_rec))).alias(f"_tf_{f}"))
        )
        out = out.join(
            tf, norm(F.col(f"l_{f}")) == F.col(f"_v_{f}"), "left"
        ).drop(f"_v_{f}")
        agree = (
            F.col(f"l_{f}").isNotNull()
            & F.col(f"r_{f}").isNotNull()
            & (norm(F.col(f"l_{f}")) == norm(F.col(f"r_{f}")))
        )
        tf_clamped = F.least(
            F.greatest(F.coalesce(F.col(f"_tf_{f}"), F.lit(1.0)), F.lit(min_tf)),
            F.lit(1 - _EPS),
        )
        term = F.when(
            agree, F.log2(F.lit(mc) / tf_clamped)
        ).otherwise(F.lit(math.log2((1 - mc) / (1 - uc))))
        total = term if total is None else total + term
    out = out.withColumn(score_col, total)
    return out.drop(*[f"_tf_{f}" for f in fields])


def pattern_diagnostics(
    df: DataFrame,
    gamma_cols: list[str],
    m: list[float],
    u: list[float],
    p_match: float,
    round_to: int = 4,
) -> DataFrame:
    """Agreement-pattern table: observed vs FS-model-expected counts.

    The standard Fellegi-Sunter model-fit diagnostic (Splink ships it
    as the "comparison pattern" chart): collapse all pairs to their
    binary agreement pattern gamma = (g_1..g_k), count each pattern,
    and compare with the count the two-class mixture model predicts:

        E[n(gamma)] = N * ( p * prod_i m_i^g * (1-m_i)^(1-g)
                        + (1-p) * prod_i u_i^g * (1-u_i)^(1-g) )

    Patterns whose observed/expected ratio strays far from 1 are where
    the conditional-independence assumption breaks (correlated fields)
    — the first thing to inspect before trusting EM weights.

    Scale: ONE map-side-combinable groupBy collapses any number of
    pairs to <= 2^k rows; everything after is constant arithmetic on
    that tiny table. Output: (gamma_cols..., n_pairs, expected,
    obs_exp_ratio), deterministic given the (m, u, p) constants.
    """
    if not (len(gamma_cols) == len(m) == len(u)):
        raise ValueError("gamma_cols, m, u must align")
    counts = df.groupBy(*[F.col(c).cast("int").alias(c) for c in gamma_cols]).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    total = counts.agg(F.sum("n_pairs").alias("_N"))
    pm = F.lit(float(p_match))
    prod_m = F.lit(1.0)
    prod_u = F.lit(1.0)
    for c, mi, ui in zip(gamma_cols, m, u):
        g = F.col(c)
        prod_m = prod_m * F.when(g == 1, F.lit(float(mi))).otherwise(
            F.lit(1.0 - float(mi))
        )
        prod_u = prod_u * F.when(g == 1, F.lit(float(ui))).otherwise(
            F.lit(1.0 - float(ui))
        )
    expected = F.col("_N") * (pm * prod_m + (F.lit(1.0) - pm) * prod_u)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *gamma_cols,
            "n_pairs",
            F.round(expected, round_to).alias("expected"),
            F.round(F.col("n_pairs") / expected, round_to).alias("obs_exp_ratio"),
        )
    )


def pattern_diagnostics_sql(
    pairs_sql: str,
    gamma_cols: list[str],
    m: list[float],
    u: list[float],
    p_match: float,
    round_to: int = 4,
) -> str:
    """DuckDB mirror of :func:`pattern_diagnostics` — generated from
    the same constants (incl. the exact IEEE value of 1-m_i, so the
    two engines multiply identical doubles)."""
    gs = ", ".join(gamma_cols)

    def prod(ps: list[float]) -> str:
        terms = [
            f"(CASE WHEN {c} = 1 THEN {pi!r} ELSE {(1.0 - pi)!r} END)"
            for c, pi in zip(gamma_cols, ps)
        ]
        return " * ".join(terms)

    mixture = (
        f"({p_match!r} * {prod(m)} + {(1.0 - p_match)!r} * {prod(u)})"
    )
    return f"""
        WITH c AS (
          SELECT {gs}, count(*)::BIGINT AS n_pairs
          FROM ({pairs_sql}) GROUP BY {gs}),
        t AS (SELECT sum(n_pairs)::DOUBLE AS nn FROM c)
        SELECT {gs}, n_pairs,
               round(nn * {mixture}, {round_to}) AS expected,
               round(n_pairs / (nn * {mixture}), {round_to}) AS obs_exp_ratio
        FROM c, t
    """


def fs_score_nullsafe(
    df: DataFrame,
    weights: FSWeights,
    score_col: str = "fs_score",
    gamma_prefix: str = "gamma_",
) -> DataFrame:
    """Fellegi-Sunter scoring with a three-level agreement pattern per
    field: agree / disagree / MISSING. A NULL similarity (either
    underlying field absent) contributes weight 0 — the field is
    uninformative, exactly the m=u case — instead of being scored as a
    disagreement the way :func:`fs_score` (two-level, NULL-unsafe
    comparators upstream) would.

    This is the standard missing-data treatment in probabilistic
    linkage (Splink's default null_level; FS 1969 §3 "blank" handling):
    penalizing absence as disagreement biases every sparse-field
    record toward nonmatch and is the single most common source of
    silently-depressed recall on real admin data, where field
    missingness is 10-40%.

    Emits one ``gamma_<field>`` column per field (2 agree / 0
    disagree / -1 missing — the reviewable agreement pattern the
    reference's comparison vectors correspond to) plus the summed
    score. Pure column ops; the pattern columns cost nothing extra
    since Catalyst shares the comparisons with the score terms.
    """
    out = df
    terms: list[Column] = []
    for col in weights.groups:
        missing = F.col(col).isNull()
        agree = F.col(col) >= F.lit(weights.agree_threshold)
        out = out.withColumn(
            gamma_prefix + col,
            F.when(missing, F.lit(-1)).when(agree, F.lit(2)).otherwise(F.lit(0)),
        )
        terms.append(
            F.when(missing, F.lit(0.0))
            .when(agree, F.lit(weights.agreement_weight(col)))
            .otherwise(F.lit(weights.disagreement_weight(col)))
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return out.withColumn(score_col, total)
