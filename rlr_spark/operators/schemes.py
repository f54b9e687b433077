"""Learning blocking schemes from labeled pairs.

Michelson & Knoblock (AAAI 2006, "Learning Blocking Schemes for Record
Linkage") made blocking design a supervised problem: given candidate
blocking predicates (equality on derived keys — soundex(name), zip
prefix, domain, LSH band, ...) and a set of labeled true matches, pick
the disjunction of predicates that covers the most true pairs within a
candidate-pair budget. This module is that loop, distributed where it
counts:

- Per-predicate statistics are Spark aggregations: candidate-pair mass
  is Σ n·(n−1)/2 over block sizes (one groupBy per predicate — never
  materializing pairs), truth coverage is an equality join of the
  labeled pairs against the keyed records.
- The greedy set-cover itself runs on the driver over a |truth| ×
  |predicates| coverage table. That is not a cop-out: labeled truth is
  human-made and therefore driver-sized BY CONSTRUCTION (thousands of
  pairs while the corpus has 10^12 records); what must never come to
  the driver — block sizes, candidate pairs, the corpus — never does.

Greedy is within (1 − 1/e) of the optimal cover (Nemhauser et al.), and
deterministic here: ties break on (coverage desc, cost asc, name asc).

Reference parity: the reference blocks on a fixed user-chosen key
(SURVEY.md §2.2 block-1); this learns which keys to choose, the same
way estimate_mu_em learns the weights the reference asks the user for.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SchemeChoice:
    """One greedy pick: the predicate, what it added, what it costs."""

    name: str
    new_true_pairs: int      # truth pairs newly covered by this pick
    cum_true_pairs: int      # truth pairs covered by the scheme so far
    cand_pairs: int          # candidate-pair mass of this predicate alone
    cum_cand_pairs: int      # upper bound on scheme mass (sum, overlaps not discounted)


def predicate_stats(
    records: DataFrame,
    predicates: dict[str, Column],
    id_col: str = "rec_id",
) -> dict[str, int]:
    """Candidate-pair mass Σ n·(n−1)/2 per predicate — ONE job for all
    predicates via a tagged union of (pred, key) rows, so adding a
    candidate predicate costs one more map projection, not one more
    scan."""
    tagged: DataFrame | None = None
    for name, key in predicates.items():
        t = records.select(
            F.lit(name).alias("_p"), key.cast("string").alias("_k")
        ).where(F.col("_k").isNotNull())
        tagged = t if tagged is None else tagged.unionByName(t)
    assert tagged is not None
    rows = (
        tagged.groupBy("_p", "_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("_p")
        .agg(F.sum(F.col("_n") * (F.col("_n") - 1) / 2).alias("_pairs"))
        .collect()
    )
    return {r["_p"]: int(r["_pairs"]) for r in rows}


def truth_coverage(
    records: DataFrame,
    truth: DataFrame,
    predicates: dict[str, Column],
    id_col: str = "rec_id",
    pair_id_cols: tuple[str, str] = ("l_id", "r_id"),
) -> DataFrame:
    """(l_id, r_id, predicate) rows: which labeled true pairs each
    predicate would co-block. Distributed equality joins; output is
    |truth| × (covering predicates) — driver-sized because truth is."""
    l, r = pair_id_cols
    out: DataFrame | None = None
    for name, key in predicates.items():
        keyed = records.select(
            F.col(id_col).alias("_id"), key.cast("string").alias("_k")
        ).where(F.col("_k").isNotNull())
        cov = (
            truth.select(l, r)
            .join(keyed.select(F.col("_id").alias(l), F.col("_k").alias("_kl")), l)
            .join(keyed.select(F.col("_id").alias(r), F.col("_k").alias("_kr")), r)
            .where(F.col("_kl") == F.col("_kr"))
            .select(l, r, F.lit(name).alias("predicate"))
            .distinct()
        )
        out = cov if out is None else out.unionByName(cov)
    assert out is not None
    return out


def learn_blocking_scheme(
    records: DataFrame,
    truth: DataFrame,
    predicates: dict[str, Column],
    id_col: str = "rec_id",
    pair_id_cols: tuple[str, str] = ("l_id", "r_id"),
    max_predicates: int = 4,
    budget_pairs: int | None = None,
) -> list[SchemeChoice]:
    """Greedy disjunctive scheme: repeatedly add the predicate covering
    the most still-uncovered true pairs (ties: candidate mass asc, then
    name asc), stopping at ``max_predicates``, when coverage stops
    improving, or when the cumulative candidate-pair budget would be
    exceeded. Returns the pick sequence with its running totals — the
    caller turns names back into block_pairs() passes."""
    l, r = pair_id_cols
    stats = predicate_stats(records, predicates, id_col)
    cov_rows = truth_coverage(
        records, truth, predicates, id_col, pair_id_cols
    ).collect()
    by_pred: dict[str, set[tuple]] = {name: set() for name in predicates}
    for row in cov_rows:
        by_pred[row["predicate"]].add((row[l], row[r]))

    chosen: list[SchemeChoice] = []
    covered: set[tuple] = set()
    cum_cand = 0
    remaining = dict(by_pred)
    while remaining and len(chosen) < max_predicates:
        scored = sorted(
            remaining.items(),
            key=lambda kv: (-len(kv[1] - covered), stats[kv[0]], kv[0]),
        )
        name, pairs = scored[0]
        gain = len(pairs - covered)
        if gain == 0:
            break
        if budget_pairs is not None and cum_cand + stats[name] > budget_pairs:
            del remaining[name]
            continue
        covered |= pairs
        cum_cand += stats[name]
        chosen.append(
            SchemeChoice(
                name=name,
                new_true_pairs=gain,
                cum_true_pairs=len(covered),
                cand_pairs=stats[name],
                cum_cand_pairs=cum_cand,
            )
        )
        del remaining[name]
    return chosen
