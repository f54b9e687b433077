"""Linkage-quality evaluation: threshold sweeps and blocking quality.

The reference exposes label *counts* (backend/rlr.py label summary);
an engine run at 10^12 pairs also needs the two questions every ER
practitioner asks before believing a run:

- *where should the match threshold sit?* — :func:`threshold_sweep`
  computes precision/recall/F1 at every distinct score value in ONE
  pass, by aggregating pairs down to score buckets first and running
  the cumulative window over the buckets, never over the pairs. A
  Fellegi-Sunter score is a sum of per-field discrete weights, so the
  bucket table has at most 2^|fields| rows no matter how many pairs
  exist — the window is driver-trivial while the heavy lifting stays
  a single map-side-combinable groupBy.

- *did blocking lose the matches?* — :func:`blocking_quality` reports
  pairs-completeness (the fraction of true matches the candidate set
  retained — the blocking recall bound no downstream scorer can
  recover) and the reduction ratio (the fraction of the n*(n-1)/2
  full cross-product the blocking pruned away).

Both are pure DataFrame aggregations: no UDFs, no collects beyond the
returned summary rows, oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def threshold_sweep(
    scored: DataFrame,
    truth: DataFrame,
    score_col: str = "fs_score",
    id_cols: tuple[str, str] = ("l_id", "r_id"),
    round_to: int = 6,
) -> DataFrame:
    """Precision/recall/F1 at every distinct score threshold.

    ``scored``: candidate pairs with ``score_col``; ``truth``: the
    labeled true-match pairs (same id columns, same canonical l<r
    orientation). Semantics of a row: *label Match iff score >=
    threshold*. Recall is measured against ALL of truth — true pairs
    the blocking never surfaced count against recall at every
    threshold, so the curve reflects the pipeline, not just the
    scorer.

    Scale shape: one groupBy collapses pairs to (score, n, n_true)
    buckets (map-side combinable); the cumulative window and the
    1-row truth total are broadcast-joined onto the bucket table,
    whose size is bounded by the number of distinct scores (<=
    2^|fields| for FS scoring), not by the pair count.
    """
    l, r = id_cols
    t = truth.select(
        F.col(l).alias("_tl"), F.col(r).alias("_tr"), F.lit(1).alias("_is_true")
    ).dropDuplicates(["_tl", "_tr"])
    joined = scored.select(
        F.round(F.col(score_col), round_to).alias("threshold"), F.col(l), F.col(r)
    ).join(
        t, (F.col(l) == F.col("_tl")) & (F.col(r) == F.col("_tr")), "left"
    )
    buckets = joined.groupBy("threshold").agg(
        F.count("*").alias("_n"),
        F.sum(F.coalesce(F.col("_is_true"), F.lit(0))).alias("_n_true"),
    )
    # cumulative from the top: predicting Match at threshold t accepts
    # every bucket with score >= t
    w = Window.orderBy(F.col("threshold").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = buckets.select(
        "threshold",
        F.sum("_n").over(w).alias("_pred_pos"),
        F.sum("_n_true").over(w).alias("_tp"),
    )
    total = t.agg(F.count("*").alias("_truth_total"))
    swept = cum.join(F.broadcast(total))
    prec = F.col("_tp") / F.col("_pred_pos")
    rec = F.col("_tp") / F.col("_truth_total")
    return swept.select(
        "threshold",
        F.col("_pred_pos").alias("predicted_pos"),
        F.col("_tp").alias("true_pos"),
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0),
            round_to,
        ).alias("f1"),
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int,
    id_cols: tuple[str, str] = ("l_id", "r_id"),
    round_to: int = 6,
) -> DataFrame:
    """One-row blocking scorecard: pairs-completeness + reduction ratio.

    ``pairs_completeness`` = |candidates ∩ truth| / |truth| — the recall
    ceiling blocking imposes on everything downstream. ``reduction_ratio``
    = 1 - |candidates| / C(n_records, 2) — how much of the full
    cross-product the blocking pruned. The classic trade-off pair
    (Christen, *Data Matching*, ch. 7): report them together or report
    nothing.
    """
    l, r = id_cols
    cand = candidates.select(l, r).dropDuplicates([l, r])
    t = truth.select(
        F.col(l).alias("_tl"), F.col(r).alias("_tr")
    ).dropDuplicates(["_tl", "_tr"])
    hit = cand.join(
        t, (F.col(l) == F.col("_tl")) & (F.col(r) == F.col("_tr")), "left_semi"
    ).agg(F.count("*").alias("_hits"))
    sides = (
        cand.agg(F.count("*").alias("n_candidates"))
        .join(F.broadcast(t.agg(F.count("*").alias("n_truth"))))
        .join(F.broadcast(hit))
    )
    total_pairs = float(n_records) * (n_records - 1) / 2.0
    return sides.select(
        "n_candidates",
        "n_truth",
        F.col("_hits").alias("true_in_candidates"),
        F.round(F.col("_hits") / F.col("n_truth"), round_to).alias(
            "pairs_completeness"
        ),
        F.round(
            F.lit(1.0) - F.col("n_candidates") / F.lit(total_pairs), round_to
        ).alias("reduction_ratio"),
    )


def bcubed(
    assign: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_id",
    round_to: int = 6,
) -> DataFrame:
    """B-cubed cluster precision/recall/F1 (Bagga & Baldwin 1998) — the
    standard extrinsic metric for ER *clusterings* (pairwise F1
    over-weights big clusters; B-cubed averages per RECORD, so a
    mangled singleton costs as much as a mangled hub member).

    Per record e: precision(e) = |C(e) ∩ T(e)| / |C(e)|, recall(e) =
    |C(e) ∩ T(e)| / |T(e)|, averaged over records. The per-record pass
    is algebraically collapsed into aggregates:

        P = (1/N) * sum over (c, t) of n_ct^2 / n_c
        R = (1/N) * sum over (c, t) of n_ct^2 / n_t

    so the whole metric is one groupBy(c, t) + two size joins + a final
    1-row aggregate — no per-record fan-out, no driver collect, linear
    in records at 10^12 docs. Records present in only one of the two
    assignments are dropped (inner join) — evaluate like-for-like.
    """
    a = assign.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t"))
    both = a.join(t, "_id")
    n_ct = both.groupBy("_c", "_t").agg(F.count("*").alias("_nct"))
    n_c = both.groupBy("_c").agg(F.count("*").alias("_nc"))
    n_t = both.groupBy("_t").agg(F.count("*").alias("_nt"))
    per = (
        n_ct.join(n_c, "_c")
        .join(n_t, "_t")
        .agg(
            F.sum(F.col("_nct") * F.col("_nct") / F.col("_nc")).alias("_sp"),
            F.sum(F.col("_nct") * F.col("_nct") / F.col("_nt")).alias("_sr"),
            F.sum("_nct").alias("n_records"),
        )
    )
    p = F.col("_sp") / F.col("n_records")
    r = F.col("_sr") / F.col("n_records")
    return per.select(
        "n_records",
        F.round(p, round_to).alias("bcubed_precision"),
        F.round(r, round_to).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), round_to).alias("bcubed_f1"),
    )


def adjusted_rand(
    assign: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_id",
    round_to: int = 6,
) -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie 1985) between a predicted
    and a true clustering — the chance-corrected pair-counting
    complement to :func:`bcubed` (B-cubed averages per record; ARI
    counts agreeing/disagreeing PAIRS and subtracts the expectation
    under random clusterings with the same marginals, so "everything
    in one cluster" scores ~0 instead of riding high recall).

        ARI = (Σ C(n_ct,2) − E) / (½(Σ C(n_c,2) + Σ C(n_t,2)) − E),
        E   = Σ C(n_c,2) · Σ C(n_t,2) / C(n,2)

    Same scale shape as bcubed: the contingency table is ONE
    groupBy(c, t); the marginal pair sums reduce from it (never from
    records); the final row is a driver-trivial 1-row aggregate. All
    pair counts stay integral until the last division, so the value
    is engine-reproducible after rounding. Degenerate case (both
    clusterings put all pairs together or all apart): denominator 0,
    defined as ARI = 1 when the tables agree — handled branch-free
    with a coalesce(try_divide) since agreement there forces the
    numerator to 0 too (0/0 → 1.0; any nonzero/0 cannot occur).
    """
    a = assign.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t"))
    both = a.join(t, "_id")
    n_ct = both.groupBy("_c", "_t").agg(F.count("*").alias("_nct"))
    n_ct = n_ct.localCheckpoint(eager=False)  # feeds three reductions

    def comb2(c: F.Column) -> F.Column:
        return (c * (c - F.lit(1))) / F.lit(2)

    sums = n_ct.agg(
        F.sum(comb2(F.col("_nct"))).alias("_sct"),
        F.sum("_nct").alias("_n"),
    )
    sa = (
        n_ct.groupBy("_c")
        .agg(F.sum("_nct").alias("_nc"))
        .agg(F.sum(comb2(F.col("_nc"))).alias("_sa"))
    )
    sb = (
        n_ct.groupBy("_t")
        .agg(F.sum("_nct").alias("_nt"))
        .agg(F.sum(comb2(F.col("_nt"))).alias("_sb"))
    )
    joined = sums.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    exp = F.col("_sa") * F.col("_sb") / comb2(F.col("_n"))
    num = F.col("_sct") - exp
    den = (F.col("_sa") + F.col("_sb")) / 2 - exp
    ari = F.coalesce(F.try_divide(num, den), F.lit(1.0))
    return joined.select(
        F.col("_n").cast("long").alias("n_records"),
        F.round(ari, round_to).alias("ari"),
    )


def vmeasure(
    assign: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_id",
    round_to: int = 6,
) -> DataFrame:
    """Homogeneity / completeness / V-measure (Rosenberg & Hirschberg
    2007) plus cluster purity — the information-theoretic complement to
    :func:`bcubed` and :func:`adjusted_rand`:

    - homogeneity  = 1 - H(T|C)/H(T): does each predicted cluster hold
      a single true entity? (over-merging hurts this)
    - completeness = 1 - H(C|T)/H(C): does each true entity land in a
      single predicted cluster? (over-splitting hurts this)
    - v_measure    = their harmonic mean
    - purity       = Σ_c max_t n_ct / N (the classic but
      chance-uncorrected "majority label" score, included because every
      ER eval sheet still quotes it)

    Same scale shape as the other metrics: ONE groupBy(c, t)
    contingency table feeds every term; marginals reduce from the
    table, never from records; entropies are Σ n ln n folds over table
    rows (H(T|C) = (Σ_c n_c ln n_c − Σ_ct n_ct ln n_ct)/N, etc.), so
    nothing scales with record count after the first groupBy. Natural
    log throughout — the ratio of entropies makes the base cancel.
    Degenerate cases per the paper: H(T)=0 → homogeneity 1, H(C)=0 →
    completeness 1, both handled by coalesce(try_divide) since the
    matching conditional entropy is then 0 as well.
    """
    a = assign.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_t"))
    both = a.join(t, "_id")
    n_ct = both.groupBy("_c", "_t").agg(F.count("*").alias("_nct"))
    n_ct = n_ct.localCheckpoint(eager=False)  # feeds four reductions

    nlogn = lambda c: c.cast("double") * F.log(c.cast("double"))  # noqa: E731

    core = n_ct.agg(
        F.sum(nlogn(F.col("_nct"))).alias("_sct"),
        F.sum("_nct").alias("_n"),
    )
    byc = (
        n_ct.groupBy("_c")
        .agg(F.sum("_nct").alias("_nc"), F.max("_nct").alias("_maj"))
        .agg(
            F.sum(nlogn(F.col("_nc"))).alias("_sc"),
            F.sum("_maj").alias("_majority"),
        )
    )
    byt = (
        n_ct.groupBy("_t")
        .agg(F.sum("_nct").alias("_nt"))
        .agg(F.sum(nlogn(F.col("_nt"))).alias("_st"))
    )
    j = core.crossJoin(F.broadcast(byc)).crossJoin(F.broadcast(byt))
    n = F.col("_n").cast("double")
    # H(T|C) = (Σ_c n_c ln n_c − Σ n_ct ln n_ct) / N ; H(T) = ln N − Σ_t n_t ln n_t / N
    h_t_given_c = (F.col("_sc") - F.col("_sct")) / n
    h_c_given_t = (F.col("_st") - F.col("_sct")) / n
    h_t = F.log(n) - F.col("_st") / n
    h_c = F.log(n) - F.col("_sc") / n
    hom = F.lit(1.0) - F.coalesce(F.try_divide(h_t_given_c, h_t), F.lit(0.0))
    com = F.lit(1.0) - F.coalesce(F.try_divide(h_c_given_t, h_c), F.lit(0.0))
    v = F.coalesce(F.try_divide(2 * hom * com, hom + com), F.lit(0.0))
    return j.select(
        F.col("_n").cast("long").alias("n_records"),
        F.round(hom, round_to).alias("homogeneity"),
        F.round(com, round_to).alias("completeness"),
        F.round(v, round_to).alias("v_measure"),
        F.round(F.col("_majority") / n, round_to).alias("purity"),
    )


def unlinkables(
    records: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "fs_score",
    pair_id_cols: tuple[str, str] = ("l_id", "r_id"),
    round_to: int = 1,
) -> DataFrame:
    """Unlinkables analysis (Splink's `unlinkables_chart` semantics):
    for every record in the blocking universe, take its BEST score over
    every candidate pair it appears in (either side), then report, per
    rounded best-score value, the share of records at that value and
    the cumulative share at-or-below it. Reading the curve at a
    proposed threshold tells you what fraction of records CANNOT link
    at that threshold no matter how the clustering goes — the
    data-quality ceiling a reviewer should see before trusting
    precision numbers.

    Records with no candidate pairs at all (blocking orphans) surface
    as a NULL score bucket sorted first — they are the *definitely*
    unlinkable mass, and hiding them is the classic way this chart
    lies. Scale shape: explode pairs to (record, score) — 2 rows per
    pair — one max-groupBy per record, one count-groupBy per bucket
    (both map-side combinable), and a cumulative window over the <=
    a-few-hundred distinct buckets, never over records.
    """
    l, r = pair_id_cols
    sides = scored.select(
        F.col(l).alias("_id"), F.col(score_col).alias("_s")
    ).unionByName(scored.select(F.col(r).alias("_id"), F.col(score_col).alias("_s")))
    best = sides.groupBy("_id").agg(F.max("_s").alias("_best"))
    base = records.select(F.col(id_col).alias("_id")).distinct()
    per_rec = base.join(best, "_id", "left").select(
        F.round(F.col("_best"), round_to).alias("best_score")
    )
    buckets = per_rec.groupBy("best_score").agg(F.count("*").alias("n_records"))
    total = F.sum("n_records").over(Window.partitionBy())
    cum = F.sum("n_records").over(
        Window.orderBy(F.asc_nulls_first("best_score")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return buckets.select(
        "best_score",
        "n_records",
        F.round(F.col("n_records") / total, 6).alias("prop"),
        F.round(cum / total, 6).alias("cum_prop"),
    )


def cluster_stability(
    scored: DataFrame,
    thresholds: list[float],
    score_col: str = "fs_score",
    pair_id_cols: tuple[str, str] = ("l_id", "r_id"),
) -> DataFrame:
    """How does the clustering change as the match threshold moves? For
    each threshold t: build the edge set {pairs with score >= t}, run
    connected components, and report the non-singleton entity count,
    the number of records they absorb, and the largest entity size —
    the three numbers a reviewer reads to pick a threshold (a largest-
    cluster explosion between two thresholds is the classic sign the
    lower one bridges distinct entities through a hub record).

    Driver loop over the (small, fixed) threshold list; per threshold
    one CC run + one size groupBy + a 1-row aggregate. The scored-pair
    table is evaluated once per threshold via its cached/checkpointed
    lineage — callers at scale pass a persisted `scored`.
    """
    from rlr_spark.operators.cluster import connected_components

    l, r = pair_id_cols
    out: DataFrame | None = None
    for t in thresholds:
        edges = scored.where(F.col(score_col) >= t).select(
            F.col(l).alias("u"), F.col(r).alias("v")
        )
        sizes = (
            connected_components(edges)
            .groupBy("entity_id")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") >= 2)
        )
        row = sizes.agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.coalesce(F.sum("_sz"), F.lit(0)).alias("n_linked_records"),
            F.coalesce(F.max("_sz"), F.lit(0)).alias("max_cluster_size"),
        ).select(F.lit(float(t)).alias("threshold"), "*")
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def transitivity_audit(
    scored: DataFrame,
    match_threshold: float,
    score_col: str = "fs_score",
    pair_id_cols: tuple[str, str] = ("l_id", "r_id"),
    round_to: int = 6,
) -> DataFrame:
    """List the transitivity violations a threshold induces: record
    pairs (u, w) that share at least one matched neighbor v (u~v and
    v~w both at/above ``match_threshold``) while (u, w) itself scores
    below it — or was never scored at all. Connected components will
    glue u and w anyway; this is the audit trail of exactly WHERE the
    clustering overrode the pairwise scorer, ranked by witness count.
    A spike here at a candidate threshold is the actionable version of
    a :func:`cluster_stability` merge explosion.

    Output: (l_id, r_id, n_witnesses, pair_score) with pair_score NULL
    for never-scored pairs (the blocking misses — arguably the worse
    kind, since no scorer ever saw them).

    Scale shape: matched edges both-orientation explode (2|M| rows),
    one self-join on the shared witness (Σ deg(v)^2 wedges — the same
    hub bound as triangle counting, controlled upstream by blocking
    caps), one groupBy to count witnesses, one left join back to the
    scored table. No windows, no collects.
    """
    l, r = pair_id_cols
    m = scored.where(F.col(score_col) >= match_threshold).select(l, r)
    halves = m.select(F.col(l).alias("_a"), F.col(r).alias("_v")).unionByName(
        m.select(F.col(r).alias("_a"), F.col(l).alias("_v"))
    )
    wedges = (
        halves.select(F.col("_a").alias("_u"), "_v")
        .join(halves.select(F.col("_a").alias("_w"), "_v"), "_v")
        .where(F.col("_u") < F.col("_w"))
        .groupBy("_u", "_w")
        .agg(F.count(F.lit(1)).alias("n_witnesses"))
    )
    # matched (u, w) pairs are not violations — remove them; the rest
    # keep their sub-threshold score, or NULL if blocking never paired them
    sc = scored.select(
        F.col(l).alias("_u"), F.col(r).alias("_w"), F.col(score_col).alias("_s")
    )
    return (
        wedges.join(m.select(F.col(l).alias("_u"), F.col(r).alias("_w")), ["_u", "_w"], "left_anti")
        .join(sc, ["_u", "_w"], "left")
        .select(
            F.col("_u").alias(l),
            F.col("_w").alias(r),
            "n_witnesses",
            F.round(F.col("_s"), round_to).alias("pair_score"),
        )
    )
