"""Sparse TF-IDF cosine all-pairs similarity (inverted-index join).

The missing middle between this repo's exact-jaccard PPJoin
(functions/dedup.py `prefix_join_pairs`) and its dense-embedding ANN
(functions/embeddings.py): cosine over *sparse lexical* vectors — the
classic weighted document-similarity join (Bayardo et al. WWW'07
"Scaling Up All Pairs Similarity Search" is the canonical treatment).

Shape, and why it scales:

1. (doc, token, tf) — one explode + one map-side-combinable groupBy.
2. idf per token — one groupBy over the token stream; ln((N+1)/(df+1))+1
   (the smooth variant: never negative, defined for df=N).
3. unit-normalize per doc (one groupBy + broadcast-friendly join).
4. inverted-index self-join ON token, partial dot-products summed per
   (l, r) pair — the join fans out by sum(df_t^2) over tokens, so the
   WHOLE cost is governed by the document-frequency tail. That is why
   ``max_df`` exists: tokens appearing in more than max_df documents
   carry near-zero idf weight but quadratic join cost; dropping them
   is the standard (and here explicit, logged, opt-in) index-pruning
   step. With a zipfian vocabulary this turns an O(n^2) stopword
   blowup into near-linear work; exact mode (max_df=None) is the
   default so correctness checks stay unconditional.

Everything is built-in column ops — no UDFs, no collects; the only
aggregations are map-side-combinable sums. The oracle mirror
(:func:`all_pairs_cosine_sql`) is generated from the same constants
so both engines compute the identical rounded cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) with one row per token OCCURRENCE (tf counts these)."""
    trimmed = F.trim(F.lower(F.col(text_col)))
    return (
        docs.where(F.col(text_col).isNotNull() & (trimmed != ""))
        .select(F.col(id_col).alias("_id"), F.explode(F.split(trimmed, r"\s+")).alias("tok"))
    )


def doc_token_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Unit-normalized TF-IDF weights: (_id, tok, w) with sum_t w^2 = 1.

    ``max_df``: drop tokens whose document frequency exceeds it BEFORE
    weighting (index pruning; see module docstring). Norms are computed
    over the kept tokens, so pruned vectors stay unit-length.
    """
    toks = _doc_tokens(docs, id_col, text_col)
    tf = toks.groupBy("_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(F.col(id_col)).where(F.col(id_col).isNotNull()).count()
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        df_t = df_t.where(F.col("df") <= max_df)
    idf = df_t.select(
        "tok",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )
    w = tf.join(F.broadcast(idf), "tok").select(
        "_id", "tok", (F.col("tf") * F.col("idf")).alias("_w")
    )
    norms = w.groupBy("_id").agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_n"))
    return w.join(norms, "_id").select(
        "_id", "tok", (F.col("_w") / F.col("_n")).alias("w")
    )


def all_pairs_cosine(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_df: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """All document pairs with TF-IDF cosine >= threshold.

    Output: (l_id, r_id, cosine), l_id < r_id, cosine rounded.
    Plan: one shuffle on token for the inverted-index self-join, one
    groupBy (l, r) for the dot product — both map-side combinable.
    """
    w = doc_token_weights(docs, id_col, text_col, max_df)
    a = w.select(F.col("_id").alias("l_id"), "tok", F.col("w").alias("_wl"))
    b = w.select(F.col("_id").alias("r_id"), "tok", F.col("w").alias("_wr"))
    return (
        a.join(b, "tok")
        .where(F.col("l_id") < F.col("r_id"))
        .groupBy("l_id", "r_id")
        .agg(F.sum(F.col("_wl") * F.col("_wr")).alias("_dot"))
        .where(F.col("_dot") >= threshold)
        .select("l_id", "r_id", F.round("_dot", round_to).alias("cosine"))
    )


def all_pairs_cosine_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_df: int | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB mirror of :func:`all_pairs_cosine` (same smoothing, same
    pruning, same rounding) — the oracle side."""
    df_filter = f"WHERE df <= {max_df}" if max_df is not None else ""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS _id,
             unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS tok
      FROM {table_expr}
      WHERE {text_col} IS NOT NULL AND trim(lower({text_col})) <> ''),
    tf AS (SELECT _id, tok, count(*)::DOUBLE AS tf FROM toks GROUP BY _id, tok),
    nd AS (SELECT count(*)::DOUBLE AS n FROM {table_expr}
           WHERE {id_col} IS NOT NULL),
    dft AS (
      SELECT tok, idf FROM (
        SELECT tok, count(*) AS df,
               ln((n + 1) / (count(*) + 1)) + 1.0 AS idf
        FROM tf, nd GROUP BY tok, n) {df_filter}),
    w0 AS (
      SELECT _id, tf.tok, tf.tf * dft.idf AS w
      FROM tf JOIN dft ON tf.tok = dft.tok),
    nrm AS (SELECT _id, sqrt(sum(w * w)) AS nn FROM w0 GROUP BY _id),
    w AS (
      SELECT w0._id, tok, w / nn AS w
      FROM w0 JOIN nrm ON w0._id = nrm._id)
    SELECT a._id AS l_id, b._id AS r_id,
           round(sum(a.w * b.w), {round_to}) AS cosine
    FROM w a JOIN w b ON a.tok = b.tok AND a._id < b._id
    GROUP BY a._id, b._id
    HAVING sum(a.w * b.w) >= {threshold}
    """


def soft_tfidf_scores(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    theta: float = 0.9,
    max_tokens: int = 6,
    out_col: str = "soft_tfidf",
    round_to: int = 6,
) -> DataFrame:
    """Soft TF-IDF (Cohen, Ravikumar & Fienberg 2003) — the hybrid
    comparator that beat every pure string distance in their SecondString
    benchmarks: corpus-level TF-IDF weighting (rare tokens matter more)
    combined with token-level Jaro-Winkler fuzziness (typos inside
    tokens still count).

        score(S,T) = Σ_{w ∈ S, maxjw(w,T) >= θ} V(w,S) · V(v*,T) · maxjw

    with V the unit-normalized idf weight over the doc's first
    ``max_tokens`` distinct tokens (set semantics: tf=1 — field
    comparators see names, not prose) and v* the best-JW partner of w
    in T (ties broken by the larger weight, deterministically — NOT by
    engine-dependent arg_max tie order, which is what makes this
    oracle-checkable).

    Plan shape: idf + norms are two corpus-level groupBys (O(docs));
    the per-pair token cross product is bounded by ``max_tokens``^2
    rows per pair and runs the existing Arrow-batched JW over one flat
    column; best-partner selection is one groupBy (max jw) + one
    equality-join back (rows where jw equals the max) + a max — no
    windows, no UDAFs, every aggregation map-side combinable.
    """
    from rlr_spark.functions.similarity import jaro_winkler_udf

    trimmed = F.trim(F.lower(F.col(text_col)))
    ts = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.slice(F.split(trimmed, r"\s+"), 1, max_tokens)).alias("_ts"),
    )
    n_docs = docs.count()
    tok = ts.select("_id", F.explode("_ts").alias("tok"))
    idf = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "tok",
            (F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1.0).alias("idf"),
        )
    )
    w = tok.join(F.broadcast(idf), "tok")
    norms = w.groupBy("_id").agg(F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("_n"))
    v = w.join(norms, "_id").select(
        "_id", "tok", (F.col("idf") / F.col("_n")).alias("v")
    )
    lv = v.select(F.col("_id").alias("l_id"), F.col("tok").alias("_lt"), F.col("v").alias("_lv"))
    rv = v.select(F.col("_id").alias("r_id"), F.col("tok").alias("_rt"), F.col("v").alias("_rv"))
    cross = (
        pairs.select("l_id", "r_id")
        .join(lv, "l_id")
        .join(rv, "r_id")
        .withColumn("_jw", jaro_winkler_udf(F.col("_lt"), F.col("_rt")))
    )
    cross = cross.localCheckpoint(eager=False)  # reused by close + sel
    close = (
        cross.groupBy("l_id", "r_id", "_lt", "_lv")
        .agg(F.max("_jw").alias("_m"))
        .where(F.col("_m") >= theta)
    )
    sel = (
        cross.select("l_id", "r_id", "_lt", "_rv", "_jw")
        .join(close, ["l_id", "r_id", "_lt"])
        .where(F.col("_jw") == F.col("_m"))
        .groupBy("l_id", "r_id", "_lt", "_lv", "_m")
        .agg(F.max("_rv").alias("_rvb"))
    )
    score = sel.groupBy("l_id", "r_id").agg(
        F.sum(F.col("_lv") * F.col("_rvb") * F.col("_m")).alias("_s")
    )
    return (
        pairs.select("l_id", "r_id")
        .join(score, ["l_id", "r_id"], "left")
        .select(
            "l_id",
            "r_id",
            F.round(F.coalesce(F.col("_s"), F.lit(0.0)), round_to).alias(out_col),
        )
    )
