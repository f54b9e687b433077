"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (pure column ops:
``zip_with`` dot products inside codegen), and a deterministic
random-hyperplane LSH bucketing as the scale path — at 10^9 vectors the
cross join is infeasible; LSH reduces each probe to one bucket's worth
of candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # branch-free: when/otherwise would re-evaluate the fold-based dot
    # and norms per branch reference (similarity.py token_jaccard note)
    denom = norm(a) * norm(b)
    return F.coalesce(F.try_divide(dot(a, b), denom), F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus, rank per query. Returns (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Hyperplane-LSH ANN
# ---------------------------------------------------------------------------

def _plane(dim: int, j: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j: a fixed integer formula
    (no RNG state, reproducible across engines/sessions)."""
    return [float(((i * 2654435761 + j * 40503 + 7) % 1021) - 510) for i in range(dim)]


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from n deterministic hyperplanes."""
    bits = []
    for j in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(dim, j)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket * 2 + b
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's hyperplane
    bucket, then exact cosine within it. Trades recall for a
    2^n_planes-fold candidate reduction; at cluster scale the corpus is
    written bucket-partitioned so a probe scans one partition."""
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cv"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cell-restricted probe
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic distributed Lloyd's: init = the k vectors with the
    smallest ids (seeded corpora make this reproducible), then a few
    update rounds. Each round is one shuffle (posexplode -> groupBy
    (cell, dim) -> avg); centroids live on the driver (k*dim floats)."""
    init_rows = (
        corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

    for _ in range(n_iter):
        assigned = corpus.select(
            F.col(vec_col),
            _nearest_centroid(F.col(vec_col), centroids).alias("_cell"),
        )
        sums = (
            assigned.select("_cell", F.posexplode(vec_col).alias("_dim", "_x"))
            .groupBy("_cell", "_dim")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = {c: dict() for c in range(len(centroids))}
        for r in sums:
            new[r._cell][r._dim] = r._m
        centroids = [
            [new[c].get(d, centroids[c][d]) for d in range(len(centroids[c]))]
            if new.get(c)
            else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax cosine over the (broadcast-literal) centroid list."""
    best_cell = F.lit(0)
    best_sim = cosine(vec, F.array(*[F.lit(x) for x in centroids[0]]))
    for c in range(1, len(centroids)):
        sim = cosine(vec, F.array(*[F.lit(x) for x in centroids[c]]))
        cond = sim > best_sim
        best_cell = F.when(cond, F.lit(c)).otherwise(best_cell)
        best_sim = F.when(cond, sim).otherwise(best_sim)
    return best_cell


def _nearest_cells(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Array of the n_probe nearest cell ids (by cosine), descending."""
    scored = F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(x) for x in centroids[c]])).alias("s"),
                F.lit(c).alias("c"),
            )
            for c in range(len(centroids))
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return F.transform(top, lambda t: t["c"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF probe: candidates restricted to the query's n_probe nearest
    cells, exact cosine within. At cluster scale the corpus is written
    partitioned by ``_cell`` so a probe scans n_probe partitions — the
    inverted-file layout, expressed as partition pruning."""
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cv"),
        _nearest_centroid(F.col(vec_col), centroids).alias("_cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("_cell"),
    )
    scored = c.join(F.broadcast(q), "_cell").select(
        query_id_col, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-bucketed
    (same-bucket candidates only). Returns (l_id, r_id, cos_sim)."""
    keyed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    )
    l = keyed.select(
        F.col(id_col).alias("l_id"), F.col(vec_col).alias("_lv"), "_bucket"
    )
    r = keyed.select(
        F.col(id_col).alias("r_id"), F.col(vec_col).alias("_rv"), "_bucket"
    )
    return (
        l.join(r, "_bucket")
        .where(F.col("l_id") < F.col("r_id"))
        .withColumn("cos_sim", cosine(F.col("_lv"), F.col("_rv")))
        .where(F.col("cos_sim") >= threshold)
        .select("l_id", "r_id", "cos_sim")
    )
