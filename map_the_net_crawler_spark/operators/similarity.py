"""Similarity search over an embedding column (array<float>).

- brute_force_cosine_topk: the exactness baseline — cross join pruned to
  (query × corpus) with the dot product computed by F.zip_with/aggregate
  (JVM-side, no Python).  Fine for broadcast-sized query sets; the
  corpus side streams and scales with executors.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH signatures
  bucket the corpus; each query only scans its matching buckets
  (multi-probe = exact bucket here).  Signatures are deterministic
  (hash-derived hyperplanes, no RNG state).
- ivf_topk: IVF-style coarse quantization — k centroid rows (tiny,
  broadcast) assign each vector to its nearest centroid; queries scan
  only ``nprobe`` nearest centroid cells.

All return (query_id, neighbor_id, cosine, rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine_col(a, b):
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)) \
            .otherwise(F.lit(0.0))


def _as_double(col):
    return F.transform(col, lambda v: v.cast("double"))


def brute_force_cosine_topk(queries: DataFrame, corpus: DataFrame,
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.  The query
    side is broadcast; ranking is a per-query window (partitioned by
    query_id — parallel across queries)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("c_vec"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplane(dim: int, plane_idx: int):
    """Deterministic pseudo-random hyperplane: component j of plane p is
    a hash-derived value in [-1, 1] — no RNG state, reproducible on any
    executor."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.concat_ws(
            ":", F.lit(plane_idx), j.cast("string"))), F.lit(10000))
            .cast("double") / 5000.0) - 1.0)


def lsh_signature_col(vec, dim: int, n_planes: int = 16):
    """Sign pattern of the vector against n deterministic hyperplanes,
    packed into a long."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        d = _dot(vec, _hyperplane(dim, p))
        sig = sig.bitwiseOR(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
                            .cast("long"))
    return sig


def lsh_bucketed_topk(queries: DataFrame, corpus: DataFrame, dim: int,
                      k: int = 10, n_planes: int = 8,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine + window rank inside the bucket.  One shuffle keyed by bucket."""
    def with_sig(df, id_alias, vec_alias):
        v = _as_double(F.col(vec_col))
        return df.select(F.col(id_col).alias(id_alias),
                         v.alias(vec_alias),
                         lsh_signature_col(v, dim, n_planes).alias("bucket"))
    q = with_sig(queries, "query_id", "q_vec")
    c = with_sig(corpus, "neighbor_id", "c_vec")
    scored = (q.join(c, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk(queries: DataFrame, corpus: DataFrame, dim: int,
             n_cells: int = 16, nprobe: int = 4, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: deterministic centroid seeds (hash-chosen corpus
    rows), cell assignment by max cosine, queries probe nprobe cells."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("c_vec"))
    # deterministic centroid pick: the n_cells corpus rows with the
    # smallest xxhash64(id) — stable under any partitioning
    cent = (c.withColumn("_h", F.xxhash64(F.col("neighbor_id")))
            .orderBy("_h").limit(n_cells)
            .select(F.monotonically_increasing_id().alias("_tmp"),
                    F.col("c_vec").alias("cent_vec"))
            .withColumn("cell", F.row_number().over(
                Window.orderBy("_tmp")) - 1)
            .drop("_tmp"))
    cent = F.broadcast(cent)

    def assign(df, vec_name, keep, n_keep):
        scored = df.crossJoin(cent).select(
            *keep, F.col("cell"),
            cosine_col(F.col(vec_name), F.col("cent_vec")).alias("_sim"))
        w = Window.partitionBy(*keep).orderBy(F.col("_sim").desc(),
                                              F.col("cell").asc())
        return (scored.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= n_keep).drop("_r", "_sim"))

    c_assigned = assign(c, "c_vec", ["neighbor_id"], 1) \
        .join(c, "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("q_vec"))
    q_assigned = assign(q, "q_vec", ["query_id"], nprobe).join(q, "query_id")

    scored = (q_assigned.join(c_assigned, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.dropDuplicates(["query_id", "neighbor_id"])
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
