"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute-force top-k** — the exactness baseline: broadcast the (small)
  query set against the corpus, cosine via JVM-side ``zip_with`` +
  ``aggregate`` array algebra, per-query top-k with a window. One scan of
  the corpus, no shuffle of the big side except the final top-k.
- **LSH-bucketed top-k** — the scale path: random-hyperplane signatures
  (deterministic, seeded) bucket the corpus; candidates = bucket
  collisions with the query in any band; exact cosine re-rank within
  candidates. Probing cost is bucket-local instead of corpus-wide; recall
  is tunable by (planes, bands).

Near-duplicate-by-embedding is ``cosine >= threshold`` on either path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    # accumulate in float64 regardless of the storage type (array<float>):
    # float32 accumulation loses the 6th decimal and is not reproducible
    # against double-precision oracles
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` must be small (it is broadcast). Self-matches are excluded.
    Ties are broken by neighbor id for full determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            dot("q_vec", "c_vec").cast("double")
            / (norm("q_vec") * norm("c_vec")).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signature(
    vec_col: str, dim: int, planes: int = 16, seed: int = 7
) -> Column:
    """Array of ``planes`` sign bits of <v, h_p> where h_p[d] is a
    deterministic pseudo-random value in [-1, 1) derived from
    xxhash64(seed, p, d) — reproducible at any parallelism, no stored
    plane table, all JVM-side."""
    def plane_dot(p: int) -> Column:
        terms = F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x
            * (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), 2000) / 1000.0 - 1.0
            ),
        )
        return F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)

    return F.array(*[F.when(plane_dot(p) >= 0, 1).otherwise(0) for p in range(planes)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH band with the
    query, then exact cosine re-rank. Same output schema as
    ``brute_force_topk`` (ranks relative to the candidate set)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    assert planes % bands == 0
    rows = planes // bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = hyperplane_signature(vec_col, dim, planes, seed)
        return (
            df.select(
                F.col(id_col).alias(f"{role}_id"),
                F.col(vec_col).alias(f"{role}_vec"),
                sig.alias("sig"),
            )
            .select(
                f"{role}_id",
                f"{role}_vec",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.concat_ws(
                                    "",
                                    *[F.col("sig")[b * rows + r].cast("string")
                                      for r in range(rows)],
                                ).alias("bucket"),
                            )
                            for b in range(bands)
                        ]
                    )
                ).alias("bb"),
            )
            .select(f"{role}_id", f"{role}_vec", "bb.band", "bb.bucket")
        )

    cq = banded(queries, "query")
    cc = banded(corpus, "neighbor")
    cand = (
        cc.join(F.broadcast(cq), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos_sim",
            dot("query_vec", "neighbor_vec").cast("double")
            / (norm("query_vec") * norm("neighbor_vec")).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dups_exact(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """All-pairs cosine near-duplicates — the EXACTNESS BASELINE.

    This is a BroadcastNestedLoopJoin: O(n^2) comparisons. It exists to
    validate the LSH path's recall at test scale, not to run on a real
    corpus. A guard refuses above ``max_rows`` (10^5 rows is already
    5*10^9 comparisons) and points at :func:`embedding_near_dups`, the
    banded-LSH scale path with identical output semantics minus recall.
    """
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_near_dups_exact is the quadratic exactness baseline "
            f"({n} rows > max_rows={max_rows}; ~{n * (n - 1) // 2:.2g} "
            f"comparisons). Use embedding_near_dups() (LSH-blocked) for "
            f"real corpora, or raise max_rows explicitly if you mean it."
        )
    a = corpus.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "cos_sim",
            dot("_va", "_vb").cast("double")
            / (norm("_va") * norm("_vb")).cast("double"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", "cos_sim")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, LSH-blocked
    (never a corpus×corpus cross join)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rows = planes // bands
    sig = hyperplane_signature(vec_col, dim, planes, seed)
    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                         sig.alias("sig"))
    banded = base.select(
        "id", "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "",
                            *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "vec", "bb.band", "bb.bucket")
    a = banded.select("band", "bucket", F.col("id").alias("doc_a"), F.col("vec").alias("va"))
    b = banded.select("band", "bucket", F.col("id").alias("doc_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("cos_sim", dot("va", "vb").cast("double") / (norm("va") * norm("vb")).cast("double"))
        .filter(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer + probed exact re-rank
# ---------------------------------------------------------------------------

def _assign_clusters(df: DataFrame, centroids, id_col: str, vec_col: str,
                     n_probe: int = 1, role: str = "corpus") -> DataFrame:
    """Append cluster assignment(s) by cosine against broadcast centroids.

    Arrow-batched mapInPandas: one numpy matmul per batch — no per-row
    Python, no shuffle. ``n_probe`` > 1 explodes each row to its top-p
    nearest centroids (query-side probing).
    """
    import numpy as np
    import pandas as pd

    C = centroids / (np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)
    n_probe_eff = min(n_probe, len(C))

    def batches(it):
        for pdf in it:
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Mn = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
            sims = Mn @ C.T
            order = np.argsort(-sims, axis=1)[:, :n_probe_eff]
            rows = {
                id_col: np.repeat(pdf[id_col].to_numpy(), n_probe_eff),
                vec_col: [v for v in pdf[vec_col] for _ in range(n_probe_eff)],
                "cluster_id": order.reshape(-1).astype("int32"),
            }
            yield pd.DataFrame(rows)

    schema = f"{id_col} long, {vec_col} array<float>, cluster_id int"
    return df.select(id_col, vec_col).mapInPandas(batches, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> DataFrame:
    """IVF approximate top-k: deterministic hash-sampled centroids bucket
    the corpus once; each query probes its ``n_probe`` nearest centroid
    lists and re-ranks exactly within them.

    At 10^12 scale the corpus assignment is one Arrow pass + a write
    partitioned by cluster_id; queries then touch n_probe/n_centroids of
    the data instead of all of it. Same output schema as brute_force_topk.
    """
    import numpy as np

    cent_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])

    c_assigned = _assign_clusters(corpus, centroids, id_col, vec_col, 1, "corpus")
    q_assigned = _assign_clusters(queries, centroids, id_col, vec_col, n_probe, "query")

    c = c_assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cluster_id"
    )
    qd = q_assigned.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cluster_id"
    )
    cand = (
        c.join(F.broadcast(qd), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cos_sim",
            dot("q_vec", "c_vec").cast("double")
            / (norm("q_vec") * norm("c_vec")).cast("double"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
