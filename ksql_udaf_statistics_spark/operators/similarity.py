"""Similarity search over embedding columns (array<float>).

Three paths:

- **brute-force top-k** — the exactness baseline: broadcast the (small)
  query matrix against the corpus, one Arrow-batched numpy matmul per
  corpus partition, per-partition top-k, then a global window top-k over
  the tiny candidate union. One scan of the corpus, no pair-row blowup,
  no shuffle of the big side except the (partitions x queries x k)-row
  final top-k.
- **LSH-bucketed top-k** — the scale path: random-hyperplane signatures
  (deterministic, seeded) bucket the corpus; candidates = bucket
  collisions with the query in any band; exact cosine re-rank within
  candidates. Probing cost is bucket-local instead of corpus-wide; recall
  is tunable by (planes, bands).
- **IVF top-k** — coarse quantizer (deterministic hash-sampled centroids)
  + probed exact re-rank within the query's n_probe nearest lists.

All scoring is Arrow-batched numpy (one matmul / one vectorized reduction
per record batch, float64 accumulation) — r2 measured the interpreted
``F.aggregate``/``zip_with`` higher-order-function cosine at ~200ns per
element, which at 100x scale dominates the ANN hot path; the Arrow path
is the same pattern the IVF assigner already used. The pure-Column
``dot``/``norm``/``cosine`` helpers remain exported for plans that must
stay Python-free, but no hot path uses them.

Near-duplicate-by-embedding is ``cosine >= threshold`` on either path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    """Pure-Column dot product (interpreted HOF — not for hot paths;
    accumulates in float64 regardless of the storage type)."""
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


def _stack(series: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow array column batch."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_long_id(df: DataFrame, id_col: str, fn: str) -> None:
    """Fail fast on non-integral id columns.

    The Arrow hot paths (brute_force_topk, banded_signatures and its
    lsh/near-dup consumers) emit 64-bit integer ids (``np.int64``
    conversion + ``long`` output schema) — the narrowest shuffle payload
    for the candidate-pair stages. A string/UUID id would otherwise fail
    deep inside an executor-side numpy conversion; this check raises at
    plan-build time with the fix (cast or zipWithIndex-style surrogate).
    """
    dtype = df.schema[id_col].dataType.simpleString()
    if dtype not in _INTEGRAL_TYPES:
        raise TypeError(
            f"{fn} requires an integral id column (got {id_col!r}: {dtype}). "
            f"Cast to long, or add a surrogate id "
            f"(e.g. df.withColumn('{id_col}', F.xxhash64('{id_col}')) or a "
            f"monotonically_increasing_id) before calling."
        )


def cosine_arrow(a, b) -> Column:
    """Arrow-vectorized row-wise cosine of two array columns (float64
    accumulation): one numpy reduction per record batch, no per-row
    Python, no interpreted lambdas."""

    def _cos(ca: pd.Series, cb: pd.Series) -> pd.Series:
        if len(ca) == 0:
            return pd.Series([], dtype="float64")
        A, B = _stack(ca), _stack(cb)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B))
        return pd.Series(num / den)

    return F.pandas_udf(_cos, DoubleType())(a, b)


def cosine_filter_pairs(
    pairs: DataFrame,
    threshold: float,
    a_col: str = "_va",
    b_col: str = "_vb",
    out_col: str = "cos_sim",
) -> DataFrame:
    """Score candidate pairs by exact cosine and keep ``>= threshold`` in
    ONE Arrow pass.

    A plain ``withColumn(cos) + filter(cos >= t)`` re-expands the scoring
    UDF into BOTH the Filter and the Project after Catalyst's projection
    collapse — the r5 plan audit found two ``ArrowEvalPython [_cos]``
    nodes in the LSH re-rank, doubling the Python hop on the hot path.
    ``mapInPandas`` fuses score + filter + vector-drop into a single
    Arrow exchange whose output batches carry only the id/score columns
    (narrowest possible payload back to the JVM)."""
    from pyspark.sql.types import StructField, StructType

    out_fields = [f for f in pairs.schema.fields if f.name not in (a_col, b_col)]
    names = [f.name for f in out_fields]
    schema = StructType(out_fields + [StructField(out_col, DoubleType())])

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A, B = _stack(pdf[a_col]), _stack(pdf[b_col])
            num = np.einsum("ij,ij->i", A, B)
            # zero-norm vectors: den == 0 -> cos is NaN, which fails the
            # >= comparison and is DROPPED — the deliberate contract (a
            # zero vector has no direction, so it is near-duplicate of
            # nothing). errstate suppresses the 0/0 RuntimeWarning so the
            # policy is silent rather than accidental (r6 ADVICE).
            with np.errstate(invalid="ignore", divide="ignore"):
                den = np.sqrt(
                    np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
                )
                cos = num / den
                keep = cos >= threshold
            if not keep.any():
                continue
            out = pdf.loc[keep, names].copy()
            out[out_col] = cos[keep]
            yield out

    return pairs.mapInPandas(score, schema)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` must be small (it is collected and broadcast into the
    Arrow workers as one numpy matrix). Self-matches are excluded. Ties
    are broken by neighbor id for full determinism; per-partition pruning
    keeps a row only if it beats < k rows under the same total order
    (cos_sim desc, id asc), so the global result equals a full sort.
    """
    _require_long_id(corpus, id_col, "brute_force_topk")
    _require_long_id(queries, id_col, "brute_force_topk")
    q_rows = queries.select(id_col, vec_col).collect()
    spark = corpus.sparkSession
    out_schema = "query_id long, neighbor_id long, cos_sim double"
    if not q_rows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))

    def score_partition(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _stack(pdf[vec_col])
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            cn = np.sqrt(np.einsum("ij,ij->i", M, M))
            sims = (Q @ M.T) / (qn[:, None] * cn[None, :])
            oq, on, os_ = [], [], []
            for qi in range(len(qids)):
                cand = np.flatnonzero(nids != qids[qi])
                # lexsort: last key is primary -> (-sim primary, id secondary)
                order = cand[np.lexsort((nids[cand], -sims[qi, cand]))][:k]
                oq.append(np.full(len(order), qids[qi], dtype=np.int64))
                on.append(nids[order])
                os_.append(sims[qi, order])
            if oq:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(oq),
                        "neighbor_id": np.concatenate(on),
                        "cos_sim": np.concatenate(os_),
                    }
                )

    partial = corpus.select(id_col, vec_col).mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _plane_matrix(dim: int, planes: int, seed: int) -> np.ndarray:
    """Deterministic (planes, dim) hyperplane matrix in [-1, 1): seeded
    PCG64 computed once on the driver — reproducible at any parallelism,
    identical across runs."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.uniform(-1.0, 1.0, size=(planes, dim))


def banded_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: int,
    bands: int,
    seed: int,
    role: str,
    include_vec: bool = True,
) -> DataFrame:
    """(role_id[, role_vec], band, bucket) rows: one Arrow matmul per batch
    computes all ``planes`` sign bits, packed per band into an integer
    bucket — the LSH blocking key. No per-plane interpreted dot products
    (r2 hot-path fix), no stored plane table.

    ``include_vec=False`` emits ids only: candidate generation then
    shuffles 16-byte (band, bucket, id) rows instead of dragging two
    embedding payloads through the bucket join and the pair dedup —
    vectors are re-attached by an id join AFTER deduplication, when the
    row count is at its minimum.
    """
    assert planes % bands == 0
    _require_long_id(df, id_col, "banded_signatures")
    rows = planes // bands
    H = _plane_matrix(dim, planes, seed)
    vec_part = f", {role}_vec array<float>" if include_vec else ""
    schema = f"{role}_id long{vec_part}, band int, bucket long"
    weights = (1 << np.arange(rows, dtype=np.int64))[None, None, :]

    def sign_and_band(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _stack(pdf[vec_col])
            bits = (M @ H.T) >= 0  # (n, planes)
            buckets = (
                bits.reshape(len(M), bands, rows).astype(np.int64) * weights
            ).sum(axis=2)  # (n, bands)
            n = len(M)
            out = {
                f"{role}_id": np.repeat(
                    pdf[id_col].to_numpy(dtype=np.int64), bands
                ),
            }
            if include_vec:
                # np.repeat on the object array repeats references — no
                # per-element Python loop (r7: the list comprehension here
                # was a visible chunk of a single-task signature pass)
                out[f"{role}_vec"] = np.repeat(pdf[vec_col].to_numpy(), bands)
            out["band"] = np.tile(np.arange(bands, dtype=np.int32), n)
            out["bucket"] = buckets.reshape(-1)
            yield pd.DataFrame(out)

    # a small parquet corpus arrives as one ~file-sized scan split and the
    # whole Arrow signature pass would run on a single core (r7: measured
    # 4 s of the 7 s LSH wall at bench sf1.0); at production scale the
    # scan already has >= defaultParallelism splits and this is a no-op
    from .dedup import ensure_parallelism

    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        sign_and_band, schema
    )


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
    query, then exact cosine re-rank (Arrow-vectorized). Same output
    schema as ``brute_force_topk`` (ranks relative to the candidate set)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    cq = banded_signatures(queries, id_col, vec_col, dim, planes, bands, seed,
                           "query", include_vec=False)
    cc = banded_signatures(corpus, id_col, vec_col, dim, planes, bands, seed,
                           "neighbor", include_vec=False)
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("query_vec"))
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("neighbor_vec"))
    cand = (
        cc.join(F.broadcast(cq), ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        # vectors attached after dedup: the bucket join and dedup move only
        # id pairs; the query side is broadcast, the corpus side id-joined
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cos_sim", cosine_arrow(F.col("query_vec"), F.col("neighbor_vec")))
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
    return cosine_filter_pairs(
        a.join(b, F.col("doc_a") < F.col("doc_b")), threshold
    ).select("doc_a", "doc_b", "cos_sim")


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
    (never a corpus×corpus cross join). Pairs are verified by exact
    cosine, so precision is 1; recall depends on (planes, bands).

    Plan shape (r7 rewrite): ONE shuffle of (band, bucket, id, vec) rows
    into per-(band, bucket) groups, scored bucket-locally. The r6 plan
    materialized every colliding id PAIR through a bucket self-join, a
    pair-dedup exchange, and two vector re-attach joins — at coarse
    bucket widths (rows-per-band small, e.g. 64/16 -> 4-bit buckets)
    candidate pairs approach all-pairs and those exchanges shuffled
    O(n^2) rows (measured 275 s at the 20k-vector bench scale, 34x the
    sf0.1 time for 10x the data). Bucket-local scoring shuffles only the
    n*bands signature rows and turns the pair work into dense BLAS:

    - per group, a blocked upper-triangle gram-matrix matmul prefilters
      at ``threshold - 1e-9`` (the margin is >> the ~1e-13 dgemm-vs-
      einsum float64 summation-order delta and << any real data gap, so
      no true pair is lost and no false pair admitted durably);
    - survivors (a tiny set: output pairs only) are re-scored with the
      IDENTICAL per-pair einsum kernel ``cosine_filter_pairs`` uses and
      re-tested at the exact threshold, so emitted values are
      bit-identical to the r6 path — duplicates of the same pair from
      different bands carry identical cos_sim, making the final
      ``dropDuplicates`` deterministic;
    - zero-norm vectors produce NaN cosine and are dropped, the same
      (now-documented) contract as ``cosine_filter_pairs``.

    The final dedup exchange carries only emitted near-dup pairs (output-
    sized, not candidate-sized). At 100 TB the same shape holds: one
    shuffle of signature rows, bucket-local dense scoring, output-sized
    dedup; bucket skew is bounded by the blocked matmul (constant-memory
    row blocks) and by choosing planes/bands so buckets stay O(n/2^rows).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    banded = banded_signatures(
        corpus, id_col, vec_col, dim, planes, bands, seed, "x",
        include_vec=True,
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": np.array([], dtype=np.int64),
                "doc_b": np.array([], dtype=np.int64),
                "cos_sim": np.array([], dtype=np.float64),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf["x_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")  # ids unique per bucket
        ids = ids[order]
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["x_vec"].to_numpy()[order]]
        )
        sq = np.einsum("ij,ij->i", M, M)
        cand_a: list[np.ndarray] = []
        cand_b: list[np.ndarray] = []
        # row-blocked gram: S block is R x m float64, R sized to ~32 MB
        R = max(1, 4_000_000 // max(m, 1))
        for r0 in range(0, m - 1, R):
            r1 = min(r0 + R, m - 1)
            S = M[r0:r1] @ M.T
            with np.errstate(invalid="ignore", divide="ignore"):
                C = S / np.sqrt(sq[r0:r1, None] * sq[None, :])
                ii, jj = np.nonzero(C >= threshold - 1e-9)
            keep = jj > ii + r0  # strict upper triangle: doc_a < doc_b
            cand_a.append(ii[keep] + r0)
            cand_b.append(jj[keep])
        ia = np.concatenate(cand_a) if cand_a else np.array([], dtype=np.int64)
        if len(ia) == 0:
            return empty
        ib = np.concatenate(cand_b)
        # exact re-score of the survivors with the cosine_filter_pairs
        # kernel (same ops, same order -> bit-identical values)
        A, B = M[ia], M[ib]
        num = np.einsum("ij,ij->i", A, B)
        with np.errstate(invalid="ignore", divide="ignore"):
            den = np.sqrt(
                np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
            )
            cos = num / den
            keep = cos >= threshold
        return pd.DataFrame(
            {"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]], "cos_sim": cos[keep]}
        )

    scored = banded.groupBy("band", "bucket").applyInPandas(
        score_bucket, "doc_a long, doc_b long, cos_sim double"
    )
    return scored.dropDuplicates(["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "cos_sim"
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
                vec_col: np.repeat(pdf[vec_col].to_numpy(), n_probe_eff),
                "cluster_id": order.reshape(-1).astype("int32"),
            }
            yield pd.DataFrame(rows)

    schema = f"{id_col} long, {vec_col} array<float>, cluster_id int"
    # no forced repartition here (r7, measured): the per-row work is one
    # n_centroids-wide matmul row — microseconds — so on a small corpus an
    # injected exchange costs more stage latency than the single-split
    # compute it spreads; at production scale the scan already has many
    # splits and parallelism comes for free. (Contrast banded_signatures,
    # whose per-pass work is planes-wide and measured 4 s single-task.)
    return df.select(id_col, vec_col).mapInPandas(batches, schema)


def _sampled_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str, seed: int
) -> np.ndarray:
    """Deterministic hash-sampled seed centroids (r4 choice, k-means seed
    in r6): the n_centroids corpus vectors with the smallest
    ``xxhash64(id, seed)`` — order-stable across runs and partitionings."""
    cent_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    return np.array([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """K-means (Lloyd) training of the IVF coarse quantizer, fully
    distributed — no driver loop over vectors.

    Each round is (a) one Arrow-batched assignment pass against the
    broadcast current centroids (numpy matmul per batch, the same kernel
    probing uses) and (b) one ``posexplode`` + hash aggregation computing
    the per-(cluster, dimension) mean with map-side partials — the
    ``embedding_centroids`` plan shape. Only ``n_centroids * dim`` rows
    (KBs) ever reach the driver per round; the corpus is scanned
    ``n_iters + probing`` times and never shuffled by vector payload.
    Empty clusters keep their previous centroid. Seeded from the
    deterministic hash sample, so the whole procedure is reproducible.

    Better-trained centroids raise recall at fixed ``n_probe`` on
    clustered corpora (the usual IVF contract); with
    ``n_probe == n_centroids`` results still equal brute force exactly,
    which is how ``ann_ivf_verified`` keeps the trained path under the
    exact DuckDB oracle."""
    # materialize the narrowed corpus once (r7): every Lloyd round re-read
    # and re-decoded the source parquet otherwise (n_iters + seed scans);
    # localCheckpoint preserves the partitioning, so the per-partition
    # double-summation order of the mean aggregation — and therefore every
    # trained centroid — is bit-identical to the uncheckpointed plan
    base = corpus.select(id_col, vec_col).localCheckpoint(eager=False)
    C = _sampled_centroids(base, n_centroids, id_col, vec_col, seed)
    for _ in range(max(n_iters, 0)):
        assigned = _assign_clusters(base, C, id_col, vec_col, 1, "train")
        means = (
            assigned.select(
                "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        newC = C.copy()
        for r in means:
            newC[r["cluster_id"], r["pos"]] = r["m"]
        C = newC
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: deterministic hash-sampled centroids bucket
    the corpus once; each query probes its ``n_probe`` nearest centroid
    lists and re-ranks exactly within them.

    At 10^12 scale the corpus assignment is one Arrow pass + a write
    partitioned by cluster_id; queries then touch n_probe/n_centroids of
    the data instead of all of it. Same output schema as brute_force_topk.
    """
    _require_long_id(corpus, id_col, "ivf_topk")
    _require_long_id(queries, id_col, "ivf_topk")
    if train_iters > 0:
        centroids = train_ivf_centroids(
            corpus, n_centroids, train_iters, id_col, vec_col, seed
        )
    else:
        centroids = _sampled_centroids(corpus, n_centroids, id_col, vec_col, seed)

    c_assigned = _assign_clusters(corpus, centroids, id_col, vec_col, 1, "corpus")
    q_assigned = _assign_clusters(queries, centroids, id_col, vec_col, n_probe, "query")

    c = c_assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cluster_id"
    )
    qd = q_assigned.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cluster_id"
    )
    # score BEFORE deduplicating (r7): a (query, neighbor) pair can only
    # arise once per probed cluster and the corpus side is assigned with
    # n_probe=1, so duplicate pairs carry identical cos_sim — aggregating
    # the scalar with max() after scoring equals dropDuplicates before it,
    # while the dedup exchange now moves (id, id, double) rows instead of
    # two 64-float vectors per row (~20x fewer shuffle bytes)
    cand = (
        c.join(F.broadcast(qd), "cluster_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine_arrow(F.col("q_vec"), F.col("c_vec")))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
