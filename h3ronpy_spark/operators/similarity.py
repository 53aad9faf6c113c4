"""Similarity search over embedding columns (array<float>).

  * brute_force_topk — exact cosine top-k, JVM-side arithmetic only
    (F.zip_with / F.aggregate), window-ranked; the correctness baseline
    and the broadcast-join pattern for small query sets.
  * lsh_topk — random-hyperplane LSH bucketing as the scale path: queries
    only compare against same-bucket candidates (multi-probe across
    signature bands), turning the N x Q cross product into a bucket join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b):
    return _dot(a, b) / (
        F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k by cosine; queries side broadcast."""
    j = embeddings.crossJoin(F.broadcast(queries))
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


_N_BANDS = 6
_PLANES_PER_BAND = 8


def lsh_band_keys(n_bands: int = _N_BANDS, planes_per_band: int = _PLANES_PER_BAND):
    """Build a random-hyperplane banded-signature UDF (seeded,
    deterministic): vec -> one int key per band.  A pair is a candidate if
    any band key matches.  Shorter bands / more bands = higher recall on
    weakly-similar neighbors at the cost of more candidates; tune per the
    corpus's neighbor-cosine profile.  Plane matrices are cached per
    embedding dimension (heterogeneous dims get independent, reproducible
    hash families)."""

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def band_keys(vec: pd.Series) -> pd.Series:
        """Whole-batch vectorized (round-3): same-dimension vectors are
        stacked into an (N, d) matrix and signed with ONE matmul per
        distinct dimension — no per-row Python.  Bit-identical to the
        per-row formulation (same planes, same sign test)."""
        out: list[list[int] | None] = [None] * len(vec)
        shifts = 1 << np.arange(planes_per_band)
        dims = np.array(
            [-1 if v is None else len(v) for v in vec], dtype=np.int64
        )
        vals = vec.to_numpy()
        for d in np.unique(dims):
            if d <= 0:
                continue
            idx = np.nonzero(dims == d)[0]
            mat = np.stack(
                [np.asarray(vals[i], dtype=np.float64) for i in idx]
            )
            rng = np.random.default_rng(12345 + int(d))
            planes = rng.standard_normal((n_bands * planes_per_band, int(d)))
            bits = (mat @ planes.T > 0).reshape(
                idx.size, n_bands, planes_per_band
            )
            keys = (bits * shifts).sum(axis=2).astype(np.int32)
            for k, i in enumerate(idx):
                out[i] = keys[k].tolist()
        return pd.Series(out)

    return band_keys


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    n_bands: int = _N_BANDS,
    planes_per_band: int = _PLANES_PER_BAND,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing at least
    one LSH band key with the query (each band additionally multi-probed at
    Hamming distance 1).  The candidate join is an equi-join on
    (band, key) — a broadcast of the probe side, never a cross product —
    which is the shape that survives a 100x data scale-up."""
    keys = lsh_band_keys(n_bands, planes_per_band)
    emb_b = embeddings.select(
        id_col,
        vec_col,
        F.posexplode(keys(F.col(vec_col))).alias("band", "key"),
    )
    q_b = queries.select(
        qid_col,
        qvec_col,
        F.posexplode(keys(F.col(qvec_col))).alias("band", "qkey"),
    )
    # multi-probe: each band's key plus its Hamming-1 variants
    probes = q_b.select(
        qid_col,
        qvec_col,
        "band",
        F.explode(
            F.array(
                F.col("qkey"),
                *[
                    F.col("qkey").bitwiseXOR(F.lit(1 << i))
                    for i in range(planes_per_band)
                ],
            )
        ).alias("key"),
    )
    j = emb_b.join(F.broadcast(probes), ["band", "key"])
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos_sim"),
    ).dropDuplicates([qid_col, id_col])
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bands: int = _N_BANDS,
    planes_per_band: int = _PLANES_PER_BAND,
    **kw,
) -> DataFrame:
    """Recall@k of lsh_topk against the exact brute-force ground truth;
    one row (n_queries, recall).  Honors the same id_col/qid_col/vec_col
    overrides as brute_force_topk/lsh_topk."""
    qid_col = kw.get("qid_col", "qid")
    id_col = kw.get("id_col", "vec_id")
    truth = brute_force_topk(embeddings, queries, k=k, **kw).select(
        qid_col, id_col
    )
    approx = lsh_topk(
        embeddings,
        queries,
        k=k,
        n_bands=n_bands,
        planes_per_band=planes_per_band,
        **kw,
    ).select(qid_col, F.col(id_col).alias("__approx_id"))
    hit = truth.join(
        approx,
        (truth[qid_col] == approx[qid_col])
        & (truth[id_col] == approx["__approx_id"]),
        "left_semi",
    )
    return truth.agg(
        F.countDistinct(qid_col).alias("n_queries"),
        F.count("*").alias("n_truth"),
    ).crossJoin(hit.agg(F.count("*").alias("n_hit"))).select(
        "n_queries",
        F.round(F.col("n_hit") / F.col("n_truth"), 4).alias("recall"),
    )
