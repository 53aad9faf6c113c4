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


_N_PLANES = 16


@pandas_udf(T.IntegerType())
def lsh_bucket(vec: pd.Series) -> pd.Series:
    """Random-hyperplane signature (16 planes, seeded) -> int bucket."""
    out = np.zeros(len(vec), dtype=np.int32)
    ok = np.ones(len(vec), dtype=bool)
    planes = None
    for i, v in enumerate(vec):
        if v is None or len(v) == 0:
            ok[i] = False
            continue
        a = np.asarray(v, dtype=np.float64)
        if planes is None or planes.shape[1] != a.shape[0]:
            rng = np.random.default_rng(12345)
            planes = rng.standard_normal((_N_PLANES, a.shape[0]))
        bits = (planes @ a) > 0
        out[i] = int(np.packbits(bits.astype(np.uint8)[::-1]).view(np.uint16)[0]) if False else int(
            (bits * (1 << np.arange(_N_PLANES))).sum()
        )
    return pd.Series(out).mask(~ok)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (plus Hamming-1 probes)."""
    emb_b = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col)))
    q_b = queries.withColumn("qbucket", lsh_bucket(F.col(qvec_col)))
    # multi-probe: query bucket and its 16 Hamming-1 variants
    probes = q_b.select(
        qid_col,
        qvec_col,
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(_N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    j = emb_b.join(F.broadcast(probes), "bucket")
    scored = j.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(qvec_col)), 6).alias("cos_sim"),
    ).dropDuplicates([qid_col, id_col])
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
