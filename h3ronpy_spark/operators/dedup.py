"""Deduplication operators for web-scale corpora.

Families (each exposed as a query in __spark_entry__ with a DuckDB oracle
where SQL-expressible):

  * exact        — md5 hash groupBy; keep the lowest doc_id per group
  * minhash-LSH  — shingle -> minhash signature -> banded bucket join ->
                   candidate pairs -> exact Jaccard verify
  * simhash      — 64-bit simhash over tokens; near-dups = small Hamming
  * embedding    — cosine near-dup pairs via LSH bucketing + verify

Scale notes: every family is shuffle-on-key (hash/bucket/band), no
cross joins; candidate verification only touches same-bucket pairs, which
is the property that survives 100x data growth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One surviving row per distinct text; deterministic keeper (min id)."""
    h = F.md5(F.col(text_col))
    return (
        docs.withColumn("__h", h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
        .drop("__h")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_N_HASHES = 32
_BANDS = 8  # 4 rows per band


@pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature(text: pd.Series) -> pd.Series:
    """32-permutation minhash over 4-character shingles (xor-shift over a
    base hash; deterministic, row-local)."""
    from ..sources.images import splitmix64

    out = []
    seeds = splitmix64(np.arange(1, _N_HASHES + 1, dtype=np.uint64))
    for t in text:
        if t is None or len(t) < 4:
            out.append(None)
            continue
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if b.size < 4:
            out.append(None)
            continue
        # rolling 4-byte shingles -> u64
        sh = (
            b[:-3].astype(np.uint64) << np.uint64(24)
        ) | (
            b[1:-2].astype(np.uint64) << np.uint64(16)
        ) | (
            b[2:-1].astype(np.uint64) << np.uint64(8)
        ) | b[3:].astype(np.uint64)
        hashed = splitmix64(np.unique(sh))
        sig = np.bitwise_xor.outer(seeds, hashed).min(axis=1)
        out.append((sig.view(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)).tolist())
    return pd.Series(out)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash, verified by signature
    Jaccard estimate >= threshold. Returns (id_a, id_b, est_jaccard)."""
    sigs = docs.select(
        F.col(id_col).alias("id"), minhash_signature(F.col(text_col)).alias("sig")
    ).filter(F.col("sig").isNotNull())
    rows_per_band = _N_HASHES // _BANDS
    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("sig")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.round(
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(_N_HASHES)),
            6,
        ),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "id_a", "id_b", "est_jaccard"
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def _token_hash64(toks: list[str], memo: dict[str, int] | None = None) -> np.ndarray:
    """Deterministic 64-bit hash per token (C-implemented blake2b digest).
    Python's builtin ``hash()`` is salted per process (PEP 456) and must
    never be used here: two executors would disagree on the signature of
    identical text.  An optional memo exploits vocabulary repetition
    across a batch (typically >90% hit rate on natural text)."""
    import hashlib

    if memo is None:
        memo = {}
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, w in enumerate(toks):
        h = memo.get(w)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(
                    w.encode("utf-8", "ignore"), digest_size=8
                ).digest(),
                "little",
            )
            memo[w] = h
        hs[i] = h
    return hs


@pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens (deterministic token hash)."""
    out = np.zeros(len(text), dtype=np.int64)
    mask_ok = np.ones(len(text), dtype=bool)
    memo: dict[str, int] = {}
    for i, t in enumerate(text):
        if t is None or not t.strip():
            mask_ok[i] = False
            continue
        toks = t.lower().split()
        hs = _token_hash64(toks, memo)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for bpos in np.nonzero(v > 0)[0]:
            sim |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(sim & np.uint64(0x7FFFFFFFFFFFFFFF))
    # nullable Int64 (mask() would coerce to float64 and corrupt 64-bit
    # signatures above 2^53 whenever the batch has a null row)
    return pd.Series(pd.arrays.IntegerArray(out, mask=~mask_ok))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by simhash: banded Hamming bucket join.

    The 64-bit signature is cut into (max_hamming + 1) bands; any pair
    within Hamming distance <= max_hamming agrees exactly on at least one
    band (pigeonhole), so the candidate join is a plain equi-join on
    (band, band_value) — a shuffle on the band key, never an all-pairs
    product.  Candidates are then verified with an exact JVM-side popcount
    (``bit_count``).

    Returns (id_a, id_b, hamming).  Reference n/a (dedup family is part of
    the training-data-pipeline surface, not h3ronpy)."""
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    width = 64 // n_bands
    sigs = docs.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    ).filter(F.col("sim").isNotNull())
    bands = sigs.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # last band keeps the leftover high bits (the
                        # unsigned shift already zero-fills, no mask needed)
                        (
                            F.shiftrightunsigned(F.col("sim"), width * b)
                            if b == n_bands - 1
                            else F.shiftrightunsigned(F.col("sim"), width * b)
                            .bitwiseAND(F.lit((1 << width) - 1))
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cand.withColumn(
        "hamming",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
    )
    return pairs.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


# ---------------------------------------------------------------------------
# n-gram jaccard (SQL-expressible for the oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_chars: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Jaccard over word n-grams for pairs sharing a prefix bucket.

    Pure DataFrame ops (explode + groupBy + join) so the DuckDB oracle can
    reproduce it exactly."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, bucket_chars).alias("bucket"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    )
    grams = toks.select(
        "id",
        "bucket",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("w", i + 1, n)),
            )
        ).alias("g"),
    ).distinct()
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    j = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
