"""Distributed compact/uncompact over DataFrames.

`compact` has no Spark primitive (SURVEY.md §4.2 custom item 4): it is an
iterative fixpoint — at each resolution r (finest first), sibling groups
whose parent has a complete child set (7, pentagons 6) are replaced by the
parent.  Each round is one hash aggregation on the parent key; rounds are
capped by the resolution span and stop early when nothing was promoted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import functions as H


def _children_need(cell_col):
    # 7 children, 6 for pentagons: pentagon == base cell pentagonal and all
    # digits zero; cheap SQL approximation is not safe, use the UDF
    return F.when(H.cells_is_pentagon(cell_col), F.lit(6)).otherwise(F.lit(7))


def compact_cells(df: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Compact a DataFrame of (distinct) cells; returns one `cell` column.

    Mixed resolutions allowed (reference requires mixed_resolutions=True
    for that, h3ronpy/python/h3ronpy/__init__.py:160-167)."""
    spark = df.sparkSession
    cur = df.select(F.col(cell_col).alias("cell")).distinct()
    cur = cur.withColumn("res", H.cells_resolution(F.col("cell")))
    max_res = cur.agg(F.max("res")).first()[0]
    if max_res is None:
        return cur.select("cell")
    out = cur.filter(F.lit(False)).select("cell")  # empty accumulator
    cur = cur.persist()
    for r in range(int(max_res), 0, -1):
        level = cur.filter(F.col("res") == r)
        rest = cur.filter(F.col("res") != r)
        with_parent = level.withColumn(
            "parent", H.change_resolution_parent(F.col("cell"), r - 1)
        )
        counts = with_parent.groupBy("parent").agg(F.count("*").alias("n"))
        full = counts.filter(
            F.col("n") == _children_need(F.col("parent"))
        ).select(F.col("parent"))
        promoted = full.select(
            F.col("parent").alias("cell"),
            F.lit(r - 1).alias("res"),
        )
        kept = (
            with_parent.join(full, "parent", "left_anti")
            .select("cell")
        )
        out = out.unionByName(kept)
        nxt = rest.unionByName(
            promoted.select("cell", "res")
        ).distinct()
        new_cur = nxt.persist()
        cur.unpersist()
        cur = new_cur
        # early exit: with mixed-resolution input, coarser levels may still
        # hold complete sibling sets straight from the input, so "no
        # promotions here" alone is not enough — only stop when nothing
        # compactable remains below r (res-0 cells are emitted at the end)
        if promoted.isEmpty() and cur.filter(
            (F.col("res") > 0) & (F.col("res") < r)
        ).isEmpty():
            break
    out = out.unionByName(cur.filter(F.col("res") == 0).select("cell"))
    return out.distinct()


def uncompact_cells(df: DataFrame, target_res: int, cell_col: str = "cell") -> DataFrame:
    """Expand to target res (finer-than-target rows dropped), exploded."""
    return (
        df.withColumn(
            "__kids", H.uncompact_list(F.col(cell_col), F.lit(target_res))
        )
        .withColumn(cell_col, F.explode("__kids"))
        .drop("__kids")
    )
