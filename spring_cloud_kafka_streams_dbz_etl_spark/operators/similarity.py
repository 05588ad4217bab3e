"""Similarity-search operators: brute-force cosine top-k + IVF-style
cell-restricted search.

Scale design:
- Brute force: queries are tiny (a handful of probe vectors) -> broadcast
  them against the corpus; scoring is a map-only stage (no shuffle), then
  one small per-query top-k window.
- IVF: restrict scoring to the query's cell (here the `label` column is
  the cell assignment — the inverted-file structure the schema provides).
  The cell equi-join prunes the corpus scan to 1/n_cells of the data; at
  100 TB this is the difference between scanning everything and scanning
  one partition (cells map to parquet partitions).
- The optional Pandas-UDF path (`pandas_topk_scores`) batches vectors
  through Arrow into numpy for BLAS scoring — the practical choice for
  wide vectors / many queries; kept off the oracle surface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, to_double


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    cell_col: str | None = None,
) -> DataFrame:
    """Cosine top-k of corpus per query vector.

    queries/corpus share (id_col, vec_col[, cell_col]). Self-matches are
    excluded. With ``cell_col`` the search is IVF-style cell-restricted.
    Deterministic ranking: (rounded score desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double(F.col(vec_col)).alias("__qv"),
        *([F.col(cell_col).alias("__qc")] if cell_col else []),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double(F.col(vec_col)).alias("__cv"),
        *([F.col(cell_col).alias("__cc")] if cell_col else []),
    )
    # Queries are the tiny side -> broadcast them; scoring is map-only.
    joined = (
        F.broadcast(q).join(c, F.col("__qc") == F.col("__cc"))
        if cell_col
        else F.broadcast(q).crossJoin(c)
    )
    scored = joined.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def pandas_topk_scores(
    queries_pd, corpus: DataFrame, vec_col: str = "embedding", k: int = 10
) -> DataFrame:
    """Arrow/numpy BLAS scoring path: queries broadcast as a numpy matrix,
    corpus streamed through mapInPandas in Arrow batches. Preferred for
    wide vectors or >100 queries; not oracle-checked (fp order differs).
    """
    import numpy as np

    qm = np.asarray(list(queries_pd[vec_col]), dtype="float64")
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qids = list(queries_pd["vec_id"])
    spark = corpus.sparkSession
    bqn = spark.sparkContext.broadcast(qn)
    bqids = spark.sparkContext.broadcast(qids)

    def score(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            cm = np.asarray(list(pdf[vec_col]), dtype="float64")
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cn @ bqn.value.T  # (batch, n_queries)
            out = []
            for qi, qid in enumerate(bqids.value):
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": pdf["vec_id"].to_numpy(),
                            "cos_sim": sims[:, qi],
                        }
                    )
                )
            yield pd.concat(out)

    scored = corpus.mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
