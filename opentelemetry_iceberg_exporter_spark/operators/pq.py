"""Product quantization (PQ) for embedding columns — the compression
layer of large-scale ANN (IVF-PQ): each vector is split into `m`
subspaces, each subvector replaced by the id of its nearest trained
sub-centroid, shrinking a 64-float embedding to `m` bytes. Search
runs over the CODES with asymmetric distance computation (ADC): per
query, one m×k lookup table of exact query-to-centroid distances,
then each candidate's distance is m table gathers — no float vector
is ever touched at scan time.

Scale shape: training reuses the distributed `kmeans_fit` loop per
subspace (broadcast assign + one shuffle per iteration); encoding is
one Arrow-batched mapInPandas with the (tiny) codebooks in the task
closure; ADC search is the same partial-top-k-then-merge shape as the
brute-force kNN baseline but over m-byte codes instead of full
vectors — the scan is ~dim/m× smaller, which at 100 TB is the
difference between reading 25 TB and reading 1.5 TB.

No reference counterpart; part of the LLM-pipeline extension surface
(similarity-search family, next to s01 brute force / s02 LSH /
s03 IVF)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import kmeans_fit


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    max_iter: int = 8,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: `m` independent distributed
    k-means runs over the dimension slices. Returns codebooks of
    shape m × k × (dim/m). The embedding dimension must divide by m."""
    dim = df.select(F.size(F.col(vec_col))).first()[0]
    if dim is None or dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    sub = dim // m
    codebooks = []
    for s in range(m):
        sub_df = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("__subv"),
        )
        cents, _ = kmeans_fit(sub_df, id_col, "__subv", k=k, max_iter=max_iter)
        codebooks.append(cents)
    return codebooks


def _np_books(codebooks) -> list[np.ndarray]:
    return [np.asarray(b, dtype=np.float64) for b in codebooks]


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks
) -> DataFrame:
    """Encode vectors to (id, codes array<int>): per subspace, the
    argmin-distance codebook entry (ties -> lowest id, matching
    kmeans_fit's assignment). One mapInPandas pass; the codebooks ride
    the task closure (m×k×dim/m doubles — kilobytes)."""
    books = _np_books(codebooks)
    m = len(books)
    sub = books[0].shape[1]
    id_type = df.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                seg = vecs[:, s * sub : (s + 1) * sub]
                # (n, k) squared distances; argmin takes the FIRST min
                d2 = ((seg[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        batches, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_decode_np(codes: np.ndarray, codebooks) -> np.ndarray:
    """Reconstruct approximate vectors from codes (test/diagnostic
    helper — production search never reconstructs)."""
    books = _np_books(codebooks)
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(len(books))], axis=1
    )


def pq_adc_topk(
    codes_df: DataFrame,
    id_col: str,
    codebooks,
    queries: list[tuple[int, list[float]]],
    topk: int = 10,
) -> DataFrame:
    """ADC top-k over PQ codes for a small query batch. Returns
    (query_id, id, adc_dist, rank) with rank 1..topk per query,
    deterministic ties by id.

    Per task: each query's m×k lookup table (exact squared distance
    from the query subvector to every sub-centroid) is built once in
    numpy; each code row costs m gathers + a sum. Partitions emit only
    their local top-k per query; ONE shuffle merges the partials —
    the same two-phase top-k as the s01 baseline with a ~dim/m×
    smaller scan."""
    books = _np_books(codebooks)
    m = len(books)
    sub = books[0].shape[1]
    luts = {}
    for qid, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        if qv.shape[0] != m * sub:
            raise ValueError(f"query dim {qv.shape[0]} != {m * sub}")
        luts[qid] = np.stack(
            [
                ((books[s] - qv[s * sub : (s + 1) * sub][None, :]) ** 2).sum(axis=1)
                for s in range(m)
            ]
        )  # (m, k)
    id_type = codes_df.schema[id_col].dataType.simpleString()

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            frames = []
            for qid, lut in luts.items():
                dist = lut[np.arange(m)[:, None], codes.T].sum(axis=0)
                take = min(topk, len(dist))
                # partial top-k with deterministic (dist, id) order
                idx = np.lexsort((ids, dist))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: ids[idx],
                            "adc_dist": dist[idx],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partials = codes_df.mapInPandas(
        partial, schema=f"query_id long, {id_col} {id_type}, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", id_col)
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", id_col, F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )
