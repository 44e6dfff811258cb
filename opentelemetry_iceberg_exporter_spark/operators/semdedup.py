"""SemDeDup-style SEMANTIC deduplication: cluster the corpus's
embeddings with k-means, compare cosine similarity only WITHIN a
cluster, and keep one representative per semantic-duplicate group —
the published web-scale recipe (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
arXiv:2303.09540; the method is public, the implementation here is
Spark-first from scratch).

Where it sits next to the existing dedup family: MinHash-LSH (d03) and
n-gram Jaccard (d04) catch LEXICAL duplication; hyperplane-LSH
embedding near-dup (d06) buckets by random directions, which is
recall-tuned for *any* near neighbor. SemDeDup buckets by the corpus's
OWN density structure — k-means cells — which is exactly where semantic
duplicates (paraphrases, template rewrites, translations of the same
boilerplate) concentrate, and the k knob directly trades recall for
candidate volume.

100 TB shape (all pieces plan-pinned by tests/test_semdedup.py):

* clustering: `kmeans_fit` — per iteration one broadcast map-side
  assignment + ONE bounded shuffle of posexploded dims; only k×dim
  doubles ever reach the driver.
* candidate pairs: ONE self-equi-join on `cell` (hash join — never an
  all-pairs product; the work is Σ|cell|², bounded by k). Zero-norm
  embeddings are precleaned map-side (`nonzero_vectors`) so the cosine
  never divides by zero under ANSI.
* groups: `dedup_groups`' hash-min + pointer-doubling connected
  components run over the candidate graph ONLY (O(log diameter)
  rounds); singleton documents — including the zero-vector ones —
  rejoin in one final left join.

The reference exporter has no counterpart; this is part of the
LLM-training-pipeline extension surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_groups
from .similarity import _spark_dot, kmeans_fit, nonzero_vectors

DEFAULT_K = 8
DEFAULT_THRESHOLD = 0.97


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = DEFAULT_K,
    threshold: float = DEFAULT_THRESHOLD,
    max_iter: int = 10,
    fit_fraction: float | None = None,
) -> DataFrame:
    """Within-cluster semantic-duplicate candidate pairs:
    (id_a, id_b, cos_sim) with id_a < id_b, cos_sim rounded to 6
    decimals (fold-ordered dot product — deterministic under any
    partitioning) and >= `threshold`.

    Pair generation is an equi-join on the trained cell id; documents
    k-means separates can never pair (that is the SemDeDup trade: a
    duplicate pair straddling a cluster boundary is missed, bounded by
    how coarse k is — the paper runs k in the tens of thousands at
    web scale for exactly this reason)."""
    nz = nonzero_vectors(df, vec_col)
    _, assigned = kmeans_fit(
        nz, id_col, vec_col, k=k, max_iter=max_iter, fit_fraction=fit_fraction,
        keep_vec=True,
    )
    # the assignment frame already carries the vector (keep_vec): derive
    # the norm map-side instead of re-joining the corpus on id — the
    # re-join was two extra full shuffles of the embedding table at
    # scale (and the bench's slowest semdedup stage)
    tagged = assigned.select(
        F.col(id_col).alias("__sid"),
        F.col("cell"),
        F.col(vec_col).alias("__v"),
        F.sqrt(_spark_dot(vec_col, vec_col)).alias("__n"),
    )
    left = tagged.select(
        F.col("__sid").alias("id_a"),
        F.col("cell"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    right = tagged.select(
        F.col("__sid").alias("id_b"),
        F.col("cell"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    return (
        left.join(right, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                _spark_dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = DEFAULT_K,
    threshold: float = DEFAULT_THRESHOLD,
    max_iter: int = 10,
    fit_fraction: float | None = None,
) -> DataFrame:
    """The full SemDeDup keep/drop decision: every document annotated
    with (group_id, group_size, is_canonical) — semantic-duplicate
    groups resolved from the within-cluster pair graph, canonical = the
    min-id member, singletons (zero-vector documents included) their
    own group. Filter `is_canonical` to materialize the deduplicated
    corpus. `fit_fraction` sample-fits the k-means (deterministic hash
    sample trains the centroids, the full corpus is assigned once) —
    the scale knob: Lloyd's per-iteration cost drops by the sample
    factor while pair generation/grouping see the exact same
    full-corpus cells the trained centroids induce."""
    pairs = semdedup_pairs(
        df, id_col, vec_col, k, threshold, max_iter, fit_fraction
    )
    return dedup_groups(df, pairs, id_col)
