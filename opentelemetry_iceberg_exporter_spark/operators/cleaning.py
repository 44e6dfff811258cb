"""Corpus-cleaning operators for training-data pipelines: corpus-wide
paragraph deduplication and benchmark decontamination.

* `dedup_paragraphs` — the CCNet / RefinedWeb preprocessing step:
  split every document into paragraphs, count each normalized
  paragraph ACROSS THE CORPUS, drop occurrences of paragraphs that
  appear in more than `max_docs` documents (boilerplate: headers,
  cookie banners, license blocks), and reassemble the surviving text
  in original order. Distributed shape: one explode, one hash
  aggregation over paragraphs (map-side partials), one equi-join of
  the exploded table against the (small) frequent-paragraph set, one
  re-aggregation by document — every stage keyed, nothing all-pairs,
  so the plan is the same at 100 TB.

* `flag_contamination` — benchmark decontamination (the GPT-3 /
  PaLM-style n-gram overlap check): any document sharing at least one
  word `n`-gram with a benchmark text is flagged, with the overlap
  count. The benchmark n-gram set is tiny next to the corpus, so it
  BROADCASTS and the corpus is scanned once map-side — no shuffle of
  corpus data at all (plan-pinned).

Both carry exact DuckDB SQL mirrors for cross-engine equality tests.
No reference counterpart (the reference is an OTLP exporter); part of
the LLM-pipeline extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ngrams, tokens


def _paragraphs(text: Column) -> Column:
    """Paragraph split: blank-line boundaries (two-plus newlines), with
    single-newline lines kept inside their paragraph. Windows newlines
    normalized first. Identical in DuckDB (regexp_split_to_array)."""
    return F.split(F.regexp_replace(text, "\r\n", "\n"), "\n{2,}")


def _norm_para(p: Column) -> Column:
    """Normalization for counting: trim + collapse inner whitespace +
    lowercase — the CCNet hash key."""
    return F.lower(F.regexp_replace(F.trim(p), "\\s+", " "))


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_docs: int = 2,
) -> DataFrame:
    """Remove corpus-wide boilerplate paragraphs: a paragraph whose
    normalized form appears in MORE THAN `max_docs` distinct documents
    is dropped from every document (classic CCNet keeps paragraphs
    seen once; `max_docs` relaxes that for small corpora). Returns

      (id, text_deduped, n_paragraphs, n_dropped)

    with `text_deduped` the surviving paragraphs re-joined by blank
    lines in their original order (documents whose every paragraph
    drops keep an empty string). Empty/whitespace-only paragraphs
    never count and never drop."""
    para = (
        df.select(
            F.col(id_col),
            F.posexplode(_paragraphs(F.col(text_col))).alias("__pos", "__para"),
        )
        .withColumn("__norm", _norm_para(F.col("__para")))
    )
    real = para.filter(F.col("__norm") != "")
    frequent = (
        real.groupBy("__norm")
        .agg(F.countDistinct(id_col).alias("__docs"))
        .filter(F.col("__docs") > max_docs)
        .select("__norm")
    )
    marked = real.join(F.broadcast(frequent).withColumn("__drop", F.lit(True)),
                       "__norm", "left")
    keep_or_drop = marked.select(
        id_col,
        "__pos",
        "__para",
        F.coalesce(F.col("__drop"), F.lit(False)).alias("__drop"),
    )
    out = keep_or_drop.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"),
                            F.struct(F.col("__pos"), F.col("__para")),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            "\n\n",
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum(F.col("__drop").cast("int")).alias("n_dropped"),
    )
    # documents that are ALL whitespace paragraphs vanish from `real`;
    # restore them with zero counts and empty deduped text
    return (
        df.select(F.col(id_col))
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_paragraphs", F.lit(0)).alias("n_paragraphs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
    )


def duck_dedup_paragraphs_sql(
    table: str, id_col: str, text_col: str, max_docs: int = 2
) -> str:
    """DuckDB mirror of dedup_paragraphs."""
    return f"""
        WITH para AS (
          SELECT {id_col},
                 generate_subscripts(p, 1) - 1 AS pos,
                 unnest(p) AS para
          FROM (
            SELECT {id_col},
                   regexp_split_to_array(replace({text_col}, chr(13) || chr(10), chr(10)), '\\n{{2,}}') AS p
            FROM {table}
          )
        ),
        normed AS (
          SELECT *, lower(regexp_replace(trim(para), '\\s+', ' ', 'g')) AS norm
          FROM para
        ),
        frequent AS (
          SELECT norm FROM normed
          WHERE norm <> ''
          GROUP BY norm
          HAVING COUNT(DISTINCT {id_col}) > {max_docs}
        ),
        marked AS (
          SELECT n.{id_col}, n.pos, n.para, n.norm,
                 (f.norm IS NOT NULL) AS dropped
          FROM normed n LEFT JOIN frequent f USING (norm)
          WHERE n.norm <> ''
        ),
        agg AS (
          SELECT {id_col},
                 string_agg(CASE WHEN NOT dropped THEN para END, chr(10) || chr(10) ORDER BY pos)
                   AS text_deduped,
                 COUNT(*) AS n_paragraphs,
                 SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS n_dropped
          FROM marked GROUP BY {id_col}
        )
        SELECT t.{id_col},
               COALESCE(a.text_deduped, '') AS text_deduped,
               COALESCE(a.n_paragraphs, 0) AS n_paragraphs,
               COALESCE(a.n_dropped, 0) AS n_dropped
        FROM {table} t LEFT JOIN agg a USING ({id_col})
    """


def flag_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at
    least one lowercased word `n`-gram with any benchmark text
    (GPT-3's 13-gram rule by default). Returns

      (id, contaminated_ngrams, contaminated)

    where `contaminated_ngrams` counts the document's DISTINCT
    n-grams that occur in the benchmark set.

    Scale shape: the benchmark n-gram set is built once and BROADCAST;
    the corpus is scanned map-side (explode distinct n-grams → hash
    join against the broadcast → count per doc). The corpus never
    shuffles its text — only (id, matched n-gram) pairs reach the
    aggregation, and those are bounded by the benchmark size."""
    btext = bench_text_col or text_col
    bench_ngrams = (
        benchmark.select(
            F.explode(ngrams(tokens(F.lower(F.col(btext))), n)).alias("__ng")
        )
        .distinct()
    )
    doc_ngrams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams(tokens(F.lower(F.col(text_col))), n))
        ).alias("__ng"),
    )
    hits = doc_ngrams.join(F.broadcast(bench_ngrams), "__ng").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("contaminated_ngrams")
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("contaminated_ngrams", F.lit(0)).alias("contaminated_ngrams"),
            (F.coalesce("contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duck_flag_contamination_sql(
    corpus_table: str,
    bench_table: str,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
) -> str:
    """DuckDB mirror of flag_contamination (same tokenization: trim +
    whitespace split; same n-gram construction)."""
    btext = bench_text_col or text_col

    def ng(col: str) -> str:
        joined = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
        return (
            f"list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1), "
            f"i -> {joined}) "
        )

    return f"""
        WITH bench_t AS (
          SELECT regexp_split_to_array(trim(lower({btext})), '\\s+') AS t
          FROM {bench_table}
        ),
        bench_ng AS (
          SELECT DISTINCT unnest({ng(btext)}) AS ng FROM bench_t
          WHERE len(t) >= {n}
        ),
        doc_t AS (
          SELECT {id_col}, regexp_split_to_array(trim(lower({text_col})), '\\s+') AS t
          FROM {corpus_table}
        ),
        doc_ng AS (
          SELECT DISTINCT {id_col}, unnest({ng(text_col)}) AS ng
          FROM doc_t WHERE len(t) >= {n}
        ),
        hits AS (
          SELECT {id_col}, COUNT(*) AS contaminated_ngrams
          FROM doc_ng JOIN bench_ng USING (ng)
          GROUP BY {id_col}
        )
        SELECT c.{id_col},
               COALESCE(h.contaminated_ngrams, 0) AS contaminated_ngrams,
               COALESCE(h.contaminated_ngrams, 0) > 0 AS contaminated
        FROM {corpus_table} c LEFT JOIN hits h USING ({id_col})
    """
