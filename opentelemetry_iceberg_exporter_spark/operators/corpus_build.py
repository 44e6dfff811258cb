"""End-to-end training-corpus construction: the composed funnel a
pretraining data pipeline actually runs, built from this repo's
operators in the canonical order:

  1. paragraph boilerplate removal   (cleaning.dedup_paragraphs)
  2. benchmark decontamination       (cleaning.flag_contamination)
  3. exact dedup                     (dedup.exact_dedup)
  4. near dedup, canonical per group (dedup minhash -> LSH -> CC groups)
  5. quality filter                  (quality_classifier, optional)
  6. sequence packing                (packing.pack_concat_chunks)

Each stage is one of the already-plan-audited operators — the funnel
composes their DataFrames lazily; only the per-stage survivor counts
(for the report) force evaluation, and `report_counts=False` turns the
whole build into a single lazy plan for production runs where the
funnel report isn't worth the extra actions.

Scale posture is inherited: every stage is either map-side or one
bounded equi-join/shuffle; nothing here adds a driver-side data path.
The reference has no counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from ..sources.tables import fan_out
from .cleaning import dedup_paragraphs, flag_contamination
from .dedup import dedup_groups, exact_dedup, minhash_lsh_pairs, minhash_signatures


@dataclass
class CorpusReport:
    """Funnel counts: how many documents survived each stage (empty when
    report_counts=False)."""

    stages: list = field(default_factory=list)  # [(stage, rows_after)]

    def add(self, stage: str, rows: int | None) -> None:
        self.stages.append((stage, rows))

    def as_dict(self) -> dict:
        return {s: n for s, n in self.stages}


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    boilerplate_max_docs: int | None = 2,
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    exact: bool = True,
    near: bool = True,
    substr_k: int | None = None,
    substr_stride: int = 1,
    quality_model=None,
    quality_threshold: float = 0.5,
    lm_model=None,
    max_perplexity: float | None = None,
    url_col: str | None = None,
    max_per_domain: int | None = None,
    bpe_model=None,
    pack_budget: int | None = None,
    shuffle_seed: str | None = None,
    report_counts: bool = True,
) -> tuple[DataFrame, CorpusReport]:
    """Run the funnel; returns (corpus, report). The output keeps the
    input columns (text rewritten in place when paragraph dedup runs)
    plus `n_tokens`, `quality_score` (when a model is given),
    `perplexity` (when an LM is given; rows above `max_perplexity`
    drop), `n_bpe_tokens` (when a BPE model is given — and packing then
    budgets by REAL tokenizer counts instead of whitespace words) and
    the packing columns (when `pack_budget` is set; `shuffle_seed`
    makes the packed training ORDER the seeded deterministic
    permutation of sampling.shuffle_corpus — an epoch reshuffle is a
    seed change re-running only the packing stage). With `url_col` +
    `max_per_domain`, a deterministic per-registrable-domain cap
    (web.cap_per_domain) runs after the content filters — the standard
    anti-concentration step against SEO farms dominating the mix."""
    report = CorpusReport()

    def count(stage: str, df: DataFrame) -> DataFrame:
        if report_counts:
            df = df.localCheckpoint(eager=False)
            report.add(stage, df.count())
        else:
            report.add(stage, None)
        return df

    # Stage boundaries materialize through AQE, which coalesces each
    # tiny semi-join output down to ONE partition at bench scale — and
    # every downstream stage's CPU-heavy map work (paragraph explode,
    # n-gram explode, minhash folds, char-gram md5) would then run on
    # one core while the rest idle. fan_out re-spreads a collapsed
    # frame before each heavy map stage; it is a no-op whenever the
    # frame is already parallel (production scale), so no full-corpus
    # shuffle can sneak in at 100 TB. The source-bytes hint (stamped by
    # load_table) rides the ORIGINAL docs frame; survivor frames only
    # shrink, so it stays a valid width bound for every stage.
    src_hint = getattr(docs, "_graft_src_bytes", None)

    def spread(df: DataFrame) -> DataFrame:
        return fan_out(df, spark, src_bytes=src_hint)

    out = count("input", docs)

    if boilerplate_max_docs is not None:
        out = spread(out)
        rewritten = dedup_paragraphs(out, id_col, text_col, boilerplate_max_docs)
        # LEFT join + coalesce: dedup_paragraphs emits no row for docs
        # with empty/NULL text, and an inner join would silently drop
        # them from the funnel — they pass through unchanged instead
        # (downstream stages decide their fate, same as when this stage
        # is disabled)
        out = (
            out.withColumnRenamed(text_col, "__orig_text")
            .join(
                rewritten.select(id_col, F.col("text_deduped").alias("__dedup_text")),
                id_col,
                "left",
            )
            .withColumn(
                text_col, F.coalesce("__dedup_text", "__orig_text")
            )
            .drop("__orig_text", "__dedup_text")
        )
        out = count("paragraph_dedup", out)

    if benchmark is not None:
        flags = flag_contamination(
            spread(out), benchmark, id_col, text_col, bench_text_col=bench_text_col
        )
        out = out.join(
            flags.filter(~F.col("contaminated")).select(id_col), id_col, "semi"
        )
        out = count("decontaminated", out)

    if exact:
        kept = exact_dedup(out, text_col, id_col)
        out = out.join(kept.select(id_col), id_col, "semi")
        out = count("exact_dedup", out)

    if near:
        pairs = minhash_lsh_pairs(
            minhash_signatures(spread(out), id_col, text_col), id_col
        )
        groups = dedup_groups(out, pairs, id_col)
        out = out.join(
            groups.filter(F.col("is_canonical")).select(id_col), id_col, "semi"
        )
        out = count("near_dedup", out)

    if substr_k is not None:
        # exact-substring pass AFTER doc-level dedup: whole-document
        # duplicates are already gone cheaply; this trims the residual
        # verbatim overlap (licenses, templates, quotes) embedded in
        # otherwise-distinct survivors. Text rewritten in place, one
        # canonical copy kept corpus-wide (Lee et al. ExactSubstr).
        from .substring_dedup import strip_duplicated_substrings

        out = (
            strip_duplicated_substrings(
                spread(out), id_col, text_col, k=substr_k, stride=substr_stride
            )
            .withColumn(text_col, F.col("text_deduped"))
            .drop("text_deduped")
        )
        out = count("substr_dedup", out)

    if quality_model is not None:
        from .quality_classifier import score_documents

        scored = score_documents(
            spark, out, quality_model, id_col, text_col, threshold=quality_threshold
        )
        out = out.join(
            scored.filter(F.col("quality_keep")).select(id_col, "quality_score"),
            id_col,
        )
        out = count("quality_filter", out)

    if lm_model is not None and max_perplexity is not None:
        from .lm import score_perplexity

        ppl = score_perplexity(out, lm_model, id_col, text_col)
        out = out.join(
            ppl.filter(
                F.col("perplexity").isNotNull()
                & (F.col("perplexity") <= F.lit(float(max_perplexity)))
            ).select(id_col, "perplexity"),
            id_col,
        )
        out = count("perplexity_filter", out)

    if url_col is not None and max_per_domain is not None:
        from .web import cap_per_domain

        out = cap_per_domain(out, id_col, url_col, max_per_domain)
        out = count("domain_cap", out)

    out = out.withColumn("n_tokens", F.size(tokens(F.col(text_col))))

    budget_col = "n_tokens"
    if bpe_model is not None:
        from .bpe import bpe_encode

        enc = bpe_encode(out.select(id_col, text_col), id_col, text_col, bpe_model)
        out = out.join(enc.select(id_col, "n_bpe_tokens"), id_col)
        budget_col = "n_bpe_tokens"

    if pack_budget is not None:
        from .packing import pack_concat_chunks

        if shuffle_seed is not None:
            # seeded training order: the packed offsets follow the
            # deterministic (seed, id) permutation instead of packing's
            # unseeded default — an epoch reshuffle is a seed change
            # re-running ONLY this stage (sampling.shuffle_corpus is
            # the standalone form of the same order)
            from .sampling import SHUFFLE_SALT_TAG

            from ..functions import md5_hash64

            out = out.withColumn(
                "__shuffle_key",
                md5_hash64(
                    F.concat(
                        F.lit(SHUFFLE_SALT_TAG + shuffle_seed),
                        F.col(id_col).cast("string"),
                    )
                ),
            )
            packed = pack_concat_chunks(
                out, id_col, budget_col, pack_budget, order_col="__shuffle_key"
            )
            out = out.drop("__shuffle_key")
        else:
            packed = pack_concat_chunks(out, id_col, budget_col, pack_budget)
        out = out.join(
            packed.select(id_col, "start_offset", "first_seq", "last_seq"), id_col
        )
        out = count("packed", out)

    return out, report
