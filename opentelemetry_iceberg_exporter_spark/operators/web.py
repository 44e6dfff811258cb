"""Web-corpus curation by URL/domain: host extraction, per-domain
concentration reports, and over-represented-domain flagging — the
source-level filter every web-scrape pipeline runs before any text
filter (link farms and boilerplate mills dominate raw crawls at the
DOMAIN level long before per-document signals fire).

All pure Catalyst (regexp + two hash aggregates + one broadcast join),
with exact DuckDB mirrors for cross-engine pinning:

* `domain_col`: host of a URL — scheme/userinfo/port/path stripped,
  lowercased; NULL for unparseable values. The regex lives in the
  Java-regex ∩ RE2 common subset (same constraint as the PII patterns).
* `registrable_domain_col`: last-two-labels heuristic (no public-suffix
  list offline — documented approximation; `news.bbc.co.uk` maps to
  `co.uk`-style false positives, which only makes grouping COARSER,
  i.e. conservative for over-representation flagging).
* `domain_report`: per-registrable-domain doc counts + corpus share —
  ONE hash aggregate; at 100 TB the result is O(domains).
* `flag_dominant_domains`: mark documents whose registrable domain
  holds more than `max_share` of the corpus — the count table is
  domains-sized, so it BROADCASTS back onto the corpus (the
  dedup_paragraphs shape: corpus-wide stat, broadcast join, no
  corpus shuffle).

No reference counterpart (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host: after optional scheme:// and userinfo@, up to :port / path ? #
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^:/?#]+)"


def domain_col(url: Column) -> Column:
    """Lowercased host, or NULL when nothing host-like is present."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.when(host.rlike(r"^[a-z0-9.-]+$") & host.contains("."), host)


def duck_domain_sql(url_sql: str) -> str:
    return (
        f"CASE WHEN lower(regexp_extract({url_sql}, '{_HOST_RE}', 1)) "
        f"~ '^[a-z0-9.-]+$' AND "
        f"contains(lower(regexp_extract({url_sql}, '{_HOST_RE}', 1)), '.') "
        f"THEN lower(regexp_extract({url_sql}, '{_HOST_RE}', 1)) END"
    )


def registrable_domain_col(url: Column) -> Column:
    """Last two dot-labels of the host (offline approximation of the
    public-suffix registrable domain; see module doc for the trade)."""
    host = domain_col(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


def duck_registrable_sql(url_sql: str) -> str:
    d = duck_domain_sql(url_sql)
    return (
        f"CASE WHEN len(string_split(({d}), '.')) >= 2 THEN "
        f"string_split(({d}), '.')[-2] || '.' || string_split(({d}), '.')[-1] "
        f"ELSE ({d}) END"
    )


def domain_report(df: DataFrame, url_col: str) -> DataFrame:
    """(domain, n_docs, share) per registrable domain, NULL-host rows
    under domain NULL — ONE corpus scan: the total comes from summing
    the domains-sized aggregate (a 1-row broadcast), not a second
    count() pass, and the whole plan stays lazy."""
    by_domain = (
        df.select(registrable_domain_col(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    total = by_domain.agg(F.sum("n_docs").alias("__total"))
    return by_domain.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        (F.col("n_docs") / F.col("__total")).alias("share"),
    )


def cap_per_domain(
    df: DataFrame,
    id_col: str,
    url_col: str,
    max_per_domain: int,
    seed: int = 0,
) -> DataFrame:
    """Keep at most `max_per_domain` documents per registrable domain —
    the standard anti-concentration step for web corpora (one SEO farm
    must not dominate a training mix). Selection is a DETERMINISTIC
    hash order (md5 of seed+id), so reruns and ingestion order changes
    keep exactly the same documents, and the survivors are an unbiased
    per-domain sample rather than "whatever crawled first".

    Shape: ONE pass and one shuffle — row_number over the domain
    (ordered by the hash, id as tiebreaker) then a filter. NULL-host
    docs are always kept and get SINGLETON window partitions keyed by
    their own hash (the null bucket is routinely the corpus's biggest at
    web scale and must never funnel through one task); a real domain's
    rows visiting one task is fine — the window is rank-only, and the
    skew this guards against is exactly what the cap removes from every
    downstream stage. The hash covers BOTH id and url with explicit
    null tokens, so null/duplicate ids still order deterministically;
    only rows identical in (id, url) remain order-tied (and for those
    any pick is the same sample)."""
    from pyspark.sql.window import Window

    def _nz(c):
        return F.coalesce(c.cast("string"), F.lit("\x00NULL"))

    domain = registrable_domain_col(F.col(url_col))
    order = F.md5(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), _nz(F.col(id_col)), _nz(F.col(url_col))
        )
    )
    # null hosts: one partition PER ROW (rank 1 <= cap, always kept; the
    # explicit null-guard below also covers hash-collided pairs)
    part = F.coalesce(domain, F.concat(F.lit("\x00"), order))
    w = Window.partitionBy(part).orderBy(order, _nz(F.col(id_col)))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(domain.isNull() | (F.col("__rn") <= int(max_per_domain)))
        .drop("__rn")
    )


def flag_dominant_domains(
    df: DataFrame, id_col: str, url_col: str, max_share: float = 0.05
) -> DataFrame:
    """(id, domain, domain_share, domain_flagged): join the domains-
    sized share table back broadcast; NULL-host docs are never flagged
    (no evidence)."""
    shares = domain_report(df, url_col).filter(F.col("domain").isNotNull())
    with_domain = df.select(
        F.col(id_col), registrable_domain_col(F.col(url_col)).alias("domain")
    )
    return (
        with_domain.join(F.broadcast(shares), "domain", "left")
        .select(
            id_col,
            "domain",
            F.col("share").alias("domain_share"),
            F.coalesce(
                F.col("share") > F.lit(float(max_share)), F.lit(False)
            ).alias("domain_flagged"),
        )
    )
