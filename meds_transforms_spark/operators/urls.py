"""URL / domain curation — crawl-corpus hygiene operators.

Web-scale training corpora are curated by URL: per-domain statistics
drive source weighting, and domain blocklists remove spam / NSFW /
boilerplate mills (the CCNet / RefinedWeb pipeline shape). All
extraction is built-in regex projections — JVM-side, no shuffle; only
the corpus-level stats aggregate moves (domain, count) pairs.

The reference engine has no URL plane; this extends the
training-pipeline layer alongside text.py / dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage

#: scheme + non-space remainder; trailing sentence punctuation trimmed
#: in a second step so "see https://x.com/a." keeps the URL clean.
URL_REGEX = r"https?://[^\s]+"
#: capture the registrable host: drop scheme, optional www., stop at
#: the first /, :, ?, or # — ports and paths are not part of a domain.
_HOST_REGEX = r"https?://(?:www\.)?([^/:?#\s]+)"


def _urls(col) -> F.Column:
    raw = F.regexp_extract_all(col, F.lit(URL_REGEX), F.lit(0))
    return F.transform(raw, lambda u: F.regexp_replace(u, r"[.,;:!?)\]]+$", ""))


@register_stage("extract_urls")
def extract_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``urls`` (as written, trailing punctuation trimmed) and
    ``domains`` (lowercased hosts, ``www.`` stripped, de-duplicated)
    array columns. NULL text yields NULL arrays."""
    urls = _urls(F.col(text_col))
    domains = F.array_distinct(
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, _HOST_REGEX, 1))
        )
    )
    return df.withColumn("urls", urls).withColumn("domains", domains)


@register_stage("domain_stats")
def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level per-domain footprint: ``(domain, n_docs, n_urls)``.

    ``n_docs`` counts documents mentioning the domain at least once;
    ``n_urls`` counts URL occurrences. One explode + one
    map-side-combined aggregation — shuffle rows are (domain, long,
    long)."""
    urls = _urls(F.col(text_col))
    per_url = df.select(
        F.col(id_col),
        F.explode(urls).alias("__url"),
    ).select(
        id_col,
        F.lower(F.regexp_extract("__url", _HOST_REGEX, 1)).alias("domain"),
    )
    per_doc = per_url.groupBy(id_col, "domain").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n").alias("n_urls"),
    )


@register_stage("filter_blocked_domains")
def filter_blocked_domains(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop documents that link to any blocked domain.

    A literal ``blocklist`` compiles to a pure codegen array-overlap
    filter — no shuffle, pushes down like any predicate. A DataFrame
    blocklist (column ``domain``) is broadcast against the exploded
    domain set and removed with a left-anti join on the doc id — the
    corpus is shuffled once on the id, the blocklist never exceeds a
    broadcast.

    ``include_subdomains`` also blocks ``*.domain`` (matching the
    usual blocklist semantics: blocking ``spam.net`` blocks
    ``cdn.spam.net``).
    """
    domains = F.array_distinct(
        F.transform(
            _urls(F.col(text_col)),
            lambda u: F.lower(F.regexp_extract(u, _HOST_REGEX, 1)),
        )
    )
    if isinstance(blocklist, DataFrame):
        bl = F.broadcast(
            blocklist.select(F.lower(F.col("domain")).alias("__blocked"))
        )
        doc_domains = df.select(F.col(id_col), F.explode(domains).alias("__dom"))
        cond = F.col("__dom") == F.col("__blocked")
        if include_subdomains:
            # suffix match forces a broadcast nested-loop join — fine:
            # the build side is the (small, broadcast) blocklist.
            cond = cond | F.col("__dom").endswith(
                F.concat(F.lit("."), F.col("__blocked"))
            )
        blocked_ids = doc_domains.join(bl, cond, "left_semi").select(id_col)
        return df.join(blocked_ids, id_col, "left_anti")
    blocked = [b.lower() for b in blocklist]

    def _hit(d):
        cond = d.isin(blocked)
        if include_subdomains:
            for b in blocked:
                cond = cond | d.endswith("." + b)
        return cond

    has_blocked = F.exists(domains, _hit)
    return df.filter(~F.coalesce(has_blocked, F.lit(False)))
