"""Web-corpus curation: URL normalization, URL-level dedup, and domain
statistics — the C4/RefinedWeb-style front door of a crawl pipeline
(URL dedup runs before any content-based dedup because it is free:
pure string ops + one hash-partitioned groupBy, no text comparison).

All pure Column expressions (JVM-side, whole-stage codegen) built from
regexes simple enough to replay identically in any SQL dialect — the
oracle gates depend on that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_normalize", "url_dedup", "domain_stats"]

# query parameters that never change content identity (tracking)
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)="


def _norm_expr(url: Column) -> Column:
    """Normalized URL as a single Column expression:
    scheme+host lowercased, default ports (http:80 / https:443) dropped,
    trailing path slashes stripped, tracking query params removed and the
    rest SORTED (param order never changes identity), fragment dropped.
    Path case is preserved (paths are case-sensitive)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host_port = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.split_part(host_port, F.lit(":"), F.lit(1)))
    port = F.split_part(host_port, F.lit(":"), F.lit(2))
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        r"/+$",
        "",
    )
    rawq = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    q = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    domain_col: str = "domain",
) -> DataFrame:
    """Add ``out_col`` (normalized URL) and ``domain_col`` (lowercased
    host with a leading ``www.`` stripped)."""
    url = F.col(url_col)
    host = F.lower(
        F.split_part(
            F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
            F.lit(":"),
            F.lit(1),
        )
    )
    return df.withColumn(out_col, _norm_expr(url)).withColumn(
        domain_col, F.regexp_replace(host, r"^www\.", "")
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per normalized URL: the keeper (smallest ``id_col`` —
    deterministic) plus the duplicate count. One map-side-combined
    groupBy on the normalized key; no content ever compared."""
    n = url_normalize(df, url_col)
    return (
        n.groupBy("url_norm")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("url_norm", id_col, "n_dupes")
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    round_to: int = 6,
) -> DataFrame:
    """Documents per domain with the corpus share — the input to
    host-level caps (``curation.source_caps``) and blocklist review.
    One groupBy plus a one-row total crossJoin-broadcast."""
    n = url_normalize(df, url_col)
    counts = n.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("__total").cast("double"),
                round_to,
            ).alias("share"),
        )
    )
