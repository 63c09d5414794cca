"""URL canonicalization, URL-level dedup, and domain blocklist filtering.

Web-crawl curation stages (extends SURVEY.md §2B op 52; reference
analogue: the Hive ORM's unique-key probes, `classes/hive/model.php`
uniqueness checks, generalized to the canonical-key dedup a crawl
pipeline needs). The fixture has no URL column, so a messy URL is
synthesized deterministically per document (scheme/host case variants,
`www.` prefixes, default ports, tracking params, fragments, trailing
slashes) — and the Spark side then canonicalizes it with REAL parsing
(`parse_url` + regex + higher-order array filter on the query string),
while the DuckDB oracle derives the canonical form directly from
(doc_id, source) arithmetic. Two independent routes to the same value:
a canonicalization bug on either side breaks the hash match.

Scale notes: canonicalization is pure codegen string work (no Python,
no shuffle); dedup shuffles only (canonical_url, doc_id) pairs — the
16-byte-per-row `dedup_exact` shape; the blocklist is a broadcast
anti-join (the blocklist side is always metadata-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_2_spark.catalog import load_table

# Tracking params stripped by canonicalization (the usual suspects).
_TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=")

_BLOCKLIST = ["src1.example.com", "src3.example.com"]


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy URL per document.

    Variants by doc_id residue: scheme case (`https`/`HTTPS`), `WWW.`
    prefix, explicit default port `:443`, trailing slash, tracking-only
    query strings, fragments, and one MEANINGFUL param (`page=2`) that
    canonicalization must KEEP. Path groups collide on doc_id % 100, so
    several docs canonicalize to the same URL — the dedup ground truth.
    """
    d = load_table(spark, sf_dir, "documents")
    scheme = F.when(F.col("doc_id") % 2 == 0, "https").otherwise("HTTPS")
    www = F.when(F.col("doc_id") % 3 == 0, "WWW.").otherwise("")
    host_case = F.when(
        F.col("doc_id") % 6 == 1, F.upper(F.col("source"))
    ).otherwise(F.col("source"))
    port = F.when(F.col("doc_id") % 5 == 0, ":443").otherwise("")
    slash = F.when(F.col("doc_id") % 4 == 0, "/").otherwise("")
    query = (
        F.when(F.col("doc_id") % 9 == 0, "?page=2&utm_campaign=x")
        .when(F.col("doc_id") % 2 == 1, F.concat(
            F.lit("?utm_source=feed&ref="), (F.col("doc_id") % 7).cast("string")
        ))
        .otherwise("")
    )
    frag = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(F.lit("#sec"), (F.col("doc_id") % 3).cast("string")),
    ).otherwise("")
    url = F.concat(
        scheme, F.lit("://"), www, host_case, F.lit(".Example.COM"), port,
        F.lit("/a/"), (F.col("doc_id") % 100).cast("string"), slash, query,
        frag,
    )
    return d.select("doc_id", "source", url.alias("url"))


def canonicalize_url(url):
    """Column expression: messy URL -> canonical URL, by real parsing.

    lower(scheme), strip `www.`, lower(host) (drops the default port —
    `parse_url(..., 'HOST')` excludes ports), strip one trailing slash,
    drop the fragment (parse_url never returns it), and keep only
    non-tracking query params (higher-order `filter` over the split
    query — a few short strings per row, the regime where HOFs are
    fine). All codegen string ops; no Python.
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), r"/$", "")
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.startswith(p, F.lit("utm_"))
            & ~F.startswith(p, F.lit("ref="))
            & ~F.startswith(p, F.lit("fbclid=")),
        ),
        "&",
    )
    return F.concat(
        proto, F.lit("://"), host, path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: canonicalize, then hash-groupBy the canonical
    URL — `dedup_exact`'s shape with a canonical key. Only
    (canonical_url, doc_id) crosses the exchange."""
    u = _messy_urls(spark, sf_dir).withColumn(
        "canonical_url", canonicalize_url(F.col("url"))
    )
    return u.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_id"),
    )


def curation_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filter: broadcast ANTI-join of the corpus
    against a (metadata-sized) blocked-domain table, then per-domain
    survivor counts. At 100 TB the blocklist always broadcasts; the
    corpus is filtered in place with no corpus-sized shuffle before
    the final count aggregation."""
    u = _messy_urls(spark, sf_dir).withColumn(
        "domain",
        F.regexp_replace(
            F.lower(F.parse_url(F.col("url"), F.lit("HOST"))), r"^www\.", ""
        ),
    )
    block = spark.createDataFrame(
        [(b,) for b in _BLOCKLIST], "blocked_domain string"
    )
    kept = u.join(
        F.broadcast(block),
        u["domain"] == block["blocked_domain"],
        "left_anti",
    )
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


# Oracle derives the canonical URL DIRECTLY from (doc_id, source)
# arithmetic — independently of the Spark-side parse_url route.
_CANON_SQL = (
    "'https://' || source || '.example.com/a/' || CAST(doc_id % 100 AS VARCHAR)"
    " || CASE WHEN doc_id % 9 = 0 THEN '?page=2' ELSE '' END"
)

QUERIES = {
    "dedup_url_canonical": dedup_url_canonical,
    "curation_domain_filter": curation_domain_filter,
}

ORACLES = {
    "dedup_url_canonical": (
        f"SELECT {_CANON_SQL} AS canonical_url, "
        "COUNT(*) AS n_dups, MIN(doc_id) AS keep_id "
        "FROM documents GROUP BY 1"
    ),
    "curation_domain_filter": (
        "SELECT source || '.example.com' AS domain, "
        "COUNT(*) AS n_docs, MIN(doc_id) AS first_doc "
        "FROM documents "
        "WHERE source || '.example.com' NOT IN "
        "('src1.example.com', 'src3.example.com') "
        "GROUP BY 1"
    ),
}
