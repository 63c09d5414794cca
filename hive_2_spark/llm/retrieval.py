"""Keyword retrieval over `documents`: BM25 top-k and boolean-AND search.

The lexical-retrieval face of the LLM pipeline (dedup/similarity cover
the embedding side, `llm/similarity.py`). No reference counterpart —
driver-mandated extension surface.

Scale notes: the plan is the classic distributed inverted-index probe.
Tokens are exploded once and immediately filtered to the query terms
(the isin sits directly on the generate's output, before any exchange,
so the shuffle carries only postings for queried terms — a vanishing
fraction of the corpus). Corpus stats (N, avgdl) and per-term
document frequencies are 1-row / |terms|-row aggregates broadcast to
the scorers; the only data-sized exchange is the (doc_id, term) tf
aggregation. Top-k is a per-query window over scored docs — with
thousands of queries this becomes the batched "multi-query search" plan
and the window key keeps it embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_2_spark.catalog import load_table

_K1 = 1.2
_B = 0.75
_TOPK = 5

# (query_id, term) — terms drawn from the generator's vocabulary
_QUERIES = [
    (1, "spark"),
    (1, "window"),
    (1, "query"),
    (2, "hash"),
    (2, "merge"),
    (3, "customer"),
    (3, "order"),
    (3, "value"),
]


def _query_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_QUERIES, "query_id int, term string")


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 docs per query (k1=1.2, b=0.75).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    score(d,q) = sum over query terms of
        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Ties broken by doc_id so top-k is a total order.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = [t for _, t in _QUERIES]
    words = F.split(F.col("text"), " ")
    docs = d.select("doc_id", words.alias("ws"))
    # corpus stats: 1-row broadcast (never a driver collect)
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("ws")).alias("avgdl"),
    )
    # isin applied directly on the exploded column — before any exchange,
    # so only queried-term postings ever cross a shuffle
    toks = docs.select(
        "doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "term", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(_query_df(spark)), "term")
        .join(F.broadcast(idf), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (_K1 + 1.0))
            / (
                F.col("tf")
                + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select(
            "query_id", "doc_id", "score", F.col("rank").cast("bigint").alias("rank")
        )
    )


def keyword_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND retrieval: docs containing EVERY term of the query.

    Distinct (doc, term) postings grouped per (query, doc); a doc
    matches when its distinct-hit count equals the query's term count.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = [t for _, t in _QUERIES]
    q = _query_df(spark)
    n_terms = q.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    postings = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term").isin(terms))
        .distinct()
    )
    hits = (
        postings.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(n_terms), "query_id")
        .filter(F.col("n_hit") == F.col("n_terms"))
    )
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_matching_docs"),
        F.min("doc_id").alias("first_doc_id"),
    )


QUERIES = {
    "bm25_topk": bm25_topk,
    "keyword_search_and": keyword_search_and,
}

_QUERY_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _QUERIES)

ORACLES = {
    "bm25_topk": f"""
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(len(ws)) AS avgdl FROM w
), toks AS (
  SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w
), tf AS (
  SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY doc_id, term, dl
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term,
         ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf,
         s.avgdl
  FROM dfreq, stats s
), scored AS (
  SELECT q.query_id, tf.doc_id,
         ROUND(SUM(idf.idf * (tf.tf * ({_K1} + 1.0))
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / idf.avgdl))),
               6) AS score
  FROM tf JOIN q USING (term) JOIN idf USING (term)
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {_TOPK}
""",
    "keyword_search_and": f"""
WITH q(query_id, term) AS (VALUES {_QUERY_VALUES}),
postings AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents)
  WHERE term IN (SELECT DISTINCT term FROM q)
), n_terms AS (
  SELECT query_id, COUNT(*) AS n_terms FROM q GROUP BY query_id
), hits AS (
  SELECT p.query_id, p.doc_id FROM (
    SELECT q.query_id, postings.doc_id, COUNT(*) AS n_hit
    FROM postings JOIN q USING (term)
    GROUP BY q.query_id, postings.doc_id
  ) p JOIN n_terms USING (query_id)
  WHERE p.n_hit = n_terms.n_terms
)
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_matching_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM hits GROUP BY query_id
""",
}
