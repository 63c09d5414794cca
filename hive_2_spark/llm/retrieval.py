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


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score): the BM25 scorer behind bm25_topk,
    shared with retrieval_rrf_fusion so the fused ranking can never
    drift from the standalone one."""
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
    return scored


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 docs per query (k1=1.2, b=0.75).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    score(d,q) = sum over query terms of
        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Ties broken by doc_id so top-k is a total order.
    """
    scored = _bm25_scored(spark, sf_dir)
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


_RRF_K = 60       # the standard RRF damping constant
_FUSE_DEPTH = 20  # per-ranker candidate depth fed into the fusion


def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two rankers: BM25 and a term-coverage
    ranker (distinct query terms matched DESC, doc length ASC — the
    'short doc containing everything' signal). Each ranker contributes
    1/(60+rank) for its top-20; docs outside a ranker's list get no
    contribution from it. The standard zero-tuning way to combine a
    lexical and a secondary signal before an expensive reranker.

    Scale: both rankers reduce to query-term postings (isin BEFORE any
    exchange), fusion is a full-outer join of two (query, doc, rank)
    frames already capped at depth x |queries| rows — metadata-sized
    regardless of corpus; the final top-k is the same per-query window
    as every other ranker here.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = [t for _, t in _QUERIES]
    q = _query_df(spark)

    wb = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    bm25 = (
        _bm25_scored(spark, sf_dir)
        .withColumn("r_bm25", F.row_number().over(wb))
        .filter(F.col("r_bm25") <= _FUSE_DEPTH)
        .select("query_id", "doc_id", "r_bm25")
    )

    postings = (
        d.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("dl"),
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
                "term"
            ),
        )
        .filter(F.col("term").isin(terms))
    )
    cov = (
        postings.join(F.broadcast(q), "term")
        .groupBy("query_id", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("n_hit").desc(), F.col("dl").asc(), F.col("doc_id").asc()
    )
    cov_r = (
        cov.withColumn("r_cov", F.row_number().over(wc))
        .filter(F.col("r_cov") <= _FUSE_DEPTH)
        .select("query_id", "doc_id", "r_cov")
    )

    fused = (
        bm25.join(cov_r, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("r_bm25")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("r_cov")), F.lit(0.0)),
                6,
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= _TOPK)
        .select(
            "query_id",
            "doc_id",
            "rrf",
            F.col("rank").cast("bigint").alias("rank"),
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


# fixed literal phrases over the corpus vocabulary (2- and 3-grams,
# incl. one with a repeated term to exercise multi-anchor contribution)
_PHRASES: list[tuple[int, str]] = [
    (1, "table scan merge"),
    (2, "hash join order"),
    (3, "sort merge"),
    (4, "stream window"),
    (5, "batch batch batch"),
]


def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact contiguous-phrase search via positional postings and the
    aligned-anchor trick — the scale substitute for `LIKE '%a b c%'`.

    A full-text LIKE forces every query to rescan every document. This
    plan explodes tokens to positional postings ONCE, keeps only the
    phrase vocabulary (isin BEFORE the exchange, like bm25's
    posting-filtered explode), and maps each posting of phrase term i
    at position p to anchor p - i: a phrase occurrence at anchor a is
    exactly an anchor group containing ALL plen distinct term indexes.
    ONE groupBy replaces the k-way positional self-join — no join in
    the plan beyond the broadcast of the phrase terms; cost scales
    with postings of the queried terms, not corpus size x queries.
    A phrase with a repeated term still works: one posting contributes
    a row per matching term_idx (distinct-count semantics).
    """
    d = load_table(spark, sf_dir, "documents")
    rows = []
    for qid, ph in _PHRASES:
        ts = ph.split()
        for i, t in enumerate(ts):
            rows.append((qid, i, t, len(ts)))
    q = spark.createDataFrame(
        rows, "query_id int, term_idx int, term string, plen int"
    )
    all_terms = sorted({t for _, ph in _PHRASES for t in ph.split()})
    postings = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
    ).filter(F.col("term").isin(all_terms))
    anchored = (
        postings.join(F.broadcast(q), "term")
        .select(
            "query_id",
            "doc_id",
            "plen",
            (F.col("pos") - F.col("term_idx")).alias("anchor"),
            "term_idx",
        )
        .filter(F.col("anchor") >= 0)
    )
    occ = (
        anchored.groupBy("query_id", "doc_id", "plen", "anchor")
        .agg(F.count_distinct("term_idx").alias("nt"))
        .filter(F.col("nt") == F.col("plen"))
    )
    return occ.groupBy("query_id").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("doc_id").alias("first_doc_id"),
    )


import math as _math

_NDCG_DEPTH = 10
# integer discount weights w_pos = round(1e6 / log2(pos+1)): FIXED
# literals interpolated into BOTH engines, so the irrational log2 is
# never evaluated at query time (the Benford-table trick)
_NDCG_W = {p: round(1_000_000 / _math.log2(p + 1)) for p in range(1, _NDCG_DEPTH + 1)}
_NDCG_W_CASE = "CASE {r} " + " ".join(
    f"WHEN {p} THEN {w}" for p, w in _NDCG_W.items()
) + " ELSE 0 END"
# deterministic synthetic graded relevance, shared literal: the gain
# 2^rel - 1 directly (rel 3/2/1/0 -> 7/3/1/0)
_NDCG_GAIN_CASE = (
    "CASE WHEN {d} % 17 = 0 THEN 7 WHEN {d} % 7 = 0 THEN 3 "
    "WHEN {d} % 3 = 0 THEN 1 ELSE 0 END"
)


def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the BM25 ranking against deterministic synthetic
    graded relevance — the ranking-quality evaluation harness every
    retrieval stack runs after an index or scorer change.

    DCG is computed in EXACT integers: gains are the literal 2^rel - 1
    table keyed on doc_id, discounts the fixed micro-scaled
    round(1e6/log2(pos+1)) weights — both interpolated as literals
    into both engines, so no transcendental is evaluated at query
    time and the only float op is the final dcg/idcg division
    (correctly-rounded IEEE, rounded to 6). The ideal ranking is the
    corpus-wide top-10 gains via TakeOrderedAndProject (never a global
    rank window over the corpus); its 10-row frame feeds a
    domain-bounded window and a 1-row broadcast.

    Output: query_id, dcg_m, idcg_m, ndcg (micro-scaled integers).
    """
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _NDCG_DEPTH)
    )
    dcg = (
        top.select(
            "query_id",
            (
                F.expr(_NDCG_GAIN_CASE.format(d="doc_id"))
                * F.expr(_NDCG_W_CASE.format(r="rank"))
            ).alias("contrib"),
        )
        .groupBy("query_id")
        .agg(F.sum("contrib").cast("bigint").alias("dcg_m"))
    )
    d = load_table(spark, sf_dir, "documents")
    ideal = (
        d.select(
            "doc_id", F.expr(_NDCG_GAIN_CASE.format(d="doc_id")).alias("g")
        )
        .orderBy(F.col("g").desc(), F.col("doc_id").asc())
        .limit(_NDCG_DEPTH)
    )
    wpos = Window.orderBy(F.col("g").desc(), F.col("doc_id").asc())
    idcg = (
        ideal.withColumn("pos", F.row_number().over(wpos))
        .agg(
            F.sum(F.col("g") * F.expr(_NDCG_W_CASE.format(r="pos")))
            .cast("bigint")
            .alias("idcg_m")
        )
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "query_id",
        "dcg_m",
        "idcg_m",
        F.round(
            F.col("dcg_m").cast("double") / F.col("idcg_m").cast("double"), 6
        ).alias("ndcg"),
    )


QUERIES = {
    "retrieval_ndcg": retrieval_ndcg,
    "bm25_topk": bm25_topk,
    "keyword_search_and": keyword_search_and,
    "retrieval_rrf_fusion": retrieval_rrf_fusion,
    "phrase_search_positional": phrase_search_positional,
}

_QUERY_VALUES = ", ".join(f"({i}, '{t}')" for i, t in _QUERIES)

# the BM25 scorer CTE chain, shared by the bm25_topk and
# retrieval_rrf_fusion oracles exactly as _bm25_scored is on the Spark side
_BM25_SCORED_CTES = f"""
q(query_id, term) AS (VALUES {_QUERY_VALUES}),
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
)"""

_PHRASE_VALUES = ", ".join(f"({i}, '{p}')" for i, p in _PHRASES)

ORACLES = {
    "retrieval_ndcg": f"""
WITH {_BM25_SCORED_CTES},
top AS (
  SELECT query_id, doc_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {_NDCG_DEPTH}
),
dcg AS (
  SELECT query_id,
         SUM(({_NDCG_GAIN_CASE.format(d="doc_id")})
             * ({_NDCG_W_CASE.format(r="rnk")})) AS dcg_m
  FROM top GROUP BY query_id
),
ideal AS (
  SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC, doc_id ASC) AS pos
  FROM (SELECT doc_id, {_NDCG_GAIN_CASE.format(d="doc_id")} AS g
        FROM documents)
  QUALIFY pos <= {_NDCG_DEPTH}
),
idcg AS (
  SELECT SUM(g * ({_NDCG_W_CASE.format(r="pos")})) AS idcg_m FROM ideal
)
SELECT query_id, CAST(dcg_m AS BIGINT) AS dcg_m,
       CAST(idcg_m AS BIGINT) AS idcg_m,
       ROUND(CAST(dcg_m AS DOUBLE) / CAST(idcg_m AS DOUBLE), 6) AS ndcg
FROM dcg, idcg
""",
    # NAIVE replay: every document scanned per query, every window
    # compared — proves the anchor trick finds exactly the contiguous
    # occurrences (positions 1-based; ws[i:i+plen-1] is plen tokens)
    "phrase_search_positional": (
        f"WITH q(query_id, phrase) AS (VALUES {_PHRASE_VALUES}), "
        "w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "x AS (SELECT q.query_id, q.phrase, "
        "len(string_split(q.phrase, ' ')) AS plen, w.doc_id, w.ws "
        "FROM q CROSS JOIN w), "
        "occ AS (SELECT query_id, doc_id, "
        "unnest(list_filter(range(1, len(ws) - plen + 2), "
        "i -> array_to_string(ws[i:i+plen-1], ' ') = phrase)) AS anchor "
        "FROM x) "
        "SELECT query_id, COUNT(DISTINCT doc_id) AS n_docs, "
        "COUNT(*) AS n_occurrences, MIN(doc_id) AS first_doc_id "
        "FROM occ GROUP BY 1"
    ),
    "bm25_topk": f"""
WITH {_BM25_SCORED_CTES}
SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {_TOPK}
""",
    "retrieval_rrf_fusion": f"""
WITH {_BM25_SCORED_CTES},
bm25 AS (
  SELECT query_id, doc_id, rnk AS r_bm25 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {_FUSE_DEPTH}
),
cp AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(list_distinct(string_split(text, ' '))) AS term
  FROM documents
),
cov AS (
  SELECT q.query_id, cp.doc_id, cp.dl, COUNT(*) AS n_hit
  FROM cp JOIN q USING (term)
  GROUP BY q.query_id, cp.doc_id, cp.dl
),
cov_r AS (
  SELECT query_id, doc_id, rnk AS r_cov FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY n_hit DESC, dl ASC, doc_id ASC) AS rnk
    FROM cov
  ) WHERE rnk <= {_FUSE_DEPTH}
),
fused AS (
  SELECT COALESCE(b.query_id, c.query_id) AS query_id,
         COALESCE(b.doc_id, c.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({_RRF_K} + b.r_bm25), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + c.r_cov), 0.0), 6) AS rrf
  FROM bm25 b FULL OUTER JOIN cov_r c
    ON b.query_id = c.query_id AND b.doc_id = c.doc_id
)
SELECT query_id, doc_id, rrf, CAST(rnk AS BIGINT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused
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
