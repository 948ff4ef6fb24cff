package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Exact

/** Full-text search as DataFrame-native inverted-index tables + BM25.
  *
  * The reference serves `@@` (MATCHES) from a persisted inverted index with
  * BM25 ranking (surrealdb: exec/operators/scan/fulltext.rs:46,
  * idx/ft/fulltext.rs:143; analyzer pipeline expr/tokenizer.rs:8-13,
  * expr/filter.rs:8-16). The Spark shape: the postings list IS a DataFrame
  * (term → doc, tf) built by one explode+groupBy pass; a query is a join
  * against the (tiny, broadcast) per-term document frequencies and a
  * per-document score aggregation. At 100 TB the postings table would be
  * written out bucketed by term so query joins are shuffle-free.
  *
  * BM25: k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)) — the exact
  * formula of the reference's scorer (idx/ft/fulltext.rs). */
object FullText {

  private val K1 = 1.2
  private val B  = 0.75

  /** Blank-tokenizer + lowercase analyzer (reference: Tokenizer::Blank +
    * lowercase filter). One row per (doc_id, term) occurrence. */
  def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), " ")).as("term"))

  /** Postings: (term, doc_id, tf). The persisted FTS index analog. */
  def postings(toks: DataFrame): DataFrame =
    toks.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Document lengths: (doc_id, dl). */
  def docLengths(toks: DataFrame): DataFrame =
    toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** BM25 top-k for a bag of query terms. All constants and intermediates in
    * double; the only order-dependent float sum is over ≤|terms| addends per
    * doc, hidden by round(4). */
  def bm25(spark: SparkSession, docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = tokenize(docs)
    val post = postings(toks).filter(col("term").isin(terms: _*))
    val dl   = docLengths(toks)
    val glob = dl.agg(count(lit(1)).cast("double").as("n"),
      Exact.davg(col("dl")).as("avgdl"))
    val df_  = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = post
      .join(dl, "doc_id")
      .join(broadcast(df_), "term")
      .crossJoin(broadcast(glob))
      .select(col("doc_id"), (
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") * lit(K1 + 1.0)) /
          (col("tf").cast("double") +
            lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
        .as("term_score"))
    scored.groupBy("doc_id").agg(round(sum(col("term_score")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** SQL twin of [[bm25]] for the DuckDB oracle. */
  def sqlBm25(terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH toks AS (
          SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS term
          FROM documents),
        post AS (
          SELECT term, doc_id, COUNT(*) AS tf FROM toks
          WHERE term IN $inList GROUP BY 1, 2),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n, ${Exact.sqlAvg("dl")} AS avgdl FROM dl),
        dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM post GROUP BY 1),
        scored AS (
          SELECT post.doc_id,
                 ln(CAST(1.0 AS DOUBLE) + (stats.n - dfreq.df + CAST(0.5 AS DOUBLE))
                      / (dfreq.df + CAST(0.5 AS DOUBLE)))
                 * (CAST(post.tf AS DOUBLE) * CAST(${K1 + 1.0} AS DOUBLE))
                 / (CAST(post.tf AS DOUBLE)
                    + CAST($K1 AS DOUBLE) * (CAST(${1.0 - B} AS DOUBLE)
                        + CAST($B AS DOUBLE) * CAST(dl.dl AS DOUBLE) / stats.avgdl))
                   AS term_score
          FROM post JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats)
        SELECT doc_id, round(SUM(term_score), 4) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT $k"""
  }

  private val queryTerms = Seq("spark", "merge", "window")

  /** `FullTextScan` (`@@` MATCHES with BM25 ranking): top-20 documents for a
    * 3-term query. */
  val fulltextBm25 = Q("fulltext_bm25", sqlBm25(queryTerms, 20)) {
    (s, d) => bm25(s, Tables.documents(s, d), queryTerms, 20)
  }

  /** Boolean AND match (`@@` with all-terms semantics): documents containing
    * every query term — postings semi-join, count == |terms|. */
  val fulltextAll = Q("fulltext_all_terms",
    """SELECT doc_id FROM (
         SELECT doc_id, COUNT(DISTINCT term) AS hits FROM (
           SELECT doc_id, unnest(string_split(trim(lower(text)), ' ')) AS term
           FROM documents)
         WHERE term IN ('spark', 'merge', 'window') GROUP BY doc_id)
       WHERE hits = 3 ORDER BY doc_id""") {
    (s, d) =>
      tokenize(Tables.documents(s, d))
        .filter(col("term").isin(queryTerms: _*))
        .groupBy("doc_id").agg(countDistinct(col("term")).as("hits"))
        .filter(col("hits") === queryTerms.size)
        .select("doc_id")
        .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(fulltextBm25, fulltextAll)
}
