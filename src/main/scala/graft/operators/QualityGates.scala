package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric quality gates for the approximate operators (r16 item #1).
  *
  * The approximate rows (LSH/IVF/HNSW probes, MinHash/SimHash dedup, rand,
  * plan text) have no exact SQL twin, so their driver artifact used to record
  * only `no_oracle`. Each gate here turns the row into an ORACLE-CHECKED
  * statement of measured quality: the Spark side computes the metric against
  * an exact in-plan oracle (brute-force top-k, exact capped-shingle Jaccard)
  * and emits `(metric, threshold, pass)`; the DuckDB side pins the expected
  * constants. Thresholds are set from measured values at sf0.001/0.01/0.1
  * with margin (see GateProbe in test sources for the measurement harness):
  *
  *   - recall@10, vec 0:  lsh .60/.70/.90   ivf .60/.40/.60   hnsw 1/1/1
  *   - sim-ratio@10:      lsh .92/.98/1.0   ivf .93/.89/.91   hnsw 1/1/1
  *   - minhash pair recall/precision vs exact Jaccard: 1.0 at every SF
  *   - simhash recall(h≤6) .93/.92/.88; precision(h≤3→j≥.35) .78/.88/.36
  *
  * The LSH numbers are the r17 query-directed multi-probe (flip-cost budget,
  * ProbeFlips=11 — see Similarity.scala); the testdata embeddings are
  * unstructured (vec 0's exact top-10 cosines are noise-level ~0.3), the
  * worst case for LSH, so the measured recall floor costs a ~30-50% scanned
  * fraction here where a structured corpus would pay far less. */
object QualityGates {

  /** One (metric, threshold, pass) gate. `value` must be a column over the
    * single aggregated row it is applied to. */
  final case class Gate(metric: String, threshold: Double, value: Column)

  /** Collapse a set of gates over a ONE-ROW aggregate frame into ordered
    * (metric, threshold, pass) rows. */
  def rows(oneRow: DataFrame, gates: Seq[Gate]): DataFrame =
    oneRow.select(explode(array(gates.map { g =>
      struct(lit(g.metric).as("metric"),
        lit(g.threshold).as("threshold"),
        (g.value >= g.threshold).as("pass"))
    }: _*)).as("g"))
      .select(col("g.metric").as("metric"),
        col("g.threshold").as("threshold"), col("g.pass").as("pass"))
      .orderBy("metric")

  /** DuckDB twin: the pinned expectation — every gate passes. */
  def oracle(gates: Seq[(String, Double)]): String =
    gates.sortBy(_._1).map { case (m, t) =>
      s"SELECT '$m' AS metric, CAST($t AS DOUBLE) AS threshold, CAST(true AS BOOLEAN) AS pass"
    }.mkString("\n       UNION ALL ")

  /** ANN probe gates: set recall@k against the exact top-k, plus the mean
    * cosine ratio (ANN top-k vs exact top-k). Both frames carry
    * (vec_id, cos_sim); `exact` is the brute-force oracle plan. */
  def annGates(ann: DataFrame, exact: DataFrame, k: Int,
      recallThr: Double, ratioThr: Double): DataFrame = {
    val hits = ann.select("vec_id")
      .join(exact.select("vec_id"), "vec_id")
      .agg(count(lit(1)).as("hits"))
    val am = ann.agg(avg("cos_sim").as("ann_mean"))
    val em = exact.agg(avg("cos_sim").as("ex_mean"))
    val one = hits.crossJoin(am).crossJoin(em)
    rows(one, Seq(
      Gate(s"recall@$k vs exact brute top-$k", recallThr,
        col("hits").cast("double") / k),
      Gate(s"sim_ratio@$k vs exact brute top-$k", ratioThr,
        col("ann_mean") / col("ex_mean"))))
  }

  def annOracle(k: Int, recallThr: Double, ratioThr: Double): String =
    oracle(Seq(
      s"recall@$k vs exact brute top-$k" -> recallThr,
      s"sim_ratio@$k vs exact brute top-$k" -> ratioThr))

  /** ANN gates + the SCAN-FRACTION cost axis (r18): LSH recall is only
    * honest next to what it scanned. Emitted as headroom = 1 − fraction so
    * the shared (value ≥ threshold) gate direction holds; headroomThr 0.40
    * means "the probe admitted at most 60% of the index" — measured
    * admit fractions are .29/.45/.52 across SFs on the noise-level
    * testdata (the worst case; structured corpora admit far less). */
  def annGatesWithScan(ann: DataFrame, exact: DataFrame, scanFrac: DataFrame,
      k: Int, recallThr: Double, ratioThr: Double,
      headroomThr: Double): DataFrame = {
    val hits = ann.select("vec_id")
      .join(exact.select("vec_id"), "vec_id")
      .agg(count(lit(1)).as("hits"))
    val am = ann.agg(avg("cos_sim").as("ann_mean"))
    val em = exact.agg(avg("cos_sim").as("ex_mean"))
    val one = hits.crossJoin(am).crossJoin(em).crossJoin(scanFrac)
    rows(one, Seq(
      Gate(s"recall@$k vs exact brute top-$k", recallThr,
        col("hits").cast("double") / k),
      Gate(s"sim_ratio@$k vs exact brute top-$k", ratioThr,
        col("ann_mean") / col("ex_mean")),
      Gate(s"scan_headroom (1 - admitted fraction)", headroomThr,
        lit(1.0) - col("scan_frac"))))
  }

  def annOracleWithScan(k: Int, recallThr: Double, ratioThr: Double,
      headroomThr: Double): String =
    oracle(Seq(
      s"recall@$k vs exact brute top-$k" -> recallThr,
      s"sim_ratio@$k vs exact brute top-$k" -> ratioThr,
      s"scan_headroom (1 - admitted fraction)" -> headroomThr))
}
