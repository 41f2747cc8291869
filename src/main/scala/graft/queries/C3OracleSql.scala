package graft.queries

/** DuckDB oracle for c3_sample_mixture: replays the keep decision —
  * splitmix64 avalanche of doc_id with the seed pre-mixed
  * (graft.functions.TextKernels.mix), top 24 bits under ⌊weight · 2²⁴⌋ —
  * in pure SQL. 64-bit wrap-around multiplication in 32-bit limbs so the
  * HUGEINT intermediates never overflow (same pattern as Mm1OracleSql);
  * the per-source thresholds are computed by the SAME ⌊w·2²⁴⌋ in Scala
  * that the operator uses, so the two sides cannot drift.
  */
object C3OracleSql {

  // the c3 query's mixture: weights, default, seed — keep in sync with
  // QueryCatalog.c3SampleMixture
  val weights: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.0)
  val defaultWeight = 0.1
  val seed = 7L

  // the operator's own threshold arithmetic — no copy to drift
  private def th(w: Double): Long = graft.operators.Corpus.drawThreshold(w)

  val sql: String = {
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${th(w)}" }.mkString(" ")
    s"""WITH ${SplitmixSql.drawCtes(seed, "doc_id, source")}
       |SELECT doc_id, source FROM m3
       |WHERE u < CASE source $cases ELSE ${th(defaultWeight)} END
       |ORDER BY doc_id""".stripMargin
  }
}
