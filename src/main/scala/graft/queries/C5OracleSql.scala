package graft.queries

/** DuckDB oracle for c5_assign_splits: the same splitmix64 draw replay as
  * c3, bucketed by cumulative ⌊Σw·2²⁴⌋ thresholds computed from the SAME
  * Scala arithmetic the operator uses (Corpus.assignSplits) so the two
  * sides cannot drift; the last split absorbs the rounding tail.
  */
object C5OracleSql {

  // keep in sync with QueryCatalog.c5AssignSplits
  val splits: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val seed = 11L

  val sql: String = {
    // the operator's own threshold + seed-derivation arithmetic — no copy
    // to drift (assignSplits draws from a split-tagged seed family so
    // chaining with sampleMixture under one seed cannot correlate)
    val cum = graft.operators.Corpus.cumulativeDrawThresholds(splits.map(_._2))
    val cases = splits.map(_._1).zip(cum).init
      .map { case (n, c) => s"WHEN u < $c THEN '$n'" }.mkString(" ")
    s"""WITH ${SplitmixSql.drawCtes(graft.operators.Corpus.splitDrawSeed(seed), "doc_id")}
       |SELECT doc_id, CASE $cases ELSE '${splits.last._1}' END AS split
       |FROM m3 ORDER BY doc_id""".stripMargin
  }
}
