package graft.queries

/** DuckDB oracle for c14_pipeline_compose: the full deterministic
  * sampling pipeline CHAINED under ONE user seed — mixture sample →
  * train/val/test split → keep train → epoch shuffle-to-shards — with
  * all three draw chains replayed in one WITH clause (renamable CTE
  * prefixes a/b/c). This is the interaction gate for the hash-family
  * design: sampleMixture, assignSplits, and shuffleToShards draw from
  * DISTINCT tagged families precisely so chaining under one seed stays
  * independent (a shared family would collapse every sampled survivor
  * into the bottom split slice, and the shard order would correlate with
  * the survivor slice). A family-tagging regression anywhere in the
  * chain breaks this oracle even if each stage's own oracle still
  * passes.
  */
object C14OracleSql {

  // keep in sync with QueryCatalog.c14PipelineCompose — ONE seed for all
  // three stages, by design
  val weights: Map[String, Double] = Map(
    "src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.0)
  val defaultWeight = 0.35
  val splits: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  val numShards = 5
  val seed = 21L

  val sql: String = {
    val op = graft.operators.Corpus
    val mixCases = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${op.drawThreshold(w)}" }.mkString(" ")
    val trainCut = op.cumulativeDrawThresholds(splits.map(_._2)).head
    val s = numShards
    s"""WITH ${SplitmixSql.drawCtes(seed, "doc_id, source", "documents", "a")},
       |kept AS (SELECT doc_id FROM a3
       |    WHERE u < CASE source $mixCases ELSE ${op.drawThreshold(defaultWeight)} END),
       |${SplitmixSql.drawCtes(op.splitDrawSeed(seed), "doc_id", "kept", "b")},
       |train AS (SELECT doc_id FROM b3 WHERE u < $trainCut),
       |${SplitmixSql.signedCtes(op.shardDrawSeed(seed), "doc_id", "train", "c")},
       |sh AS (SELECT doc_id, b,
       |    CAST(((b % $s) + $s) % $s AS INT) AS shard FROM c3)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY b, doc_id) - 1
       |       AS BIGINT) AS pos
       |FROM sh ORDER BY doc_id""".stripMargin
  }
}
