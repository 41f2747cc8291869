package graft.queries

/** DuckDB oracle for t14_shard_shuffle: replays BOTH coordinates of the
  * deterministic epoch shuffle (graft.operators.Corpus.shuffleToShards)
  * from scratch — the splitmix64 avalanche of doc_id under the SHARDS
  * hash family in HUGEINT limb math, folded to the SIGNED BIGINT the JVM
  * orders by (the T6 rule), then shard = Spark's pmod replayed as
  * ((b % S) + S) % S and pos = the within-shard rank of (draw, id).
  */
object T14OracleSql {

  // keep in sync with QueryCatalog.t14ShardShuffle
  val numShards = 7
  val seed = 3L

  val sql: String = {
    val s = numShards
    s"""WITH ${SplitmixSql.signedCtes(
         graft.operators.Corpus.shardDrawSeed(seed), "doc_id")},
       |sh AS (SELECT doc_id, b,
       |    CAST(((b % $s) + $s) % $s AS INT) AS shard FROM m3)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY b, doc_id) - 1
       |       AS BIGINT) AS pos
       |FROM sh ORDER BY doc_id""".stripMargin
  }
}
