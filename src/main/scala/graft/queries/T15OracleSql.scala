package graft.queries

/** DuckDB oracle for t15_read_shards: the epoch WRITE→READ round trip.
  * The query materializes graft.operators.Corpus.writeShards' layout
  * (one parquet file per shard, row order = draw order, no stored
  * position column) and reads it back through Corpus.readShards, which
  * reconstructs (shard, pos) from the file layout alone
  * (`_metadata.row_index`). The oracle replays the COORDINATES from
  * scratch — splitmix64 of doc_id under the SHARDS hash family in
  * HUGEINT limb math folded to signed BIGINT (the T6 rule), shard =
  * Spark's pmod as ((b % S) + S) % S, pos = the within-shard rank of
  * (draw, id) — and joins the documents table for the text md5, so a
  * hash match proves the reader returns every document at exactly the
  * coordinate the writer's row order encodes.
  */
object T15OracleSql {

  // keep in sync with QueryCatalog.t15ReadShards; distinct from t14's
  // (7, 3) so the two rows exercise different pmod foldings
  val numShards = 5
  val seed = 11L

  val sql: String = {
    val s = numShards
    s"""WITH ${SplitmixSql.signedCtes(
         graft.operators.Corpus.shardDrawSeed(seed), "doc_id")},
       |sh AS (SELECT doc_id, b,
       |    CAST(((b % $s) + $s) % $s AS INT) AS shard FROM m3),
       |coords AS (SELECT doc_id, shard,
       |    CAST(row_number() OVER (PARTITION BY shard ORDER BY b, doc_id) - 1
       |         AS BIGINT) AS pos FROM sh)
       |SELECT c.doc_id, c.shard, c.pos, md5(d.text) AS text_md5
       |FROM coords c JOIN documents d USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
