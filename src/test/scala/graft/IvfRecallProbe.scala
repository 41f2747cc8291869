package graft

import org.apache.spark.sql.functions.col

import graft.operators.{IvfIndex, VectorSearch}

/** One-off probe: measured recall@10 of IVF at nprobe=4/nlist=16 over the
  * sf0.01 embeddings, averaged over query vectors — sets the honest bound
  * for the IvfSpec recall gate. Run: sbt "Test/runMain graft.IvfRecallProbe"
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.session
    import spark.implicits._
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings").cache()
    val queries = emb.where(col("vec_id") % 50 === 7)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().take(20)
    for (na <- Seq(3)) {
      val idx = IvfIndex.build(spark, emb, "embedding", nlist = 16, nassign = na)
      val recalls = queries.map { case (qid, q) =>
        val exact = VectorSearch.topK(emb, "embedding", q, 10, Seq("vec_id"))
          .select("vec_id").as[Long].collect().toSet
        val approx = idx.search(q, 10, nprobe = 4, Seq("vec_id"))
          .select("vec_id").as[Long].collect().toSet
        approx.intersect(exact).size / 10.0
      }
      println(f"nassign=$na MEAN RECALL: ${recalls.sum / recalls.length}%.3f  MIN: ${recalls.min}%.2f")
      idx.data.unpersist()
    }
    spark.stop()
  }
}
