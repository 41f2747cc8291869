package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook: registers the whole graft SQL function
  * surface at session build time —
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * gives every session (including pure-SQL users over Thrift/Connect)
  * `cosine_similarity`, `vec_*`, `simhash64`, `minhash_signature`,
  * `embed_text`, `chunk_text`, `lang_id`, `ts_vector` without Scala code.
  * (`spark.sql.extensions` is a static conf — it must be set before the
  * SparkContext starts; on a live session use
  * `VecFunctions.registerAll(spark)` instead, same registration table.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    SqlRegistrations.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
