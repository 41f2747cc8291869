package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** k-nearest-neighbour estimator (orm/algorithm.rs:16 — sklearn's
  * KNeighborsClassifier/Regressor): the "model" IS the training set, as
  * in sklearn. Serving broadcasts the stored points into the transform
  * closure and scores per row against all of them — the model-boundary
  * UDF class every MLlib-Vector head uses. Deterministic contract (what
  * the m13 oracle replays): neighbours rank by (squared L2 distance asc,
  * stored-row index asc); classification votes by (count desc, label
  * asc) — sklearn's mode() also takes the smallest tied label;
  * regression averages the k neighbour labels in neighbour-rank order.
  *
  * Scale: the stored design matrix is the sklearn residency class — fine
  * for the tune/predict relations this lifecycle serves. A corpus-scale
  * nearest-neighbour query belongs to the ANN index families
  * (VectorSearch / IvfIndex / HnswIndex), which share the same distance
  * kernels; this head is the predict()-lifecycle wrapper, not the
  * retrieval path. */
class KnnModel(
    override val uid: String,
    val points: Array[Array[Double]],
    val labels: Array[Double],
    val k: Int,
    val classification: Boolean) extends Transformer with MLWritable {

  def this(points: Array[Array[Double]], labels: Array[Double], k: Int,
      classification: Boolean) =
    this(Identifiable.randomUID("knn"), points, labels, k, classification)

  require(points.length == labels.length, "points/labels length mismatch")
  require(points.nonEmpty, "knn needs at least one training point")

  /** (squared-distance asc, index asc) top-k neighbour indices. */
  private def neighbours(v: Vector): Array[Int] = {
    val kk = math.min(k, points.length)
    // (dsq, idx) selection sort over a k-slot buffer: points are scanned
    // in stored order, so equal distances keep the lower index
    val bestIdx = new Array[Int](kk)
    val bestD = new Array[Double](kk)
    var filled = 0
    var i = 0
    while (i < points.length) {
      val p = points(i)
      var dsq = 0.0
      var j = 0
      while (j < p.length) { val df = v(j) - p(j); dsq += df * df; j += 1 }
      if (filled < kk) {
        // insert into the sorted prefix
        var pos = filled
        while (pos > 0 && bestD(pos - 1) > dsq) {
          bestD(pos) = bestD(pos - 1); bestIdx(pos) = bestIdx(pos - 1); pos -= 1
        }
        bestD(pos) = dsq; bestIdx(pos) = i; filled += 1
      } else if (dsq < bestD(kk - 1)) { // strict <: ties keep the earlier index
        var pos = kk - 1
        while (pos > 0 && bestD(pos - 1) > dsq) {
          bestD(pos) = bestD(pos - 1); bestIdx(pos) = bestIdx(pos - 1); pos -= 1
        }
        bestD(pos) = dsq; bestIdx(pos) = i
      }
      i += 1
    }
    bestIdx.take(filled)
  }

  def predictOne(v: Vector): Double = {
    val nb = neighbours(v)
    if (classification) {
      // vote: count desc, then SMALLEST label (sklearn mode semantics)
      val counts = scala.collection.mutable.Map.empty[Double, Int]
      nb.foreach(i => counts(labels(i)) = counts.getOrElse(labels(i), 0) + 1)
      counts.toSeq.minBy { case (label, c) => (-c, label) }._1
    } else {
      // mean in neighbour-rank order (deterministic left fold)
      var s = 0.0
      nb.foreach(i => s += labels(i))
      s / nb.length
    }
  }

  override def transform(df: Dataset[_]): DataFrame = {
    val predUdf = udf { (v: Vector) => predictOne(v) }
    df.withColumn("prediction", predUdf(col("features")))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", DoubleType, nullable = false))

  override def copy(extra: ParamMap): KnnModel =
    new KnnModel(uid, points.map(_.clone()), labels.clone(), k, classification)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      implicit val fmts: Formats = DefaultFormats
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$path/knn.json"),
        Serialization.write(Map(
          "uid" -> uid,
          "points" -> points.map(_.toSeq).toSeq,
          "labels" -> labels.toSeq,
          "k" -> k,
          "classification" -> classification)))
    }
  }
}

object KnnModel extends MLReadable[KnnModel] {

  /** Collect the training relation in FEATURE-FRAME ORDER — the stored
    * index IS the tie-break, so the order must be deterministic: rows
    * sort by (label, features lexicographic) before storing. */
  def fit(train: DataFrame, featuresCol: String, labelCol: String,
      k: Int, classification: Boolean): KnnModel = {
    val rows = train.select(col(featuresCol), col(labelCol).cast("double"))
      .collect()
      .map(r => (r.getAs[Vector](0).toArray, r.getDouble(1)))
      .sortBy { case (p, y) => (y, p.toIndexedSeq) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering,
          Ordering.Implicits.seqOrdering[IndexedSeq, Double](
            Ordering.Double.TotalOrdering)))
    new KnnModel(rows.map(_._1), rows.map(_._2), k, classification)
  }

  override def read: MLReader[KnnModel] = new MLReader[KnnModel] {
    override def load(path: String): KnnModel = {
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$path/knn.json")))
      new KnnModel(
        (j \ "uid").extract[String],
        (j \ "points").extract[Seq[Seq[Double]]].map(_.toArray).toArray,
        (j \ "labels").extract[Seq[Double]].toArray,
        (j \ "k").extract[Int],
        (j \ "classification").extract[Boolean])
    }
  }
}
