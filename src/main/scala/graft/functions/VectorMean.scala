package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: element-wise mean of `array<double>` vectors —
  * the centroid-update step of k-means and the embedding-pooling step of
  * a feature pipeline. An `Aggregator` keeps the whole reduction
  * partial+final (map-side combine) with a single mutable buffer per
  * group — no posexplode, no per-dimension shuffle rows.
  */
object VectorMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    if (v == null) b
    else if (b._2 == 0L) (v.clone(), 1L)
    else {
      val acc = b._1
      var i = 0
      while (i < acc.length && i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0L) b
    else if (b._2 == 0L) a
    else {
      val acc = a._1
      var i = 0
      while (i < acc.length && i < b._1.length) { acc(i) += b._1(i); i += 1 }
      (acc, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.empty[Double]
    else {
      val out = new Array[Double](r._1.length)
      var i = 0
      while (i < out.length) { out(i) = r._1(i) / r._2; i += 1 }
      out
    }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
