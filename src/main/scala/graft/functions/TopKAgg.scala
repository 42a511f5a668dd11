package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator (the
  * `Aggregator[IN, BUF, OUT]` custom-function surface): the buffer
  * holds at most k (value, id) entries, partial-aggregated map-side —
  * each task ships k rows per group, like WindowGroupLimit but with no
  * sort/window machinery at all. For tiny k over huge groups this is
  * the cheapest per-group top-k shape Spark can execute.
  *
  * Ordering: value DESC, id ASC — ids at the k boundary with fully
  * identical (value, id) are interchangeable, so output is
  * deterministic. `finish` emits the ids joined by ',' in rank order
  * (engine-checkable as a string).
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(String, Long, Double), TopKAgg.Buf, String] {

  import TopKAgg.Buf

  private def better(v1: Double, i1: Long, v2: Double, i2: Long): Boolean =
    v1 > v2 || (v1 == v2 && i1 < i2)

  private def merged(a: Buf, b: Buf): Buf = {
    val n = a.ids.length + b.ids.length
    val vs = new Array[Double](n)
    val is = new Array[Long](n)
    var ai = 0; var bi = 0; var o = 0
    while (o < n) {
      val takeA = bi >= b.ids.length ||
        (ai < a.ids.length && better(a.vals(ai), a.ids(ai), b.vals(bi), b.ids(bi)))
      if (takeA) { vs(o) = a.vals(ai); is(o) = a.ids(ai); ai += 1 }
      else { vs(o) = b.vals(bi); is(o) = b.ids(bi); bi += 1 }
      o += 1
    }
    Buf(vs.take(k), is.take(k))
  }

  def zero: Buf = Buf(Array.empty, Array.empty)

  def reduce(buf: Buf, row: (String, Long, Double)): Buf =
    // fast path: a full buffer whose worst entry beats the row — the
    // overwhelmingly common case on huge groups — allocates nothing
    if (buf.ids.length >= k &&
        !better(row._3, row._2, buf.vals(k - 1), buf.ids(k - 1))) buf
    else merged(buf, Buf(Array(row._3), Array(row._2)))

  def merge(a: Buf, b: Buf): Buf = merged(a, b)

  def finish(buf: Buf): String = buf.ids.mkString(",")

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopKAgg {
  /** Rank-ordered buffer: parallel arrays, invariantly sorted by
    * (value desc, id asc) and at most k long.
    */
  final case class Buf(vals: Array[Double], ids: Array[Long])
}
