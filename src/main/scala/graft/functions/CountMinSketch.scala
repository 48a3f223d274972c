package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Engine-portable hash for the Count-Min sketch: row i's bucket for a
  * key is the first 4 bytes (== first 8 hex digits) of
  * md5("cms" + i + ":" + key), unsigned, mod width — exactly
  * `CAST(conv(substring(md5(concat('cms', i, ':', k)), 1, 8), 16, 10) AS BIGINT) % width`
  * in Spark SQL and the same via `('0x' || substring(md5(...), 1, 8))::BIGINT`
  * in DuckDB, so a sketch built here is bit-reproducible in plain SQL
  * (which is what makes the q136 gate exact-oracle rather than rows-only).
  */
object CmsHash {
  def bucket(i: Int, key: String, width: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"cms$i:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % width).toInt
  }
}

/** Count-Min sketch as a typed `Aggregator` UDAF — the mergeable
  * heavy-hitter / frequency sketch (Cormode & Muthukrishnan 2005): a
  * depth × width counter matrix where every occurrence increments one
  * counter per row and a key's estimate is the MINIMUM of its counters —
  * never an undercount, overcount bounded by ε·N with ε = e/width at
  * confidence 1 − e^−depth. The buffer is a flat Long array, so partial
  * sketches combine by elementwise addition exactly like any partial
  * aggregate (map-side combine, one small fixed-size state per partition
  * — the 100 TB way to track frequent items without a per-key shuffle).
  * Deterministic md5 bucketing (CmsHash) keeps estimates identical across
  * reruns, partitionings, and engines.
  */
class CountMinSketchAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    if (key != null) {
      var i = 0
      while (i < depth) {
        buf(i * width + CmsHash.bucket(i, key, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
