package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * K-minimum-values (KMV) distinct-count sketch — the sketch alternative
 * to `count(DISTINCT x)` for 100 TB aggregations: a single pass with
 * O(k) state per group, partial-aggregated map-side, merged by unioning
 * k-min sets; only k 8-byte hashes per partition cross the shuffle,
 * where exact distinct must shuffle every distinct value.
 *
 * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
 * stream", RANDOM'02): with h_k the k-th smallest distinct hash on a
 * [0, 2^60) scale, est = (k-1) * 2^60 / h_k; below k distinct values the
 * sketch is exact.
 *
 * Unlike engine-private HLL sketches (`approx_count_distinct`), every
 * term here is portable: hashes are [[TextStats.hash60]], (k-1)*2^60 is
 * an exactly-representable double, and the rounding is half-up — so any
 * SQL engine reproduces the estimate BIT-FOR-BIT (the `x_sketch_distinct`
 * DuckDB oracle does, via a row_number window).
 */
object Sketch {

  val Two60: Double = 1152921504606846976.0 // 2^60, exact as a double

  /** Aggregator over 60-bit hash values; buffer = the sorted distinct
    * k-min set. Use via `functions.udaf(KMV(k), Encoders.LONG)` on a
    * hash column. Input is BOXED so a NULL hash is skipped like
    * `count(DISTINCT x)` skips NULLs — a primitive Long input would
    * decode NULL as 0 and insert a phantom minimum hash. */
  case class KMV(k: Int) extends Aggregator[java.lang.Long, Array[Long], Long] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) buf else insert(buf, h.longValue())

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(insert)

    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else Math.floor((k - 1).toDouble * Two60 / buf.last + 0.5).toLong

    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf                            // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {                      // displaces the current max
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong

    /** The udaf-wrapped column function with the boxed input encoder. */
    def toUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
      org.apache.spark.sql.functions.udaf(this, Encoders.LONG)
  }
}
