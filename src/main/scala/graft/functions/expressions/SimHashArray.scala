package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Scalar 64-bit SimHash over a per-document token array (Charikar 2002):
  * per bit j, sum ±1 votes from bit j of each token's hash; bit j of the
  * signature = sign of the vote. When the tokens are already an
  * `array<string>` column the whole signature is a pure narrow map — NO
  * explode (×|tokens| row blowup) and NO 64-column aggregation shuffle.
  * At 100 TB this turns the SimHash stage from the corpus's largest
  * shuffle into a scan.
  *
  * The per-token hash is EXACTLY Spark's `xxhash64(token)` (XXH64 over the
  * UTF-8 bytes, seed 42) — the same family the aggregate formulation
  * [[graft.operators.DedupOps.simhashSignatures]] uses, so the two paths
  * produce bit-identical signatures and are interchangeable (asserted in
  * DedupSpec). Votes are exact integer sums, so per-row evaluation order
  * cannot change the result. Empty arrays yield NULL (the aggregate path
  * produces no row for a token-less doc).
  */
case class SimHashArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_array"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash_array needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sz = arr.numElements()
    if (sz == 0) return null
    val votes = new Array[Int](64)
    var t = 0
    while (t < sz) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        val bytes = s.getBytes
        // seed 42 = Spark's xxhash64() default — keep bit-compatible
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
