package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Scalar 60-bit SimHash over a per-document token array (Charikar 2002):
  * per bit j, sum ±1 votes from bit j of each token's hash; bit j of the
  * signature = sign of the vote. When the tokens are already an
  * `array<string>` column the whole signature is a pure narrow map — NO
  * explode (×|tokens| row blowup) and NO per-bit aggregation shuffle.
  * At 100 TB this turns the SimHash stage from the corpus's largest
  * shuffle into a scan.
  *
  * The per-token hash is the engine-portable md5-60 of
  * [[MinHashFamily.hash60]] (first 15 hex chars of `md5(token)` as an
  * unsigned integer — DuckDB: `CAST(('0x' || substr(md5(tok), 1, 15)) AS
  * BIGINT)`), so the whole signature — and the Hamming-band dedup built
  * on it — has an exact DuckDB oracle twin. 60 bits (not 64) because 15
  * hex nibbles is the widest md5 prefix that stays a non-negative BIGINT
  * in every engine; the Manku-style 4-band pigeonhole argument carries
  * unchanged with 15-bit bands. The aggregate formulation
  * [[graft.operators.DedupOps.simhashSignatures]] uses the same hash, so
  * the two paths produce bit-identical signatures and are interchangeable
  * (asserted in DedupSpec). Votes are exact integer sums, so per-row
  * evaluation order cannot change the result. Empty arrays yield NULL
  * (the aggregate path produces no row for a token-less doc).
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
    val votes = new Array[Int](SimHashArray.Bits)
    var t = 0
    while (t < sz) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        val h = MinHashFamily.hash60(null, s.getBytes)
        var j = 0
        while (j < SimHashArray.Bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < SimHashArray.Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashArray {
  /** Signature width: 60 = the md5-prefix width that fits a signed 64-bit
    * integer unsigned in both Spark and DuckDB. */
  val Bits: Int = 60
}
