package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.util.sketch.BloomFilter

/** Column wrappers for sketch-backed predicates (Bloom-filter probes). */
object SketchFunctions {

  /** Serialize a built [[BloomFilter]] to the byte form
    * [[bloomMightContain]] ships to executors. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** True when `key` MIGHT be in the serialized Bloom filter (no false
    * negatives). Backed by the codegen'd
    * [[graft.functions.expressions.BloomContains]]; the filter rides as a
    * reference object, so the generated source is filter-independent. */
  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftColumnBridge.toColumn(expressions.BloomContains(
      GraftColumnBridge.toExpression(key), bloomBytes))
}
