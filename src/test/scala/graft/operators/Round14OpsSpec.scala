package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants for the round-14 batch: the r13 advisor closures
  * (order-sensitive epoch-shuffle head checksum, hillTail degenerate
  * case) plus the round's new operators as they land. Each declared
  * query is also oracle-checked in the driver's DuckDB gate; these pin
  * what a hash compare can't express (driver replays, degenerate
  * cases, bounds). */
class Round14OpsSpec extends SparkTestBase {

  test("epochShuffle: head checksum matches a driver replay and is order-sensitive") {
    val rows = CorpusOps.epochShuffle(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // driver replay: md5(seed:doc_id) keys, per-shard (k, doc_id) sort,
    // checksum = sum(rn * doc_id) over the first 8 rows of each shard
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = graft.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (md5hex(s"epoch0:$id"), id))
    val expected = keyed.groupBy(_._1.substring(0, 1)).map { case (sh, xs) =>
      val head = xs.sortBy(identity).take(8)
      sh -> head.zipWithIndex.map { case ((_, id), i) => (i + 1) * id }.sum
    }
    assert(rows == expected)
    // order sensitivity: swapping ANY two distinct head ids changes
    // sum(rn * id) (a plain id-sum would be blind to in-head swaps)
    val someShard = keyed.groupBy(_._1.substring(0, 1)).values
      .find(xs => xs.sortBy(identity).take(8).map(_._2).distinct.length >= 2)
    someShard.foreach { xs =>
      val head = xs.sortBy(identity).take(8).map(_._2)
      val i = head.indexWhere(_ != head.head)
      val swapped = head.updated(0, head(i)).updated(i, head.head)
      def ck(ids: Seq[Long]) =
        ids.zipWithIndex.map { case (id, j) => (j + 1) * id }.sum
      assert(ck(head) != ck(swapped), "checksum blind to an in-head swap")
    }
  }

  test("hillTail: corpus smaller than k+1 yields ZERO rows (degenerate guard)") {
    // k larger than any fixture corpus: the x_(k+1) frame is empty, so
    // the cross join must empty the result in Spark exactly as the
    // oracle's rn = k+1 FILTER (not max(CASE)) does in DuckDB
    val r = StatOps.hillTail(spark, sf, k = 100 * 1000 * 1000)
    assert(r.count() == 0L)
  }

  test("grubbs: argmax deviation survives BIGINT-overflow-scale products") {
    // the dev_n product rides DECIMAL(38,0): cents ~ 5.6e7 at max and
    // n ~ 1.5e11 at 100 TB posture put cents*n near Long.MAX; assert the
    // plan's dev_n column is a decimal, not a long
    val df = StatOps.grubbs(spark, sf)
    assert(df.collect().length == 1)
    val planStr = df.queryExecution.analyzed.toString
    assert(!planStr.contains("dev_n: bigint"),
      "dev_n must not be a bigint product")
  }
}
