package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** [[ExactPercentile]] must be BIT-IDENTICAL to Spark's own
  * `percentile()` — every assertion here compares raw doubles with ==,
  * never a tolerance. */
class ExactPercentileSpec extends SparkTestBase {

  private def sparkPercentile(df: org.apache.spark.sql.DataFrame,
      c: String, p: Double): Double =
    df.agg(expr(s"percentile($c, $p)")).collect()(0).getDouble(0)

  test("global percentiles match percentile() bitwise on lineitem") {
    val li = Tables.lineitem(spark, sf)
    val ps = Seq(0.0, 0.05, 0.5, 0.9, 0.95, 1.0)
    val got = ExactPercentile.computeGlobal(li, "l_extendedprice", ps)
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(got(i) == sparkPercentile(li, "l_extendedprice", p),
        s"p=$p: ${got(i)}")
    }
  }

  test("grouped percentiles match on the low-cardinality quantity column") {
    val li = Tables.lineitem(spark, sf)
    // l_quantity is heavily duplicated — the bracket window spans ties
    val got = ExactPercentile.compute(li, Seq("l_returnflag"),
      "l_quantity", Seq(0.5, 0.9))
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("m"),
        expr("percentile(l_quantity, 0.9)").as("p9"))
      .collect().map(r => Seq[Any](r.get(0)) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, vs) =>
      assert(vs(0) == want(k)._1 && vs(1) == want(k)._2, s"$k: ${vs.toSeq}")
    }
  }

  test("tiny and degenerate frames: n=1, n=2, all-equal, with NULLs") {
    val spark0 = spark
    import spark0.implicits._
    val cases = Seq(
      Seq(Some(5.0)),
      Seq(Some(1.0), Some(2.0)),
      Seq(Some(3.0), Some(3.0), Some(3.0), Some(3.0)),
      Seq(Some(1.5), None, Some(-2.25), Some(7.0), None),
      (1 to 101).map(i => Some((i % 7).toDouble)))
    for (vals <- cases; p <- Seq(0.0, 0.25, 0.5, 0.77, 1.0)) {
      val df = vals.toDF("x")
      val got = ExactPercentile.computeGlobal(df, "x", Seq(p))(0)
      assert(got == sparkPercentile(df, "x", p), s"vals=$vals p=$p got=$got")
    }
  }

  test("exhausted brackets fall back to [min,max] and still resolve") {
    val spark0 = spark
    import spark0.implicits._
    // accuracy 1 makes the sketch brackets useless; the [min,max]
    // fallback must still produce the exact answer
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val got = ExactPercentile.computeGlobal(df, "x", Seq(0.42), accuracy = 1)
    assert(got(0) == sparkPercentile(df, "x", 0.42))
  }
}
