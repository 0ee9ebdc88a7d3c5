package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Bench-honesty audit (round 14): Bench times `query.count()`, but
  * Catalyst may ELIMINATE work under a bare count — measured concretely
  * on q_semdedup, whose survivor left join against the unique-keyed dup
  * aggregate (and the 1.4e9-row pair join feeding it) vanishes from the
  * count plan: 0.9 s "benched" where the real computation pays ~14 s at
  * 100x. This main compares, for every declared query, the work-bearing
  * node counts (Join / Aggregate / Window / Generate) of the OPTIMIZED
  * plan under count() vs under the full projection, and prints every
  * query where counting erases work — the list Bench's action choice
  * must be judged against.
  *
  *   sbt "runMain graft.BenchVacuityAudit [sfDir]"
  */
object BenchVacuityAudit {
  private def workNodes(p: LogicalPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    p.foreach {
      case _: Join => counts("join") += 1
      case _: Aggregate => counts("agg") += 1
      case _: Window => counts("window") += 1
      case _: Generate => counts("generate") += 1
      case _ => ()
    }
    counts.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("graft-vacuity-audit",
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var vacuous = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = workNodes(df.queryExecution.optimizedPlan)
        val counted =
          workNodes(df.groupBy().count().queryExecution.optimizedPlan)
        val lost = full.map { case (k, v) =>
          k -> (v - counted.getOrElse(k, 0)) }.filter(_._2 > 0)
        if (lost.nonEmpty) {
          vacuous += 1
          println(s"[vacuity] $name loses " +
            lost.map { case (k, v) => s"$v $k" }.mkString(", ") +
            s" under count() (full=$full counted=$counted)")
        }
      } catch { case e: Throwable =>
        println(s"[vacuity] ERR $name ${e.getMessage}")
      }
    }
    println(s"[vacuity] $vacuous/${SparkEntry.queries.size} queries lose " +
      "work-bearing plan nodes under count()")
    spark.stop()
  }
}
