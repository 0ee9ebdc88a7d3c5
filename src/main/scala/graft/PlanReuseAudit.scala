package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Window}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.{ReusedSubqueryExec, SparkPlan}

/** Dev audit for the multi-consumer re-execution bug class (the q_dsir /
  * q_doremi double-paid-scoring pattern): a DataFrame stage consumed by two
  * or more downstream joins/aggregates WITHOUT a barrier re-executes once
  * per consumer, because Catalyst plans each consumer's branch
  * independently. At 100 TB that silently doubles (or worse) the most
  * expensive pass of the query; at test SFs it is invisible.
  *
  * For every declared query this walks the OPTIMIZED logical plan, counts
  * canonicalized-subtree occurrences, and reports each MAXIMAL duplicated
  * subtree that contains a Join/Aggregate/Window (cheap repeated
  * filters/projections of a shared scan are not the bug class — the scan
  * is IO-bound and each branch prunes differently). For each hit it also
  * reports whether the PHYSICAL plan rescues the duplication via
  * `ReusedExchangeExec`/`ReusedSubqueryExec` — a duplicate whose exchange
  * Spark already reuses costs one extra in-memory read, not a recompute.
  *
  * A `Materialize` barrier shows up as a LogicalRDD leaf, which contains no
  * join/agg and is therefore never flagged — the barrier IS the sanctioned
  * fix for this class.
  *
  *   sbt "runMain graft.PlanReuseAudit [sfDir]"
  *
  * Verdict: flagged = logical duplicate with zero physical reuse nodes.
  * Findings and fixes are recorded in SCALE.md (round-10 audit table);
  * PlanQualitySpec pins the fixed queries.
  */
object PlanReuseAudit {

  /** The bug class: the duplicated subtree re-runs real compute, not just
    * a re-scan. */
  private def expensive(p: LogicalPlan): Boolean =
    p.exists {
      case _: Join | _: Aggregate | _: Window => true
      case _ => false
    }

  /** Maximal duplicated expensive subtrees of `plan`: walk top-down, stop
    * descending at the first node whose canonicalized form occurs >1 time
    * — children of a duplicated node are duplicated too and would only
    * re-report the same finding. Returns (occurrences, subtree) pairs,
    * one entry per distinct duplicated shape. */
  def duplicatedSubtrees(plan: LogicalPlan): Seq[(Int, LogicalPlan)] = {
    val counts = mutable.Map.empty[LogicalPlan, Int]
    // a no-op (pure-renaming) Project canonicalizes to its CHILD in
    // Spark 4, so a node can collide with its own ancestor — that is one
    // occurrence, not a duplicate. Count a node only where its canonical
    // form differs from its parent's.
    def tally(n: LogicalPlan, parentC: Option[LogicalPlan]): Unit = {
      val c = n.canonicalized
      if (!parentC.contains(c)) counts(c) = counts.getOrElse(c, 0) + 1
      n.children.foreach(tally(_, Some(c)))
    }
    tally(plan, None)
    val seen = mutable.Set.empty[LogicalPlan]
    val hits = mutable.ArrayBuffer.empty[(Int, LogicalPlan)]
    def walk(n: LogicalPlan): Unit = {
      val c = n.canonicalized
      // getOrElse(1): a node skipped by the parent-collision rule above
      // is by construction a single occurrence
      if (counts.getOrElse(c, 1) > 1 && expensive(n)) {
        if (!seen.contains(c)) { seen += c; hits += ((counts(c), n)) }
        // don't descend: children duplicate with the parent
      } else n.children.foreach(walk)
      // subquery expressions host their own plans (e.g. scalar subqueries)
      n.subqueries.foreach(walk)
    }
    walk(plan)
    hits.toSeq
  }

  /** Physical-reuse rescue count: exchanges/subqueries Spark deduplicated
    * at planning time. */
  def physicalReuse(p: SparkPlan): Int = {
    var n = 0
    p.foreach {
      case _: ReusedExchangeExec | _: ReusedSubqueryExec => n += 1
      case _ => ()
    }
    n
  }

  private def shortSig(p: LogicalPlan): String = {
    val ops = mutable.LinkedHashMap.empty[String, Int]
    p.foreach { n =>
      val k = n.nodeName
      ops(k) = ops.getOrElse(k, 0) + 1
    }
    val size = ops.values.sum
    s"top=${p.nodeName} nodes=$size [" +
      ops.toSeq.sortBy(-_._2).take(5).map { case (k, v) => s"$k:$v" }
        .mkString(" ") + "]"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // AQE OFF for the audit only: with AQE on, exchange reuse happens at
    // RUNTIME (stage cache), so the pre-execution plan never shows
    // ReusedExchangeExec and every duplicate would read as unrescued.
    // With AQE off the static ReuseExchange rule — the same
    // canonical-equality test AQE applies per stage — marks the rescued
    // duplicates at planning time.
    val spark =
      GraftSession.builder("graft-plan-reuse", "local[8]", 8)
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var rescued = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val dups = duplicatedSubtrees(df.queryExecution.optimizedPlan)
        if (dups.nonEmpty) {
          val reuse = physicalReuse(df.queryExecution.executedPlan)
          // each duplicated shape with n occurrences needs n-1 reuse nodes
          // to be fully rescued; reuse nodes for cheap (unflagged) shapes
          // can inflate the count, so a shortfall here is a REVIEW mark
          // for manual plan reading, not an automatic verdict
          val needed = dups.map(_._1 - 1).sum
          dups.foreach { case (n, sub) =>
            val tag = if (reuse >= needed) { rescued += 1; "REUSED" }
                      else { flagged += 1; "REVIEW" }
            println(s"[audit] $tag $name x$n reuseNodes=$reuse " +
              s"needed=$needed " + shortSig(sub))
          }
        }
      } catch {
        case e: Throwable =>
          println(s"[audit] ERROR $name: ${e.getMessage}")
      }
    }
    println(s"[audit] done: flagged=$flagged physically_rescued=$rescued")
    spark.stop()
  }
}
