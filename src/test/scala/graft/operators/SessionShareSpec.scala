package graft.operators

import graft.{SparkTestBase, Tables}

/** Round-15 session-sharing contract for the ANN index artifacts
  * (IvfOps.trainIndexShared / PqOps.buildIndex): sharing must be
  * result-invisible, actually shared within a session, and dropped by
  * [[SessionCache.clearAll]] (the lost-localCheckpoint retry contract). */
class SessionShareSpec extends SparkTestBase {

  test("shared-trainer semDedupQuery is row-identical to the ad-hoc trainer") {
    val shared = DedupOps.semDedupQuery(spark, sf).collect().toSeq
    val adhoc = DedupOps.semDedup(Tables.embeddings(spark, sf)).collect().toSeq
    assert(shared == adhoc)
  }

  test("buildIndex returns the SAME index instance within a session, a new one after clearAll") {
    val a = PqOps.buildIndex(spark, sf)
    val b = PqOps.buildIndex(spark, sf)
    assert(a eq b, "second build must be the session-cached instance")
    SessionCache.clearAll()
    val c = PqOps.buildIndex(spark, sf)
    assert(!(a eq c), "clearAll must drop the cached index")
    // and the rebuilt index is content-identical (deterministic training)
    assert(a.model.map(_.map(_.toSeq).toSeq).toSeq
      == c.model.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("trainIndexShared dials never alias: k=16 and k=8 models differ") {
    val m16 = IvfOps.trainIndexShared(spark, sf)._1.collect().length
    val m8 = IvfOps.trainIndexShared(spark, sf, k = 8)._1.collect().length
    assert(m16 == 16 && m8 == 8)
  }
}
