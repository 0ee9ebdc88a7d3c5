#!/bin/bash
# DEV-ONLY: deliberately loaded bench run demonstrating the round-15
# burst gate firing (BASELINE.md "Burst gate + trend eligibility").
#
# Reproduces the round-14 driver failure mode synthetically: an
# INTERMITTENT CPU burst that lands between in-sweep canaries corrupts a
# contiguous sweep window while the median canary factor still reads
# idle. The loaded run must emit n_burst_windows > 0 and/or
# burst_disagreement > 1.3 and trend_eligible:false; a clean same-HEAD
# run alongside it stays trend_eligible:true.
#
# Usage (from the repo root; ~15 min):
#   OUT=BENCH_BURSTDEMO_loaded.json BURST_AT=480 BURST_SECS=150 dev/burst_demo.sh
#
# BURST_AT seconds from launch to the burst (default 480 ≈ mid-sweep
# after the ~6 min warm phase), BURST_SECS its length, BURST_CPUS the
# number of spin loops (default 30 — oversubscribes the 32-thread pool).
set -u
(
  sleep "${BURST_AT:-480}"
  echo "[burst_demo] firing ${BURST_CPUS:-30} spinners for ${BURST_SECS:-150}s" >&2
  for _ in $(seq 1 "${BURST_CPUS:-30}"); do
    timeout "${BURST_SECS:-150}" bash -c 'while :; do :; done' &
  done
  wait
) &
LOADER=$!
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_BENCH_OUT="${OUT:-BENCH_BURSTDEMO_loaded.json}" \
  sbt -batch "runMain graft.Bench"
kill "$LOADER" 2>/dev/null
wait "$LOADER" 2>/dev/null
exit 0
