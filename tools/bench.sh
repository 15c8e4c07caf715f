#!/usr/bin/env bash
# Run the benchmark so the compact summary JSON is the LITERAL last line
# of stdout: a bare `sbt "runMain graft.Bench"` appends its own
# "[success] Total time…" epilogue after the program's final println,
# which defeats a tail-parse of the output (BENCH_r11.json's `parsed`
# was null for exactly that reason). `sbt -error` silences sbt's own
# logging — [info] prefixes and the epilogue — while the program's
# stdout passes through untouched, so the last line IS the compact
# summary (also emitted on stderr as a second landing spot).
#
# Usage: tools/bench.sh [sf_dir] [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
export SPARK_GRAFT_CPUS="${2:-${SPARK_GRAFT_CPUS:-32}}"
exec sbt -batch -error "runMain graft.Bench"
