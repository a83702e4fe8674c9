#!/bin/bash
# Engine-side 10x correctness for the sf1-gate-excluded quadratic-twin set
# (x67/x76/x79/x83/x108+x109): their DuckDB oracles are the quadratic side
# at 10x, so Sf1InvariantsSpec checks the ENGINE output at sf1 against
# independently-known structure (ScaleUp's planted verbatim clone groups,
# raw-text jaccard rechecks, an alternative triangle enumeration, the
# cross-plan sweep identity, IVF-vs-brute agreement).
# Usage: tools/sf1_invariants.sh [sf1dir]   (default /root/repo/localdata/sf1;
# regenerate first with: sbt 'runMain graft.tools.ScaleUp /root/testdata/sf0.1
# /root/repo/localdata/sf1 10')
set -e
SF1=${1:-/root/repo/localdata/sf1}
if [ ! -e "$SF1/documents.parquet" ]; then
  echo "sf1 fixtures missing at $SF1 — run graft.tools.ScaleUp first" >&2
  exit 2
fi
cd "$(dirname "$0")/.."
SPARK_GRAFT_SF1_DIR="$SF1" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g} \
  exec sbt -batch 'testOnly graft.Sf1InvariantsSpec'
