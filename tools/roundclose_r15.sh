#!/bin/bash
# Round-15 close: refresh the full ladder (parity x10..x128 + tuned
# x40/x64/x128) at protocol 4, then BENCH_LOCAL at sf0.1. Sequential on
# purpose: two sbt invocations race each other on target/.
set -e
cd /root/repo

GENREV=$(cat src/main/scala/graft/tools/BenchAtScale.scala \
             src/main/scala/graft/functions/FixtureCorpora.scala \
         | sha256sum | cut -d' ' -f1)
for K in 10 20 40 64 128; do
  MARKER=/tmp/graft_sf_x$K/_SUCCESS
  if [ ! -f "$MARKER" ] || [ "$(cat "$MARKER")" != "$GENREV" ]; then
    echo "=== build x$K corpus $(date +%T)"
    rm -rf /tmp/graft_sf_x$K
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.tools.BenchAtScale $K /tmp/graft_sf_x$K" \
      > /tmp/build_x$K.log 2>&1
    echo "$GENREV" > "$MARKER"
  fi
done

for K in 10 20 40 64 128; do
  echo "=== parity bench x$K $(date +%T)"
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf_x$K SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=BENCH_x$K.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x$K.log 2>&1
  grep -o '"value":[0-9.]*' BENCH_x$K.json | head -1
done

declare -A BITS=([40]=9 [64]=10 [128]=11)
for K in 40 64 128; do
  echo "=== tuned bench x$K $(date +%T)"
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf_x$K SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=BENCH_x${K}_tuned.json \
    SPARK_GRAFT_LSH_BITS=${BITS[$K]} SPARK_GRAFT_ANN_SAMPLE_MOD=4 \
    SPARK_GRAFT_EDITDIST_SAMPLE_MOD=2 SPARK_GRAFT_CALIBRATION_SAMPLE_MOD=4 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x${K}_tuned.log 2>&1
  grep -o '"value":[0-9.]*' BENCH_x${K}_tuned.json | head -1
done

echo "=== BENCH_LOCAL refresh $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_local_r15.log 2>&1
grep -o '"value":[0-9.]*' BENCH_LOCAL.json | head -1
echo "=== done $(date +%T)"
