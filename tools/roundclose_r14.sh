#!/bin/bash
# Round-14 close driver: sf0.01 correctness first (the gate), then the
# full ladder refresh (corpora reused under the content-hash marker —
# the generator is unchanged this round — with every rung re-stamped at
# measurement protocol 2: per-settle load/GC self-attribution), then
# sf0.1 correctness. Sequential — sbt invocations must never race on
# target/.
set -e
cd /root/repo

echo "=== verify sf0.01 $(date +%T)"
rm -rf /tmp/verify_r14_sf001
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r14_sf001" \
  > /tmp/verify_r14_sf001.log 2>&1
python3 tools/parity.py /root/testdata/sf0.01 /tmp/verify_r14_sf001 \
  > /tmp/parity_r14_sf001.log 2>&1
tail -1 /tmp/parity_r14_sf001.log

echo "=== ladder refresh $(date +%T)"
bash tools/ladder_refresh.sh

echo "=== verify sf0.1 $(date +%T)"
rm -rf /tmp/verify_r14_sf01
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_r14_sf01" \
  > /tmp/verify_r14_sf01.log 2>&1
python3 tools/parity.py /root/testdata/sf0.1 /tmp/verify_r14_sf01 \
  > /tmp/parity_r14_sf01.log 2>&1
tail -1 /tmp/parity_r14_sf01.log

echo "=== round-close driver done $(date +%T)"
