#!/bin/bash
# Run graft.Bench captures only in quiet host windows: sample steal+load for
# 60s first; skip the attempt if the window is noisy. Keeps every capture as
# plans/r22/bench_autoN.json with a host stamp; exits after a capture whose
# whole-run steal delta is under $3 (default 3000) or after $2 attempts.
cd /root/repo
MAXTRIES=${2:-12}
GOODDELTA=${3:-3000}
for i in $(seq 1 $MAXTRIES); do
  s0=$(grep -m1 cpu /proc/stat | awk '{print $9}')
  sleep 60
  s1=$(grep -m1 cpu /proc/stat | awk '{print $9}')
  d=$((s1-s0)); l=$(cut -d' ' -f1 /proc/loadavg)
  echo "[quietbench] probe $i: steal/60s=$d load=$l"
  if [ "$d" -gt 400 ] || [ "${l%.*}" -ge 2 ]; then sleep 120; continue; fi
  b0=$(grep -m1 cpu /proc/stat | awk '{print $9}')
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=/root/repo/plans/r22/bench_auto$i.json \
    sbt -batch 'runMain graft.Bench' > /tmp/bench_auto$i.log 2>&1
  b1=$(grep -m1 cpu /proc/stat | awk '{print $9}')
  db=$((b1-b0))
  echo "{\"attempt\":$i,\"steal_delta\":$db}" > /root/repo/plans/r22/bench_auto$i.host.json
  echo "[quietbench] capture $i done: run steal delta=$db"
  if [ "$db" -lt "$GOODDELTA" ]; then echo "[quietbench] good capture: $i"; exit 0; fi
done
echo "[quietbench] no quiet window found"
