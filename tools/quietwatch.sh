#!/bin/bash
# Arm-and-fire for a scaling batch: sample the host-noise probe once a
# minute and launch `graft.Scaling` only after WINDOW consecutive quiet
# samples (single-thread memcpy >= THRESH MB/s and 1-min loadavg < 2.0).
# Single-point pre-stamps have twice fired into windows that collapsed
# within minutes (batches t, u); requiring a HELD quiet run-up selects
# against the choppy co-tenant regime before committing 40 minutes.
#
# Usage: quietwatch.sh <tag> [maxWatchMin] [nFiles] [reps]
# Fires at most once, then exits. Logs: /tmp/quietwatch_<tag>.log,
# probe loop -> /tmp/probeloop_<tag>.log, batch -> /tmp/scaling_batch_<tag>.log
set -u
TAG="${1:?tag}"
MAXMIN="${2:-150}"
NFILES="${3:-432000}"
REPS="${4:-3}"
THRESH=1300
WINDOW=8
cd /root/repo
streak=0
for i in $(seq 1 "$MAXMIN"); do
  line=$(python3 tools/hostprobe.py 2>/dev/null)
  echo "$line" >> "/tmp/quietwatch_${TAG}.log"
  mbs=$(echo "$line" | python3 -c 'import sys,json; d=json.load(sys.stdin); print(int(d["one_thread_mbs"]))' 2>/dev/null || echo 0)
  la=$(echo "$line" | python3 -c 'import sys,json; d=json.load(sys.stdin); print(d["loadavg"][0])' 2>/dev/null || echo 99)
  ok=$(python3 -c "print(1 if $mbs >= $THRESH and $la < 2.0 else 0)")
  if [ "$ok" = "1" ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge "$WINDOW" ]; then
    echo "{\"fired\": \"$(date -u +%FT%TZ)\", \"streak\": $streak}" >> "/tmp/quietwatch_${TAG}.log"
    ( for j in $(seq 1 95); do python3 tools/hostprobe.py >> "/tmp/probeloop_${TAG}.log" 2>&1; sleep 30; done ) &
    PROBE_PID=$!
    sbt -batch "runMain graft.Scaling $NFILES 8 2 $REPS" > "/tmp/scaling_batch_${TAG}.log" 2>&1
    kill "$PROBE_PID" 2>/dev/null
    echo "{\"batch_done\": \"$(date -u +%FT%TZ)\"}" >> "/tmp/quietwatch_${TAG}.log"
    exit 0
  fi
  sleep 55
done
echo "{\"expired\": \"$(date -u +%FT%TZ)\"}" >> "/tmp/quietwatch_${TAG}.log"
exit 3
