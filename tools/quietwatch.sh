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
  mbs=$(echo "$line" | python3 -c 'import sys,json; d=json.load(sys.stdin); print(int(d["one_thread_mbs"]))' 2>/dev/null || echo BAD)
  la=$(echo "$line" | python3 -c 'import sys,json; d=json.load(sys.stdin); print(d["loadavg"][0])' 2>/dev/null || echo BAD)
  if [ "$mbs" = "BAD" ] || [ "$la" = "BAD" ]; then
    # distinct marker for an unparseable probe line, so persistent probe
    # failure is visible in the log instead of silently burning MAXMIN
    echo "{\"probe_parse_failed\": \"$(date -u +%FT%TZ)\"}" >> "/tmp/quietwatch_${TAG}.log"
    ok=0
  else
    # values pass as argv, never string-interpolated into the expression
    ok=$(python3 -c 'import sys; m, l, t = float(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3]); print(1 if m >= t and l < 2.0 else 0)' "$mbs" "$la" "$THRESH" 2>/dev/null || echo 0)
  fi
  if [ "$ok" = "1" ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge "$WINDOW" ]; then
    echo "{\"fired\": \"$(date -u +%FT%TZ)\", \"streak\": $streak}" >> "/tmp/quietwatch_${TAG}.log"
    # probe until the batch EXITS (not a fixed 95-sample cap a slow batch
    # can outlast): loop while the sbt pid is alive
    sbt -batch "runMain graft.Scaling $NFILES 8 2 $REPS" > "/tmp/scaling_batch_${TAG}.log" 2>&1 &
    SBT_PID=$!
    ( while kill -0 "$SBT_PID" 2>/dev/null; do
        python3 tools/hostprobe.py >> "/tmp/probeloop_${TAG}.log" 2>&1
        sleep 30
      done ) &
    PROBE_PID=$!
    wait "$SBT_PID"
    rc=$?
    kill "$PROBE_PID" 2>/dev/null
    # batch exit status recorded and propagated: a crashed batch is
    # distinguishable from a successful one
    echo "{\"batch_done\": \"$(date -u +%FT%TZ)\", \"rc\": $rc}" >> "/tmp/quietwatch_${TAG}.log"
    exit "$rc"
  fi
  sleep 55
done
echo "{\"expired\": \"$(date -u +%FT%TZ)\"}" >> "/tmp/quietwatch_${TAG}.log"
exit 3
