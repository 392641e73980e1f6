#!/bin/bash
# Sequential regeneration of the scale artifacts for the current query
# set. sbt -batch prefixes the forked program's stdout with "[info] ",
# so JSON lines are extracted by stripping that prefix — a bare
# grep '^{' captures nothing.
set -u
cd /root/repo
log() { echo "[artifacts $(date +%H:%M:%S)] $*"; }
extract_json() { sed -n 's/^\[info\] \({.*}\)$/\1/p'; }

if [ "${SKIP_SPILL:-0}" != "1" ]; then
  log "spill rehearsal (512 MB cap, full suite)"
  sbt -batch "runMain graft.SpillRehearsal" > /tmp/spill_stdout.txt 2>&1
  tail -1 SWEEP_SPILL.json | cut -c1-200
fi

log "uniform 10x sweep"
sbt -batch "runMain graft.ScaleSweep" 2>&1 | tee /tmp/sweep_raw.txt | extract_json > /tmp/SWEEP.json.tmp
[ -s /tmp/SWEEP.json.tmp ] && mv /tmp/SWEEP.json.tmp SWEEP.json
tail -1 SWEEP.json

log "skew 10x sweep"
sbt -batch "runMain graft.ScaleSweep --skew" 2>&1 | tee /tmp/sweep_skew_raw.txt | extract_json > /tmp/SWEEP_SKEW.json.tmp
[ -s /tmp/SWEEP_SKEW.json.tmp ] && mv /tmp/SWEEP_SKEW.json.tmp SWEEP_SKEW.json
tail -1 SWEEP_SKEW.json

log "3-point curvature"
sbt -batch "runMain graft.SweepCurve" > /tmp/curve_raw.txt 2>&1
tail -1 SWEEP_CURVE.json

log "BPE depth at 4096 merges"
sbt -batch "runMain graft.BpeDepth 4096 8" 2>&1 | tee /tmp/bpe_raw.txt | extract_json > /tmp/SWEEP_BPE.json.tmp
[ -s /tmp/SWEEP_BPE.json.tmp ] && mv /tmp/SWEEP_BPE.json.tmp SWEEP_BPE.json
tail -1 SWEEP_BPE.json

log "bench pass 1 (quiet)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/bench1_raw.txt | extract_json > /tmp/bench1.json
grep -o '"calibration":{[^}]*}' /tmp/bench1.json | head -1
grep -o '"value":[0-9.]*' /tmp/bench1.json | head -1

log "bench pass 2 (quiet)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/bench2_raw.txt | extract_json > /tmp/bench2.json
grep -o '"calibration":{[^}]*}' /tmp/bench2.json | head -1
grep -o '"value":[0-9.]*' /tmp/bench2.json | head -1

log "done"
