#!/bin/bash
# Sequential regeneration of every scale artifact for the current
# query set. Run from /root/repo; takes ~2.5 h. Order: the spill
# rehearsal first (this round's acceptance gate — leaves time to react
# if it fails), then the sweeps, then the depth artifact, then two
# quiet bench recordings.
set -u
cd /root/repo
log() { echo "[artifacts $(date +%H:%M:%S)] $*"; }

log "spill rehearsal (768 MB cap, full suite)"
sbt -batch "runMain graft.SpillRehearsal" > /tmp/spill_stdout.txt 2>/tmp/spill_stderr.txt
tail -2 SWEEP_SPILL.json

log "uniform 10x sweep"
sbt -batch "runMain graft.ScaleSweep" 2>/tmp/sweep_stderr.txt | grep '^{' > SWEEP.json
tail -1 SWEEP.json

log "skew 10x sweep"
sbt -batch "runMain graft.ScaleSweep --skew" 2>/tmp/sweep_skew_stderr.txt | grep '^{' > SWEEP_SKEW.json
tail -1 SWEEP_SKEW.json

log "3-point curvature"
sbt -batch "runMain graft.SweepCurve" > /tmp/curve_stdout.txt 2>/tmp/curve_stderr.txt
tail -1 SWEEP_CURVE.json

log "BPE depth at 1024 merges"
sbt -batch "runMain graft.BpeDepth 1024 8" 2>/tmp/bpe_stderr.txt | grep '^{' > SWEEP_BPE.json
tail -1 SWEEP_BPE.json

log "bench pass 1 (quiet)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/tmp/bench1_stderr.txt | grep '^{' > /tmp/bench1.json
cat /tmp/bench1.json | head -c 300

log "bench pass 2 (quiet)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/tmp/bench2_stderr.txt | grep '^{' > /tmp/bench2.json
cat /tmp/bench2.json | head -c 300

log "done"
