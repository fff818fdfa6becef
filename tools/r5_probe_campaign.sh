#!/bin/bash
# Round-5 stage-1 chip campaign: cost decomposition of the resident
# search kernel before building the structural fixes.
#  A. micro-probes: gather loop (plain/unrolled/vectorized), one-hot
#     pool passes at NP=512 and 1024, push mix, width passes
#  B. resident-kernel ablation sweep at the official config: per-iter
#     cost with gather / rank / push / shadow individually removed
# NEVER run two TPU processes concurrently (CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fq_jax_cache

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r5c_driver.log; }

log "stage A: micro-probes"
timeout 2400 python tools/probe_mosaic_perf.py 64 gather gather_unroll vgather width \
    > /tmp/r5c_probe1.log 2>&1
log "probe1 rc=$?"
grep -v WARNING /tmp/r5c_probe1.log | tee -a /tmp/r5c_driver.log

FQ_PROBE_NP=1024 timeout 1800 python tools/probe_mosaic_perf.py 64 onehot push \
    > /tmp/r5c_probe2.log 2>&1
log "probe2 (NP=1024) rc=$?"
grep -v WARNING /tmp/r5c_probe2.log | tee -a /tmp/r5c_driver.log

log "stage B: resident ablation sweep (16k reads)"
FQ_SWEEP_READS=16384 FQ_SWEEP_REPS=2 timeout 14400 python tools/sweep_tpu.py \
    "1024,1024,1,32,resident" \
    "1024,1024,1,32,resident+nogather" \
    "1024,1024,1,32,resident+nopush" \
    "1024,1024,1,32,resident+noshadow" \
    "1024,512,1,32,resident" \
    > /tmp/r5c_sweep.log 2>&1
log "sweep rc=$?"
grep -v "^#" /tmp/r5c_sweep.log | tail -8 | tee -a /tmp/r5c_driver.log
log "campaign done"
