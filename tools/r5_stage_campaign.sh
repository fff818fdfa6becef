#!/bin/bash
# Round-5 stage-2: decompose the fixed per-dispatch cost D (~57% of
# wall at 16k reads) into width-precompute / consts-assembly / kernel /
# host pack+unpack / D2H, at the official 32k-read shape.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fq_jax_cache
export FQ_BS_PROF=1

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r5s_driver.log; }

log "stage-stop sweep (32k reads)"
FQ_SWEEP_READS=32768 FQ_SWEEP_REPS=2 timeout 14400 python tools/sweep_tpu.py \
    "1024,1024,1,32,resident+stopwidth" \
    "1024,1024,1,32,resident+stopconsts" \
    "1024,1024,1,32,resident" \
    > /tmp/r5s_sweep.log 2>&1
log "sweep rc=$?"
grep -E "^#? ?BS_PROF|^\{" /tmp/r5s_sweep.log | tail -30 | tee -a /tmp/r5s_driver.log
log "done"
