#!/bin/bash
# Round-4 on-chip campaign: run once the axon relay is healthy.
# Stages (each logged under /tmp/r4c_*.log):
#  1. compiled on-chip differentials for every device path that changed
#     this round (resident search incl. chain>1, drand48 scan, sw kernel)
#  2. resident-kernel config sweep (chain x pool x step_cap)
#  3. official bench with defaults
# NEVER run two TPU processes concurrently (CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fq_jax_cache
# NB: do NOT unset PALLAS_AXON_POOL_IPS at the shell level -- sitecustomize
# needs it to register the axon backend; in-python pops are fine.

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r4c_driver.log; }

log "stage 1: on-chip differentials"
FQ_TEST_PLATFORM=axon timeout 3600 python -m pytest \
    tests/test_search_pallas.py tests/test_batch_engine.py \
    tests/test_sw_pallas.py tests/test_drand48_device.py -q \
    > /tmp/r4c_diff1.log 2>&1
log "diff1 rc=$? tail: $(tail -1 /tmp/r4c_diff1.log)"

FQ_TEST_PLATFORM=axon FQ_BS_CHAIN=4 timeout 2400 python -m pytest \
    tests/test_search_pallas.py -q > /tmp/r4c_diff2.log 2>&1
log "diff2 (chain=4) rc=$? tail: $(tail -1 /tmp/r4c_diff2.log)"

log "stage 2: resident sweep"
FQ_SWEEP_READS=16384 timeout 14400 python tools/sweep_tpu.py \
    "1024,512,1,32,resident" \
    "1024,512,2,32,resident" \
    "1024,512,4,32,resident" \
    "1024,1024,4,32,resident" \
    "1024,1024,1,32,resident" \
    > /tmp/r4c_sweep.log 2>&1
log "sweep rc=$?"
cat /tmp/r4c_sweep.log | grep -v "^#" | tail -8 | tee -a /tmp/r4c_driver.log

log "stage 3: official bench"
timeout 3000 python bench.py > /tmp/r4c_bench.log 2>&1
log "bench rc=$? tail: $(tail -1 /tmp/r4c_bench.log)"
log "campaign done"
