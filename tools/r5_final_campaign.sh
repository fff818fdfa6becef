#!/bin/bash
# Round-5 final chip campaign:
#  1. compiled on-chip differentials for every device path that changed
#     this round (width kernel, compaction, packed H2D, rescue/occ
#     injection paths run CPU-side but batch engine + search kernels
#     must revalidate compiled)
#  2. official bench with defaults (paired protocol + tpu + e2e)
# NEVER run two TPU processes concurrently (CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/fq_jax_cache

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/r5f_driver.log; }

log "stage 1: on-chip compiled differentials"
FQ_TEST_PLATFORM=axon timeout 5400 python -m pytest \
    tests/test_search_pallas.py tests/test_batch_engine.py -q \
    > /tmp/r5f_diff.log 2>&1
log "diff rc=$? tail: $(tail -1 /tmp/r5f_diff.log)"

log "stage 2: official bench"
timeout 4000 python bench.py > /tmp/r5f_bench.log 2>&1
log "bench rc=$?"
grep "^{" /tmp/r5f_bench.log | tail -1 | tee -a /tmp/r5f_driver.log
log "done"
