#!/usr/bin/env bash
# Multi-host-style sharded run: N independent align shards + merge.
# Each shard command can run on a different host against a shared or
# copied index; the merge combines the accumulator states.
set -o errexit -o pipefail

INDEX=$1          # index prefix (from `fastquick index`)
OUT=$2            # output prefix for merged stats
shift 2           # remaining args: fq1a fq2a fq1b fq2b ...
REPO=$(cd "$(dirname "$0")/.." && pwd)
FQ="python -m fastquick_tpu.cli"
export PYTHONPATH="$REPO:$PYTHONPATH"

i=0
shards=()
while [ $# -ge 2 ]; do
  $FQ align --fastq_1 "$1" --fastq_2 "$2" \
    --index_prefix "$INDEX" --out_prefix "${OUT}.shard$i" --shard_out
  shards+=("${OUT}.shard$i")
  shift 2; i=$((i+1))
done

$FQ merge --index_prefix "$INDEX" --out_prefix "$OUT" "${shards[@]}"
echo "Merged $i shards into $OUT"
