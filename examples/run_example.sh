#!/usr/bin/env bash
# End-to-end smoke run on the reference repo's bundled example data
# (mirrors /root/reference/example/run.test.sh for this framework).
set -o errexit -o pipefail

EXAMPLE=${EXAMPLE:-/root/reference/example}
RESOURCE=${RESOURCE:-/root/reference/resource}
OUT=${OUT:-$(mktemp -d)}
REPO=$(cd "$(dirname "$0")/.." && pwd)
FQ="python -m fastquick_tpu.cli"
export PYTHONPATH="$REPO:$PYTHONPATH"

echo "== index =="
$FQ index --siteVCF "$EXAMPLE/hapmap.test.vcf.gz" \
  --dbsnpVCF "$EXAMPLE/dbsnp.test.vcf.gz" \
  --ref "$EXAMPLE/ref.test.fa" --out_prefix "$OUT/test_out_ref"

echo "== align =="
(cd "$EXAMPLE" && $FQ align --fq_list fq.test.list \
  --index_prefix "$OUT/test_out_ref" --out_prefix "$OUT/test_out")

echo "== pop+con =="
$FQ pop+con --DisableSanityCheck --BamFile "$OUT/test_out.bam" \
  --SVDPrefix "$RESOURCE/hapmap_3.3.b37.dat" \
  --Reference "$EXAMPLE/ref.test.fa" --Output "$OUT/test_out"

echo "== report =="
$FQ report --in_prefix "$OUT/test_out" \
  --SVDPrefix "$RESOURCE/hapmap_3.3.b37.dat" \
  --PopLabels "$RESOURCE/1000g.pop"

echo "All stages finished successfully. Outputs in $OUT"
