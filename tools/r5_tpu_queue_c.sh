#!/bin/bash
# Round-5 TPU work queue, phase C: NON-degenerate flagship parity at
# production geometry via the reverse (export) roundtrip — train on TPU at
# 256^2/512^2, export to torch, reference evaluate() vs cli.evaluate on
# identical pixels. The forward roundtrip cannot reach this regime for
# eelunet (64^2-trained ckpts collapse at 256^2+; the high-pass mask_range
# is resolution-dependent by design, faithfully to the reference).
set -u
cd /root/repo
mkdir -p docs/results/roundtrip_r5 /tmp/r5_logs

for size in 256 512; do
  timeout 10800 python tools/export_roundtrip.py --model_type eelunet \
    --image_size $size --epochs 30 \
    > "docs/results/roundtrip_r5/eelunet_${size}_export.txt" \
    2> "/tmp/r5_logs/ert_eelunet_${size}.err"
  echo "export_roundtrip eelunet_${size} rc=$?"
done

# control: one tiny family through the same reverse path (different rule
# kinds: bn + shift-MLP)
timeout 7200 python tools/export_roundtrip.py --model_type unext_s \
  --image_size 256 --epochs 30 \
  > docs/results/roundtrip_r5/unext_s_256_export.txt \
  2> /tmp/r5_logs/ert_unext_s_256.err
echo "export_roundtrip unext_s_256 rc=$?"
echo "=== r5 TPU queue phase C done ==="
