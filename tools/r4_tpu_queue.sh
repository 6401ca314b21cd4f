#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 task 2, TPU side): the eelunet_tpu half
# of the tiny-family re-pair at the working recipe. Mostly device/compile
# bound, so it coexists with the CPU queue on the 1-core host.
set -u
cd /root/repo
mkdir -p docs/results/h2h_r4 /tmp/r4_logs

for fam in egeunet malunet unext_s; do
  timeout 10800 python tools/accuracy_bench.py --model_type $fam \
    --image_size 128 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 60 --lr 1e-3 --seeds 7686 6716 6345 \
    > docs/results/h2h_r4/tpu_${fam}.json 2> /tmp/r4_logs/tpu_${fam}.err
  echo "tpu_${fam} rc=$?"
done
echo "=== TPU queue done ==="
