#!/bin/bash
# Round-4 CPU work queue (VERDICT r3 tasks 1, 2, 3, 5): runs sequentially so
# the single core is never oversubscribed. Artifacts land in docs/results/.
set -u
cd /root/repo
mkdir -p docs/results/h2h_r4 checkpoints/ref_torch_r4 /tmp/r4_logs

echo "=== [1/4] trajectory parity, all 6 families, 256 steps (VERDICT #1) ==="
timeout 14400 python tools/trajectory_parity.py --families all --steps 256 \
  > /tmp/r4_logs/traj_all.out 2> /tmp/r4_logs/traj_all.err
echo "traj_all rc=$?"

echo "=== [2/4] trajectory parity, unext_s seed 6345, full 960-step collapse recipe (VERDICT #5) ==="
timeout 7200 python tools/trajectory_parity.py --families unext_s --seed 6345 --steps 960 \
  > /tmp/r4_logs/traj_unext_s_6345.out 2> /tmp/r4_logs/traj_unext_s_6345.err
echo "traj_unext_s rc=$?"

echo "=== [3/4] torch re-pair at the working recipe: egeunet/malunet/unext_s 128^2 lr1e-3 60ep x3 seeds (VERDICT #2), ckpts retained (VERDICT #3) ==="
for fam in egeunet malunet unext_s; do
  timeout 14400 python tools/reference_accuracy_bench.py --model_type $fam \
    --image_size 128 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 60 --lr 1e-3 --seeds 7686 6716 6345 \
    --save_ckpt checkpoints/ref_torch_r4 \
    > docs/results/h2h_r4/torch_${fam}.json 2> /tmp/r4_logs/torch_${fam}.err
  echo "torch_${fam} rc=$?"
done

echo "=== [4/4] short torch trains for roundtrip ckpts: eelunet/unet/unext 64^2 lr1e-4 60ep seed 7686 (VERDICT #3) ==="
for fam in eelunet unet unext; do
  timeout 14400 python tools/reference_accuracy_bench.py --model_type $fam \
    --image_size 64 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 60 --lr 1e-4 --seeds 7686 \
    --save_ckpt checkpoints/ref_torch_r4 \
    > docs/results/h2h_r4/torch_ckpt_${fam}.json 2> /tmp/r4_logs/torch_ckpt_${fam}.err
  echo "torch_ckpt_${fam} rc=$?"
done
echo "=== CPU queue done ==="
