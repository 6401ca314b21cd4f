#!/bin/bash
# Round-4 CPU queue, part 2 — swapped in after trajectory-parity step 1 so the
# judge-critical items land first on the 1-core host:
#   [1] tiny-family torch re-pair at the working recipe (VERDICT #2) + ckpts
#   [2] unet/unext torch ckpts for the roundtrip gate (VERDICT #3; eelunet's
#       gate already passed in r3 on its own artifact, 30 epochs here for
#       CPU feasibility — the gate needs trained weights, not SOTA ones)
#   [3] unext_s seed-6345 full 960-step paired trajectory (VERDICT #5)
set -u
cd /root/repo
mkdir -p docs/results/h2h_r4 checkpoints/ref_torch_r4 /tmp/r4_logs

echo "=== [1/3] torch re-pair egeunet/malunet/unext_s 128^2 lr1e-3 60ep x3 seeds ==="
for fam in egeunet malunet unext_s; do
  timeout 14400 python tools/reference_accuracy_bench.py --model_type $fam \
    --image_size 128 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 60 --lr 1e-3 --seeds 7686 6716 6345 \
    --save_ckpt checkpoints/ref_torch_r4 \
    > docs/results/h2h_r4/torch_${fam}.json 2> /tmp/r4_logs/torch_${fam}.err
  echo "torch_${fam} rc=$?"
done

echo "=== [2/3] torch ckpts for roundtrip: unet/unext 64^2 lr1e-4 30ep seed 7686 ==="
for fam in unet unext; do
  timeout 14400 python tools/reference_accuracy_bench.py --model_type $fam \
    --image_size 64 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 30 --lr 1e-4 --seeds 7686 \
    --save_ckpt checkpoints/ref_torch_r4 \
    > docs/results/h2h_r4/torch_ckpt_${fam}.json 2> /tmp/r4_logs/torch_ckpt_${fam}.err
  echo "torch_ckpt_${fam} rc=$?"
done

echo "=== [3/3] unext_s seed 6345, full 60-epoch collapse recipe, paired ==="
timeout 10800 python tools/trajectory_parity.py --families unext_s --seed 6345 --steps 960 \
  > /tmp/r4_logs/traj_unext_s_6345.out 2> /tmp/r4_logs/traj_unext_s_6345.err
echo "traj_unext_s rc=$?"
echo "=== CPU queue 2 done ==="
