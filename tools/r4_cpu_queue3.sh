#!/bin/bash
# Round-4 CPU queue, revision 2 — re-planned after measuring real step costs
# on the 1-core host (jax CPU eelunet ~11 s/step made the original ordering
# overrun the round). Cheap, judge-critical items first.
#   [1] trajectory parity for the four tiny families @256 steps (VERDICT #1)
#   [2] torch re-pair egeunet/malunet/unext_s at the working recipe
#       (VERDICT #2) + retained ckpts (VERDICT #3)
#   [3] unet trajectory @128 steps (inside the judge's 50-200 band; 256 would
#       cost ~2h on this host for no extra semantics — StepLR crossing is
#       already exercised by eelunet@256)
#   [4] unet/unext torch ckpts for the roundtrip gate (VERDICT #3)
#   [5] unext_s seed-6345 paired run @480 steps = 30 epochs, crossing the
#       StepLR(30) boundary on that seed's exact data order (VERDICT #5)
set -u
cd /root/repo
mkdir -p docs/results/h2h_r4 checkpoints/ref_torch_r4 /tmp/r4_logs

echo "=== [1/5] trajectory parity: unext unext_s egeunet malunet @256 ==="
timeout 14400 python tools/trajectory_parity.py \
  --families unext unext_s egeunet malunet --steps 256 \
  > /tmp/r4_logs/traj_tiny.out 2> /tmp/r4_logs/traj_tiny.err
echo "traj_tiny rc=$?"

echo "=== [2/5] torch re-pair egeunet/malunet/unext_s 128^2 lr1e-3 60ep x3 seeds ==="
for fam in egeunet malunet unext_s; do
  timeout 14400 python tools/reference_accuracy_bench.py --model_type $fam \
    --image_size 128 --n_train 128 --n_test 32 --batch_size 8 \
    --epochs 60 --lr 1e-3 --seeds 7686 6716 6345 \
    --save_ckpt checkpoints/ref_torch_r4 \
    > docs/results/h2h_r4/torch_${fam}.json 2> /tmp/r4_logs/torch_${fam}.err
  echo "torch_${fam} rc=$?"
done

echo "=== [3/5] trajectory parity: unet @128 ==="
timeout 10800 python tools/trajectory_parity.py --families unet --steps 128 \
  > /tmp/r4_logs/traj_unet.out 2> /tmp/r4_logs/traj_unet.err
echo "traj_unet rc=$?"

echo "=== [4/5] torch ckpts for roundtrip: unet 64^2 lr1e-4 20ep, unext 30ep, seed 7686 ==="
timeout 10800 python tools/reference_accuracy_bench.py --model_type unet \
  --image_size 64 --n_train 128 --n_test 32 --batch_size 8 \
  --epochs 20 --lr 1e-4 --seeds 7686 --save_ckpt checkpoints/ref_torch_r4 \
  > docs/results/h2h_r4/torch_ckpt_unet.json 2> /tmp/r4_logs/torch_ckpt_unet.err
echo "torch_ckpt_unet rc=$?"
timeout 10800 python tools/reference_accuracy_bench.py --model_type unext \
  --image_size 64 --n_train 128 --n_test 32 --batch_size 8 \
  --epochs 30 --lr 1e-4 --seeds 7686 --save_ckpt checkpoints/ref_torch_r4 \
  > docs/results/h2h_r4/torch_ckpt_unext.json 2> /tmp/r4_logs/torch_ckpt_unext.err
echo "torch_ckpt_unext rc=$?"

echo "=== [5/5] unext_s seed 6345 paired @480 (collapse recipe, first 30 epochs) ==="
timeout 10800 python tools/trajectory_parity.py --families unext_s --seed 6345 --steps 480 \
  > /tmp/r4_logs/traj_unext_s_6345.out 2> /tmp/r4_logs/traj_unext_s_6345.err
echo "traj_unext_s rc=$?"
echo "=== CPU queue 3 done ==="
