#!/bin/bash
# Round-5 TPU work queue, phase A (VERDICT r4 tasks 1 + 2): trained-weights
# roundtrip gates at production geometry (256^2 all families, 512^2 flagship)
# using the retained round-4 torch checkpoints, then multi-class convergence
# for the three remaining families. Serial: one process on the TPU tunnel.
set -u
cd /root/repo
mkdir -p docs/results/roundtrip_r5 /tmp/r5_logs

rt() {  # fam ckpt size tag
  timeout 7200 python tools/import_roundtrip.py --model_type "$1" \
    --checkpoint "$2" --image_size "$3" --n_test 32 --init_image_size 64 \
    > "docs/results/roundtrip_r5/$4.txt" 2> "/tmp/r5_logs/rt_$4.err"
  echo "roundtrip $4 rc=$?"
}

echo "=== [1/2] roundtrip gates at 256^2 (+ eelunet 512^2) (VERDICT #1) ==="
rt eelunet checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth 256 eelunet_256
rt unet    checkpoints/ref_torch_r4/unet_ref_seed7686.pth         256 unet_256
rt unext   checkpoints/ref_torch_r4/unext_ref_seed7686.pth        256 unext_256
rt unext_s checkpoints/ref_torch_r4/unext_s_ref_seed7686.pth      256 unext_s_256
rt egeunet checkpoints/ref_torch_r4/egeunet_ref_seed7686.pth      256 egeunet_256
rt malunet checkpoints/ref_torch_r4/malunet_ref_seed7686.pth      256 malunet_256
rt eelunet checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth 512 eelunet_512

echo "=== [2/2] multi-class convergence, remaining 3 families (VERDICT #2) ==="
for fam in unext_s malunet unext; do
  timeout 14400 python tools/accuracy_bench.py --model_type $fam \
    --num_classes 4 --image_size 128 --epochs 30 \
    > "docs/results/multiclass_${fam}_r5.json" 2> "/tmp/r5_logs/mc_${fam}.err"
  echo "multiclass_${fam} rc=$?"
done
echo "=== r5 TPU queue phase A done ==="
