#!/bin/bash
# Round-5 TPU work queue, phase B: mosaic roundtrips (production-geometry
# boundary regime with NON-degenerate trained predictions — plain 256^2 draws
# collapse 64^2-trained ckpts because synthetic feature scale is relative),
# the boundary-F1 implementation sweep (VERDICT #3), and the inference-lever
# A/B (VERDICT #5).
set -u
cd /root/repo
mkdir -p docs/results/roundtrip_r5 /tmp/r5_logs

rtm() {  # fam ckpt size base tag
  timeout 7200 python tools/import_roundtrip.py --model_type "$1" \
    --checkpoint "$2" --image_size "$3" --mosaic_base "$4" --n_test 32 \
    --init_image_size 64 \
    > "docs/results/roundtrip_r5/$5.txt" 2> "/tmp/r5_logs/rt_$5.err"
  echo "roundtrip $5 rc=$?"
}

echo "=== [1/3] mosaic roundtrips at production geometry ==="
rtm eelunet checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth 256 64 eelunet_256_mosaic
rtm eelunet checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth 512 64 eelunet_512_mosaic
rtm unet    checkpoints/ref_torch_r4/unet_ref_seed7686.pth         256 64 unet_256_mosaic
rtm unext   checkpoints/ref_torch_r4/unext_ref_seed7686.pth        256 64 unext_256_mosaic
rtm unext_s checkpoints/ref_torch_r4/unext_s_ref_seed7686.pth      256 128 unext_s_256_mosaic
rtm egeunet checkpoints/ref_torch_r4/egeunet_ref_seed7686.pth      256 128 egeunet_256_mosaic
rtm malunet checkpoints/ref_torch_r4/malunet_ref_seed7686.pth      256 128 malunet_256_mosaic

echo "=== [1b] re-run the two plain rows that ran before the abs-gate fix ==="
rt() {  # fam ckpt size tag  (plain draws)
  timeout 7200 python tools/import_roundtrip.py --model_type "$1" \
    --checkpoint "$2" --image_size "$3" --n_test 32 --init_image_size 64 \
    > "docs/results/roundtrip_r5/$4.txt" 2> "/tmp/r5_logs/rt_$4.err"
  echo "roundtrip $4 rc=$?"
}
rt eelunet checkpoints/ref_torch_r4_60ep/eelunet_ref_seed7686.pth 256 eelunet_256
rt unet    checkpoints/ref_torch_r4/unet_ref_seed7686.pth         256 unet_256

# boundary_f1_sweep runs separately on the scrubbed CPU backend (the
# reduce_window path is backend-agnostic XLA; keeps the tunnel free).

echo "=== [2/2] inference levers A/B (bf16-resident params, BN-fold ceiling) ==="
timeout 7200 python tools/infer_levers_ab.py \
  > docs/results/infer_levers_ab_r5.txt 2> /tmp/r5_logs/levers.err
echo "infer_levers rc=$?"
echo "=== r5 TPU queue phase B done ==="
