"""Train the REFERENCE PyTorch models on the hard synthetic task.

Head-to-head accuracy evidence for the north star ("Dice/IoU within 0.5% of
the PyTorch reference"): this harness trains the reference implementation
(/root/reference, imported read-only via tests/reference_loader.py) on the
SAME hard-synthetic samples tools/accuracy_bench.py feeds eelunet_tpu, with
the reference's own training protocol —

  - criterion  edge_BceDiceLoss(wb=1, wd=1)         train.py:305
  - optimizer  Adam(lr, weight_decay=1e-5)          train.py:312
  - scheduler  StepLR(step_size=30, gamma=0.5)      train.py:315
  - loss dispatch for eelunet (edge_outs, seg_out)  train.py:62-66
  - metrics    evaluate.evaluate() (confusion + per-sample cv2 boundary F1)
                                                    evaluate.py:62-124

— and prints the same per-seed table so the two frameworks' trained accuracy
can be compared on identical data.  CPU-only (no CUDA here), so use small
image_size/n_train; pass the SAME flags to tools/accuracy_bench.py for the
eelunet_tpu side of the table.

    python tools/reference_accuracy_bench.py --image_size 64 --n_train 128 \
        --n_test 32 --epochs 20 --seeds 7686 6716 6345

Caveats (recorded in docs/PERF.md alongside the results): parameter init
distributions differ between torch defaults and flax defaults, per-epoch
shuffle RNG streams differ, and eelunet_tpu trains bf16-compute — so rows
compare final accuracy distributions, not trajectories.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

METRIC_NAMES = (  # evaluate.py:124 return order
    "pixel_acc", "precision", "recall", "f1", "iou", "dice",
    "miou", "boundary_f1", "mdice",
)


def make_loaders(seed: int, image_size: int, n_train: int, n_test: int,
                 batch_size: int):
    """The exact arrays accuracy_bench feeds eelunet_tpu, as torch loaders.

    SyntheticDataset pre-normalizes with ImageNet mean/std (the reference
    normalizes identically, ToothDataset.py:58-61), so tensors convert
    HWC->CHW with no further preprocessing.
    """
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    from eelunet_tpu.data.synthetic import SyntheticDataset

    def to_tensors(ds):
        imgs = torch.stack(
            [torch.from_numpy(np.transpose(img, (2, 0, 1))) for img, _ in ds.samples]
        )
        masks = torch.stack(
            [torch.from_numpy(np.transpose(m, (2, 0, 1))) for _, m in ds.samples]
        )
        return TensorDataset(imgs, masks)

    tr = SyntheticDataset(n=n_train, image_size=(image_size, image_size),
                          seed=seed, difficulty="hard")
    te = SyntheticDataset(n=n_test, image_size=(image_size, image_size),
                          seed=seed + 100000, difficulty="hard")
    g = torch.Generator()
    g.manual_seed(seed)
    return (
        DataLoader(to_tensors(tr), batch_size=batch_size, shuffle=True, generator=g),
        DataLoader(to_tensors(te), batch_size=batch_size),
    )


# Construction per train.py:268-288. Criterion: the reference ships
# edge_BceDiceLoss for every --model_type (train.py:305), but its forward is
# (gt_pre, out, target) while calculate_loss (train.py:62-84) calls plain
# criterion(outputs, labels) for unet/unet++/unext/unext_s/malunet — the
# shipped default TypeErrors for those models; the operable choice is the
# commented-out BceDiceLoss (train.py:302), and GT_BceDiceLoss (train.py:304)
# for egeunet's (gt_pre, out) head. These pairings mirror eelunet_tpu's
# loss "auto" defaults (config.py), so the head-to-head protocols match.
#
# 4th field: unet/unext/unext_s return raw LOGITS (Unet.py:97-98,
# unext.py:325) while the reference losses consume probabilities
# (nn.BCELoss, Loss.py:45-58) — feeding logits crashes ("all elements of
# input should be between 0 and 1"), and evaluate.py:92 would threshold
# logits at 0.5 (= prob 0.622). The only operable protocol bridges with a
# sigmoid for both loss and eval — exactly eelunet_tpu's seg_probabilities
# convention (registry.py), and the divergence README.md already catalogs.
MODEL_ZOO = {
    "eelunet": ("models.EELUnet",
                lambda m: m.EELUnet(3, 1), "edge", False),
    "unet": ("models.Unet",
             lambda m: m.Unet(in_channels=3, out_channels=1), "plain", True),
    "egeunet": ("models.egeunet",
                lambda m: m.EGEUNet(num_classes=1, input_channels=3,
                                    c_list=[8, 16, 24, 32, 48, 64],
                                    bridge=True, gt_ds=True), "gt", False),
    "unext": ("models.unext",
              lambda m: m.UNext(num_classes=1, in_channels=3), "plain", True),
    "unext_s": ("models.unext",
                lambda m: m.UNext_S(num_classes=1, in_channels=3),
                "plain", True),
    "malunet": ("models.malunet",
                lambda m: m.MALUNet(num_classes=1, input_channels=3),
                "plain", False),
    # unet++ is absent: the upstream forward crashes on a channel mismatch
    # (UnetPlusPlus.py:50-76, SURVEY §2.2) so the reference cannot train it.
}


def wrap_eval_model(model, logits_head: bool):
    """evaluate.py:92 thresholds the raw output at 0.5; for a logits head
    that is prob 0.622, so bridge with the same sigmoid used in the loss to
    keep the 0.5-probability operating point of every other model (and of
    eelunet_tpu's evaluate). Identity wrap for probability-headed models."""
    import torch

    if not logits_head:
        return model

    class _SigmoidHead(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner
            self.name = inner.name

        def forward(self, x):
            return torch.sigmoid(self.inner(x))

    return _SigmoidHead(model)


def run_seed(seed: int, image_size: int, n_train: int, n_test: int,
             batch_size: int, epochs: int, lr: float, log,
             save_ckpt: str | None = None, model_type: str = "eelunet") -> dict:
    import torch

    from reference_loader import load_reference_module

    torch.set_num_threads(1)
    # set_seed parity (train.py:24-33)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)

    module_name, build, dispatch, logits_head = MODEL_ZOO[model_type]
    mod = load_reference_module(module_name)
    loss_mod = load_reference_module("utils.Loss")
    eval_mod = load_reference_module("evaluate")

    model = build(mod)
    if dispatch == "edge":
        criterion = loss_mod.edge_BceDiceLoss(wb=1, wd=1)
    elif dispatch == "gt":
        criterion = loss_mod.GT_BceDiceLoss(wb=1, wd=1)
    else:
        criterion = loss_mod.BceDiceLoss(wb=1, wd=1)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, step_size=30, gamma=0.5)

    train_loader, test_loader = make_loaders(
        seed, image_size, n_train, n_test, batch_size)

    for epoch in range(epochs):
        model.train()
        t0 = time.time()
        running = 0.0
        for inputs, labels in train_loader:
            optimizer.zero_grad()
            # per-model loss dispatch: calculate_loss, train.py:62-84
            if dispatch == "edge":
                seg_out, edge_outs = model(inputs)
                loss = criterion(edge_outs, seg_out, labels)
            elif dispatch == "gt":
                gt_pre, out = model(inputs)
                loss = criterion(gt_pre, out, labels)
            else:
                out = model(inputs)
                loss = criterion(torch.sigmoid(out) if logits_head else out,
                                 labels)
            loss.backward()
            optimizer.step()
            running += loss.item()
        scheduler.step()
        log(f"  seed {seed} epoch {epoch + 1}/{epochs}: "
            f"train_loss {running / len(train_loader):.4f} "
            f"({time.time() - t0:.1f}s)")

    eval_model = wrap_eval_model(model, logits_head)
    vals = eval_mod.evaluate(eval_model, test_loader, torch.device("cpu"))
    out = dict(zip(METRIC_NAMES, (float(v) for v in vals)))
    # train-set eval (same eval-mode metrics): separates "failed to learn"
    # from "learned but doesn't generalize / eval-mode BN collapse"
    tvals = eval_mod.evaluate(eval_model, train_loader, torch.device("cpu"))
    out["train_miou"] = float(tvals[6])
    out["train_dice"] = float(tvals[5])
    if save_ckpt:
        # weights-only state_dict, the reference's own checkpoint format
        # (train.py:157-180) — consumable by cli.import_torch for the
        # trained-weights importer round trip
        import os

        os.makedirs(save_ckpt, exist_ok=True)
        path = os.path.join(save_ckpt, f"{model_type}_ref_seed{seed}.pth")
        torch.save(model.state_dict(), path)
        log(f"  seed {seed}: saved reference checkpoint -> {path}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="eelunet", choices=sorted(MODEL_ZOO))
    p.add_argument("--seeds", type=int, nargs="+", default=[7686, 6716, 6345])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_train", type=int, default=128)
    p.add_argument("--n_test", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    # reference train.py:229 default; 1e-3 diverges the torch-init EELUnet
    # on this task (measured: eval collapses to all-bg/all-fg)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save_ckpt", default=None, metavar="DIR",
                   help="save each seed's trained state_dict (torch format) "
                   "into DIR for the cli.import_torch round trip")
    args = p.parse_args(argv)

    log = lambda m: print(m, file=sys.stderr, flush=True)
    rows = {}
    for seed in args.seeds:
        t0 = time.time()
        rows[seed] = run_seed(seed, args.image_size, args.n_train, args.n_test,
                              args.batch_size, args.epochs, args.lr, log,
                              save_ckpt=args.save_ckpt,
                              model_type=args.model_type)
        log(f"seed {seed} done in {time.time() - t0:.0f}s: "
            f"miou {rows[seed]['miou']:.4f} "
            f"bf1 {rows[seed]['boundary_f1']:.4f}")

    log("")
    log("| seed | mIoU | mDice | boundary F1 | dice | iou |")
    log("|---|---|---|---|---|---|")
    for seed, m in rows.items():
        log(f"| {seed} | {m['miou']:.4f} | {m['mdice']:.4f} | "
            f"{m['boundary_f1']:.4f} | {m['dice']:.4f} | {m['iou']:.4f} |")
    print(json.dumps({
        "harness": "reference_torch_cpu",
        "model": args.model_type, "image_size": args.image_size,
        "epochs": args.epochs, "n_train": args.n_train, "n_test": args.n_test,
        "batch_size": args.batch_size, "lr": args.lr,
        "per_seed": {str(s): m for s, m in rows.items()},
    }))


if __name__ == "__main__":
    main()
