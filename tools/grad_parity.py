"""Single-step GRADIENT parity probe vs the torch reference.

Diagnosis companion to tools/trajectory_parity.py: when a family's paired
trajectory forks at step K, this tool pinpoints WHERE. It runs the torch
reference to step K (same shared-batch protocol), ports the step-K weights to
flax, computes ONE loss+gradient on batch K in BOTH frameworks from those
identical weights, ports the torch gradient tree through the same layout
rules, and prints the worst-agreeing parameters — the op whose VJP semantics
differ is named by its parameter path.

    python tools/grad_parity.py --model_type malunet --at_steps 0 28 29 30

Reference semantics probed: loss dispatch train.py:62-84, criterion
utils/Loss.py:59-113, backward through the family's modules.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + "/tests")
sys.path.insert(0, REPO + "/tools")

from trajectory_parity import _ensure_cpu_env, make_batches  # noqa: E402


def torch_loss_grads_at(family: str, seed: int, batches, per_epoch: int,
                        lr: float, k: int):
    """Train the reference to step k, then loss+grads on batch k (no step).
    Returns (loss, state_dict_at_k, grads_by_name)."""
    import random

    import torch

    from reference_accuracy_bench import MODEL_ZOO
    from reference_loader import load_reference_module

    torch.set_num_threads(1)
    random.seed(seed)
    np.random.seed(seed)
    torch.manual_seed(seed)
    module_name, build, dispatch, logits_head = MODEL_ZOO[family]
    model = build(load_reference_module(module_name))
    loss_mod = load_reference_module("utils.Loss")
    criterion = {
        "edge": lambda: loss_mod.edge_BceDiceLoss(wb=1, wd=1),
        "gt": lambda: loss_mod.GT_BceDiceLoss(wb=1, wd=1),
        "plain": lambda: loss_mod.BceDiceLoss(wb=1, wd=1),
    }[dispatch]()
    optimizer = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, 30, gamma=0.5)

    def step_loss(xi, yi):
        inputs = torch.from_numpy(np.ascontiguousarray(xi.transpose(0, 3, 1, 2)))
        labels = torch.from_numpy(np.ascontiguousarray(yi.transpose(0, 3, 1, 2)))
        if dispatch == "edge":
            seg_out, edge_outs = model(inputs)
            return criterion(edge_outs, seg_out, labels)
        if dispatch == "gt":
            gt_pre, out = model(inputs)
            return criterion(gt_pre, out, labels)
        out = model(inputs)
        return criterion(torch.sigmoid(out) if logits_head else out, labels)

    model.train()
    for step in range(k):
        optimizer.zero_grad()
        loss = step_loss(*batches[step])
        loss.backward()
        optimizer.step()
        if (step + 1) % per_epoch == 0:
            scheduler.step()

    sd_k = {n: v.detach().cpu().numpy().copy() for n, v in model.state_dict().items()}
    optimizer.zero_grad()
    loss = step_loss(*batches[k])
    loss.backward()
    # NOTE: probe gradients are the RAW dLoss/dw (no weight decay) — the wd
    # term w*p is identical given identical weights, so it cancels in the
    # comparison; jax side differentiates the same raw loss.
    grads = {n: p.grad.detach().cpu().numpy().copy()
             for n, p in model.named_parameters() if p.grad is not None}
    return float(loss.item()), sd_k, grads


def torch_f64_oracle(family: str, sd_k, batch):
    """The float64 TRUTH gradient at the same weights/batch: cast the
    reference model (holding sd_k) and the batch to double and backprop once.
    If |g_f32_torch - g_f64| ~= |g_f32_jax - g_f64| per parameter, the two
    f32 frameworks are EQUIDISTANT from the true gradient — their mutual
    difference is float rounding by construction, not semantics."""
    import torch

    from reference_accuracy_bench import MODEL_ZOO
    from reference_loader import load_reference_module

    torch.set_num_threads(1)
    module_name, build, dispatch, logits_head = MODEL_ZOO[family]
    model = build(load_reference_module(module_name)).double()
    model.load_state_dict({k: torch.from_numpy(v).double()
                           for k, v in sd_k.items()})
    loss_mod = load_reference_module("utils.Loss")
    criterion = {
        "edge": lambda: loss_mod.edge_BceDiceLoss(wb=1, wd=1),
        "gt": lambda: loss_mod.GT_BceDiceLoss(wb=1, wd=1),
        "plain": lambda: loss_mod.BceDiceLoss(wb=1, wd=1),
    }[dispatch]()
    model.train()
    xi, yi = batch
    inputs = torch.from_numpy(
        np.ascontiguousarray(xi.transpose(0, 3, 1, 2))).double()
    labels = torch.from_numpy(
        np.ascontiguousarray(yi.transpose(0, 3, 1, 2))).double()
    if dispatch == "edge":
        seg_out, edge_outs = model(inputs)
        loss = criterion(edge_outs, seg_out, labels)
    elif dispatch == "gt":
        gt_pre, out = model(inputs)
        loss = criterion(gt_pre, out, labels)
    else:
        out = model(inputs)
        loss = criterion(torch.sigmoid(out) if logits_head else out, labels)
    loss.backward()
    grads = {n: p.grad.detach().cpu().numpy().copy()
             for n, p in model.named_parameters() if p.grad is not None}
    return float(loss.item()), grads


def jax_loss_grads(family: str, sd_k, grads_t, batch, image_size: int,
                   batch_size: int):
    """Port step-k weights, compute loss+grads on the same batch; also port
    the TORCH gradient tree through the identical layout rules so trees
    compare leaf-for-leaf. Returns (loss, grads_jax_tree, grads_torch_tree)."""
    import jax
    import jax.numpy as jnp

    from eelunet_tpu.config import TrainConfig, apply_overrides
    from eelunet_tpu.models.torch_port import port_state_dict
    from eelunet_tpu.train.trainer import Trainer

    cfg = apply_overrides(TrainConfig(), [
        f"model.name={family}", "model.dtype=float32",
        f"data.image_size=[{image_size},{image_size}]",
        f"data.batch_size={batch_size}", "seed=0",
    ])
    trainer = Trainer(cfg)
    variables = port_state_dict(family, sd_k)
    params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(jnp.asarray, variables["batch_stats"])
    has_bs = bool(jax.tree_util.tree_leaves(bstats))
    model = trainer.model

    def loss_of(p, x, y):
        vs = {"params": p}
        if has_bs:
            vs["batch_stats"] = bstats
            out, _ = model.apply(vs, x, train=True, mutable=["batch_stats"])
        else:
            out = model.apply(vs, x, train=True)
        return trainer.loss_fn(out, y)

    xi, yi = batch
    loss, grads_j = jax.jit(jax.value_and_grad(loss_of))(
        params, jnp.asarray(xi), jnp.asarray(yi))

    # Port the torch gradients: same rules map (O,I,kh,kw)->HWIO etc. BN
    # running stats have no grads — splice zeros so the porter's
    # completeness check passes, then compare params only.
    g_sd = dict(grads_t)
    for name, v in sd_k.items():
        if name not in g_sd:
            g_sd[name] = np.zeros_like(v)
    grads_t_tree = port_state_dict(family, g_sd)["params"]
    return float(loss), grads_j, grads_t_tree


def compare_grads(grads_j, grads_t, top: int = 12):
    import jax

    flat_j = {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
              for path, v in jax.tree_util.tree_flatten_with_path(grads_j)[0]}
    flat_t = {"/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
              for path, v in jax.tree_util.tree_flatten_with_path(grads_t)[0]}
    rows = []
    for kname in sorted(flat_j):
        gj, gt = flat_j[kname], flat_t[kname]
        scale = float(np.abs(gt).max()) + 1e-30
        rel = float(np.abs(gj - gt).max()) / scale
        cj = float((gj * gt).sum() /
                   (np.linalg.norm(gj) * np.linalg.norm(gt) + 1e-30))
        rows.append((rel, cj, scale, kname))
    rows.sort(reverse=True)
    return rows[:top], max(r[0] for r in rows)


def main(argv=None):
    _ensure_cpu_env()
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", default="malunet")
    p.add_argument("--seed", type=int, default=7686)
    p.add_argument("--at_steps", type=int, nargs="+", default=[0])
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--f64_oracle", action="store_true",
                   help="also compute the torch-float64 truth gradient and "
                   "report how far each f32 framework sits from it")
    args = p.parse_args(argv)

    batches, per_epoch = make_batches(
        args.seed, args.image_size, args.n_train, args.batch_size,
        max(args.at_steps) + 1)
    out = {"model": args.model_type, "seed": args.seed, "steps": {}}
    for k in args.at_steps:
        lt, sd_k, grads_t = torch_loss_grads_at(
            args.model_type, args.seed, batches, per_epoch, args.lr, k)
        lj, grads_j, grads_t_tree = jax_loss_grads(
            args.model_type, sd_k, grads_t, batches[k],
            args.image_size, args.batch_size)
        worst, max_rel = compare_grads(grads_j, grads_t_tree)
        print(f"\n== step {k}: loss torch {lt:.8f} jax {lj:.8f} "
              f"|d|={abs(lt - lj):.2e}  max grad rel-err {max_rel:.2e}",
              file=sys.stderr)
        print("   worst params (rel-err, cosine, |g|max, path):", file=sys.stderr)
        for rel, cj, scale, name in worst:
            print(f"   {rel:9.2e}  cos={cj:+.6f}  |g|={scale:.2e}  {name}",
                  file=sys.stderr)
        out["steps"][str(k)] = {
            "loss_torch": lt, "loss_jax": lj, "max_grad_rel": max_rel,
            "worst": [{"rel": r, "cos": c, "gmax": s, "param": n}
                      for r, c, s, n in worst[:5]],
        }
        if args.f64_oracle:
            import jax

            from eelunet_tpu.models.torch_port import port_state_dict

            lo, grads_o = torch_f64_oracle(args.model_type, sd_k, batches[k])
            g_sd_o = dict(grads_o)
            for name, v in sd_k.items():
                if name not in g_sd_o:
                    g_sd_o[name] = np.zeros_like(v)
            grads_o_tree = port_state_dict(args.model_type, g_sd_o)["params"]

            def flat(tree):
                return {"/".join(str(getattr(p_, "key", p_)) for p_ in path):
                        np.asarray(v) for path, v in
                        jax.tree_util.tree_flatten_with_path(tree)[0]}

            fo, ft, fj = flat(grads_o_tree), flat(grads_t_tree), flat(grads_j)
            rows = []
            for name in sorted(fo):
                scale = float(np.abs(fo[name]).max()) + 1e-30
                dt = float(np.abs(ft[name] - fo[name]).max()) / scale
                dj = float(np.abs(fj[name] - fo[name]).max()) / scale
                rows.append((name, dt, dj))
            dts = np.array([r[1] for r in rows])
            djs = np.array([r[2] for r in rows])
            orc = {
                "loss_f64": lo,
                "dloss_torch_f32_vs_f64": abs(lt - lo),
                "dloss_jax_f32_vs_f64": abs(lj - lo),
                "grad_dist_torch_f32_median": float(np.median(dts)),
                "grad_dist_jax_f32_median": float(np.median(djs)),
                "grad_dist_torch_f32_max": float(dts.max()),
                "grad_dist_jax_f32_max": float(djs.max()),
            }
            out["steps"][str(k)]["f64_oracle"] = orc
            print(f"   f64 oracle: loss {lo:.8f} | torch f32 off by "
                  f"{orc['dloss_torch_f32_vs_f64']:.2e}, jax f32 off by "
                  f"{orc['dloss_jax_f32_vs_f64']:.2e} | grad dist "
                  f"median torch {orc['grad_dist_torch_f32_median']:.2e} "
                  f"vs jax {orc['grad_dist_jax_f32_median']:.2e}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
