"""Assemble the per-family torch-vs-eelunet_tpu head-to-head table.

Pairs the per-family summary JSONs emitted by tools/reference_accuracy_bench.py
(torch side) and tools/accuracy_bench.py (TPU side) — same seeds, same
hard-synthetic draws, same protocol — into one markdown table of per-seed
paired deltas plus a combined JSON artifact for docs/results/.

The torch reference models print construction banners to stdout (e.g.
MALUNet's "SC_Att_Bridge was used", malunet.py:141), so torch-side files may
carry non-JSON lines before the summary; the last parseable line wins.

    python tools/h2h_report.py --pairs egeunet:/tmp/h2h/torch_egeunet.json:/tmp/h2h/tpu_egeunet.json ... \
        --out docs/results/family_head_to_head_r3.json
"""

from __future__ import annotations

import argparse
import json
import sys

# torch-side key -> tpu-side key (reference names: evaluate.py:124;
# eelunet_tpu names: metrics.py scalar names)
KEYMAP = {
    "iou": "iou", "dice": "dice", "miou": "miou", "mdice": "mdice",
    "boundary_f1": "boundary_f1",
    "train_miou": "train_miou", "train_dice": "train_dice",
}


def load_summary(path: str) -> dict:
    last_err = None
    for line in reversed(open(path).read().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError as e:  # keep scanning upward
            last_err = e
    raise SystemExit(f"{path}: no parseable JSON summary line ({last_err})")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pairs", nargs="+", required=True,
                   metavar="FAMILY:TORCH_JSON:TPU_JSON")
    p.add_argument("--out", default=None, help="combined JSON artifact path")
    args = p.parse_args(argv)

    combined = {"protocol": None, "families": {}}
    rows = []
    for spec in args.pairs:
        family, torch_path, tpu_path = spec.split(":")
        t = load_summary(torch_path)
        j = load_summary(tpu_path)
        proto = {k: t.get(k) for k in
                 ("image_size", "epochs", "n_train", "n_test", "batch_size", "lr")}
        jt = {"image_size": j.get("image_size"), "epochs": j.get("epochs"),
              "n_train": j.get("n_train"), "n_test": j.get("n_test"),
              "batch_size": j.get("batch_size"), "lr": j.get("lr")}
        for k, v in jt.items():
            if v is not None and proto.get(k) is not None and v != proto[k]:
                raise SystemExit(f"{family}: protocol mismatch on {k}: "
                                 f"torch={proto[k]} tpu={v}")
        if combined["protocol"] is None:
            combined["protocol"] = proto
        fam = {"torch": {}, "tpu": {}, "delta": {}}
        for seed, tm in t["per_seed"].items():
            jm = j["seeds"].get(seed)
            if jm is None:
                print(f"warning: {family} seed {seed} missing on tpu side",
                      file=sys.stderr)
                continue
            fam["torch"][seed] = {k: round(float(tm[k]), 4) for k in KEYMAP}
            fam["tpu"][seed] = {k: round(float(jm[KEYMAP[k]]), 4) for k in KEYMAP}
            fam["delta"][seed] = {
                k: round(float(jm[KEYMAP[k]]) - float(tm[k]), 4) for k in KEYMAP}
            rows.append((family, seed, tm, jm))
        combined["families"][family] = fam

    print("| family | seed | torch mIoU | tpu mIoU | Δ mIoU | torch dice "
          "| tpu dice | Δ dice | torch bF1 | tpu bF1 |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for family, seed, tm, jm in rows:
        dm = jm["miou"] - tm["miou"]
        dd = jm["dice"] - tm["dice"]
        print(f"| {family} | {seed} | {tm['miou']:.4f} | {jm['miou']:.4f} "
              f"| {dm:+.4f} | {tm['dice']:.4f} | {jm['dice']:.4f} | {dd:+.4f} "
              f"| {tm['boundary_f1']:.3f} | {jm['boundary_f1']:.3f} |")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(combined, f, indent=1)
            f.write("\n")
        print(f"\nwrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
