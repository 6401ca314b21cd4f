"""cli.visualize: offline feature-map grids replacing the reference's
in-forward PNG dumps (utils/tools.py:12-123, EELUnet.py:389-462)."""

import os

import pytest


def _run(argv):
    from eelunet_tpu.cli import visualize as cli_visualize

    return cli_visualize.main(argv)


def test_visualize_writes_grids_and_summary_images(tmp_path, synthetic_tree):
    out_dir = _run([
        "--model_type", "unet", "--data_dir", synthetic_tree,
        "--image_size", "32", "--results_dir", str(tmp_path / "viz"),
        "--index", "1",
    ])
    files = set(os.listdir(out_dir))
    assert {"input.png", "probabilities.png", "mask.png"} <= files
    grids = files - {"input.png", "probabilities.png", "mask.png"}
    assert grids, "expected per-module feature grids"
    # PNG magic on one grid (not an empty file)
    with open(os.path.join(out_dir, sorted(grids)[0]), "rb") as f:
        assert f.read(8)[:4] == b"\x89PNG"


def test_visualize_module_filter_selects_matching_modules(tmp_path, synthetic_tree):
    one_dir = _run([
        "--model_type", "unet", "--data_dir", synthetic_tree,
        "--image_size", "32", "--results_dir", str(tmp_path / "one"),
        "--modules", "ConvTranspose",
    ])
    grids = set(os.listdir(one_dir)) - {"input.png", "probabilities.png", "mask.png"}
    assert grids and all("ConvTranspose" in g for g in grids)


def test_visualize_index_out_of_range(tmp_path, synthetic_tree):
    with pytest.raises(IndexError, match="out of range"):
        _run([
            "--model_type", "unet", "--data_dir", synthetic_tree,
            "--image_size", "32", "--results_dir", str(tmp_path / "viz"),
            "--index", "99",
        ])
