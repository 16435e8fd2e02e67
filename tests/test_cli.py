"""CLI smoke tests: train presets and eval run end-to-end on synthetic
volumes with the tiny model (CPU)."""

import json
import os
import sys

def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    module.main()


def test_train_cli_soft_intro(tmp_path, monkeypatch):
    from cli import train as cli_train

    run_dir = str(tmp_path / "run")
    _run_main(cli_train, [
        "train", "--preset", "z1200", "--model", "tiny_spatial",
        "--synthetic", "40", "--epochs", "1", "--batch", "4",
        "--no-bf16", "--no-data-parallel", "--run-dir", run_dir,
        "--beta-kl", "0.7", "--beta-neg", "512",
    ], monkeypatch)
    assert os.path.exists(os.path.join(run_dir, "train_result.csv"))
    assert os.path.exists(os.path.join(run_dir, "args.json"))
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    with open(os.path.join(run_dir, "args.json")) as f:
        snap = json.load(f)
    assert snap["beta_kl"] == 0.7 and snap["beta_neg"] == 512.0


def test_preset_z600_maps_to_as_run_config():
    # 600z_main.py:176 runs mymodel.SoftIntroVAE(12,24,32,48,150): the z600
    # preset must map to that config, the documented 600-d one to z600-wide
    from cli.train import PRESETS
    from sivae_tpu.models.registry import get_model_config

    cfg = get_model_config(PRESETS["z600"]["model"])
    assert (cfg.first_ch, cfg.second_ch, cfg.third_ch, cfg.forth_ch,
            cfg.z_ch) == (12, 24, 32, 48, 150)
    wide = get_model_config(PRESETS["z600-wide"]["model"])
    assert (wide.first_ch, wide.second_ch, wide.third_ch, wide.forth_ch,
            wide.z_ch) == (16, 32, 64, 128, 600)


def test_train_cli_vae_preset(tmp_path, monkeypatch):
    from cli import train as cli_train

    run_dir = str(tmp_path / "vae")
    _run_main(cli_train, [
        "train", "--preset", "vae", "--model", "tiny_spatial",
        "--synthetic", "40", "--epochs", "1", "--batch", "4",
        "--no-bf16", "--no-data-parallel", "--run-dir", run_dir,
    ], monkeypatch)
    assert os.path.exists(os.path.join(run_dir, "train_result.csv"))


def test_eval_cli(tmp_path, monkeypatch):
    from cli import eval as cli_eval

    out = str(tmp_path / "report.json")
    _run_main(cli_eval, [
        "eval", "--model", "tiny_spatial", "--synthetic", "40",
        "--batch", "8", "--k", "3", "--out", out,
    ], monkeypatch)
    with open(out) as f:
        report = json.load(f)
    assert "retrieval_p_at_k" in report and "rmse" in report
    assert 0.0 <= report["retrieval_p_at_k"] <= 1.0


def test_preset_dp_variant_loss_config():
    """main_DataParallel.py:470,617: 0.25*expELBO, no x10, scale 1/(80*96*80),
    beta_neg=256, beta_kl=1.0, spatial-150 model."""
    from cli.train import PRESETS

    p = PRESETS["dp-variant"]
    assert p["model"] == "spatial_150"
    assert p["beta_neg"] == 256.0 and p["beta_kl"] == 1.0
    assert p["exp_elbo_weight"] == 0.25 and p["loss_multiplier"] == 1.0
    assert abs(p["scale"] - 1.0 / (80 * 96 * 80)) < 1e-12


def test_preset_vae_default_weights():
    """vae_main.py:53-54 defaults mse_weight=1, kl_weight=1 (VERDICT r2
    missing-#2: the old preset default of kl_w=20 mis-reproduced it)."""
    from cli.train import PRESETS

    assert PRESETS["vae"]["mse_w"] == 1.0
    assert PRESETS["vae"]["kl_w"] == 1.0
