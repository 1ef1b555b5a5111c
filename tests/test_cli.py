"""CLI tests: flag parsing, config overrides, and an end-to-end `test` run."""

import os

from ircolor_tpu.cli import build_config, main


def test_build_config_overrides():
    import argparse

    ns = argparse.Namespace(
        config=None, img_size="64", batch_size="8", lr_G="1e-3",
        no_antialias=True, train_roots=["a", "b"], test_roots=None,
    )
    cfg = build_config(ns, "train")
    assert cfg.mode == "train"
    assert cfg.img_size == 64
    assert cfg.batch_size == 8
    assert abs(cfg.lr_G - 1e-3) < 1e-12
    assert cfg.no_antialias is True
    assert cfg.train_roots == ("a", "b")
    assert cfg.test_roots == Config_default_test_roots()


def Config_default_test_roots():
    from ircolor_tpu.config import Config

    return Config().test_roots


def test_build_config_coerces_optional_int_fields():
    """`int | None` fields (default None) must coerce CLI strings to int —
    the 512×640 BASELINE resolution is reached through exactly these flags
    (round-1 regression: they passed through as strings and model init
    crashed)."""
    import argparse

    ns = argparse.Namespace(config=None, img_height="512", img_width="640")
    cfg = build_config(ns, "test")
    assert cfg.resolved_hw == (512, 640)
    assert isinstance(cfg.img_height, int) and isinstance(cfg.img_width, int)


def test_cli_nonsquare_flagship_resolution_end_to_end(kaist_tree, tmp_path):
    """--img-height/--img-width must run end-to-end (non-square shapes)."""
    root, _ = kaist_tree
    out = str(tmp_path / "cli_nonsquare")
    rc = main([
        "test",
        "--img-height", "32",
        "--img-width", "40",
        "--test-batch-size", "4",
        "--test-roots", str(root / "set02"),
        "--output-dir", out,
        "--topk", "1",
        "--no-save-comparisons",
        "--num-workers", "2",
    ])
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "metrics_test.csv"))


def test_config_json_roundtrip(tmp_path):
    from ircolor_tpu.config import Config

    cfg = Config(img_size=128, topk=7, train_roots=("x",))
    path = tmp_path / "cfg.json"
    path.write_text(cfg.to_json())
    cfg2 = Config.from_json(path.read_text())
    assert cfg2 == cfg


def test_cli_test_mode_end_to_end(kaist_tree, tmp_path):
    root, _ = kaist_tree
    out = str(tmp_path / "cli_results")
    rc = main([
        "test",
        "--img-size", "32",
        "--test-batch-size", "4",
        "--test-roots", str(root / "set02"),
        "--output-dir", out,
        "--topk", "2",
        "--no-save-comparisons",
        "--num-workers", "2",
    ])
    assert rc == 0
    assert os.path.isfile(os.path.join(out, "metrics_test.csv"))


def test_cli_export_mode_end_to_end(tmp_path):
    """`python -m ircolor_tpu export`: writes a loadable AOT serving
    artifact (random init — the weights warning path); the reloaded
    artifact colorizes on CPU."""
    import jax.numpy as jnp
    import numpy as np

    from ircolor_tpu.export.aot import load_exported

    out = str(tmp_path / "serve" / "netG.stablehlo")
    rc = main([
        "export",
        "--img-size", "32",
        "--n-blocks", "1",
        "--ngf", "8",
        "--test-batch-size", "2",
        "--export-out", out,
        "--export-platforms", "cpu",
    ])
    assert rc == 0
    served = load_exported(out)
    ir = np.random.RandomState(0).rand(2, 32, 32, 1).astype(np.float32) * 2 - 1
    pred = np.asarray(served.call(jnp.asarray(ir)))
    assert pred.shape == (2, 32, 32, 3) and pred.dtype == np.uint8


def test_cli_round2_extension_flags():
    """--batch-transport / --no-lanepack round-trip through the REAL
    argparse parser (auto-generated flags) into typed Config fields."""
    import argparse

    from ircolor_tpu.cli import _add_config_flags

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    _add_config_flags(parser)
    ns = parser.parse_args(
        ["--batch-transport", "float", "--no-lanepack", "--train-roots", "a"]
    )
    cfg = build_config(ns, "train")
    assert cfg.batch_transport == "float"
    assert cfg.lanepack is False
    ns2 = parser.parse_args(["--train-roots", "a"])
    cfg2 = build_config(ns2, "train")
    assert cfg2.batch_transport == "int"
    assert cfg2.lanepack is True


def test_config_presets_load():
    """Every shipped preset in configs/ parses through the real --config
    path and maps to the regime it claims (reference regimes: Train(D) =
    day sets 00+01, Train(N) = night sets 03+04, Train(DN) = the reference
    default 00/01/03/04; Test(DN) = set02+set05, ref :81-86/:121-124)."""
    import argparse
    import glob

    from ircolor_tpu.cli import _add_config_flags
    from ircolor_tpu.config import Config

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    presets = {os.path.basename(p): p for p in glob.glob(os.path.join(cfg_dir, "*.json"))}
    assert set(presets) == {
        "train_day.json", "train_day_night.json", "train_night.json",
        "test_daynight.json", "flagship_512x640.json",
    }

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    _add_config_flags(parser)

    def load(name, mode):
        ns = parser.parse_args(["--config", presets[name]])
        return build_config(ns, mode)

    day = load("train_day.json", "train")
    assert [os.path.basename(r) for r in day.train_roots] == ["set00", "set01"]
    assert "trained_w_day/" in day.save_dir

    dn = load("train_day_night.json", "train")
    assert [os.path.basename(r) for r in dn.train_roots] == [
        "set00", "set01", "set03", "set04"
    ]
    assert dn.train_roots == Config().train_roots  # the reference default

    night = load("train_night.json", "train")
    assert [os.path.basename(r) for r in night.train_roots] == ["set03", "set04"]

    test = load("test_daynight.json", "test")
    assert test.mode == "test"
    assert [os.path.basename(r) for r in test.test_roots] == ["set02", "set05"]
    assert test.test_G_weights.endswith("netG_best.pth")

    flag = load("flagship_512x640.json", "test")
    assert flag.resolved_hw == (512, 640)
    # Resolution-aware default: the flagship preset leaves test_batch_size
    # unset so the product dispatches the certified 512×640 batch (32); 256²
    # resolves to 16 (VERDICT r4 #5).
    assert flag.compute_dtype == "bf16" and flag.resolved_test_batch_size == 32
    assert Config(img_size=256).resolved_test_batch_size == 16
    # int8 serving default: ON for bf16 serving, OFF for the f32 parity path
    # and for training (VERDICT r4 #2).
    assert flag.resolved_quant_int8 is True
    assert Config().resolved_quant_int8 is False          # f32 parity path
    assert flag.replace(mode="train").resolved_quant_int8 is False
    assert flag.replace(quant_int8=False).resolved_quant_int8 is False
    # 256²-class bf16 also resolves int8 since round 5 (int8 th16 blocks +
    # QuantConv enc/dec measured −2.8 ms vs float); smaller planes stay
    # float (unprobed).
    assert Config(img_size=256, compute_dtype="bf16").resolved_quant_int8 is True
    assert Config(img_size=128, compute_dtype="bf16").resolved_quant_int8 is False

    # Flags still win over the preset (CLI contract).
    ns = parser.parse_args(["--config", presets["flagship_512x640.json"],
                            "--test-batch-size", "4"])
    assert build_config(ns, "test").test_batch_size == 4
