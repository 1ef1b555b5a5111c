"""Integration test: full test-mode run on a synthetic KAIST tree —
mirrored outputs, metrics_test.csv format, collages, Top-K tree + ranking CSV
(SURVEY.md §4 integration plan).
"""

import os

import numpy as np
import pytest

from ircolor_tpu.config import Config
from ircolor_tpu.eval.runner import run_test


def test_run_test_end_to_end(kaist_tree, tmp_path):
    root, _ = kaist_tree
    out_dir = str(tmp_path / "results")
    cfg = Config(
        mode="test",
        img_size=32,
        test_batch_size=4,
        test_roots=(str(root / "set02"),),
        output_dir=out_dir,
        test_G_weights=None,  # random init path (warns, ref :1353-1355)
        topk=3,
        num_workers=2,
    )
    summary = run_test(cfg)

    # Counts: set02 has 4 + 3 paired frames (+2 unpaired lwir extras per seq
    # which produce predictions but no metrics).
    assert summary["count"] == 7

    # Mirrored prediction tree.
    assert os.path.isfile(os.path.join(out_dir, "set02", "V000", "I00000.png"))
    assert os.path.isfile(os.path.join(out_dir, "set02", "V001", "nested", "I00001.png"))
    # Unpaired extras still get predictions (GT just missing).
    assert os.path.isfile(os.path.join(out_dir, "set02", "V000", "only_ir_000.png"))

    # Collages.
    assert os.path.isfile(
        os.path.join(out_dir, "Comparisons", "set02", "V000", "I00000_cmp.png")
    )

    # metrics_test.csv: header, per-image rows, summary block.
    csv_path = os.path.join(out_dir, "metrics_test.csv")
    lines = open(csv_path).read().splitlines()
    assert lines[0] == "file,mae,mse,psnr,ssim"
    data_rows = [l for l in lines[1:] if l and not l.startswith("#")]
    assert len(data_rows) == 7
    for row in data_rows:
        parts = row.split(",")
        assert len(parts) == 5
        float(parts[1]); float(parts[2]); float(parts[3]); float(parts[4])
    assert "# Summary" in lines
    assert any(l.startswith("# count,7") for l in lines)
    assert any(l.startswith("# mean_psnr,") for l in lines)

    # Top-K tree: ranking CSV + flat copies.
    best_dir = os.path.join(out_dir, "Best_50_colored_images")
    rank_csv = os.path.join(best_dir, "top_3_ranking.csv")
    rlines = open(rank_csv).read().splitlines()
    assert rlines[0] == "rank,file,mae,mse,psnr,ssim,metric_used"
    assert len(rlines) == 4
    assert all(r.endswith(",ssim") for r in rlines[1:])
    # Ranking is descending in ssim.
    ssims = [float(r.split(",")[5]) for r in rlines[1:]]
    assert ssims == sorted(ssims, reverse=True)

    colored = os.listdir(os.path.join(best_dir, "colored"))
    collages = os.listdir(os.path.join(best_dir, "collages"))
    assert len(colored) == 3 and len(collages) == 3
    assert all("__" in f for f in colored)  # flat set__seq__name naming
    assert all(f.endswith("__cmp.png") for f in collages)


def test_run_test_with_trained_weights_beats_random(kaist_tree, tmp_path):
    """Loading weights changes outputs (exercises load path end-to-end)."""
    import jax
    import torch

    from torch_golden import GoldGenerator

    root, _ = kaist_tree
    gold = GoldGenerator(n_blocks=9)
    pth = str(tmp_path / "netG.pth")
    torch.save(gold.state_dict(), pth)

    out1 = str(tmp_path / "r1")
    out2 = str(tmp_path / "r2")
    base = dict(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    s1 = run_test(Config(output_dir=out1, test_G_weights=None, **base))
    s2 = run_test(Config(output_dir=out2, test_G_weights=pth, **base))
    assert s1["count"] == s2["count"]
    assert not np.isclose(s1["mean_mae"], s2["mean_mae"])


def test_run_test_nonsquare_resolution(kaist_tree, tmp_path):
    """img_height/img_width decouple from the square img_size (BASELINE's
    512×640 shape class; the reference assumes square, ref :818)."""
    root, _ = kaist_tree
    out = str(tmp_path / "ns_results")
    cfg = Config(
        mode="test",
        img_size=32,            # overridden by the explicit H/W below
        img_height=32,
        img_width=40,
        test_batch_size=4,
        test_roots=(str(root / "set02"),),
        output_dir=out,
        topk=2,
        save_comparisons=True,
        num_workers=2,
    )
    summary = run_test(cfg)
    assert summary["count"] == 7
    from PIL import Image

    img = Image.open(os.path.join(out, "set02", "V000", "I00000.png"))
    assert img.size == (40, 32)  # PIL size is (W, H)


def test_topk_and_csv_ssim_none_paths(tmp_path):
    """The reference ranks by PSNR with empty ssim CSV cells when skimage is
    absent (ref :1238-1241, :1270-1278, :1502-1507). We always have SSIM in
    production, but the None paths must stay reference-exact (VERDICT r1
    weak #6: previously unreachable-and-untested)."""
    import numpy as np

    from ircolor_tpu.config import Config
    from ircolor_tpu.export.topk import save_best_k_outputs, write_metrics_csv

    out = tmp_path / "results"
    out.mkdir()
    metrics = [
        {"file": "set02/V000/a.png", "mae": 0.1, "mse": 0.01, "psnr": 20.0, "ssim": None},
        {"file": "set02/V000/b.png", "mae": 0.2, "mse": 0.04, "psnr": 14.0, "ssim": None},
        {"file": "set02/V000/c.png", "mae": 0.3, "mse": 0.09, "psnr": float("inf"), "ssim": None},
    ]
    # Predictions on disk so copies succeed.
    for m in metrics:
        p = out / m["file"]
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"png")

    cfg = Config(output_dir=str(out), topk=2, best50_copy_collages=False)
    save_best_k_outputs(cfg, metrics)
    rank = (out / cfg.best50_dirname / "top_2_ranking.csv").read_text().splitlines()
    assert rank[0] == "rank,file,mae,mse,psnr,ssim,metric_used"
    # Non-finite PSNR (inf) is dropped like the reference (ref :1243-1254);
    # a.png (PSNR 20) ranks first with an empty ssim cell and metric_used=psnr.
    assert rank[1].endswith(",,psnr")
    assert "a.png" in rank[1]
    assert all("c.png" not in line for line in rank)

    csv_path = str(tmp_path / "metrics_test.csv")
    write_metrics_csv(csv_path, metrics[:2], 2, 0.15, 0.025, 17.0, None)
    text = open(csv_path).read()
    assert ",20.000000,\n" in text      # empty per-image ssim cell
    assert "# mean_ssim,\n" in text     # empty summary ssim line


def test_integer_transport_encoding_is_exact():
    """uint16 IR / uint8 GT transport: bit-identical uint8 predictions; the
    metrics may differ by the 1-ulp constant-divide strength reduction
    (make_infer_fn docstring invariant)."""
    import jax.numpy as jnp

    from ircolor_tpu.eval.runner import make_infer_fn
    from ircolor_tpu.models.wrapper import generator_from_config

    cfg = Config(img_size=32, n_blocks=1, ngf=8)
    module = generator_from_config(cfg)
    rng = np.random.RandomState(0)
    # Values exactly representable as k/255 (8-bit sources) and m/65535.
    ir_k = rng.randint(0, 256, (2, 32, 32, 1)).astype(np.float32)
    gt_k = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.float32)
    ir01 = ir_k / 255.0
    gt01 = gt_k / 255.0

    import jax

    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    infer = make_infer_fn(module)

    pred_f, m_f = infer(params, jnp.asarray(ir01 * 2.0 - 1.0), jnp.asarray(gt01))
    ir_u16 = np.rint(ir01 * 65535.0).astype(np.uint16)
    gt_u8 = np.rint(gt01 * 255.0).astype(np.uint8)
    pred_i, m_i = infer(params, jnp.asarray(ir_u16), jnp.asarray(gt_u8))

    # Predictions may differ where a pre-quantization value sits within the
    # 1-ulp divide difference of a k+0.5 rounding boundary — allow one
    # quantization step (the documented contract), not bit-exactness.
    diff = np.abs(
        np.asarray(pred_f).astype(np.int16) - np.asarray(pred_i).astype(np.int16)
    )
    assert diff.max() <= 1, f"pred differs by {diff.max()} quantization steps"
    for k in m_f:
        np.testing.assert_allclose(
            np.asarray(m_f[k]), np.asarray(m_i[k]), rtol=1e-5, atol=1e-6
        )

    # uint8 IR leg (8-bit sources ride the half-size encoding): same
    # contract vs the uint16 form — k/255 == 257k/65535 exactly, so the two
    # integer paths may themselves differ only by the 1-ulp divide.
    ir_u8 = np.rint(ir01 * 255.0).astype(np.uint8)
    pred_i8, m_i8 = infer(params, jnp.asarray(ir_u8), jnp.asarray(gt_u8))
    diff8 = np.abs(
        np.asarray(pred_i8).astype(np.int16) - np.asarray(pred_i).astype(np.int16)
    )
    assert diff8.max() <= 1
    for k in m_i8:
        np.testing.assert_allclose(
            np.asarray(m_i8[k]), np.asarray(m_i[k]), rtol=1e-5, atol=1e-6
        )


def test_aot_export_roundtrip(tmp_path):
    """jax.export serving artifact: serialize with weights baked in, reload,
    and match the live module's uint8 output exactly."""
    import jax
    import jax.numpy as jnp

    from ircolor_tpu.export.aot import export_inference, load_exported, save_exported
    from ircolor_tpu.models.wrapper import generator_from_config

    cfg = Config(img_size=32, n_blocks=1, ngf=8)
    module = generator_from_config(cfg)
    rng = np.random.RandomState(0)
    ir = (rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    blob = export_inference(module, params, 32, 32, batch_size=2, platforms=("cpu",))
    path = str(tmp_path / "netG_serve.stablehlo")
    save_exported(path, blob)

    served = load_exported(path)
    got = np.asarray(served.call(jnp.asarray(ir)))

    fake = module.apply({"params": params}, jnp.asarray(ir), train=False)
    want = np.asarray(
        jnp.floor(jnp.clip((fake + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    )
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_aot_export_strips_pallas_paths(tmp_path, monkeypatch):
    """Serving artifacts must be pure StableHLO: a module carrying
    pallas_block=True (the live-TPU inference default) is exported through
    the XLA graph — the Mosaic custom call would be rejected by jax.export
    and would pin the artifact to one libtpu. Proven by making the kernel
    path explode if traced."""
    import jax
    import jax.numpy as jnp

    from ircolor_tpu.export.aot import export_inference, load_exported, save_exported
    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.models.wrapper import generator_from_config

    def boom(*a, **k):  # pragma: no cover - fails the test if reached
        raise AssertionError("pallas kernel traced into the export graph")

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(gen_mod, "resnet_block_pallas", boom)

    cfg = Config(img_size=32, n_blocks=1, ngf=8)
    plain = generator_from_config(cfg)  # init on the XLA path (same tree)
    params = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    module = plain.clone(
        pallas_block=True, pallas_block_min_area=0,
        pallas_block_min_launch=0, use_pallas=False
    )
    blob = export_inference(module, params, 32, 32, batch_size=1, platforms=("cpu",))
    path = str(tmp_path / "strip_serve.stablehlo")
    save_exported(path, blob)
    served = load_exported(path)
    ir = np.random.RandomState(0).rand(1, 32, 32, 1).astype(np.float32) * 2 - 1
    out = np.asarray(served.call(jnp.asarray(ir)))
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8


def test_aot_export_keep_pallas_same_fleet_artifact(monkeypatch):
    """keep_pallas=True: the fused-kernel inference path (the measured-
    fastest serving graph) exports as a TPU-only artifact carrying the
    Mosaic custom call — opt-in via DisabledSafetyCheck, refused for
    non-TPU platforms."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ircolor_tpu.export.aot import (
        artifact_has_tpu_kernels,
        export_inference,
    )
    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.models.wrapper import generator_from_config

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)

    cfg = Config(img_size=32, n_blocks=1, ngf=32)  # bottleneck C=128: gate-able
    plain = generator_from_config(cfg)
    params = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    module = plain.clone(pallas_block_min_area=0, pallas_block_min_launch=0)
    assert module.pallas_block
    blob = export_inference(
        module, params, 32, 32, batch_size=1, platforms=("tpu",),
        keep_pallas=True,
    )
    # The artifact CALLS the Mosaic kernel (python-side lowering runs on
    # CPU; execution needs a compatible libtpu — TPU-validated separately).
    # artifact_has_tpu_kernels inspects the MLIR, not the raw bytes: a
    # keep_pallas blob always contains the literal "tpu_custom_call" in its
    # DisabledSafetyCheck metadata, kernels or not.
    assert artifact_has_tpu_kernels(blob)
    with pytest.raises(ValueError, match="tpu"):
        export_inference(
            module, params, 32, 32, batch_size=1, platforms=("cpu",),
            keep_pallas=True,
        )
    # Gates off (default min_area at 32²): keep_pallas export succeeds but
    # produces a kernel-less artifact — the helper must say so (run_export
    # downgrades its log line on this signal).
    blob_off = export_inference(
        plain, params, 32, 32, batch_size=1, keep_pallas=True,
    )
    assert b"tpu_custom_call" in blob_off  # metadata string IS present...
    assert not artifact_has_tpu_kernels(blob_off)  # ...but no kernel call


def test_aot_export_batchnorm_variables_dict(tmp_path):
    """norm='batch' models export with the full variables dict (batch_stats
    baked in), matching make_infer_fn's accepted forms."""
    import jax
    import jax.numpy as jnp

    from ircolor_tpu.export.aot import export_inference, load_exported, save_exported
    from ircolor_tpu.models.wrapper import generator_from_config

    cfg = Config(img_size=32, n_blocks=1, ngf=8, norm="batch")
    module = generator_from_config(cfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    blob = export_inference(
        module, dict(variables), 32, 32, batch_size=1, platforms=("cpu",)
    )
    path = str(tmp_path / "bn_serve.stablehlo")
    save_exported(path, blob)
    served = load_exported(path)
    ir = np.random.RandomState(0).rand(1, 32, 32, 1).astype(np.float32) * 2 - 1
    out = np.asarray(served.call(jnp.asarray(ir)))
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8


def test_run_test_spatial_sharded(kaist_tree, tmp_path):
    """--sp-devices shards the image H axis over the (fake) mesh; summary
    metrics must match the single-device run up to float reduction order."""
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single"), **base))
    s2 = run_test(Config(output_dir=str(tmp_path / "sp"), sp_devices=2, **base))
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 0.1
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-3


def test_run_test_spatial_fused_blocks_engage(kaist_tree, tmp_path, monkeypatch):
    """--sp-devices with pallas_block: the runner wires spatial_mesh so the
    fused blocks stay ON under sharding (shard_map halo exchange; run in
    interpret mode on CPU) instead of falling back to XLA — metrics must
    match the single-device fused run."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.models import wrapper as wrap_mod
    from ircolor_tpu.ops.pallas_resblock import (
        resnet_block_pallas,
        resnet_block_pallas_spatial,
    )

    orig_from_config = wrap_mod.generator_from_config
    monkeypatch.setattr(
        wrap_mod, "generator_from_config",
        # engage the fused gate at the tiny test bottleneck (8×8 px)
        lambda cfg: orig_from_config(cfg).clone(
            pallas_block_min_area=0, pallas_block_min_launch=0),
    )
    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "resnet_block_pallas",
        functools.partial(resnet_block_pallas, interpret=True),
    )
    calls = []

    def counted_spatial(*a, **kw):
        calls.append(1)
        return resnet_block_pallas_spatial(*a, interpret=True, **kw)

    monkeypatch.setattr(gen_mod, "resnet_block_pallas_spatial", counted_spatial)
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=32, test_batch_size=4, n_blocks=1,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
        # nb/head off: this test isolates the spatial BLOCK path (batch 4
        # is inside the small-batch band, which would otherwise engage
        # them without an interpret-mode monkeypatch).
        pallas_norm_blur=False, pallas_head=False,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single_f"), **base))
    s2 = run_test(Config(output_dir=str(tmp_path / "sp_f"), sp_devices=2, **base))
    assert calls, "spatial fused block never engaged under --sp-devices"
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 0.1
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-3


def test_run_test_2d_spatial_auto_degrades_lanepack(kaist_tree, tmp_path):
    """--sp-devices 4 --sp-w-devices 2 with the DEFAULT lanepack=True config:
    the runner must transparently rebuild the generator with lanepack=False
    (instead of raising) and produce metrics matching the single-device run."""
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    cfg2d = Config(
        output_dir=str(tmp_path / "sp2d"), sp_devices=4, sp_w_devices=2, **base
    )
    assert cfg2d.lanepack  # the combination that previously raised
    s1 = run_test(Config(output_dir=str(tmp_path / "single2"), **base))
    s2 = run_test(cfg2d)
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 0.1
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-3


def test_run_test_sp_w_requires_sp_devices(kaist_tree, tmp_path):
    """sp_w_devices is a FACTOR of the spatial mesh; without sp_devices > 1
    it used to be silently ignored (unsharded eval) — now refused."""
    root, _ = kaist_tree
    cfg = Config(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False, output_dir=str(tmp_path / "o"),
        sp_w_devices=2,
    )
    with pytest.raises(ValueError, match="sp_w_devices"):
        run_test(cfg)


def test_run_test_2d_h_divisor_uses_h_shard_count(kaist_tree, tmp_path):
    """2-D tiling shards H over sp_devices // sp_w_devices devices, so
    H=40 with sp_devices=8, sp_w_devices=2 (H-shards=4) is valid even
    though 40 % 8 != 0 — the old check refused it."""
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=40, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single40"), **base))
    s2 = run_test(Config(
        output_dir=str(tmp_path / "sp40"), sp_devices=8, sp_w_devices=2, **base
    ))
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 0.1


def test_run_test_data_parallel(kaist_tree, tmp_path):
    """--dp-devices N in test mode: the batch is sharded over the (fake)
    mesh via shard_map — each device infers whole images, so per-image
    metrics must match the single-device run almost exactly."""
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single"), **base))
    s2 = run_test(Config(output_dir=str(tmp_path / "dp"), dp_devices=4, **base))
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 1e-4
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-6


def test_run_test_data_parallel_guards(kaist_tree, tmp_path):
    root, _ = kaist_tree
    base = dict(
        mode="test", img_size=32, test_batch_size=4,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False,
    )
    with pytest.raises(ValueError, match="divide"):
        run_test(Config(output_dir=str(tmp_path / "bad"), dp_devices=3, **base))
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_test(Config(
            output_dir=str(tmp_path / "bad2"), dp_devices=4, sp_devices=2, **base
        ))
