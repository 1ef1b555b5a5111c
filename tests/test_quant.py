"""int8 quantized inference mode (ops/quant.py, Config.quant_int8).

The quantized mode is opt-in serving (no reference counterpart); these
tests pin (a) the dequantize-exact scale math, (b) that the quantized
generator's param tree is IDENTICAL to the float one (checkpoints
interchangeable), (c) that the int8 path actually engages (s8 convs in the
lowered HLO), (d) closeness to the float forward, and (e) that training
always forces the mode off (round-to-nearest has zero gradient).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ircolor_tpu.config import Config
from ircolor_tpu.models.generator import ResnetUNetGenerator
from ircolor_tpu.models.wrapper import generator_from_config
from ircolor_tpu.ops.quant import (
    conv2d_int8,
    quantize_dynamic,
    quantize_weight_per_channel,
)


def _ref_conv(x, w, padding="VALID", stride=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=dn
    )


def test_conv2d_int8_exact_for_int_valued_operands():
    """Operands that are exactly int8·scale grids round-trip with zero error:
    proves the scale bookkeeping (per-sample sx, per-channel sw) is exact."""
    rng = np.random.RandomState(0)
    sx0, sx1 = 0.031, 0.17  # distinct per-sample scales
    xi = rng.randint(-127, 128, (2, 9, 11, 8)).astype(np.float32)
    xi[0, 0, 0, 0], xi[1, 0, 0, 0] = 127, 127  # pin each sample's amax
    x = jnp.asarray(xi * np.array([sx0, sx1]).reshape(2, 1, 1, 1))
    swc = rng.uniform(0.01, 0.2, 16).astype(np.float32)
    wi = rng.randint(-127, 128, (3, 3, 8, 16)).astype(np.float32)
    wi[0, 0, 0, :] = 127  # pin each channel's amax
    w = jnp.asarray(wi * swc)
    y = conv2d_int8(x, w, padding=((1, 1), (1, 1)))
    y_ref = _ref_conv(x, w, padding=((1, 1), (1, 1)))
    # rtol allows the 1-LSB flips where f32 scale recovery (amax·s/127 ≠ s
    # exactly in f32) lands a value on a rounding boundary — the point is
    # that the scale bookkeeping has no systematic (2×/offset/axis) error.
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=5e-3, atol=1e-2)


def test_conv2d_int8_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(64) * 0.01, jnp.float32)
    y = np.asarray(conv2d_int8(x, w, padding="SAME", bias=b))
    y_ref = np.asarray(_ref_conv(x, w, padding="SAME") + b)
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.03, rel  # int8 rounding noise only


def test_quantize_dynamic_per_sample_independence():
    """Each sample's quantization is independent of its batchmates — results
    are invariant to batching (and therefore to DP sharding)."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    b = jnp.asarray(rng.randn(1, 8, 8, 4) * 100.0, jnp.float32)  # huge range
    qa_solo, sa_solo = quantize_dynamic(a)
    batch = jnp.concatenate([a, b], axis=0)
    qab, sab = quantize_dynamic(batch)
    np.testing.assert_array_equal(np.asarray(qa_solo[0]), np.asarray(qab[0]))
    np.testing.assert_allclose(np.asarray(sa_solo[0]), np.asarray(sab[0]))


def test_quantize_weight_per_channel_shapes():
    w = jnp.asarray(np.random.RandomState(3).randn(5, 5, 3, 7), jnp.float32)
    wq, sw = quantize_weight_per_channel(w)
    assert wq.shape == w.shape and wq.dtype == jnp.int8
    assert sw.shape == (7,)
    # zero-channel safety: no inf/nan scales
    w0 = w.at[..., 0].set(0.0)
    wq0, sw0 = quantize_weight_per_channel(w0)
    assert np.isfinite(np.asarray(sw0)).all()
    assert not np.asarray(wq0[..., 0]).any()


def _small_cfgs(quant: bool):
    kw = dict(
        input_nc=1, output_nc=3, ngf=16, n_blocks=2,
        dtype=jnp.float32, quant_int8=quant,
    )
    return ResnetUNetGenerator(**kw)


def test_generator_param_tree_identical():
    mod_f = _small_cfgs(False)
    mod_q = _small_cfgs(True)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    shapes = lambda m: jax.tree_util.tree_map(
        lambda v: (v.shape, str(v.dtype)),
        jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))["params"],
    )
    assert shapes(mod_f) == shapes(mod_q)


def test_generator_quant_forward_close_and_engaged():
    mod_f, mod_q = _small_cfgs(False), _small_cfgs(True)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 32, 32, 1) * 0.5, jnp.float32)
    params = mod_f.init(jax.random.PRNGKey(0), x)["params"]
    y_f = np.asarray(mod_f.apply({"params": params}, x))
    y_q = np.asarray(mod_q.apply({"params": params}, x))
    # int8 rounding noise through 2 blocks + down/up stages; IN renormalizes
    # each stage so the noise stays relative, and tanh bounds the output.
    assert np.abs(y_q - y_f).mean() < 0.05
    assert np.abs(y_q).max() <= 1.0
    # the path must actually engage: the lowered IR carries int8 tensors
    hlo = jax.jit(lambda p, v: mod_q.apply({"params": p}, v)).lower(params, x).as_text()
    assert "xi8>" in hlo, "quantized generator lowered without int8 ops"
    hlo_f = jax.jit(lambda p, v: mod_f.apply({"params": p}, v)).lower(params, x).as_text()
    assert "xi8>" not in hlo_f


def test_generator_quant_train_arg_uses_float_path():
    """train=True must never trace the zero-gradient int8 ops."""
    mod_q = _small_cfgs(True)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = mod_q.init(jax.random.PRNGKey(0), x)["params"]
    hlo = (
        jax.jit(lambda p, v: mod_q.apply({"params": p}, v, train=True))
        .lower(params, x)
        .as_text()
    )
    assert "xi8>" not in hlo


def test_create_train_state_forces_quant_off():
    from ircolor_tpu.train.state import create_train_state

    cfg = Config(
        mode="train", img_size=32, ngf=8, n_blocks=1, batch_size=2,
        quant_int8=True,
    )
    _, g_module, _, _ = create_train_state(cfg, steps_per_epoch=4)
    assert g_module.quant_int8 is False


def test_config_cli_flag():
    import argparse

    from ircolor_tpu.cli import build_config

    ns = argparse.Namespace(config=None, quant_int8=True)
    cfg = build_config(ns, "test")
    assert cfg.quant_int8 is True


def test_quant_dp_eval_matches_single_device(tmp_path):
    """Per-SAMPLE activation scales make the quantized forward invariant to
    batch sharding up to f32 reduction order: --dp-devices eval tracks the
    single-device run at metric precision. (Not bit-exact: a reassociated
    amax/conv sum can flip an occasional int8 rounding boundary — with
    per-BATCH scales the deltas would be orders of magnitude larger and
    batch-composition-dependent.)"""
    from ircolor_tpu.data.synthetic import make_kaist_tree
    from ircolor_tpu.eval.runner import run_test

    root = tmp_path / "tree"
    make_kaist_tree(str(root), {"set02": {"V000": 8}}, size_hw=(32, 32))
    base = dict(
        mode="test", img_size=32, test_batch_size=4, ngf=16, n_blocks=2,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False, quant_int8=True,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single"), **base))
    s2 = run_test(Config(output_dir=str(tmp_path / "dp"), dp_devices=4, **base))
    assert s2["count"] == s1["count"]
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 1e-3
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-4


def test_quant_spatial_sharding_eval(tmp_path):
    """quant × spatial sharding: the per-sample amax becomes a cross-shard
    reduce under GSPMD — results stay at metric precision vs single-device."""
    from ircolor_tpu.data.synthetic import make_kaist_tree
    from ircolor_tpu.eval.runner import run_test

    root = tmp_path / "tree"
    make_kaist_tree(str(root), {"set02": {"V000": 4}}, size_hw=(32, 32))
    base = dict(
        mode="test", img_size=32, test_batch_size=2, ngf=16, n_blocks=2,
        test_roots=(str(root / "set02"),), topk=2, num_workers=2,
        save_comparisons=False, quant_int8=True,
    )
    s1 = run_test(Config(output_dir=str(tmp_path / "single"), **base))
    s2 = run_test(Config(output_dir=str(tmp_path / "sp"), sp_devices=2, **base))
    assert s2["count"] == s1["count"]
    # Sharded reductions reassociate f32 sums; an int8 boundary flip moves a
    # uint8 output pixel by 1 → millidB PSNR wiggle on tiny images. 0.01 dB
    # is 5× tighter than the float-path parity budget.
    assert abs(s2["mean_psnr"] - s1["mean_psnr"]) < 1e-2
    assert abs(s2["mean_ssim"] - s1["mean_ssim"]) < 1e-3


def test_quant_aot_export_roundtrip(tmp_path):
    """The int8 serving mode is pure StableHLO: it survives jax.export with
    quantization intact (reloaded artifact == live quantized module)."""
    from ircolor_tpu.export.aot import export_inference, load_exported, save_exported

    cfg = Config(img_size=32, n_blocks=1, ngf=8, quant_int8=True)
    module = generator_from_config(cfg)
    assert module.quant_int8 is True
    rng = np.random.RandomState(5)
    ir = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]

    blob = export_inference(module, params, 32, 32, batch_size=2, platforms=("cpu",))
    path = str(tmp_path / "netG_serve_int8.stablehlo")
    save_exported(path, blob)
    got = np.asarray(load_exported(path).call(ir))

    fake = module.apply({"params": params}, ir, train=False)
    want = np.asarray(
        jnp.floor(jnp.clip((fake + 1.0) / 2.0, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("no_aa", [False, True])
def test_generator_quant_variants_run(no_aa):
    mod = ResnetUNetGenerator(
        ngf=8, n_blocks=1, no_antialias=no_aa, no_antialias_up=no_aa,
        dtype=jnp.float32, quant_int8=True,
    )
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    y = mod.apply({"params": mod.init(jax.random.PRNGKey(0), x)["params"]}, x)
    assert y.shape == (1, 16, 16, 3)


def test_quant_convs_disabled_when_fused_kernels_engage(monkeypatch):
    """The XLA int8 enc/dec convs LOSE when the fused nb/head kernels engage
    (+3.0 ms at 512×640 b16: fwdvariants int8_ship 106.0 vs int8_nbh 103.0,
    docs/PERF.md r3 run D): the generator must keep those convs bf16
    whenever either fused kernel will run, and keep the QuantConv path
    where neither does. n_blocks=0 isolates the enc/dec sites (resblocks
    carry their own int8 handling)."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down
    from ircolor_tpu.ops.pallas_head import outc_head

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "norm_relu_blur_down",
        functools.partial(norm_relu_blur_down, interpret=True),
    )
    monkeypatch.setattr(
        gen_mod, "outc_head", functools.partial(outc_head, interpret=True)
    )
    kw = dict(n_blocks=0, dtype=jnp.float32, quant_int8=True)
    fused = ResnetUNetGenerator(
        pallas_norm_blur=True, pallas_norm_blur_min_area=0,
        pallas_norm_blur_min_launch=0,
        pallas_head=True, pallas_head_min_area=0, pallas_head_min_launch=0,
        **kw,
    )
    plain = ResnetUNetGenerator(**kw)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    hlo_fused = (
        jax.jit(lambda p, v: fused.apply({"params": p}, v)).lower(params, x).as_text()
    )
    # With the fused kernels engaged, NO XLA int8 conv remains by default:
    # the dynamic QuantConv sites are deselected (their epilogues de-fuse
    # the nb/head kernels) and the round-5 fixed-scale up2 / int8 head are
    # opt-in only (they failed the accuracy gate — Config.quant_fixed_u2 /
    # quant_head).
    i8_convs = sum(
        1 for l in hlo_fused.splitlines() if "convolution" in l and "xi8>" in l
    )
    assert i8_convs == 0, f"unexpected int8 convs in the fused graph: {i8_convs}"
    hlo_plain = (
        jax.jit(lambda p, v: plain.apply({"params": p}, v)).lower(params, x).as_text()
    )
    i8_convs_plain = sum(
        1 for l in hlo_plain.splitlines() if "convolution" in l and "xi8>" in l
    )
    assert i8_convs_plain > 2, "QuantConv path lost without fused kernels"


def test_int8_budget_gate_micro_train(kaist_tree, tmp_path):
    """Automated accuracy-budget regression gate behind the int8-by-default
    serving mode (VERDICT r4 #2). Micro-trains a small generator on the
    synthetic tree, then runs the FULL test pipeline (uint8 roundtrip
    before metrics, ref :1413) on the trained weights in float and int8
    serving modes and asserts the summary deltas stay inside a scaled
    budget. The full-scale tight gate (0.02 dB / 0.002 SSIM at 512×640 on a
    trained checkpoint — measured −0.011 dB / −0.0002 in round 4,
    docs/int8_budget_r4.json) runs per round on hardware via
    `tools/int8budget.py --assert-max-dpsnr 0.02 --assert-max-dssim 0.002`;
    this CPU gate catches mode-level breakage (scale absorption, QuantConv
    routing, transport) at bounds loose enough for the tiny scale but far
    below what any real int8 regression produces (a broken scale fold moves
    PSNR by whole dB)."""
    from ircolor_tpu.eval.runner import run_test
    from ircolor_tpu.train.loop import train_kaist

    root, _ = kaist_tree
    train_cfg = Config(
        mode="train", img_size=32, batch_size=2, epochs=2, save_every=2,
        n_blocks=2, ngf=16, num_workers=2, train_roots=(str(root / "set00"),),
        save_dir=str(tmp_path / "ckpt"), lr_decay_start_epoch=1, log_every=5,
        seed=0,
    )
    train_kaist(train_cfg)
    pth = os.path.join(train_cfg.save_dir, "netG_epoch_002.pth")
    assert os.path.isfile(pth)

    summaries = {}
    for mode, quant in (("float", False), ("int8", True)):
        cfg = Config(
            mode="test", img_size=32, test_batch_size=4, n_blocks=2, ngf=16,
            test_roots=(str(root / "set02"),),
            output_dir=str(tmp_path / f"res_{mode}"), test_G_weights=pth,
            topk=0, save_comparisons=False, num_workers=2, quant_int8=quant,
        )
        summaries[mode] = run_test(cfg)
    f, q = summaries["float"], summaries["int8"]
    assert q["count"] == f["count"] > 0
    assert abs(q["mean_psnr"] - f["mean_psnr"]) < 0.3, (f, q)
    assert abs(q["mean_ssim"] - f["mean_ssim"]) < 0.01, (f, q)
    assert abs(q["mean_mae"] - f["mean_mae"]) < 0.005, (f, q)


def test_conv2d_int8_fixed_close_to_float_on_bounded_inputs():
    """Fixed 127/6σ scale ≡ dynamic scheme for inputs in [0, 6): same
    rounding-noise-only contract (ops/quant.conv2d_int8_fixed)."""
    from ircolor_tpu.ops.quant import conv2d_int8_fixed

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(2, 12, 12, 8)).astype(np.float32))  # ~[0, 4]
    k = jnp.asarray(rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1)
    want = np.asarray(_ref_conv(np.asarray(x), np.asarray(k), padding=((1, 1), (1, 1))))
    got = np.asarray(conv2d_int8_fixed(x, k, padding=((1, 1), (1, 1))))
    # quant noise: ~6/127 per tap accumulated over 72 taps, well under 0.5
    assert np.max(np.abs(got - want)) < 0.5
    assert np.mean(np.abs(got - want)) < 0.05


def test_concat_conv_quant_fixed_param_layout_and_close():
    """ConcatConv3x3(quant_fixed=True): identical param tree to the float
    form; output tracks float at quant-noise scale on bounded inputs."""
    from ircolor_tpu.models.common import ConcatConv3x3

    rng = np.random.RandomState(1)
    a = jnp.asarray(np.abs(rng.randn(2, 8, 8, 6)).astype(np.float32))
    b = jnp.asarray(np.abs(rng.randn(2, 8, 8, 4)).astype(np.float32))
    plain = ConcatConv3x3(5)
    fixed = ConcatConv3x3(5, quant_fixed=True)
    p1 = plain.init(jax.random.PRNGKey(0), a, b)["params"]
    p2 = fixed.init(jax.random.PRNGKey(0), a, b)["params"]
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    y1 = np.asarray(plain.apply({"params": p1}, a, b))
    y2 = np.asarray(fixed.apply({"params": p1}, a, b))
    assert np.max(np.abs(y1 - y2)) < 0.6
    assert np.mean(np.abs(y1 - y2)) < 0.06


def test_generator_quant_fixed_u2_routing(monkeypatch):
    """With fused kernels engaged under quant (quant_convs deselected), the
    up2 conv routes to the fixed-scale int8 form — visible as an int8
    convolution in the lowered HLO even though QuantConv is disabled."""
    import functools

    import ircolor_tpu.models.generator as gen_mod
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down
    from ircolor_tpu.ops.pallas_head import outc_head, outc_head_q

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "norm_relu_blur_down",
        functools.partial(norm_relu_blur_down, interpret=True),
    )
    monkeypatch.setattr(
        gen_mod, "outc_head", functools.partial(outc_head, interpret=True)
    )
    monkeypatch.setattr(
        gen_mod, "outc_head_q", functools.partial(outc_head_q, interpret=True)
    )
    kw = dict(
        n_blocks=0, dtype=jnp.float32, quant_int8=True,
        quant_fixed_u2=True,  # opt-in since the accuracy-gate failure
    )
    fused = ResnetUNetGenerator(
        pallas_norm_blur=True, pallas_norm_blur_min_area=0,
        pallas_norm_blur_min_launch=0,
        pallas_head=True, pallas_head_min_area=0, pallas_head_min_launch=0,
        **kw,
    )
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = fused.init(jax.random.PRNGKey(0), x)["params"]
    hlo = (
        jax.jit(lambda p, v: fused.apply({"params": p}, v)).lower(params, x).as_text()
    )
    # exactly the up2 site contributes int8 convs (2 legs); enc/dec
    # QuantConv stays deselected (no dynamic per-sample amax quantize).
    assert "xi8>" in hlo, "fixed-scale int8 up2 not engaged"
