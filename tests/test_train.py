"""Training integration tests: tiny end-to-end runs on a synthetic tree —
finite losses, checkpoints appear, best-ckpt logic fires, resume restores,
train-step math (hinge + composite) matches manual computation.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.config import Config
from ircolor_tpu.losses.vgg import VGG16Features, init_vgg16_params
from ircolor_tpu.train.loop import train_kaist
from ircolor_tpu.train.state import create_train_state
from ircolor_tpu.train.step import make_train_step, make_val_step


def tiny_cfg(root, save_dir, **kw):
    base = dict(
        mode="train",
        img_size=32,
        batch_size=2,
        epochs=2,
        save_every=1,
        n_blocks=1,
        ngf=8,
        num_workers=2,
        train_roots=(str(root / "set00"),),
        save_dir=str(save_dir),
        lr_decay_start_epoch=1,
        log_every=2,
        seed=0,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def step_setup():
    cfg = Config(img_size=32, batch_size=2, n_blocks=1, ngf=8)
    state, g_mod, d_mod, (opt_g, opt_d) = create_train_state(cfg, steps_per_epoch=10)
    vgg_mod = VGG16Features()
    vgg_params = init_vgg16_params()
    step = make_train_step(cfg, g_mod, d_mod, vgg_mod, opt_g, opt_d, donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "ir": jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1),
        "rgb": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
    }
    return cfg, state, step, batch, (g_mod, d_mod, vgg_mod, vgg_params)


def test_pallas_block_train_gating():
    """Fused-block training (custom_vjp path) engages only on a
    single-device data mesh: pallas_call does not GSPMD-partition, so
    multi-device DP must fall back to the XLA block (identical params)."""
    multi = Config(img_size=32, batch_size=8, n_blocks=1, ngf=8,
                   pallas_block=True, pallas_block_train=True)
    _, g_multi, _, _ = create_train_state(multi, steps_per_epoch=2)
    assert not g_multi.pallas_block  # 8 fake CPU devices → multi-device mesh

    single = multi.replace(dp_devices=1)
    _, g_single, _, _ = create_train_state(single, steps_per_epoch=2)
    assert g_single.pallas_block  # single-device mesh keeps the fused path

    off = multi.replace(dp_devices=1, pallas_block_train=False)
    _, g_off, _, _ = create_train_state(off, steps_per_epoch=2)
    assert not g_off.pallas_block


def test_fused_bwd_training_trajectory_matches_xla_bwd(monkeypatch):
    """5 full train steps with the fused block backward (interpret mode on
    CPU) track the XLA-backward trajectory: the custom_vjp backwards are
    the same math, so param divergence stays at accumulation-noise level
    even compounded across optimizer steps."""
    import functools

    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.ops.pallas_resblock import resnet_block_pallas

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    calls = []
    monkeypatch.setattr(
        gen_mod, "resnet_block_pallas",
        functools.partial(
            lambda *a, **kw: calls.append(kw.get("bwd")) or
            resnet_block_pallas(*a, **kw),
            interpret=True,
        ),
    )
    rng = np.random.RandomState(3)
    batches = [
        {
            "ir": jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1),
            "rgb": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
        }
        for _ in range(5)
    ]
    vgg_mod = VGG16Features()
    vgg_params = init_vgg16_params()

    def run(bwd):
        # ngf=32 → block dim 128: the generator's Mosaic 128-lane alignment
        # gate passes, so the fused path (and the bwd under test) actually
        # engages — at ngf=8 this test would compare XLA to itself.
        cfg = Config(img_size=32, batch_size=2, n_blocks=1, ngf=32,
                     dp_devices=1, pallas_block=True, pallas_block_train=True,
                     pallas_block_bwd=bwd)
        state, g_mod, d_mod, (opt_g, opt_d) = create_train_state(
            cfg, steps_per_epoch=10
        )
        g_mod = g_mod.clone(pallas_block_min_area=0, pallas_block_min_launch=0)
        step = make_train_step(cfg, g_mod, d_mod, vgg_mod, opt_g, opt_d,
                               donate=False)
        metrics = None
        for b in batches:
            state, metrics = step(state, b, vgg_params)
        return state, metrics

    s_x, m_x = run("xla")
    s_f, m_f = run("fused_wg")
    # The fused path must have ENGAGED in both runs (5 steps × 1 block each,
    # through jit tracing at least once per bwd mode).
    assert "xla" in calls and "fused_wg" in calls, calls
    np.testing.assert_allclose(
        float(m_x["loss_G"]), float(m_f["loss_G"]), rtol=1e-4
    )
    # Param tolerance: Adam normalizes gradient MAGNITUDE away, so entries
    # whose true gradient is ~0 (e.g. IN-inert conv biases: exact-0 grads on
    # the fused path vs rounding-level ~0 on the XLA path) can flip update
    # sign and drift by up to steps·lr = 5·2e-4 = 1e-3 while training the
    # identical function — the documented inert-bias effect
    # (ops/pallas_resblock.py resnet_block_pallas docstring). Bound at
    # 2.5·steps·lr; meaningful-gradient entries agree far tighter.
    for a, b in zip(jax.tree.leaves(s_x.g_params), jax.tree.leaves(s_f.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)


def test_pallas_block_bwd_flag_reaches_module():
    """Config.pallas_block_bwd ('xla'|'fused'|'fused_wg') is threaded
    through create_train_state to the generator module, which passes it
    to resnet_block_pallas (the custom_vjp backward selector)."""
    for mode in ("xla", "fused", "fused_wg"):
        cfg = Config(img_size=32, batch_size=8, n_blocks=1, ngf=8,
                     dp_devices=1, pallas_block=True,
                     pallas_block_train=True, pallas_block_bwd=mode)
        _, g_mod, _, _ = create_train_state(cfg, steps_per_epoch=2)
        assert g_mod.pallas_block_bwd == mode


def test_train_step_runs_and_updates(step_setup):
    cfg, state, step, batch, _ = step_setup
    new_state, metrics = step(state, batch, init_vgg16_params())
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # Params actually moved.
    g0 = jax.tree.leaves(state.g_params)[0]
    g1 = jax.tree.leaves(new_state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    d0 = jax.tree.leaves(state.d_params)[0]
    d1 = jax.tree.leaves(new_state.d_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_train_step_loss_math(step_setup):
    """The composite G loss equals the hand-assembled weighted sum."""
    cfg, state, step, batch, _ = step_setup
    _, m = step(state, batch, init_vgg16_params())
    total = (
        cfg.lambda_gan * float(m["loss_G_GAN"])
        + float(m["loss_G_L1"])
        + float(m["loss_G_perc"])
        + float(m["loss_G_TV"])
        + float(m["loss_G_SSIM"])
    )
    np.testing.assert_allclose(float(m["loss_G"]), total, rtol=1e-5)


def test_d_phase_hinge_math(step_setup):
    """loss_D equals 0.5·(relu(1−D(real)).mean()+relu(1+D(fake)).mean())
    computed with the PRE-update D params and PRE-update G fake."""
    cfg, state, step, batch, (g_mod, d_mod, _, _) = step_setup
    _, m = step(state, batch, init_vgg16_params())
    fake = g_mod.apply({"params": state.g_params}, batch["ir"], train=True)
    pr = d_mod.apply({"params": state.d_params},
                     jnp.concatenate([batch["ir"], batch["rgb"]], -1), train=True)
    pf = d_mod.apply({"params": state.d_params},
                     jnp.concatenate([batch["ir"], fake], -1), train=True)
    expect = 0.5 * (
        float(jnp.mean(jax.nn.relu(1.0 - pr))) + float(jnp.mean(jax.nn.relu(1.0 + pf)))
    )
    np.testing.assert_allclose(float(m["loss_D"]), expect, rtol=1e-5)


def test_val_step_per_sample(step_setup):
    cfg, state, step, batch, (g_mod, *_rest) = step_setup
    val = make_val_step(g_mod)
    per = np.asarray(val(state.g_params, batch))
    fake = np.asarray(g_mod.apply({"params": state.g_params}, batch["ir"]))
    manual = np.abs(fake - np.asarray(batch["rgb"])).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(per, manual, rtol=1e-5)


def test_train_kaist_end_to_end(kaist_tree, tmp_path):
    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "ckpt")
    summary = train_kaist(cfg)

    assert np.isfinite(summary["best_val_l1"])
    assert summary["epochs_run"] == 2
    # Checkpoints: every epoch (save_every=1) + best.
    for name in ("netG_epoch_001.msgpack", "netG_epoch_002.msgpack",
                 "netG_epoch_001.pth", "netG_best.msgpack"):
        assert os.path.isfile(os.path.join(cfg.save_dir, name)), name
    # orbax full-state dirs exist.
    orbax_dir = os.path.join(cfg.save_dir, "orbax")
    assert os.path.isdir(os.path.join(orbax_dir, "0001"))


def test_resume_continues(kaist_tree, tmp_path):
    root, _ = kaist_tree
    save = tmp_path / "ckpt_resume"
    cfg1 = tiny_cfg(root, save, epochs=1)
    s1 = train_kaist(cfg1)
    cfg2 = tiny_cfg(root, save, epochs=2, resume=True)
    s2 = train_kaist(cfg2)
    assert s2["epochs_run"] == 1  # resumed from epoch 1, ran only epoch 2
    assert os.path.isfile(os.path.join(str(save), "netG_epoch_002.msgpack"))


def test_exported_pth_loads_into_eval(kaist_tree, tmp_path):
    """Train → .pth export → test-mode load: the full checkpoint cycle."""
    from ircolor_tpu.eval.runner import run_test

    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "ckpt2", epochs=1)
    train_kaist(cfg)
    pth = os.path.join(cfg.save_dir, "netG_epoch_001.pth")
    test_cfg = Config(
        mode="test", img_size=32, test_batch_size=2, n_blocks=1, ngf=8,
        test_roots=(str(root / "set02"),), output_dir=str(tmp_path / "res"),
        test_G_weights=pth, topk=2, save_comparisons=False, num_workers=2,
    )
    summary = run_test(test_cfg)
    assert summary["count"] > 0


def test_batch_norm_training_and_eval(kaist_tree, tmp_path):
    """norm='batch' (ref get_norm_layer :154-165): running stats update in
    train-mode forwards, eval uses them; full tiny train + test cycle."""
    from ircolor_tpu.eval.runner import run_test

    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "bn_ckpt", epochs=1, norm="batch")
    state0, g_mod, d_mod, (opt_g, opt_d) = create_train_state(cfg, steps_per_epoch=3)
    assert state0.g_stats, "batch norm init must produce batch_stats"

    vgg_mod = VGG16Features()
    step = make_train_step(cfg, g_mod, d_mod, vgg_mod, opt_g, opt_d, donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "ir": jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32) * 2 - 1),
        "rgb": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1),
    }
    state1, metrics = step(state0, batch, init_vgg16_params())
    assert np.isfinite(float(metrics["loss_G"]))
    # Running stats moved (torch train-mode semantics).
    s0 = jax.tree.leaves(state0.g_stats)[0]
    s1 = jax.tree.leaves(state1.g_stats)[0]
    assert not np.allclose(np.asarray(s0), np.asarray(s1))

    # Full loop + eval with batch norm end to end.
    summary = train_kaist(cfg)
    assert np.isfinite(summary["best_val_l1"])
    test_cfg = Config(
        mode="test", img_size=32, test_batch_size=2, n_blocks=1, ngf=8, norm="batch",
        test_roots=(str(root / "set02"),), output_dir=str(tmp_path / "bn_res"),
        topk=2, save_comparisons=False, num_workers=2,
    )
    s = run_test(test_cfg)
    assert s["count"] > 0


def test_none_norm_trains(kaist_tree, tmp_path):
    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "nn_ckpt", epochs=1, norm="none")
    summary = train_kaist(cfg)
    assert np.isfinite(summary["best_val_l1"])


def test_train_kaist_shard_map_mode(kaist_tree, tmp_path):
    """dp_mode='shard_map' drives the explicit-collectives step end to end —
    with the DEFAULT integer batch transport, asserting a sane TRAINING loss
    magnitude (not just finite validation: validation decodes the transport
    separately, so it stayed green while the round-2 shard_map step trained
    on raw uint16/uint8 values)."""
    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "sm_ckpt", epochs=1, dp_mode="shard_map")
    assert cfg.batch_transport == "int"  # the combination that was broken
    summary = train_kaist(cfg)
    assert np.isfinite(summary["best_val_l1"])
    losses = summary["final_epoch_losses"]
    assert np.isfinite(losses["loss_G"])
    # [-1,1] inputs bound pixel L1 by 2 (raw integer inputs blow past this).
    assert losses["loss_G_L1"] <= 2.0 * cfg.lambda_L1


def test_train_kaist_spatial_mode(kaist_tree, tmp_path):
    """Spatially-sharded training end to end: --sp-devices 2 in TRAIN mode
    builds the ('data','sp') mesh (H halo-exchanged by GSPMD in fwd+bwd),
    trains a truncated epoch with sane losses, and validates through the
    same mesh."""
    root, _ = kaist_tree
    cfg = tiny_cfg(root, tmp_path / "sp_ckpt", epochs=1, sp_devices=2)
    summary = train_kaist(cfg, max_steps_per_epoch=2)
    assert np.isfinite(summary["best_val_l1"])
    losses = summary["final_epoch_losses"]
    assert np.isfinite(losses["loss_G"]) and np.isfinite(losses["loss_D"])
    assert losses["loss_G_L1"] <= 2.0 * cfg.lambda_L1


def test_train_spatial_requires_gspmd(kaist_tree, tmp_path):
    """sp_devices > 1 with dp_mode='shard_map' is rejected loudly (the
    shard_map step partitions the batch axis only)."""
    root, _ = kaist_tree
    cfg = tiny_cfg(
        root, tmp_path / "sp_bad", sp_devices=2, dp_mode="shard_map"
    )
    with pytest.raises(ValueError, match="gspmd"):
        train_kaist(cfg)


@pytest.mark.parametrize("dp_mode", ["gspmd", "shard_map"])
@pytest.mark.parametrize("transport", ["float", "int"])
@pytest.mark.parametrize("norm", ["instance", "none"])
def test_train_mode_matrix_smoke(kaist_tree, tmp_path, dp_mode, transport, norm):
    """(dp_mode × transport × norm) combination matrix: every CLI-reachable
    path trains one truncated epoch with sane losses (the loop's
    _check_loss_sanity guard raises inside train_kaist on violation).
    norm='batch' is excluded: the shard_map step rejects it by design
    (cross-device batch-stats semantics)."""
    root, _ = kaist_tree
    cfg = tiny_cfg(
        root, tmp_path / f"mx_{dp_mode}_{transport}_{norm}", epochs=1,
        dp_mode=dp_mode, batch_transport=transport, norm=norm,
    )
    summary = train_kaist(cfg, max_steps_per_epoch=2)
    losses = summary["final_epoch_losses"]
    assert np.isfinite(losses["loss_G"]) and np.isfinite(losses["loss_D"])
    assert losses["loss_G_L1"] <= 2.0 * cfg.lambda_L1


@pytest.mark.parametrize("dp_mode", ["gspmd", "shard_map"])
def test_train_lambda_zero_skips_structurally(kaist_tree, tmp_path, dp_mode):
    """λ_perc == 0 / λ_gan == 0 must skip the VGG towers and the G-side GAN
    forward STRUCTURALLY in BOTH DP step implementations — the shard_map
    step used to build them unconditionally (paying two VGG forwards for a
    0-weighted term, with 0·inf NaN-poisoning exposure the GSPMD step
    didn't have). train_kaist now passes vgg_params=None when λ_perc == 0,
    so this fails loudly if either step still traces the tower. D itself
    still trains (reference semantics: λ_gan scales only G's GAN term)."""
    root, _ = kaist_tree
    cfg = tiny_cfg(
        root, tmp_path / f"lz_{dp_mode}", epochs=1, dp_mode=dp_mode,
        lambda_perc=0.0, lambda_gan=0.0,
    )
    summary = train_kaist(cfg, max_steps_per_epoch=2)
    losses = summary["final_epoch_losses"]
    assert losses["loss_G_perc"] == 0.0 and losses["loss_G_GAN"] == 0.0
    assert np.isfinite(losses["loss_D"]) and losses["loss_D"] > 0.0
    assert np.isfinite(losses["loss_G"]) and losses["loss_G"] > 0.0


@pytest.mark.parametrize("dp_mode", ["gspmd", "shard_map"])
def test_train_mode_matrix_bf16_smoke(kaist_tree, tmp_path, dp_mode):
    """bf16 rows of the combination matrix (the TPU training dtype): the
    one-pass-IN bf16 compute path + f32 loss reductions + integer batch
    transport train sanely through both DP step implementations. (On CPU
    the fused Pallas kernels stay off; this covers the XLA bf16 path the
    GSPMD multi-device fallback also uses.)"""
    root, _ = kaist_tree
    cfg = tiny_cfg(
        root, tmp_path / f"mxb_{dp_mode}", epochs=1, dp_mode=dp_mode,
        batch_transport="int", compute_dtype="bf16",
    )
    summary = train_kaist(cfg, max_steps_per_epoch=2)
    losses = summary["final_epoch_losses"]
    assert np.isfinite(losses["loss_G"]) and np.isfinite(losses["loss_D"])
    assert losses["loss_G_L1"] <= 2.0 * cfg.lambda_L1


def test_loss_sanity_guard():
    """_check_loss_sanity raises on NaN and on an L1 past the [-1,1] bound."""
    from ircolor_tpu.train.loop import _check_loss_sanity

    cfg = Config(img_size=32)
    ok = {"loss_D": 1.0, "loss_G": 35.0, "loss_G_L1": 20.0}
    _check_loss_sanity(ok, cfg, 1, 1)
    with pytest.raises(FloatingPointError, match="Non-finite"):
        _check_loss_sanity({**ok, "loss_G": float("nan")}, cfg, 1, 1)
    with pytest.raises(FloatingPointError, match="batch_transport"):
        # raw-uint8-scale L1 ≈ 127 · λ_L1 — the round-2 failure signature
        _check_loss_sanity({**ok, "loss_G_L1": 127.0 * cfg.lambda_L1}, cfg, 1, 1)


def test_single_forward_step_matches_two_forward_reference(step_setup):
    """The fused step runs ONE generator forward per step (the D phase
    consumes the vjp primal the G phase backprops through); the reference
    runs G twice (ref :1637, :1657) — deterministic G makes them equal.
    Guard the restructure against an explicit two-forward formulation."""
    import optax  # noqa: F401 (sgd below)
    from ircolor_tpu.losses.gan import hinge_d_loss, hinge_g_loss
    from ircolor_tpu.losses.ssim import ssim_loss
    from ircolor_tpu.losses.tv import tv_loss
    from ircolor_tpu.train.state import TrainState

    cfg, state, _, batch, (g_mod, d_mod, vgg_mod, vgg_params) = step_setup
    # Plain SGD so updated params differ from originals by exactly the raw
    # gradients: biases that the following instance norm cancels have a TRUE
    # gradient of zero, and an adaptive optimizer (Adam) amplifies their
    # float-noise-level grads to ±lr with compilation-dependent sign.
    opt_g = opt_d = optax.sgd(1.0)
    # Pin the two-forward D phase AND the depthwise blur backward: this test
    # isolates the single-G-forward restructure at tight (2e-6) tolerance,
    # and both the d_concat double-batch wgrad and the banded-matmul blur
    # VJP reassociate f32 sums beyond it when the two formulations compile
    # as separate graphs (each has its own exact equivalence test:
    # test_d_concat_step_matches_two_forward below;
    # test_ops.py::test_blur_downsample_matmul_bwd_matches_autodiff +
    # ::test_generator_grads_match_with_blur_matmul_bwd).
    pinned = cfg.replace(d_concat=False, blur_matmul_bwd=False)
    g_mod = g_mod.clone(blur_matmul_bwd=False)
    step = make_train_step(
        pinned, g_mod, d_mod, vgg_mod, opt_g, opt_d,
        donate=False,
    )

    def two_forward_step(state, batch, vgg_params):
        ir, rgb = batch["ir"], batch["rgb"]
        fake_detached = g_mod.apply({"params": state.g_params}, ir, train=True)

        def d_loss_fn(d_params):
            pr = d_mod.apply({"params": d_params}, jnp.concatenate([ir, rgb], -1), train=True)
            pf = d_mod.apply({"params": d_params}, jnp.concatenate([ir, fake_detached], -1), train=True)
            return hinge_d_loss(pr, pf)

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_upd, d_opt = opt_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_upd)

        def g_loss_fn(g_params):
            fake = g_mod.apply({"params": g_params}, ir, train=True)
            pf = d_mod.apply({"params": d_params}, jnp.concatenate([ir, fake], -1), train=True)
            fake32, rgb32 = fake.astype(jnp.float32), rgb.astype(jnp.float32)
            feat_f = vgg_mod.apply({"params": vgg_params}, fake).astype(jnp.float32)
            feat_r = vgg_mod.apply({"params": vgg_params}, rgb).astype(jnp.float32)
            total = (
                cfg.lambda_gan * hinge_g_loss(pf)
                + jnp.mean(jnp.abs(fake32 - rgb32)) * cfg.lambda_L1
                + jnp.mean(jnp.abs(feat_f - feat_r)) * cfg.lambda_perc
                + tv_loss(fake32) * cfg.lambda_tv
                + ssim_loss((fake32 + 1) / 2, (rgb32 + 1) / 2) * cfg.lambda_ssim
            )
            return total

        g_grads = jax.grad(g_loss_fn)(state.g_params)
        g_upd, g_opt = opt_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upd)
        return TrainState(
            g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt,
            step=state.step + 1, g_stats=state.g_stats, d_stats=state.d_stats,
        ), loss_d

    got, _ = step(state, batch, vgg_params)
    want, _ = jax.jit(two_forward_step, donate_argnums=())(state, batch, vgg_params)
    for a, b in zip(jax.tree_util.tree_leaves(got.g_params), jax.tree_util.tree_leaves(want.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got.d_params), jax.tree_util.tree_leaves(want.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


def test_d_concat_step_matches_two_forward(step_setup):
    """cfg.d_concat (one double-batch D forward/backward over [real ‖ fake])
    computes the same loss surface as the two-forward form under instance
    norm: identical losses and D grads to float reassociation noise (the
    double-batch wgrad sums 2B terms in one reduction, so bitwise equality
    is not expected — and post-Adam params can't be compared at step 1: the
    int-transport test's ±lr sign-flip caveat applies)."""
    from ircolor_tpu.losses.gan import hinge_d_loss

    cfg, state, step, batch, (g_mod, d_mod, vgg_mod, vgg_params) = step_setup
    fake = jax.lax.stop_gradient(
        g_mod.apply({"params": state.g_params}, batch["ir"], train=True)
    )
    real_in = jnp.concatenate([batch["ir"], batch["rgb"]], axis=-1)
    fake_in = jnp.concatenate([batch["ir"], fake], axis=-1)

    def loss_two(d_params):
        pr = d_mod.apply({"params": d_params}, real_in, train=True)
        pf = d_mod.apply({"params": d_params}, fake_in, train=True)
        return hinge_d_loss(pr, pf)

    def loss_cat(d_params):
        pred = d_mod.apply(
            {"params": d_params},
            jnp.concatenate([real_in, fake_in], axis=0), train=True,
        )
        b = real_in.shape[0]
        return hinge_d_loss(pred[:b], pred[b:])

    l_a, g_a = jax.value_and_grad(loss_two)(state.d_params)
    l_b, g_b = jax.value_and_grad(loss_cat)(state.d_params)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # And the full step produces the same losses either way (cfg default is
    # d_concat=True; build the two-forward step explicitly).
    step_two = make_train_step(
        cfg.replace(d_concat=False), g_mod, d_mod, vgg_mod,
        *create_train_state(cfg, steps_per_epoch=10)[3], donate=False,
    )
    _, m_a = step(state, dict(batch), vgg_params)
    _, m_b = step_two(state, dict(batch), vgg_params)
    for k in m_a:
        np.testing.assert_allclose(
            float(m_a[k]), float(m_b[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_int_transport_step_matches_float(step_setup):
    """A step fed the integer-encoded batch must produce the same losses and
    params as the float batch (transport exactness through the whole D+G
    update; tolerance covers the 1-ulp constant-divide strength reduction)."""
    cfg, state, step, batch, (_, _, _, vgg_params) = step_setup
    ir01 = (np.asarray(batch["ir"]) + 1.0) / 2.0
    rgb01 = (np.asarray(batch["rgb"]) + 1.0) / 2.0
    # Quantize to representable sample values so both encodings are exact.
    ir01 = np.rint(ir01 * 255.0) / np.float32(255.0)
    rgb01 = np.rint(rgb01 * 255.0) / np.float32(255.0)
    fbatch = {
        "ir": jnp.asarray((ir01 * 2.0 - 1.0).astype(np.float32)),
        "rgb": jnp.asarray((rgb01 * 2.0 - 1.0).astype(np.float32)),
    }
    ibatch = {
        "ir": jnp.asarray((np.rint(ir01 * 255.0) * 257).astype(np.uint16)),
        "rgb": jnp.asarray(np.rint(rgb01 * 255.0).astype(np.uint8)),
    }
    s_f, m_f = step(state, fbatch, vgg_params)
    s_i, m_i = step(state, ibatch, vgg_params)
    for k in m_f:
        np.testing.assert_allclose(float(m_f[k]), float(m_i[k]), rtol=2e-4, atol=2e-5)
    # NOTE: post-Adam params are NOT compared — at step 1 Adam's update is
    # ±lr·sign(grad), so a 1-ulp input difference flips near-zero-gradient
    # entries by 2·lr. The val step (pure forward) must agree tightly:
    g_mod = step_setup[4][0]
    val = make_val_step(g_mod)
    v_f = np.asarray(val(state.g_params, fbatch))
    v_i = np.asarray(val(state.g_params, ibatch))
    np.testing.assert_allclose(v_f, v_i, rtol=1e-5, atol=1e-6)
