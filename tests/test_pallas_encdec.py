"""Parity tests for the fused encoder/decoder segment backward
(ops/pallas_encdec.py) — interpret mode vs XLA autodiff of the identical
segment (zero-SAME conv + one-pass IN + ReLU, ref
`/root/reference/Code/ir_colorization.py:469-482, 503-507`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm_onepass
from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused, seg_tile_h


def _ref_segment(zs, k):
    z = zs[0] if len(zs) == 1 else jnp.concatenate(zs, axis=-1)
    raw = conv2d(z, k, padding=((1, 1), (1, 1)))
    return jax.nn.relu(instance_norm_onepass(raw))


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("wgrad_mode", ["xla", "fused"])
@pytest.mark.parametrize(
    "cins,cout,hw",
    [((16,), 8, (16, 16)), ((16,), 32, (8, 24)), ((24, 8), 16, (16, 16))],
)
def test_segment_grad_matches_xla(wgrad_mode, cins, cout, hw):
    h, w = hw
    b = 2
    zs = tuple(_rand((b, h, w, c), 7 + i) for i, c in enumerate(cins))
    k = _rand((3, 3, sum(cins), cout), 3) * 0.2
    cot = _rand((b, h, w, cout), 11)

    want_out = _ref_segment(zs, k)
    want_dzs, want_dk = jax.grad(
        lambda zs_, k_: jnp.sum(_ref_segment(zs_, k_) * cot), argnums=(0, 1)
    )(zs, k)

    fn = lambda zs_, k_: conv_in_relu_fused(wgrad_mode, 8, True, zs_, k_)
    got_out = fn(zs, k)
    got_dzs, got_dk = jax.grad(
        lambda zs_, k_: jnp.sum(fn(zs_, k_) * cot), argnums=(0, 1)
    )(zs, k)

    np.testing.assert_allclose(got_out, want_out, atol=2e-5, rtol=1e-4)
    for got, want in zip(got_dzs, want_dzs):
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(got_dk, want_dk, atol=3e-3, rtol=1e-3)


def test_relu_dead_zone_masks_gradient():
    """A channel whose cotangent lands entirely in the ReLU dead zone must
    contribute nothing — the mask path, not just the happy path."""
    b, h, w = 1, 8, 8
    z = _rand((b, h, w, 4), 0)
    k = _rand((3, 3, 4, 4), 1) * 0.2
    cot_fn = lambda out: jnp.sum(jnp.where(out > 0, 0.0, 1.0) * out)

    dz_ref = jax.grad(lambda z_: cot_fn(_ref_segment((z_,), k)))(z)
    dz_got = jax.grad(
        lambda z_: cot_fn(conv_in_relu_fused("xla", 8, True, (z_,), k))
    )(z)
    np.testing.assert_allclose(dz_got, dz_ref, atol=1e-5)
    # where ReLU is active the integrand is 0·out ⇒ both gradients vanish
    assert float(jnp.max(jnp.abs(dz_ref))) == 0.0


def test_seg_tile_h_budget():
    assert seg_tile_h(512, 640, 128) == 16   # down1: xcat th32 would be 16.7MB
    assert seg_tile_h(256, 320, 256) == 16   # down2
    assert seg_tile_h(256, 320, 128) == 32   # up1 dgrad
    assert seg_tile_h(100, 320, 128) == 4    # only th=4 divides 100
    assert seg_tile_h(7, 320, 128) is None


def test_generator_encdec_bwd_matches_xla(monkeypatch):
    """Generator-level wiring: identical param tree, same primal, matching
    grads between pallas_encdec_bwd on/off (interpret mode), and the fused
    path must actually ENGAGE (pallas_call in the grad jaxpr)."""
    from ircolor_tpu.config import Config
    from ircolor_tpu.models import generator as gen_mod
    from ircolor_tpu.models.wrapper import generator_from_config
    from ircolor_tpu.ops.pallas_encdec import conv_in_relu_fused as real_fn

    monkeypatch.setattr(gen_mod, "_pallas_available", lambda: True)
    monkeypatch.setattr(gen_mod, "_fused_dtype_ok", lambda d: True)
    monkeypatch.setattr(
        gen_mod, "conv_in_relu_fused",
        lambda wm, th, interp, zs, k: real_fn(wm, th, True, zs, k),
    )
    cfg = Config(img_size=32, ngf=64, n_blocks=0)  # ngf 64 ⇒ cout 128/256
    # Pin every other kernel family off: the b=2 small-batch band would
    # engage nb/head under the patched availability (no interpret wiring
    # here) — this test isolates the enc/dec segment path.
    base = generator_from_config(cfg).clone(
        pallas_norm_blur=False, pallas_head=False, pallas_block=False,
        use_pallas=False,
    )
    xla_mod = base.clone(pallas_encdec_bwd=False)
    fus_mod = base.clone(pallas_encdec_bwd=True)
    x = _rand((2, 32, 32, 1), 5)
    params = xla_mod.init(jax.random.PRNGKey(0), x)["params"]
    p2 = fus_mod.init(jax.random.PRNGKey(0), x, train=True)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    out_x = xla_mod.apply({"params": params}, x, train=True)
    out_f = fus_mod.apply({"params": params}, x, train=True)
    np.testing.assert_allclose(out_f, out_x, atol=2e-5, rtol=1e-4)

    def loss(mod):
        return lambda p: jnp.sum(jnp.abs(mod.apply({"params": p}, x, train=True)))

    jaxpr = str(jax.make_jaxpr(jax.grad(loss(fus_mod)))(params))
    n_pallas = jaxpr.count("pallas_call")
    assert n_pallas >= 4, f"fused enc/dec backward did not engage: {n_pallas}"
    assert "pallas_call" not in str(jax.make_jaxpr(jax.grad(loss(xla_mod)))(params))

    gx = jax.grad(loss(xla_mod))(params)
    gf = jax.grad(loss(fus_mod))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_x:
        got = np.asarray(flat_f[path], np.float64)
        want = np.asarray(leaf, np.float64)
        # The closed-form IN backward with precomputed moments is the same
        # exact formula as autodiff evaluated in a different association
        # order — per-leaf noise is ~1e-5 relative (same class the fused
        # block ships with, "equivalence-tested to ~1e-4 rel").
        if np.linalg.norm(want) < 1e-2:
            # conv bias through IN: gradient is analytically ZERO — each
            # side carries its own (uncorrelated) reduction noise, so only
            # negligibility is comparable, not the difference.
            assert np.linalg.norm(got) < 1e-2, jax.tree_util.keystr(path)
            continue
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        # On this f32 CPU config the XLA Norm runs TWO-pass stats while the
        # fused segment standardizes on the one-pass form (what the bf16
        # compute path ships) — chained through 3 segments + blur VJPs that
        # formulation difference amplifies to ~8e-4 here. Same-formulation
        # parity is pinned at ~3e-5 by test_segment_grad_matches_xla.
        assert rel < 2e-3, (
            f"grad rel-norm {rel:.2e} at {jax.tree_util.keystr(path)}"
        )
