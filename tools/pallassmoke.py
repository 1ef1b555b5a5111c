"""TPU compile + parity smoke for the round-3 Pallas kernels at tiny shapes.

Mosaic remote-compile failures in this environment are silent HTTP 500s
(CLAUDE.md) — this runs each new kernel at a small shape FIRST, asserting
numerics against XLA, so a broken kernel is caught in seconds instead of
wedging a full pallasbench sweep. Run SERIALLY on the TPU.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ircolor_tpu.ops.conv import conv2d
from ircolor_tpu.ops.norm import instance_norm
from ircolor_tpu.ops.padding import reflect_pad2d
from ircolor_tpu.ops.pallas_conv import conv3x3_valid_pallas_v2
from ircolor_tpu.ops.pallas_resblock import (
    conv3x3_reflect_fused,
    conv3x3_sum_fused,
    resnet_block_pallas,
)


def check(name, got, want, atol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    status = "OK " if err <= atol else "FAIL"
    print(f"{status} {name:32s} max|Δ|={err:.2e}", flush=True)
    return err <= atol


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 32, 64, 128
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    k2 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want_conv = conv2d(xp, k1, padding="VALID")
    ok = True
    for mode in ("preshift", "dxcat"):
        got = jax.jit(
            lambda v, mode=mode: conv3x3_valid_pallas_v2(v, k1, tile_h=16, mode=mode)
        )(xp)
        ok &= check(f"conv v2 {mode}", got, want_conv, atol=0.5)

    want_refl = conv2d(reflect_pad2d(x, 1), k1, padding="VALID")
    raw, m, inv = jax.jit(
        lambda v: conv3x3_reflect_fused(v, k1, tile_h=16)
    )(x)
    ok &= check("v3 reflconv raw", raw, want_refl, atol=0.5)
    m_ref = jnp.mean(want_refl.astype(jnp.float32), axis=(1, 2))
    ok &= check("v3 reflconv mean", m, m_ref, atol=0.02)

    h1 = jax.nn.relu(instance_norm(want_refl))
    want_block = x + instance_norm(
        conv2d(reflect_pad2d(h1, 1), k2, padding="VALID")
    ).astype(x.dtype)
    got_block = jax.jit(
        lambda v: resnet_block_pallas(v, k1, k2, tile_h=16)
    )(x)
    ok &= check("v3 full block", got_block, want_block, atol=0.5)

    want_zero = conv2d(x, k1, padding=((1, 1), (1, 1)))
    got_z, _, _ = jax.jit(
        lambda v: conv3x3_sum_fused([v], [k1], pad="zero", tile_h=16)
    )(x)
    ok &= check("sum_fused zero n=1", got_z, want_zero, atol=0.5)

    # Second leg MUST be 128-aligned in channels: Mosaic cannot DMA-slice a
    # tile-padded C<128 memref (the C=64 variant fails to compile — see the
    # constraint note in conv3x3_sum_fused). 256+128 mirrors the up1 skip.
    xb = jnp.asarray(rng.rand(B, H, W, 128).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
    kb = jnp.asarray(rng.randn(3, 3, 128, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    want2 = want_zero + conv2d(xb, kb, padding=((1, 1), (1, 1)))
    got2, _, _ = jax.jit(
        lambda a, b2: conv3x3_sum_fused([a, b2], [k1, kb], pad="zero", tile_h=16)
    )(x, xb)
    ok &= check("sum_fused zero n=2", got2, want2, atol=0.5)

    # Fused BACKWARD (conv3x3_dgrad_fused ×2 inside the block custom_vjp):
    # grads of the bwd="fused" block vs the bwd="xla" block on the same
    # cotangent. Exercises remote compile of the dgrad kernel (3 DMA legs,
    # in-kernel fold matmuls, stats epilogue) end-to-end.
    gct = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    def _blk_loss(bwd):
        def f(v):
            return jnp.sum(
                (resnet_block_pallas(v, k1, k2, tile_h=16, bwd=bwd)
                 * gct).astype(jnp.float32)
            )
        return f

    try:
        dx_x = jax.jit(jax.grad(_blk_loss("xla")))(x)
        for bwd in ("fused", "fused_wg"):
            dx_f = jax.jit(jax.grad(_blk_loss(bwd)))(x)
            ok &= check(f"block bwd {bwd} dx", dx_f, dx_x, atol=0.5)
        # wgrad parity (the dk side of fused_wg) vs the XLA backward:
        def _k_loss(bwd):
            def f(k):
                return jnp.sum(
                    (resnet_block_pallas(x, k, k2, tile_h=16, bwd=bwd)
                     * gct).astype(jnp.float32)
                )
            return f

        dk_x = jax.jit(jax.grad(_k_loss("xla")))(k1)
        dk_f = jax.jit(jax.grad(_k_loss("fused_wg")))(k1)
        ok &= check("block bwd fused_wg dk1", dk_f, dk_x, atol=1.0)
    except Exception as exc:
        print(
            f"FAIL block bwd fused: {type(exc).__name__}: {str(exc)[:200]}",
            flush=True,
        )
        ok = False

    # norm_relu_blur_down: IN-normalize+ReLU on load + reflect blur-pool
    # (the generator down-stage chain). C=128 is the d1 output width.
    from ircolor_tpu.ops.norm import instance_norm_stats
    from ircolor_tpu.ops.pallas_blur import norm_relu_blur_down_pallas
    from ircolor_tpu.ops.blurpool import blur_downsample

    mean, inv = instance_norm_stats(x)
    normed = jax.nn.relu(
        (x.astype(jnp.float32) - mean[:, None, None, :]) * inv[:, None, None, :]
    ).astype(x.dtype)
    want_nb = blur_downsample(normed)
    try:
        got_nb = jax.jit(
            lambda v, m2, i2: norm_relu_blur_down_pallas(v, m2, i2)
        )(x, mean, inv)
        ok &= check("norm_relu_blur_down", got_nb, want_nb, atol=0.05)
    except Exception as exc:  # keep later, independent cases running
        print(
            f"FAIL norm_relu_blur_down: {type(exc).__name__}: {str(exc)[:200]}",
            flush=True,
        )
        ok = False

    # conv7x7_head_pallas: fused output head (IN+ReLU on load, reflect
    # halos in-kernel, p=32 lane-packed matmuls). C=64 is the real outc
    # input width; W=64 exercises WG=2 (both edge windows + a neighbor).
    from ircolor_tpu.ops.conv import conv2d as _conv2d
    from ircolor_tpu.ops.padding import reflect_pad2d as _rpad
    from ircolor_tpu.ops.pallas_head import conv7x7_head_pallas

    xh = jnp.asarray(rng.rand(B, H, 64, 64).astype(np.float32) * 2 - 1).astype(jnp.bfloat16)
    k7 = jnp.asarray(rng.randn(7, 7, 64, 3).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    mh, ih = instance_norm_stats(xh)
    zh = jax.nn.relu(
        (xh.astype(jnp.float32) - mh[:, None, None, :]) * ih[:, None, None, :]
    ).astype(xh.dtype)
    want_h = _conv2d(_rpad(zh, 3), k7, padding="VALID")
    try:
        got_h = jax.jit(
            lambda v, m2, i2: conv7x7_head_pallas(v, m2, i2, k7)
        )(xh, mh, ih)
        ok &= check("conv7x7_head", got_h, want_h, atol=0.05)
    except Exception as exc:
        print(
            f"FAIL conv7x7_head: {type(exc).__name__}: {str(exc)[:200]}",
            flush=True,
        )
        ok = False

    # int8 head (round 5): same schedule, int8 matmuls + fixed 127/6σ
    # activation scale. Reference = the interpret-mode kernel itself (exact
    # integer math inside; TPU-vs-interpret diffs are quant-step-boundary
    # flips, same bound as the int8 block).
    try:
        want_hq = conv7x7_head_pallas(
            xh, mh, ih, k7, quant=True, interpret=True
        )
        got_hq = jax.jit(
            lambda v, m2, i2: conv7x7_head_pallas(v, m2, i2, k7, quant=True)
        )(xh, mh, ih)
        ok &= check("conv7x7_head_q", got_hq, want_hq, atol=0.05)
    except Exception as exc:
        print(
            f"FAIL conv7x7_head_q: {type(exc).__name__}: {str(exc)[:200]}",
            flush=True,
        )
        ok = False

    # Mosaic int8 matmul CAPABILITY probe (not a regression gate): if this
    # compiles and matches, an int8 fused resblock (in-DMA halos + int8
    # matmuls + IN epilogue) is buildable on top of the XLA-level int8
    # results from tools/int8probe.py. If Mosaic rejects int8 dots, that
    # kernel idea closes here regardless of the XLA probe.
    from jax.experimental import pallas as pl

    def _i8mm_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    a8 = jnp.asarray(rng.randint(-127, 128, (256, 256)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 128, (256, 256)), jnp.int8)
    try:
        got8 = jax.jit(
            pl.pallas_call(
                _i8mm_kernel,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
            )
        )(a8, b8)
        want8 = jnp.dot(a8.astype(jnp.int32), b8.astype(jnp.int32))
        check("mosaic int8 matmul (info)", got8, want8, atol=0)
    except Exception as exc:  # capability info only — never fails the smoke
        print(
            f"INFO mosaic int8 matmul unsupported: "
            f"{type(exc).__name__}: {str(exc)[:200]}",
            flush=True,
        )

    # Spatial-sharding halo forms — the kernels behind
    # resnet_block_pallas(_q)_spatial (`test --sp-devices N`). A multi-device
    # shard_map cannot run here (the relay exposes one chip and the halo DMA
    # pattern is what differs anyway), so smoke the kernels directly against
    # the in-kernel-reflect form with locally-built halo rows.
    try:
        slab = reflect_pad2d(x, 1)[:, :, 1:-1]
        got_p, mp, ip = jax.jit(
            lambda v: conv3x3_reflect_fused(v, k1, tile_h=16, halo="provided")
        )(slab)
        ok &= check("provided-halo reflconv", got_p, want_refl, atol=0.5)
        ok &= check("provided-halo mean", mp, m_ref, atol=0.02)
    except Exception as exc:
        print(
            f"FAIL provided-halo reflconv: {type(exc).__name__}: "
            f"{str(exc)[:200]}",
            flush=True,
        )
        ok = False

    # separate mode (the shipped wrapper form): unpadded input + 1-row halo
    # operands, float and int8, at nh=2 (boundary DMAs) and nh=1.
    rows = (x[:, 1:2], x[:, -2:-1])
    for th in (16, 32):
        try:
            got_s, ms, _ = jax.jit(
                lambda v, t, bt, th=th: conv3x3_reflect_fused(
                    v, k1, tile_h=th, halo="separate", halo_rows=(t, bt)
                )
            )(x, *rows)
            ok &= check(f"separate-halo reflconv th{th}", got_s, want_refl,
                        atol=0.5)
        except Exception as exc:
            print(
                f"FAIL separate-halo reflconv th{th}: {type(exc).__name__}: "
                f"{str(exc)[:200]}",
                flush=True,
            )
            ok = False
    try:
        from ircolor_tpu.ops.pallas_resblock import conv3x3_reflect_fused_q
        from ircolor_tpu.ops.quant import _AMAX_FLOOR, quantize_weight_per_channel

        kq1, sw1 = quantize_weight_per_channel(k1)
        amax = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3)), _AMAX_FLOOR
        )
        qs = 127.0 / amax
        sc1 = (amax / 127.0)[:, None] * sw1[None, :]
        want_q = jax.jit(
            lambda v: conv3x3_reflect_fused_q(v, kq1, sc1, qscale=qs, tile_h=16)
        )(x)[0]
        got_q = jax.jit(
            lambda v, t, bt: conv3x3_reflect_fused_q(
                v, kq1, sc1, qscale=qs, tile_h=16, halo="separate",
                halo_rows=(t, bt)
            )
        )(x, *rows)[0]
        # Same quant grid either way — differences are rounding-boundary
        # flips only (one int8 step through the dequant scale).
        ok &= check("separate-halo int8 vs reflect", got_q, want_q, atol=0.05)
    except Exception as exc:
        print(
            f"FAIL separate-halo int8: {type(exc).__name__}: "
            f"{str(exc)[:200]}",
            flush=True,
        )
        ok = False

    print("SMOKE PASS" if ok else "SMOKE FAIL", flush=True)
    _sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
