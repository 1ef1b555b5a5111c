"""The fused train step: D update + G update + composite loss, one jit.

Reference semantics (the per-batch hot loop,
`/root/reference/Code/ir_colorization.py:1629-1694`, trace in SURVEY.md §3.1):

  D phase: fake = G(ir) under no_grad (ref :1637-1638);
           L_D = 0.5·(relu(1−D(ir⊕rgb)).mean() + relu(1+D(ir⊕fake)).mean());
           Adam step on D (ref :1647-1651).
  G phase: a SECOND G forward WITH grad (ref :1657); D here is the UPDATED
           discriminator (optimizerD.step() ran first);
           L_G = 0.1·(−D(ir⊕fake).mean()) + 30·L1 + 30·VGG-L1 + 1e-4·TV
                 + 2·(1−SSIM on [0,1]) (ref :1662-1679); Adam step on G.

TPU-native structure: both phases compile into ONE jitted function with the
train state donated (params/opt buffers update in place). The literal
two-G-forward structure is preserved (SURVEY.md §7.1 item 7 — keeps the
optimizer-ordering math identical; the D-phase fake needs no stop_gradient
because the D grad is only taken w.r.t. d_params). Under a data-sharded
batch and replicated params, GSPMD turns the grad reductions into
all-reduces over ICI automatically — this same function IS the multi-chip
data-parallel step.

Loss scalars are returned as device arrays; the loop fetches them
asynchronously (no per-step host sync, unlike the reference's ``.item()``
calls, ref :1683-1684).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ircolor_tpu.config import Config
from ircolor_tpu.losses.gan import hinge_d_loss, hinge_g_loss
from ircolor_tpu.losses.ssim import ssim_loss
from ircolor_tpu.losses.tv import tv_loss
from ircolor_tpu.train.state import TrainState


def _decode_transport(ir: jnp.ndarray, rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trace-time decode of the integer batch transport (see BatchLoader).

    Batches may arrive as uint16 IR (``k·257`` for 8-bit sources — exactly
    k/255 as a rational — or the raw 16-bit value) and uint8 RGB, at 1/3 the
    host→device bytes of float32. Float batches pass through unchanged (the
    [-1,1] convention of the reference, ref :855-862, :1170-1177).
    """
    if ir.dtype == jnp.uint16:
        ir = ir.astype(jnp.float32) / 65535.0 * 2.0 - 1.0
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return ir, rgb


def composite_g_losses(
    cfg: Config,
    vgg_module: Any,
    vgg_params: Any,
    fake: jnp.ndarray,
    rgb: jnp.ndarray,
    loss_gan: jnp.ndarray,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """The reference's composite G objective (ref :1650-1676) minus the GAN
    forward, which callers compute (its D-stats threading differs between
    the GSPMD and shard_map steps): 30·L1 + 30·Perc + 1e-4·TV + 1·SSIM +
    λ_gan·loss_gan. ONE implementation for both DP steps so the structural
    λ==0 skips cannot desynchronize again.

    Loss terms whose λ is exactly 0 are skipped STRUCTURALLY — XLA cannot
    fold ``x * 0.0`` away (NaN/inf poisoning), so a zeroed λ must not build
    the term's subgraph at all (the VGG towers are the expensive case).

    Loss terms compute in float32 even under a bf16 compute path: the SSIM
    covariance terms cancel catastrophically in bf16 (observed SSIM map
    means > 1.7, i.e. negative "1−SSIM" loss) and the L1 reductions lose
    precision. Networks stay bf16; losses don't.
    """
    fake32 = fake.astype(jnp.float32)
    rgb32 = rgb.astype(jnp.float32)
    loss_l1 = (
        jnp.mean(jnp.abs(fake32 - rgb32)) * cfg.lambda_L1
        if cfg.lambda_L1 != 0.0
        else jnp.float32(0.0)
    )
    if cfg.lambda_perc != 0.0:
        feat_fake = vgg_module.apply({"params": vgg_params}, fake)
        feat_real = vgg_module.apply({"params": vgg_params}, rgb)
        loss_perc = (
            jnp.mean(jnp.abs(feat_fake.astype(jnp.float32) - feat_real.astype(jnp.float32)))
            * cfg.lambda_perc
        )
    else:
        loss_perc = jnp.float32(0.0)
    loss_tv = tv_loss(fake32) * cfg.lambda_tv if cfg.lambda_tv != 0.0 else jnp.float32(0.0)
    loss_ssim = (
        ssim_loss((fake32 + 1.0) / 2.0, (rgb32 + 1.0) / 2.0) * cfg.lambda_ssim
        if cfg.lambda_ssim != 0.0
        else jnp.float32(0.0)
    )
    total = cfg.lambda_gan * loss_gan + loss_l1 + loss_perc + loss_tv + loss_ssim
    metrics = {
        "loss_G": total,
        "loss_G_GAN": loss_gan,
        "loss_G_L1": loss_l1,
        "loss_G_perc": loss_perc,
        "loss_G_TV": loss_tv,
        "loss_G_SSIM": loss_ssim,
    }
    return total, metrics


def make_train_step(
    cfg: Config,
    g_module: Any,
    d_module: Any,
    vgg_module: Any,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    donate: bool = True,
    update_d: bool = True,
) -> Callable[[TrainState, dict[str, jnp.ndarray], Any], tuple[TrainState, dict[str, jnp.ndarray]]]:
    """Build the jitted step: (state, batch, vgg_params) → (state, metrics).

    Loss terms whose λ is exactly 0 are skipped STRUCTURALLY (the VGG tower /
    SSIM windows / D forward never enter the graph): XLA cannot fold
    ``x * 0.0`` away itself (NaN/inf semantics), so a zero weight would
    otherwise still pay the full compute. Metrics keys stay present (as 0.0)
    for logging stability. ``update_d=False`` additionally skips the D phase
    entirely — an ablation/benchmark knob (tools/trainbench.py), not a
    reference behavior (the reference always steps D, ref :1647-1651).

    BatchNorm (``cfg.norm == "batch"``): running stats follow torch train-mode
    semantics — every train-mode forward updates them, including the
    D-phase's no-grad G forward and all three D forwards per step
    (ref :1637-1659 run each net in .train() mode). Stats updates are carried
    as aux outputs so gradients flow only through params.
    """
    has_bn = cfg.norm == "batch"

    def g_apply(params, stats, ir):
        if not has_bn:
            return g_module.apply({"params": params}, ir, train=True), stats
        out, upd = g_module.apply(
            {"params": params, "batch_stats": stats}, ir, train=True,
            mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    def d_apply(params, stats, x):
        if not has_bn:
            return d_module.apply({"params": params}, x, train=True), stats
        out, upd = d_module.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    def step_fn(state: TrainState, batch: dict[str, jnp.ndarray], vgg_params: Any):
        ir, rgb = _decode_transport(batch["ir"], batch["rgb"])

        # ONE generator forward serves both phases. The reference runs G
        # twice per step (no-grad for D at ref :1637-1638, with grad at
        # :1657) but G is deterministic (instance norm, dropout off,
        # ref :771), so both forwards produce the SAME tensor — and XLA does
        # NOT CSE the duplicate (measured: the two-forward step compiles to
        # one extra full G forward ≈ 0.69 TFLOP/frame at 512×640). Here the
        # D phase consumes the primal of the same jax.vjp the G phase
        # backprops through. BatchNorm configs keep the literal two-forward
        # structure below: their running stats must update twice per step to
        # match torch train-mode semantics.
        single_forward = not has_bn

        if single_forward:
            # Non-BN g_apply passes stats through unchanged, so vjp over the
            # image output alone is complete; g_stats stays state.g_stats.
            fake_primal, g_vjp = jax.vjp(
                lambda p: g_apply(p, state.g_stats, ir)[0], state.g_params
            )
            fake_detached = jax.lax.stop_gradient(fake_primal)
            g_stats = state.g_stats
        else:
            fake_detached, g_stats = g_apply(state.g_params, state.g_stats, ir)

        # ---- D phase (hinge) ----
        if update_d:
            # Batch-concat form: ONE double-batch D forward/backward over
            # [real ‖ fake] instead of two. EXACT for instance/none norms
            # (per-sample statistics; hinge terms mean each half
            # independently) — BatchNorm keeps the literal two-forward
            # structure (its batch statistics would mix the halves).
            d_concat = cfg.d_concat and not has_bn

            def d_loss_fn(d_params):
                if d_concat:
                    both = jnp.concatenate([
                        jnp.concatenate([ir, rgb], axis=-1),
                        jnp.concatenate([ir, fake_detached], axis=-1),
                    ], axis=0)
                    pred, ds2 = d_apply(d_params, state.d_stats, both)
                    bsz = ir.shape[0]
                    return hinge_d_loss(pred[:bsz], pred[bsz:]), ds2
                pred_real, ds1 = d_apply(d_params, state.d_stats, jnp.concatenate([ir, rgb], axis=-1))
                pred_fake, ds2 = d_apply(d_params, ds1, jnp.concatenate([ir, fake_detached], axis=-1))
                return hinge_d_loss(pred_real, pred_fake), ds2

            (loss_d, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
            d_updates, d_opt = opt_d.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
        else:
            loss_d = jnp.float32(0.0)
            d_stats = state.d_stats
            d_params, d_opt = state.d_params, state.d_opt

        # ---- G phase (uses the freshly updated D, matching ref ordering) ----
        def g_loss_terms(fake, gs):
            ds = d_stats
            if cfg.lambda_gan != 0.0:
                pred_fake, ds = d_apply(d_params, d_stats, jnp.concatenate([ir, fake], axis=-1))
                loss_gan = hinge_g_loss(pred_fake)
            else:
                loss_gan = jnp.float32(0.0)
            total, metrics = composite_g_losses(
                cfg, vgg_module, vgg_params, fake, rgb, loss_gan
            )
            return total, {"metrics": metrics, "g_stats": gs, "d_stats": ds}

        if single_forward:
            (_, aux), dl_dfake = jax.value_and_grad(
                lambda f: g_loss_terms(f, g_stats), has_aux=True
            )(fake_primal)
            (g_grads,) = g_vjp(dl_dfake)
        else:

            def g_loss_fn(g_params):
                fake, gs = g_apply(g_params, g_stats, ir)
                return g_loss_terms(fake, gs)

            (_, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = opt_g.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = TrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            step=state.step + 1,
            g_stats=aux["g_stats"],
            d_stats=aux["d_stats"],
        )
        metrics = {"loss_D": loss_d, **aux["metrics"]}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_val_step(g_module: Any) -> Callable[..., jnp.ndarray]:
    """Jitted validation: per-sample pixel-L1 (ref :1521-1542).

    Returns (B,) so the host can mask padded rows of the final batch and
    compute the sample-weighted mean exactly like the reference
    (``total += loss·B; total/count``). Eval mode: BatchNorm (if any) uses
    running stats (``model.eval()``, ref :1527).
    """

    def val_fn(g_params, batch, g_stats=None):
        ir, rgb = _decode_transport(batch["ir"], batch["rgb"])
        variables = {"params": g_params}
        if g_stats:
            variables["batch_stats"] = g_stats
        fake = g_module.apply(variables, ir, train=False)
        return jnp.mean(jnp.abs(fake - rgb), axis=(1, 2, 3))

    return jax.jit(val_fn)


def make_val_sum_step(g_module: Any) -> Callable[..., tuple[jnp.ndarray, jnp.ndarray]]:
    """Multihost-safe validation step: (params, batch, mask) → (Σ l1, Σ mask).

    ``mask`` is 1.0 for real rows, 0.0 for host-side padding of a short final
    batch. The reductions over the data-sharded batch compile to GSPMD
    all-reduces, so the returned scalars are REPLICATED — every host can
    fetch them (a per-sample (B,) output sharded across hosts is not
    addressable from any one host, and per-host partial sums would let
    best-val decisions diverge between hosts). Sample-weighted mean semantics
    match the reference (``total += loss·B; total/count``, ref :1532-1542).
    """

    def val_fn(g_params, batch, mask, g_stats=None):
        ir, rgb = _decode_transport(batch["ir"], batch["rgb"])
        variables = {"params": g_params}
        if g_stats:
            variables["batch_stats"] = g_stats
        fake = g_module.apply(variables, ir, train=False)
        per = jnp.mean(jnp.abs(fake.astype(jnp.float32) - rgb.astype(jnp.float32)), axis=(1, 2, 3))
        return jnp.sum(per * mask), jnp.sum(mask)

    return jax.jit(val_fn)
