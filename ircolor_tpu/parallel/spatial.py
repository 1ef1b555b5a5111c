"""Spatial (image-axis) sharding — the CNN analog of sequence parallelism.

The reference has no attention and no sequence axis; SURVEY.md §5 records
that the "large input" axis of this workload is image RESOLUTION, and that
the idiomatic TPU answer when a resolution exceeds per-chip HBM is 2-D
spatial sharding of the image under GSPMD, with halo exchange over ICI for
the convolutions. This module provides exactly that, as a pure sharding
layout on the UNCHANGED model:

* activations are sharded on H (and optionally W) over mesh axes;
* params stay replicated;
* XLA's GSPMD spatial partitioner inserts the conv halo exchanges
  (collective-permutes of the kernel-support border rows) and turns the
  instance-norm spatial means into cross-shard all-reduces — no model or
  kernel changes, bit-compatible up to float reduction order (tested to
  ≤1e-5 against the single-device forward on a fake 8-device mesh).

Caveat: 2-D H×W tiling requires ``cfg.lanepack=False`` — GSPMD
mispartitions the lane-packed outc conv's strided unpack reshape when BOTH
image axes are sharded (silently wrong output; isolated per-module and
regression-tested in tests/test_parallel.py). 1-D sharding of either axis
is correct with packing on.

Composability: a leading ``'data'`` mesh axis can shard batch at the same
time (``P('data', 'sp', None, None)``), giving DP×SP over a 2-D mesh — the
layout that keeps the halo traffic on ICI while batch gradients reduce over
the outer axis.

TRAINING uses exactly this layout: ``train --sp-devices N`` builds the
``('data', 'sp')`` mesh via ``parallel.mesh.make_train_mesh`` and the
unchanged GSPMD train step halo-exchanges the convolutions in both the
forward and the backward pass (activation grads need the same neighbor
rows), with IN/loss spatial means all-reduced — training at resolutions
whose activations exceed one chip's HBM. Equivalence vs the single-device
step: tests/test_parallel.py::test_spatial_train_step_matches_single_device.

Typical use (inference at a resolution that does not fit one chip)::

    mesh = make_spatial_mesh(8)                       # ('sp',) over 8 chips
    fwd = jax.jit(lambda p, x: module.apply({'params': p}, x),
                  out_shardings=spatial_sharding(mesh))
    out = fwd(jax.device_put(params, replicated_sharding(mesh)),
              jax.device_put(big_image_batch, spatial_sharding(mesh)))
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(
    n_devices: int = 0, devices: Any = None, w_devices: int = 1
) -> Mesh:
    """Mesh for spatial sharding: ``('sp',)`` 1-D over H, or
    ``('sp', 'spw')`` 2-D when ``w_devices > 1`` (H × W tiling).

    2-D tiling emits a loud warning: it requires a ``lanepack=False`` model
    (see module docstring / ``check_spatial_compat``)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices == 0:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(
            f"need {n_devices} devices for the spatial mesh, have {len(devs)}"
        )
    devs = devs[:n_devices]
    if w_devices <= 1:
        return Mesh(np.asarray(devs), ("sp",))
    if n_devices % w_devices:
        raise ValueError(f"{n_devices} devices do not tile into w_devices={w_devices}")
    import warnings

    warnings.warn(
        "2-D H×W spatial tiling requires a lanepack=False model "
        "(cfg.lanepack / --no-lanepack): GSPMD mispartitions the lane-packed "
        "output head and produces silently wrong images. Validate with "
        "check_spatial_compat(module, mesh).",
        stacklevel=2,
    )
    grid = np.asarray(devs).reshape(n_devices // w_devices, w_devices)
    return Mesh(grid, ("sp", "spw"))


def check_spatial_compat(module: Any, mesh: Mesh) -> None:
    """Raise if ``module`` is known to miscompute under this mesh:

    * Image-axis sharding with the fused Pallas kernels engaged but NOT
      spatially wired: the kernels build their reflect halos from the
      *local shard*, so every shard seam reflects at the wrong rows —
      silently wrong pixels. Exception: ``pallas_block`` with
      ``module.spatial_mesh`` set to this 1-D H mesh runs the blocks under
      shard_map with ppermuted halos + psum'd IN stats (exact; the eval
      runner wires this automatically). The norm-blur tail and 7×7 head
      kernels have no spatial form and must be off.
    * 2-D H×W tiling with a lane-packed output head (``module.lanepack``
      True): GSPMD mispartitions the packed head's unpack reshape
      (regression-tested in tests/test_parallel.py)."""
    block_ok = (
        getattr(module, "spatial_mesh", None) is not None
        and tuple(module.spatial_mesh.axis_names)
        == (getattr(module, "spatial_axis", "sp"),)
        and module.spatial_mesh == mesh
    )
    if (
        (getattr(module, "pallas_block", False) and not block_ok)
        or getattr(module, "pallas_norm_blur", False)
        or getattr(module, "pallas_head", False)
    ):
        from ircolor_tpu.models.generator import _pallas_available

        # Only a hazard where the kernels actually engage (the module's own
        # gate): on CPU/fake-device meshes the flags are inert and the XLA
        # paths compute correctly.
        if _pallas_available():
            raise ValueError(
                "spatial sharding with a pallas_block=True (and no matching "
                "spatial_mesh), pallas_norm_blur=True, or pallas_head=True "
                "generator produces silently wrong shard-seam pixels (the "
                "fused kernels reflect at local tile edges) — rebuild the "
                "model with these flags False, or wire "
                "spatial_mesh=<the 1-D sp mesh> for the fused blocks "
                "(identical params; the CLI test runner does this "
                "automatically)"
            )
    if "spw" in mesh.axis_names and getattr(module, "lanepack", False):
        raise ValueError(
            "2-D spatial tiling ('spw' axis) with a lanepack=True generator "
            "produces silently wrong outputs — rebuild the model with "
            "cfg.lanepack=False (CLI: --no-lanepack)"
        )


def spatial_sharding(
    mesh: Mesh, module: Any = None, *, allow_unchecked: bool = False
) -> NamedSharding:
    """NHWC activation sharding: H on ``'sp'`` (and W on ``'spw'`` if the
    mesh has it); batch and channels unsharded.

    For a 2-D (H×W) mesh the known-silently-wrong combination (lane-packed
    output head) is ENFORCED here, not just advised: pass the module so
    ``check_spatial_compat`` can vet it, or explicitly opt out with
    ``allow_unchecked=True`` (e.g. for non-generator arrays). 1-D meshes are
    safe with any module and need neither."""
    if "spw" in mesh.axis_names:
        if module is not None:
            check_spatial_compat(module, mesh)
        elif not allow_unchecked:
            raise ValueError(
                "2-D H×W spatial tiling is silently wrong for lanepack=True "
                "generators — pass the module (spatial_sharding(mesh, module)) "
                "so it can be checked, or acknowledge with allow_unchecked=True"
            )
    wspec = "spw" if "spw" in mesh.axis_names else None
    return NamedSharding(mesh, P(None, "sp", wspec, None))


def data_spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC sharding for a ``('data', 'sp')`` mesh: batch on ``'data'``,
    H on ``'sp'`` — DP×SP."""
    return NamedSharding(mesh, P("data", "sp", None, None))
