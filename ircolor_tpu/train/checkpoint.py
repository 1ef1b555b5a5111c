"""Checkpointing: orbax full train state + reference-style netG exports.

The reference saves ONLY ``netG.state_dict()`` every 5 epochs and on val-L1
improvement (`/root/reference/Code/ir_colorization.py:1706-1715`) — a crash
loses optimizer/epoch state (SURVEY.md §5). Here:

* **Full state** (G+D params, both optimizer states, step, epoch, best
  val-L1) goes to orbax under ``<orbax_dir>/<epoch>`` with ``--resume``
  support — the failure-recovery subsystem the reference lacks.
* **netG-only artifacts** are still exported alongside with the reference's
  exact naming (``netG_epoch_{epoch:03d}``, ``netG_best``): a native
  ``.msgpack`` (flax serialization) and, when torch is importable, a
  reference-loadable ``.pth`` via the compat exporter.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from ircolor_tpu.utils.logging import get_logger

log = get_logger(__name__)


# ---------------- netG-only exports (reference-compatible naming) ----------


def save_netg_export(
    params: Any,
    path_stem: str,
    also_pth: bool = True,
    *,
    no_antialias: bool = False,
    pad_type: str = "reflect",
    use_dropout: bool = False,
) -> list[str]:
    """Write ``<stem>.msgpack`` (+ ``<stem>.pth`` when torch available).

    The variant kwargs mirror ``export_generator_pth``: the .pth resblock
    indices depend on pad type / dropout (the reference loads strict=False,
    so wrong indices would be silently dropped there)."""
    written = []
    host_params = jax.tree.map(np.asarray, params)
    os.makedirs(os.path.dirname(path_stem) or ".", exist_ok=True)
    mp = path_stem + ".msgpack"
    with open(mp, "wb") as f:
        f.write(serialization.msgpack_serialize(host_params))
    written.append(mp)
    if also_pth:
        try:
            from ircolor_tpu.compat.torch_import import export_generator_pth

            pth = path_stem + ".pth"
            export_generator_pth(
                host_params, pth, no_antialias=no_antialias,
                pad_type=pad_type, use_dropout=use_dropout,
            )
            written.append(pth)
        except ImportError:
            log.warning("torch unavailable; skipped .pth export for %s", path_stem)
    return written


def load_netg_export(path: str) -> Any:
    """Read a ``.msgpack`` netG export back into a param tree."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# ---------------- full-state orbax checkpoints ----------


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_full_state(orbax_dir: str, epoch: int, state: Any, extra: dict[str, Any]) -> str:
    """Save the full train state + host metadata under <orbax_dir>/<epoch>."""
    path = os.path.abspath(os.path.join(orbax_dir, f"{epoch:04d}"))
    payload = {"state": state, "extra": extra}
    _ckptr().save(path, payload, force=True)
    return path


def latest_checkpoint(orbax_dir: str) -> int | None:
    """Highest epoch with a saved checkpoint, or None."""
    if not os.path.isdir(orbax_dir):
        return None
    epochs = [int(d) for d in os.listdir(orbax_dir) if d.isdigit()]
    return max(epochs) if epochs else None


def restore_full_state(orbax_dir: str, epoch: int, state_template: Any) -> tuple[Any, dict[str, Any]]:
    """Restore (state, extra) from <orbax_dir>/<epoch> using a template tree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(orbax_dir, f"{epoch:04d}"))
    extra_template = {"epoch": 0, "best_val_l1": 0.0, "val_l1": 0.0}
    payload = _ckptr().restore(
        path,
        args=ocp.args.PyTreeRestore(
            item={"state": state_template, "extra": extra_template}
        ),
    )
    return payload["state"], payload["extra"]
