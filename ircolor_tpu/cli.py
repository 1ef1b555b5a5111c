"""Command-line entry point.

The reference has no CLI — mode and every knob are edited in the source
``Config`` class (`/root/reference/Code/ir_colorization.py:32-142`,
`README.md:150-167` "no CLI args required"). Here every README workflow maps
to a flag: ``python -m ircolor_tpu train|test [--flag value ...]`` plus
``--config path.json`` for full overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import Any, Sequence

from ircolor_tpu.config import Config
from ircolor_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _add_config_flags(parser: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        if f.name == "mode":
            continue
        # Lowercase flag names (--test-g-weights for test_G_weights), with
        # the original-case spelling kept as an alias.
        args = ["--" + f.name.replace("_", "-").lower()]
        cased = "--" + f.name.replace("_", "-")
        if cased not in args:
            args.append(cased)
        ann = f.type if isinstance(f.type, str) else getattr(f.type, "__name__", str(f.type))
        if "bool" in {p.strip() for p in ann.split("|")} or isinstance(f.default, bool):
            parser.add_argument(*args, dest=f.name, default=None,
                                action=argparse.BooleanOptionalAction)
        elif f.name in ("train_roots", "test_roots"):
            parser.add_argument(*args, dest=f.name, nargs="+", default=None)
        else:
            parser.add_argument(*args, dest=f.name, default=None)


def _coerce(cfg_field: dataclasses.Field, value: Any) -> Any:
    """Coerce a CLI string by the field's TYPE ANNOTATION (not the default
    instance — ``int | None`` fields default to None, and typing off the
    default would pass '512' through as a string for --img-height)."""
    if value is None or isinstance(value, (bool, list, tuple)):
        return tuple(value) if isinstance(value, list) else value
    ann = cfg_field.type
    ann = ann if isinstance(ann, str) else getattr(ann, "__name__", str(ann))
    parts = {p.strip() for p in ann.split("|")}
    optional = "None" in parts
    if value == "none" and optional:
        return None
    if "bool" in parts:
        return bool(value)
    if "int" in parts:
        return int(value)
    if "float" in parts:
        return float(value)
    return value


def build_config(args: argparse.Namespace, mode: str) -> Config:
    if getattr(args, "config", None):
        with open(args.config, "r", encoding="utf-8") as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    overrides: dict[str, Any] = {"mode": mode}
    for f in dataclasses.fields(Config):
        if f.name == "mode":
            continue
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = _coerce(f, v)
    return cfg.replace(**overrides)


def main(argv: Sequence[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="ircolor_tpu",
        description="TPU-native LWIR→RGB colorization (train/test).",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name, desc in (("train", "Train the conditional GAN on KAIST pairs"),
                       ("test", "Run inference + metrics + exports"),
                       ("export", "Write an AOT serving artifact "
                                  "(jax.export StableHLO; --export-keep-pallas "
                                  "embeds the fused TPU kernels)")):
        p = sub.add_parser(name, help=desc)
        p.add_argument("--config", default=None, help="JSON config file")
        _add_config_flags(p)

    args = parser.parse_args(argv)
    cfg = build_config(args, args.command)

    # Reference banner (ref :1738-1741).
    log.info("Config mode: %s", cfg.mode)
    log.info("SAVE_DIR: %s", cfg.save_dir)
    log.info("OUTPUT_DIR: %s", cfg.output_dir)
    log.info("TEST_G_WEIGHTS: %s", cfg.test_G_weights)

    if cfg.mode == "train":
        from ircolor_tpu.train.loop import train_kaist

        train_kaist(cfg)
    elif cfg.mode == "test":
        from ircolor_tpu.eval.runner import run_test

        run_test(cfg)
    elif cfg.mode == "export":
        from ircolor_tpu.export.aot import run_export

        run_export(cfg)
    else:
        raise ValueError("cfg.mode must be 'train', 'test', or 'export'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
