"""PyTorch interop: .pth checkpoint import/export (OIHW↔HWIO)."""

from ircolor_tpu.compat.torch_import import (
    load_generator_pth,
    load_discriminator_pth,
    load_vgg16_pth,
    export_generator_pth,
)

__all__ = [
    "load_generator_pth",
    "load_discriminator_pth",
    "load_vgg16_pth",
    "export_generator_pth",
]
