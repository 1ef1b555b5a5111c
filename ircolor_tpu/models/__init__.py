"""Model family (layer L2 of the reference, SURVEY.md §1).

``ResnetUNetGenerator`` — U-Net with ResNet-9 bottleneck and anti-aliased
blur-pool down/upsampling (ref `/root/reference/Code/ir_colorization.py:425-569`).
``NLayerDiscriminator`` — PatchGAN (ref :576-635).
``IRColorizationModel`` — generator wrapper with weight loading (ref :757-796).
"""

from ircolor_tpu.models.generator import ResnetBlock, ResnetUNetGenerator
from ircolor_tpu.models.discriminator import NLayerDiscriminator
from ircolor_tpu.models.wrapper import IRColorizationModel

__all__ = [
    "ResnetBlock",
    "ResnetUNetGenerator",
    "NLayerDiscriminator",
    "IRColorizationModel",
]
