"""Losses (layer L3 of the reference, SURVEY.md §1).

Hinge GAN (ref `/root/reference/Code/ir_colorization.py:1645-1662`), L1,
anisotropic TV (ref :686-694), differentiable Gaussian-window SSIM
(ref :699-750), and the VGG-16 perceptual feature distance (ref :642-683).
"""

from ircolor_tpu.losses.gan import hinge_d_loss, hinge_g_loss
from ircolor_tpu.losses.tv import tv_loss
from ircolor_tpu.losses.ssim import ssim_loss, ssim_index
from ircolor_tpu.losses.vgg import VGG16Features, init_vgg16_params

__all__ = [
    "hinge_d_loss",
    "hinge_g_loss",
    "tv_loss",
    "ssim_loss",
    "ssim_index",
    "VGG16Features",
    "init_vgg16_params",
]
