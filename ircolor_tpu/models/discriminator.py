"""PatchGAN discriminator (NHWC Flax).

Reference semantics: ``NLayerDiscriminator``
(`/root/reference/Code/ir_colorization.py:576-635`). At input_nc=4 (IR 1ch ⊕
RGB 3ch, ref :583, :1592), ndf=64, n_layers=3:

  4×4 conv s2  4→64   + LeakyReLU(0.2)          (no norm, bias on) ref :599-602
  4×4 conv s2  64→128 + IN + LeakyReLU(0.2)                        ref :604-615
  4×4 conv s2 128→256 + IN + LeakyReLU(0.2)
  4×4 conv s1 256→512 + IN + LeakyReLU(0.2)     (penultimate)      ref :617-625
  4×4 conv s1 512→1                              (patch score map)  ref :627-630

Channel growth is min(2**n, 8)·ndf; all convs use padding 1; output at 256²
input is a 30×30 single-channel patch score map.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ircolor_tpu.models.common import (
    Conv,
    LanePackConv,
    Norm,
    lanepack_p,
    use_bias_for_norm,
)


def _lp_conv4(features, stride, p, bias, dtype, precision, name):
    """4×4 pad-1 strided lane-packed conv for the PatchGAN's
    lane-underfilled first (Cout=ndf) and last (Cout=1) convs. Param
    layout/init matches ``Conv`` (kernel HWIO + bias, N(0,0.02)), so
    checkpoints are interchangeable; math is exact."""
    return LanePackConv(
        features=features, ksize=4, stride=stride, padding=((1, 1), (1, 1)),
        p=p, use_bias=bias, dtype=dtype, precision=precision, name=name,
    )


class NLayerDiscriminator(nn.Module):
    input_nc: int = 4
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    dtype: Any = jnp.float32
    precision: Any = None
    lanepack: bool = False  # pack conv0/conv_out output pixels into MXU lanes

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_bias = use_bias_for_norm(self.norm)
        kw, padw = 4, ((1, 1), (1, 1))

        def conv(name, feats, stride, bias):
            return Conv(
                feats,
                (kw, kw),
                strides=(stride, stride),
                padding=padw,
                use_bias=bias,
                dtype=self.dtype,
                precision=self.precision,
                name=name,
            )

        def maybe_packed(name, feats, stride, bias, h):
            out_w = (h.shape[2] + 2 - kw) // stride + 1
            p = lanepack_p(feats, out_w) if self.lanepack else 1
            if p > 1:
                return _lp_conv4(
                    feats, stride, p, bias, self.dtype, self.precision, name
                )(h)
            return conv(name, feats, stride, bias)(h)

        # First layer: bias always on (ref :600 has no bias= kwarg).
        h = maybe_packed("conv0", self.ndf, 2, True, x)
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = conv(f"conv{n}", self.ndf * nf_mult, 2, use_bias)(h)
            h = Norm(self.norm, name=f"norm{n}")(h, train)
            h = nn.leaky_relu(h, 0.2)

        # Penultimate: stride 1 for finer patches (ref :617-625).
        nf_mult = min(2**self.n_layers, 8)
        h = conv(f"conv{self.n_layers}", self.ndf * nf_mult, 1, use_bias)(h)
        h = Norm(self.norm, name=f"norm{self.n_layers}")(h, train)
        h = nn.leaky_relu(h, 0.2)

        # Final 1-channel patch map: bias always on (ref :629).
        return maybe_packed("conv_out", 1, 1, True, h)
