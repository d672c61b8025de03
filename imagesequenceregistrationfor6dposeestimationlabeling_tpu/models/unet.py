"""ResNet-UNet query encoder in flax.

The reference imports ``dep.unet.ResNetUNetNew`` (missing from the repo,
trainPose.py:169, inference.py:40) — a SurfEmb-style ResNet18-encoder
U-Net with ``n_class=13`` outputs: 12 query-feature channels + 1 mask
logit channel (inference.py:236-239).  This is our own design:

* ResNet18-shaped encoder (7x7/2 stem + 4 stages of 2 basic blocks),
* GroupNorm instead of BatchNorm (no mutable batch stats under jit;
  pretrained torchvision weights are unavailable in this environment
  anyway, so training from scratch with GN is the right call),
* decoder with bilinear upsampling + skip concatenation back to full
  resolution.

Input is NHWC (B, S, S, 3), ImageNet-normalized; output (B, S, S, 13).
Convolutions run in bfloat16 on the MXU with fp32 accumulation/params.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # GroupNorm IO dtype.  flax computes the group statistics in fp32
    # regardless (linen normalization promotes stats); fp32 here ALSO
    # materializes every normalized activation in fp32, doubling the
    # inter-conv HBM traffic — bfloat16 keeps the conv chain bf16
    # end-to-end with fp32 stats/params (mixed-precision standard).
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), (self.stride, self.stride), use_bias=False, dtype=self.dtype
            )(residual)
            residual = nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(residual)
        return nn.relu(y + residual.astype(y.dtype))


class ResNetUNet(nn.Module):
    """13-channel query CNN: 12 feature dims + 1 mask logit."""

    n_class: int = 13
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    decoder_width: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32  # see BasicBlock.norm_dtype

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = x.astype(self.dtype)
        # stem: 7x7/2 + maxpool/2
        s0 = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        s0 = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(s0))  # H/2
        h = nn.max_pool(s0, (3, 3), (2, 2), padding=((1, 1), (1, 1)))  # H/4

        skips = [s0]
        for i, (n_blocks, w) in enumerate(zip(self.stage_sizes, self.widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                h = BasicBlock(w, stride, self.dtype, self.norm_dtype)(h)
            skips.append(h)
        # skips: [H/2 (64), H/4 (64), H/8 (128), H/16 (256), H/32 (512)]

        def upsample_to(t, hh, ww):
            b, _, _, c = t.shape
            return jax.image.resize(t, (b, hh, ww, c), "nearest")

        h = skips[-1]
        for skip in reversed(skips[:-1]):
            h = upsample_to(h, skip.shape[1], skip.shape[2])
            h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
            h = nn.Conv(self.decoder_width * 2, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
            h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(h))
        # final upsample to full res
        h = upsample_to(h, H, W)
        h = nn.Conv(self.decoder_width, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.relu(nn.GroupNorm(num_groups=8, dtype=self.norm_dtype)(h))
        out = nn.Conv(self.n_class, (1, 1), dtype=jnp.float32)(h)
        return out.astype(jnp.float32)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_image(img):
    """ImageNet normalization (dataGen.py:10-20, inference.py:135-141)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_image(img):
    return img * IMAGENET_STD + IMAGENET_MEAN
