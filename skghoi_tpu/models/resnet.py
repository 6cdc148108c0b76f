"""ResNet-50 backbone in Flax (NHWC, MXU-friendly, frozen BatchNorm).

Replaces the reference's mmdet-built AdaMixer ResNet-50 backbone
(``models/adamixer_transH_spatial_r50_models.py:144-157``).  The reference
fine-tunes with the backbone's BatchNorm in eval mode (mmdet ``norm_eval``
convention; backbone lr scaled x0.1, ``configures/.../main.py:122-127``), so
BN here always uses stored statistics — it folds into the preceding conv at
compile time, which is exactly what you want on TPU.

Layout notes: NHWC throughout (TPU native); convolutions hit the MXU when the
channel dims are >= 128, which holds for every stage except the stem.  A
``dtype`` knob runs compute in bfloat16 with float32 params.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics.

    Parameters live in the ``params`` collection (scale/bias) and
    ``batch_stats`` (mean/var) so torch checkpoints map 1:1.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,)).value
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,)).value
        # Fold into a single multiply-add; XLA fuses this into the conv
        # epilogue.  The per-channel constants are computed in fp32 (rsqrt of
        # small variances), but the activation path stays in the compute
        # dtype: upcasting the whole [B, H, W, C] tensor to fp32 here would
        # force every conv->BN boundary to materialize an fp32 copy
        # (2x HBM traffic on each of the 53 BNs in bf16 mode).
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
        return x.astype(self.dtype) * inv.astype(self.dtype) + shift.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        bn = partial(FrozenBatchNorm, dtype=self.dtype)

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = bn(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides), name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, computed as an exactly-equivalent 4x4/1 conv on
    2x2 space-to-depth input (the standard TPU ResNet stem transform).

    A 3-input-channel 7x7 conv runs at ~4% MFU: the contraction is only
    7*7*3 = 147 long and XLA burns a layout copy shaping the [H, W, 3] image
    (measured 5.6 ms + 1.6 ms copy of the 45 ms forward at 832x1344x8).
    Folding a 2x2 pixel block into channels gives a 12-channel input and a
    192-long contraction with identical arithmetic: output pixel ``o`` of the
    stride-2 conv reads raw taps ``2o-3 .. 2o+3``, i.e. space-to-depth cells
    ``o-2 .. o+1`` — a 4-tap stride-1 conv whose weight at (cell d, phase ph)
    is the 7x7 tap ``t = 2d + ph - 1`` (zero at the former ``t = -1``
    positions).  The parameter keeps the [7, 7, C, 64] torch-checkpoint
    layout; the equivalent kernel is derived in the forward (a tiny constant
    transform XLA hoists out of the loop).

    ``impl`` selects how the 4x4/1 12-channel conv is executed:

    - ``"conv"``: ``lax.conv_general_dilated`` — XLA's conv path tiles a
      12-channel contraction poorly on the MXU (measured 9.1 ms of the
      22.8 ms backbone forward at 832x1344x8, ~6 TFLOP/s).
    - ``"im2col"``: explicit patch extraction (16 shifted slices, one
      concat) followed by a single ``[.., 192] @ [192, 64]`` matmul — a
      192-long contraction the MXU tiles natively.  Bit-identical math
      (same products, same kernel layout), ``tests/test_stem_s2d.py``.
    """

    features: int = 64
    dtype: Any = jnp.float32
    space_to_depth: bool = True
    impl: str = "conv"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c, self.features)
        )
        if not (self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

        # [7, 7, C, F] -> [4, 4, 4C, F]: pad tap axes so t = 2d+ph-1 maps to
        # [0..7] (leading zero row/col), split into (cell, phase), and order
        # the input channels (ph_y, ph_x, c) to match xs's flattening.
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8, 8, C, F]
        k = k.reshape(4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        if self.impl == "im2col":
            h2, w2 = h // 2, w // 2
            xp = jnp.pad(xs, ((0, 0), (2, 1), (2, 1), (0, 0))).astype(self.dtype)
            # Channel order (dy, dx, cin) matches k.reshape(-1, F)'s flatten.
            patches = jnp.concatenate(
                [xp[:, dy:dy + h2, dx:dx + w2, :]
                 for dy in range(4) for dx in range(4)], axis=-1)
            km = k.reshape(16 * 4 * c, self.features).astype(self.dtype)
            return jnp.einsum("bhwk,kf->bhwf", patches, km)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _block_body(block: "Bottleneck", x: Array, _) -> Tuple[Array, None]:
    """Scan body: one identity-shortcut bottleneck application."""
    return block(x), None


class ResNet50(nn.Module):
    """Returns the C2..C5 feature pyramid (strides 4, 8, 16, 32).

    ``frozen_stages`` follows mmdet's ResNet semantics (the reference builds
    its backbone from an mmdet config, ``models/adamixer_transH_spatial_r50_models.py:147-156``;
    the public AdaMixer R50 configs all train with ``frozen_stages=1``):
    -1 trains everything, 0 freezes the stem, 1 freezes stem + layer1, etc.
    Freezing is a ``stop_gradient`` at the stage boundary — the frozen
    prefix's backward pass is eliminated from the compiled program entirely,
    which matters: at 832x1344 the stem+layer1 backward is ~1/3 of the whole
    train step.  Pair it with the optimizer's "frozen" label
    (``train/optimizer.py``) so AdamW never touches the frozen parameters.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    stem_space_to_depth: bool = True
    stem_impl: str = "conv"
    frozen_stages: int = -1
    # Rematerialize bottlenecks from this 1-based stage onward (0 disables):
    # backward recomputes their activations instead of keeping them in HBM —
    # the standard trade that unlocks larger train batches (the batch-size
    # axis of the MFU campaign).  Parameter names are unchanged (nn.remat is
    # transparent), so checkpoints are interchangeable.
    remat_stages: int = 0
    # Fold each stage's identical-shape tail blocks (everything after the
    # stride/projection block 0) into one ``nn.scan`` — 12 of the 16
    # bottlenecks compile as 4 scan bodies instead of 12 inlined copies,
    # shrinking the train-step HLO and its XLA compile time (the driver's
    # multi-chip dryrun budget) without changing the math.  Parameter layout
    # changes: ``layer{s}_rest/conv1/kernel`` has a leading ``blocks-1``
    # axis; ``load_torch_resnet50`` emits either layout.
    scan_blocks: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        x = x.astype(self.dtype)
        x = StemConv(dtype=self.dtype, space_to_depth=self.stem_space_to_depth,
                     impl=self.stem_impl, name="stem_conv")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outputs = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            use_remat = bool(self.remat_stages) and stage + 1 >= self.remat_stages
            block_cls = nn.remat(Bottleneck) if use_remat else Bottleneck
            x = block_cls(width, strides=2 if stage > 0 else 1, dtype=self.dtype,
                          name=f"layer{stage + 1}_block0")(x)
            if blocks > 1 and self.scan_blocks:
                body = nn.remat(_block_body, prevent_cse=False) if use_remat else _block_body
                scan = nn.scan(
                    body,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True},
                    length=blocks - 1,
                )
                x, _ = scan(
                    Bottleneck(width, strides=1, dtype=self.dtype,
                               name=f"layer{stage + 1}_rest"),
                    x, None,
                )
            else:
                for block in range(1, blocks):
                    x = block_cls(width, strides=1, dtype=self.dtype,
                                  name=f"layer{stage + 1}_block{block}")(x)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            outputs.append(x)
        return tuple(outputs)
