"""Flax ResNet18 — the lesion classifier backbone.

Checkpoint-compatible with torchvision's `resnet18` with a replaced
`fc` head, which is what the reference builds and loads from
`classifier.pth` (reference `xai/XAI.py:385-397` builtin model,
`xai/XAI.py:479-558` shape-compatible partial loading; note the XAI path
constructs it with NUM_CLASSES+1 = 8 outputs, `XAI.py:489-493`).

TPU-native notes: NHWC layout; BatchNorm is implemented as frozen affine
statistics (the reference only ever runs the classifier in eval mode —
`XAI.py:541`, `xai_integration.py:82`), which turns every BN into a fused
scale+shift on the VPU and keeps the whole forward jit/vmap-friendly for
the thousands-of-forwards XAI workloads.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias.

    mean/var are loaded from torch running statistics (`running_mean`,
    `running_var` — mapped by `io.convert`).
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) * scale.astype(jnp.float32)
        return (x.astype(jnp.float32) - mean) * inv + bias


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/projection shortcut (ResNet v1)."""
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(self.features, (3, 3), strides=self.strides,
                             padding=1, use_bias=False, dtype=self.dtype)
        self.bn1 = FrozenBatchNorm(self.features)
        self.conv2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype)
        self.bn2 = FrozenBatchNorm(self.features)
        if self.downsample:
            # torch names: downsample.0 (conv), downsample.1 (bn)
            self.downsample_0 = nn.Conv(self.features, (1, 1), strides=self.strides,
                                        use_bias=False, dtype=self.dtype)
            self.downsample_1 = FrozenBatchNorm(self.features)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = nn.relu(self.bn1(self.conv1(x)).astype(self.dtype))
        out = self.bn2(self.conv2(out))
        if self.downsample:
            identity = self.downsample_1(self.downsample_0(x))
        return nn.relu(out + identity.astype(out.dtype)).astype(self.dtype)

    # Grad-CAM support: expose the pieces around conv2 so the target-layer
    # activation (conv2 output, pytorch_grad_cam's default target in the
    # reference, `XAI.py:2947`) can be differentiated against.
    def pre_activation(self, x: jnp.ndarray) -> jnp.ndarray:
        """block input -> conv2 output (the Grad-CAM target activation)."""
        out = nn.relu(self.bn1(self.conv1(x)).astype(self.dtype))
        return self.conv2(out)

    def post_activation(self, act: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """(conv2 output, block input) -> block output."""
        identity = x
        if self.downsample:
            identity = self.downsample_1(self.downsample_0(x))
        return nn.relu(self.bn2(act) + identity.astype(jnp.float32)).astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class ResNet18Config:
    num_classes: int = 7
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    stage_features: Tuple[int, ...] = (64, 128, 256, 512)


class ResNet18(nn.Module):
    """NHWC ResNet18. `__call__` returns logits; `features_and_logits`
    additionally returns the Grad-CAM target activation."""
    config: ResNet18Config = ResNet18Config()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.conv1 = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                             dtype=self.dtype)
        self.bn1 = FrozenBatchNorm(64)
        blocks = {}
        for stage, (size, feats) in enumerate(zip(cfg.stage_sizes, cfg.stage_features),
                                              start=1):
            for i in range(size):
                strides = 2 if (stage > 1 and i == 0) else 1
                downsample = stage > 1 and i == 0
                blocks[f"layer{stage}_{i}"] = BasicBlock(
                    feats, strides=strides, downsample=downsample,
                    dtype=self.dtype, name=f"layer{stage}_{i}")
        self._blocks = blocks
        self.fc = nn.Dense(cfg.num_classes, dtype=jnp.float32)

    def _stem(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(self.bn1(self.conv1(x)).astype(self.dtype))
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return self.fc(x.astype(jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self._stem(x)
        for stage, size in enumerate(self.config.stage_sizes, start=1):
            for i in range(size):
                x = self._blocks[f"layer{stage}_{i}"](x)
        return self._head(x)

    def penultimate(self, x: jnp.ndarray) -> jnp.ndarray:
        """Global-average-pooled 512-d features (pre-fc) — used as the FID
        feature embedding."""
        x = self._stem(x)
        for stage, size in enumerate(self.config.stage_sizes, start=1):
            for i in range(size):
                x = self._blocks[f"layer{stage}_{i}"](x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    def features_and_logits(self, x: jnp.ndarray):
        """Returns (logits, act, block_input) where act is layer4[-1].conv2's
        output — the reference Grad-CAM target layer (`XAI.py:2947`) — and
        block_input is the final block's input (needed to re-run the tail
        from a perturbed activation in `logits_from_activation`)."""
        x = self._stem(x)
        last_stage = len(self.config.stage_sizes)
        for stage, size in enumerate(self.config.stage_sizes, start=1):
            for i in range(size):
                block = self._blocks[f"layer{stage}_{i}"]
                if stage == last_stage and i == size - 1:
                    act = block.pre_activation(x)
                    out = block.post_activation(act, x)
                    logits = self._head(out)
                    return logits, act, x
                x = block(x)
        raise AssertionError("unreachable")

    def logits_from_activation(self, act: jnp.ndarray, block_input: jnp.ndarray):
        """Recompute logits from a (possibly perturbed) target activation,
        holding the final block's input fixed — the vjp path for Grad-CAM."""
        last_stage = len(self.config.stage_sizes)
        block = self._blocks[f"layer{last_stage}_{self.config.stage_sizes[-1] - 1}"]
        x = block.post_activation(act, block_input)
        return self._head(x)


def init_resnet_params(model: ResNet18, rng: jax.Array, image_size: int = 224):
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(rng, x)["params"]
