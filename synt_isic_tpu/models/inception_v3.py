"""Flax InceptionV3 — the standard FID embedding network (pool3, 2048-d).

Checkpoint-compatible with torchvision's `inception_v3` state dict (the
standard "torchvision-FID" embedding): same module names
(Conv2d_1a_3x3 ... Mixed_7c, branch1x1/branch5x5_1/..., conv/bn inside
BasicConv2d), so `io.convert.torch_to_flax` maps the weights mechanically
(conv OIHW->HWIO, bn running stats -> FrozenBatchNorm mean/var).
`scripts/convert_inception.py` documents producing `inception_v3.pth`
from torchvision where egress exists; BASELINE.md's "FID parity" contract
runs against these weights.

TPU-native notes: NHWC; BatchNorm frozen to affine statistics (FID only
ever runs inference), eps=1e-3 per torchvision BasicConv2d; pooling via
reduce_window; the whole feature pass is one jitted program batched over
images.

NOTE on variants: pytorch-fid ships a TF-ported InceptionV3 whose pooling
layers differ slightly (count_include_pad=False in InceptionA/C/E pool
branches) and expects [-1,1] inputs; torchvision semantics (implemented
here) use count_include_pad=True and ImageNet normalization with the
`transform_input` recentering. FID numbers are comparable only within one
variant — ours are "torchvision-FID".
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet18 import FrozenBatchNorm

# ImageNet normalization (torchvision transforms for inception_v3)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


def _avg_pool_3x3(x):
    """torch F.avg_pool2d(x, 3, stride=1, padding=1) with
    count_include_pad=True (the torchvision default)."""
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return (s / 9.0).astype(x.dtype)


def _max_pool_3x3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision `inception_v3` (eval mode, no aux head).

    `transform_input=True` replays torchvision's pretrained-weight input
    recentering (expects ImageNet-normalized input).
    """
    num_classes: int = 1000
    transform_input: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dtype
        self.Conv2d_1a_3x3 = BasicConv2d(32, (3, 3), strides=2, dtype=d)
        self.Conv2d_2a_3x3 = BasicConv2d(32, (3, 3), dtype=d)
        self.Conv2d_2b_3x3 = BasicConv2d(64, (3, 3), padding=1, dtype=d)
        self.Conv2d_3b_1x1 = BasicConv2d(80, (1, 1), dtype=d)
        self.Conv2d_4a_3x3 = BasicConv2d(192, (3, 3), dtype=d)
        self.Mixed_5b = InceptionA(32, dtype=d)
        self.Mixed_5c = InceptionA(64, dtype=d)
        self.Mixed_5d = InceptionA(64, dtype=d)
        self.Mixed_6a = InceptionB(dtype=d)
        self.Mixed_6b = InceptionC(128, dtype=d)
        self.Mixed_6c = InceptionC(160, dtype=d)
        self.Mixed_6d = InceptionC(160, dtype=d)
        self.Mixed_6e = InceptionC(192, dtype=d)
        self.Mixed_7a = InceptionD(dtype=d)
        self.Mixed_7b = InceptionE(dtype=d)
        self.Mixed_7c = InceptionE(dtype=d)
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32)

    def _transform_input(self, x):
        if not self.transform_input:
            return x
        chans = []
        for c, (m, s) in enumerate(zip(_IMAGENET_MEAN, _IMAGENET_STD)):
            chans.append(x[..., c] * (s / 0.5) + (m - 0.5) / 0.5)
        return jnp.stack(chans, axis=-1)

    def pool3_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 299, 299, 3) ImageNet-normalized -> (B, 2048) pool3 features
        (the FID embedding)."""
        x = self._transform_input(x).astype(self.dtype)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = _max_pool_3x3_s2(x)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = _max_pool_3x3_s2(x)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # adaptive avgpool

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc(self.pool3_features(x))


def preprocess_for_inception(images: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] NHWC (any size) -> 299x299 ImageNet-normalized (bilinear,
    matching torchvision transforms)."""
    x = (images.astype(jnp.float32) + 1.0) / 2.0
    x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    return (x - mean) / std


def expected_inception_state_shapes(num_classes: int = 1000) -> Dict[str, tuple]:
    """torchvision inception_v3 state-dict manifest (aux head excluded —
    the loader drops `AuxLogits.*`)."""
    keys: Dict[str, tuple] = {}

    def conv(prefix, cout, cin, kh, kw):
        keys[f"{prefix}.conv.weight"] = (cout, cin, kh, kw)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            keys[f"{prefix}.bn.{leaf}"] = (cout,)

    conv("Conv2d_1a_3x3", 32, 3, 3, 3)
    conv("Conv2d_2a_3x3", 32, 32, 3, 3)
    conv("Conv2d_2b_3x3", 64, 32, 3, 3)
    conv("Conv2d_3b_1x1", 80, 64, 1, 1)
    conv("Conv2d_4a_3x3", 192, 80, 3, 3)

    def inception_a(prefix, cin, pool):
        conv(f"{prefix}.branch1x1", 64, cin, 1, 1)
        conv(f"{prefix}.branch5x5_1", 48, cin, 1, 1)
        conv(f"{prefix}.branch5x5_2", 64, 48, 5, 5)
        conv(f"{prefix}.branch3x3dbl_1", 64, cin, 1, 1)
        conv(f"{prefix}.branch3x3dbl_2", 96, 64, 3, 3)
        conv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3)
        conv(f"{prefix}.branch_pool", pool, cin, 1, 1)

    inception_a("Mixed_5b", 192, 32)
    inception_a("Mixed_5c", 256, 64)
    inception_a("Mixed_5d", 288, 64)

    conv("Mixed_6a.branch3x3", 384, 288, 3, 3)
    conv("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    conv("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    conv("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def inception_c(prefix, c7):
        conv(f"{prefix}.branch1x1", 192, 768, 1, 1)
        conv(f"{prefix}.branch7x7_1", c7, 768, 1, 1)
        conv(f"{prefix}.branch7x7_2", c7, c7, 1, 7)
        conv(f"{prefix}.branch7x7_3", 192, c7, 7, 1)
        conv(f"{prefix}.branch7x7dbl_1", c7, 768, 1, 1)
        conv(f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1)
        conv(f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7)
        conv(f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1)
        conv(f"{prefix}.branch7x7dbl_5", 192, c7, 1, 7)
        conv(f"{prefix}.branch_pool", 192, 768, 1, 1)

    inception_c("Mixed_6b", 128)
    inception_c("Mixed_6c", 160)
    inception_c("Mixed_6d", 160)
    inception_c("Mixed_6e", 192)

    conv("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    conv("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    conv("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    conv("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    conv("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    conv("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def inception_e(prefix, cin):
        conv(f"{prefix}.branch1x1", 320, cin, 1, 1)
        conv(f"{prefix}.branch3x3_1", 384, cin, 1, 1)
        conv(f"{prefix}.branch3x3_2a", 384, 384, 1, 3)
        conv(f"{prefix}.branch3x3_2b", 384, 384, 3, 1)
        conv(f"{prefix}.branch3x3dbl_1", 448, cin, 1, 1)
        conv(f"{prefix}.branch3x3dbl_2", 384, 448, 3, 3)
        conv(f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3)
        conv(f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1)
        conv(f"{prefix}.branch_pool", 192, cin, 1, 1)

    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)

    keys["fc.weight"] = (num_classes, 2048)
    keys["fc.bias"] = (num_classes,)
    return keys


def load_inception_params(path: str) -> Any:
    """torchvision inception_v3 .pth -> validated Flax param tree."""
    from ..io.convert import torch_to_flax
    from ..io.manifest import validate_state_dict
    from ..io.pth import load_pth

    state = load_pth(path)
    state = {k: v for k, v in state.items() if not k.startswith("AuxLogits.")}
    problems = validate_state_dict(state, expected_inception_state_shapes())
    if problems:
        preview = "; ".join(problems[:5])
        raise ValueError(f"not a torchvision inception_v3 state dict: {preview}"
                         + (f" (+{len(problems) - 5} more)"
                            if len(problems) > 5 else ""))
    return torch_to_flax(state)


def init_inception_params(rng: jax.Array, dtype: Any = jnp.float32) -> Any:
    model = InceptionV3(dtype=dtype)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    return model.init(rng, x)["params"]
