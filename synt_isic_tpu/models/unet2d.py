"""Flax UNet2D: the per-class DDPM epsilon-predictor.

Architecture is checkpoint-compatible with the reference's diffusers
`UNet2DModel(sample_size=128, in/out=3, layers_per_block=2,
block_out_channels=(64,128,256,256), down=(Down,Down,AttnDown,Down),
up=(Up,AttnUp,Up,Up))` (reference `core/generator/model_manager.py:173-194`,
`diffusion/train_diffusion.py:118-137`): same module graph, same parameter
shapes, default attention_head_dim=8, GroupNorm(32, eps=1e-5), sinusoidal
timestep embedding (flip_sin_to_cos=True, freq_shift=0).

TPU-native design choices (NOT a port):
  * NHWC data layout end-to-end — channels-last feeds the MXU's native conv
    tiling; torch checkpoints' OIHW conv kernels are transposed at load time
    (`synt_isic_tpu/io/convert.py`).
  * computation dtype is a module knob (`dtype=bfloat16` for MXU speed,
    params stay float32); normalization statistics are always fp32.
  * attention is a batched einsum over (B*heads) so XLA maps it to batched
    MXU matmuls; fusable with the Pallas kernels in
    `synt_isic_tpu/ops/pallas/`.
  * everything is a pure function of (params, x, t) — jit/vmap/shard_map
    compose; no Python control flow depends on traced values.

Parameter tree mirrors the torch state-dict key structure so conversion is
mechanical ("down_blocks.0.resnets.1.conv1.weight" ->
params["down_blocks_0"]["resnets_1"]["conv1"]["kernel"]).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    sample_size: int = 128
    in_channels: int = 3
    out_channels: int = 3
    layers_per_block: int = 2
    block_out_channels: Tuple[int, ...] = (64, 128, 256, 256)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "DownBlock2D", "AttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "AttnUpBlock2D", "UpBlock2D", "UpBlock2D")
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    add_mid_attention: bool = True
    # Class-conditional variant (diffusers UNet2DModel `num_class_embeds`):
    # an nn.Embed(num_class_embeds, time_embed_dim) table whose row is ADDED
    # to the timestep embedding. One conditional model then serves every
    # ISIC class (vs the reference's 7 separate 101 MB checkpoints,
    # `core/generator/model_manager.py:89-171`) — on TPU that means one
    # resident parameter set, no per-class HBM swaps, and mixed-class
    # batches. Convention: the LAST index is the null/unconditional
    # embedding used for classifier-free-guidance training dropout, so a
    # 7-class model has num_class_embeds=8. None = unconditional
    # (reference parity).
    num_class_embeds: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0,
                           max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (Transformer-style positional)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """MLP on the sinusoidal features: linear_1 -> silu -> linear_2."""
    time_embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


class _NormParams(nn.Module):
    """Declares GroupNorm affine params with the same tree layout as
    nn.GroupNorm ({'scale','bias'}) for the fused-kernel path."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class ResnetBlock2D(nn.Module):
    """norm1 -> silu -> conv1 -> (+ FiLM temb) -> norm2 -> silu -> conv2, residual.

    `fast_norm=True` (bf16 sampling path) keeps the GroupNorm statistics in
    f32 but does all tensor arithmetic in bf16 with no f32 materialization
    (`ops/norms.py`) — same param tree, bf16-rounding-level deviation.
    A Pallas VMEM GroupNorm kernel was tried in round 1 and measured SLOWER
    than XLA's own fusions (see PERFORMANCE.md "negative results"); it was
    removed in round 2 when fast_norm superseded it.
    """
    in_channels: int
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    fast_norm: bool = False  # f32 stats + bf16 arithmetic (ops/norms.py) —
                             # no f32 activation materialization

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        residual = x
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        if self.fast_norm:
            from ..ops.norms import group_norm_silu_fast

            scale1, bias1 = _NormParams(self.in_channels, name="norm1")()
            h = group_norm_silu_fast(x.astype(self.dtype), scale1, bias1,
                                     self.groups, self.eps)
            h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
            h = h + t[:, None, None, :]
            scale2, bias2 = _NormParams(self.out_channels, name="norm2")()
            h = group_norm_silu_fast(h, scale2, bias2, self.groups, self.eps)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=jnp.float32, name="norm1")(x)
            h = nn.silu(h).astype(self.dtype)
            h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
            h = h + t[:, None, None, :]
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=jnp.float32, name="norm2")(h)
            h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if self.in_channels != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over HW tokens with residual connection.

    Matches diffusers' deprecated-attn-block semantics: GroupNorm, per-head
    qkv projections (heads = channels // head_dim), fp32 softmax, output
    projection, additive residual.

    `use_fused=True` routes the softmax(QK^T)V core through the Pallas VMEM
    kernel (`ops/pallas/attention.py`) — identical math, no HBM-resident
    (B, heads, T, T) logits, in the FORWARD and (via the custom-vjp
    recompute backward) in TRAINING too. The einsum path remains the
    default for CPU tests and exact-autodiff golden checks.
    """
    channels: int
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_fused: bool = False
    fused_heads_per_program: int = 1
    fused_fast_math: bool = False
    fast_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = self.channels // self.head_dim
        residual = x
        if self.fast_norm:
            from ..ops.norms import group_norm_silu_fast

            scale, bias = _NormParams(c, name="group_norm")()
            y = group_norm_silu_fast(x.astype(self.dtype), scale, bias,
                                     self.groups, self.eps, silu=False)
        else:
            y = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=jnp.float32, name="group_norm")(x)
        y = y.astype(self.dtype).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)

        def split(z):
            return z.reshape(b, h * w, heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # the Pallas kernel keeps the (T, T) fp32 logits in VMEM — only
        # valid while they fit (T=1024/256 for the reference's 128² config;
        # a 256² config reaches T=4096 => 67 MB and must take the XLA path)
        fits_vmem = 4 * (h * w) ** 2 <= 12 * 2 ** 20
        if self.use_fused and fits_vmem:
            # trainable wrapper: same Pallas forward, plus a fused VMEM
            # backward (custom_vjp) so jax.grad through training works —
            # static args positionally (custom_vjp nondiff_argnums)
            from ..ops.pallas.attention import fused_attention_trainable

            out = fused_attention_trainable(
                q, k, v, False, self.fused_heads_per_program,
                self.fused_fast_math, True).astype(self.dtype)
        else:
            scale = 1.0 / math.sqrt(self.head_dim)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return residual + out.reshape(b, h, w, c)


class Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # nearest-neighbor 2x == repeat along H and W (exact torch parity)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class DownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    with_attention: bool = False
    attention_head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_fused_attention: bool = False
    fused_heads_per_program: int = 1
    fused_fast_math: bool = False
    fast_norm: bool = False

    def setup(self):
        resnets = []
        attentions = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            resnets.append(ResnetBlock2D(in_ch, self.out_channels,
                                         groups=self.groups, eps=self.eps,
                                         dtype=self.dtype,
                                         fast_norm=self.fast_norm,
                                         name=f"resnets_{i}"))
            if self.with_attention:
                attentions.append(AttentionBlock(self.out_channels,
                                                 head_dim=self.attention_head_dim,
                                                 groups=self.groups, eps=self.eps,
                                                 dtype=self.dtype,
                                                 use_fused=self.use_fused_attention,
                                               fused_heads_per_program=self.fused_heads_per_program,
                                               fused_fast_math=self.fused_fast_math,
                                                 fast_norm=self.fast_norm,
                                                 name=f"attentions_{i}"))
        self.resnets = resnets
        self.attentions = attentions
        if self.add_downsample:
            self.downsamplers_0 = Downsample2D(self.out_channels, dtype=self.dtype)

    def __call__(self, x, temb):
        states = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.with_attention:
                x = self.attentions[i](x)
            states.append(x)
        if self.add_downsample:
            x = self.downsamplers_0(x)
            states.append(x)
        return x, states


class UNetMidBlock2D(nn.Module):
    channels: int
    attention_head_dim: int = 8
    add_attention: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_fused_attention: bool = False
    fused_heads_per_program: int = 1
    fused_fast_math: bool = False
    fast_norm: bool = False

    def setup(self):
        self.resnets_0 = ResnetBlock2D(self.channels, self.channels,
                                       groups=self.groups, eps=self.eps,
                                       dtype=self.dtype,
                                       fast_norm=self.fast_norm)
        if self.add_attention:
            self.attentions_0 = AttentionBlock(self.channels,
                                               head_dim=self.attention_head_dim,
                                               groups=self.groups, eps=self.eps,
                                               dtype=self.dtype,
                                               use_fused=self.use_fused_attention,
                                               fused_heads_per_program=self.fused_heads_per_program,
                                               fused_fast_math=self.fused_fast_math,
                                               fast_norm=self.fast_norm)
        self.resnets_1 = ResnetBlock2D(self.channels, self.channels,
                                       groups=self.groups, eps=self.eps,
                                       dtype=self.dtype,
                                       fast_norm=self.fast_norm)

    def __call__(self, x, temb):
        x = self.resnets_0(x, temb)
        if self.add_attention:
            x = self.attentions_0(x)
        return self.resnets_1(x, temb)


class UpBlock2D(nn.Module):
    in_channels: int       # skip channels of the DEEPER resolution entering last
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    with_attention: bool = False
    attention_head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_fused_attention: bool = False
    fused_heads_per_program: int = 1
    fused_fast_math: bool = False
    fast_norm: bool = False

    def setup(self):
        resnets = []
        attentions = []
        for i in range(self.num_layers):
            res_skip_channels = self.in_channels if i == self.num_layers - 1 else self.out_channels
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            resnets.append(ResnetBlock2D(resnet_in_channels + res_skip_channels,
                                         self.out_channels, groups=self.groups,
                                         eps=self.eps, dtype=self.dtype,
                                         fast_norm=self.fast_norm,
                                         name=f"resnets_{i}"))
            if self.with_attention:
                attentions.append(AttentionBlock(self.out_channels,
                                                 head_dim=self.attention_head_dim,
                                                 groups=self.groups, eps=self.eps,
                                                 dtype=self.dtype,
                                                 use_fused=self.use_fused_attention,
                                               fused_heads_per_program=self.fused_heads_per_program,
                                               fused_fast_math=self.fused_fast_math,
                                                 fast_norm=self.fast_norm,
                                                 name=f"attentions_{i}"))
        self.resnets = resnets
        self.attentions = attentions
        if self.add_upsample:
            self.upsamplers_0 = Upsample2D(self.out_channels, dtype=self.dtype)

    def __call__(self, x, skips, temb):
        for i, resnet in enumerate(self.resnets):
            skip = skips.pop()
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = resnet(x, temb)
            if self.with_attention:
                x = self.attentions[i](x)
        if self.add_upsample:
            x = self.upsamplers_0(x)
        return x


class UNet2D(nn.Module):
    """Top-level epsilon-prediction UNet. Input/output NHWC.

    `use_fused_attention=True` enables the Pallas VMEM attention kernel in
    every attn block (TPU inference path; the einsum path stays default
    for CPU and autodiff).
    """
    config: UNet2DConfig = UNet2DConfig()
    dtype: Any = jnp.float32
    use_fused_attention: bool = False
    fused_heads_per_program: int = 1  # heads per Pallas grid program (bit-
                                      # identical math; amortizes grid/DMA)
    fused_fast_math: bool = False  # bf16 exponentials in the fused kernel —
                                   # CHANGES output at bf16 level; opt-in only
    fast_norm: bool = False  # f32-stats/bf16-arithmetic GroupNorm (sampling)
    # rematerialization in the backward pass (jax.checkpoint — trades FLOPs
    # for training memory). Accepts a bool (True == "all") or a mode string:
    #   "all"   — every block recomputes its forward in the backward pass
    #             (measured a net LOSS at full width/b64: recompute cost
    #             exceeds the larger-batch win, PERFORMANCE.md round 4)
    #   "hires" — only the highest-resolution blocks (first down block,
    #             last up block), which hold the largest activations; the
    #             cheap-to-store low-res levels stay saved
    #   "attn"  — only attention-bearing blocks
    #   "dots"  — every block, but with the dots_with_no_batch_dims_saveable
    #             policy: matmul outputs stay saved, elementwise/norm
    #             intermediates recompute (bandwidth-cheap on TPU)
    remat: Any = False

    def setup(self):
        cfg = self.config
        mode = (self.remat if isinstance(self.remat, str)
                else ("all" if self.remat else "none"))
        if mode not in ("none", "all", "hires", "attn", "dots"):
            raise ValueError(f"unknown remat mode {mode!r} "
                             "(expected bool or all/hires/attn/dots)")
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if mode == "dots" else None)

        def wrap(block_cls, want: bool, **remat_kw):
            if not want:
                return block_cls
            if policy is not None:
                remat_kw["policy"] = policy
            return nn.remat(block_cls, **remat_kw)

        def want_block(is_hires: bool, has_attn: bool) -> bool:
            return (mode in ("all", "dots")
                    or (mode == "hires" and is_hires)
                    or (mode == "attn" and has_attn))
        self.conv_in = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                               dtype=self.dtype)
        self.time_embedding = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype)
        if cfg.num_class_embeds:
            # torch key `class_embedding.weight` (N, time_embed_dim) —
            # row added to the timestep embedding (diffusers UNet2DModel
            # class-conditioning semantics)
            self.class_embedding = nn.Embed(cfg.num_class_embeds,
                                            cfg.time_embed_dim,
                                            dtype=self.dtype)

        down_blocks = []
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            down_cls = wrap(DownBlock2D,
                            want_block(is_hires=i == 0,
                                       has_attn=block_type == "AttnDownBlock2D"))
            down_blocks.append(down_cls(
                in_channels=input_channel, out_channels=output_channel,
                num_layers=cfg.layers_per_block,
                add_downsample=not is_final,
                with_attention=block_type == "AttnDownBlock2D",
                attention_head_dim=cfg.attention_head_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dtype=self.dtype,
                use_fused_attention=self.use_fused_attention,
                fused_heads_per_program=self.fused_heads_per_program,
                fused_fast_math=self.fused_fast_math,
                fast_norm=self.fast_norm,
                name=f"down_blocks_{i}"))
        self.down_blocks = down_blocks

        mid_cls = wrap(UNetMidBlock2D,
                       want_block(is_hires=False,
                                  has_attn=cfg.add_mid_attention))
        self.mid_block = mid_cls(cfg.block_out_channels[-1],
                                        attention_head_dim=cfg.attention_head_dim,
                                        add_attention=cfg.add_mid_attention,
                                        groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                                        dtype=self.dtype,
                                        use_fused_attention=self.use_fused_attention,
                                        fused_heads_per_program=self.fused_heads_per_program,
                                        fused_fast_math=self.fused_fast_math,
                                        fast_norm=self.fast_norm)

        up_blocks = []
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(cfg.block_out_channels) - 1)]
            is_final = i == len(cfg.block_out_channels) - 1
            up_cls = wrap(UpBlock2D,
                          want_block(is_hires=is_final,
                                     has_attn=block_type == "AttnUpBlock2D"),
                          static_argnums=())
            up_blocks.append(up_cls(
                in_channels=input_channel,
                prev_output_channel=prev_output_channel,
                out_channels=output_channel,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=not is_final,
                with_attention=block_type == "AttnUpBlock2D",
                attention_head_dim=cfg.attention_head_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dtype=self.dtype,
                use_fused_attention=self.use_fused_attention,
                fused_heads_per_program=self.fused_heads_per_program,
                fused_fast_math=self.fused_fast_math,
                fast_norm=self.fast_norm,
                name=f"up_blocks_{i}"))
        self.up_blocks = up_blocks

        self.conv_norm_out = nn.GroupNorm(num_groups=cfg.norm_num_groups,
                                          epsilon=cfg.norm_eps, dtype=jnp.float32)
        self.conv_out = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                                dtype=jnp.float32)

    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 class_labels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """sample: (B, H, W, C) in [-1, 1]; timesteps: scalar or (B,) ints;
        class_labels: (B,) int class ids, REQUIRED iff the config is
        conditional (`num_class_embeds` set)."""
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0],
                                       flip_sin_to_cos=cfg.flip_sin_to_cos,
                                       downscale_freq_shift=float(cfg.freq_shift))
        emb = self.time_embedding(t_emb.astype(self.dtype))
        if cfg.num_class_embeds:
            if class_labels is None:
                raise ValueError(
                    "conditional UNet2D (num_class_embeds set) requires "
                    "class_labels")
            emb = emb + self.class_embedding(class_labels.astype(jnp.int32))
        elif class_labels is not None:
            raise ValueError("class_labels passed to an unconditional UNet2D "
                             "(num_class_embeds is None)")

        x = self.conv_in(sample.astype(self.dtype))
        skips = [x]
        for block in self.down_blocks:
            x, states = block(x, emb)
            skips.extend(states)

        x = self.mid_block(x, emb)

        for block in self.up_blocks:
            n = len(block.resnets)
            block_skips, skips = skips[-n:], skips[:-n]
            x = block(x, block_skips, emb)

        x = self.conv_norm_out(x)
        x = nn.silu(x)
        return self.conv_out(x.astype(jnp.float32))


def create_reference_unet(dtype=jnp.float32) -> UNet2D:
    """The exact architecture the reference trains/loads
    (`model_manager.py:173-194`)."""
    return UNet2D(config=UNet2DConfig(), dtype=dtype)


def init_unet_params(model: UNet2D, rng: jax.Array,
                     image_size: Optional[int] = None) -> Any:
    size = image_size or model.config.sample_size
    sample = jnp.zeros((1, size, size, model.config.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    if model.config.num_class_embeds:
        return model.init(rng, sample, t, jnp.zeros((1,), jnp.int32))["params"]
    return model.init(rng, sample, t)["params"]
