"""Torch oracle for the UNet2D architecture — TEST/BASELINE CODE ONLY.

A from-scratch PyTorch transcription of the same published UNet2D math the
Flax model implements (sinusoidal t-embed, FiLM ResNet blocks, per-head
spatial attention, leading skip bookkeeping). Its state_dict uses
diffusers-style key names so it doubles as a generator of realistic
`unet_<CLASS>_best.pth` fixtures for the converter/loader tests, and as the
CPU reference implementation for benchmarking (the real reference stack —
diffusers/torchvision — is not installed in this environment).

This is NOT part of the framework; nothing in `synt_isic_tpu/` imports it.

AUDIT vs diffusers >=0.21 UNet2DModel source (the reference's pin,
`/root/reference/requirements.txt:6`; config at
`/root/reference/core/generator/model_manager.py:173-194`), done 2026-08-16
against diffusers' src/diffusers/models/{unet_2d, unet_2d_blocks, resnet,
attention_processor, embeddings}.py semantics:

  * get_timestep_embedding: half = dim//2; exponent = -ln(10000) *
    arange(half)/(half - downscale_freq_shift(=0)); emb = t * exp(exponent);
    flip_sin_to_cos=True -> [cos, sin] order; odd-dim zero-pad N/A (dim=64).
    MATCHES `timestep_embedding` below.
  * TimestepEmbedding: Timesteps(ch0) -> linear_1(ch0, 4*ch0) -> SiLU ->
    linear_2. MATCHES.
  * ResnetBlock2D (pre_norm=True, time_embedding_norm="default",
    output_scale_factor=1.0, dropout=0.0, eps=norm_eps=1e-5):
    h = conv1(silu(norm1(x))); h += time_emb_proj(silu(temb))[..., None, None];
    h = conv2(dropout(silu(norm2(h)))); shortcut = 1x1 conv iff in != out
    (use_in_shortcut default); out = (shortcut(x) + h) / output_scale_factor.
    MATCHES — the /1.0 division is a no-op and is omitted here; UNet2DModel
    never passes a non-default output_scale_factor for these block types.
  * Attention (constructed by Attn{Down,Up}Block2D / UNetMidBlock2D with
    _from_deprecated_attn_block=True, residual_connection=True, bias=True,
    upcast_softmax=True, rescale_output_factor=output_scale_factor=1.0,
    eps=resnet_eps=1e-5, norm_num_groups=resnet_groups):
    GroupNorm on channels; q/k/v Linear WITH bias; heads =
    channels // attention_head_dim; logits scaled by dim_head**-0.5
    (baddbmm alpha=scale); softmax upcast to fp32; to_out.0 Linear;
    out = out + residual; / rescale_output_factor(=1.0) omitted as a no-op.
    MATCHES `AttentionBlock` below (mid-block head_dim: UNet2DModel passes
    attention_head_dim(=8), NOT block channels, when it is not None).
  * Downsample2D(use_conv=True, padding=downsample_padding=1, name="op"):
    3x3 stride-2 conv registered as attribute `conv`. MATCHES (padding=1).
  * Upsample2D(use_conv=True, name="conv"): nearest-2x interpolate then 3x3
    conv. MATCHES.
  * Block wiring: skips = [conv_in out] + each down-block's per-resnet
    outputs (+ downsampled); up blocks consume layers_per_block+1 skips
    last-first; AttnDown/AttnUp apply attention after EVERY resnet;
    mid = resnet, attention, resnet; head: conv_norm_out (GroupNorm 32,
    eps 1e-5 — torch default matches diffusers' norm_eps) -> SiLU ->
    conv_out. MATCHES UNet2DModel.forward.
  * center_input_sample=False, class_embed_type=None -> no input centering,
    no class embedding parameters. MATCHES (absent here).

Structural proof at full size: `tests/test_checkpoint_manifest.py` asserts
this module's 128x128 state_dict is key-for-key and shape-for-shape
identical to the vendored diffusers manifest
(`synt_isic_tpu/io/manifest.py`), whose fp32 byte count matches the real
reference checkpoints (101,345,019 bytes) within 1%.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32, device=t.device)
    exponent = exponent / (half - freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin], dim=-1) if flip_sin_to_cos else torch.cat([sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_ch: int, groups: int = 32,
                 eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        residual = x
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return residual + h


class AttentionBlock(nn.Module):
    def __init__(self, ch: int, head_dim: int = 8, groups: int = 32, eps: float = 1e-5):
        super().__init__()
        self.heads = ch // head_dim
        self.head_dim = head_dim
        self.group_norm = nn.GroupNorm(groups, ch, eps=eps)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)  # (B, T, C)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)

        def split(z):
            return z.reshape(b, h * w, self.heads, self.head_dim).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        logits = torch.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = logits.float().softmax(dim=-1).to(v.dtype)
        out = torch.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(1, 2).reshape(b, h * w, c)
        out = self.to_out[0](out).transpose(1, 2).reshape(b, c, h, w)
        return residual + out


class Downsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class DownBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, layers=2, downsample=True,
                 attention=False, head_dim=8, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, temb_ch, groups=groups)
             for i in range(layers)])
        self.attentions = nn.ModuleList(
            [AttentionBlock(out_ch, head_dim, groups=groups) for _ in range(layers)]) if attention else None
        self.downsamplers = nn.ModuleList([Downsample2D(out_ch)]) if downsample else None

    def forward(self, x, temb):
        states = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x)
            states.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states.append(x)
        return x, states


class MidBlock2D(nn.Module):
    def __init__(self, ch, temb_ch, head_dim=8, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(ch, ch, temb_ch, groups=groups),
                                      ResnetBlock2D(ch, ch, temb_ch, groups=groups)])
        self.attentions = nn.ModuleList([AttentionBlock(ch, head_dim, groups=groups)])

    def forward(self, x, temb):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x)
        return self.resnets[1](x, temb)


class UpBlock2D(nn.Module):
    def __init__(self, in_ch, prev_out_ch, out_ch, temb_ch, layers=3,
                 upsample=True, attention=False, head_dim=8, groups=32):
        super().__init__()
        resnets = []
        for i in range(layers):
            res_skip = in_ch if i == layers - 1 else out_ch
            res_in = prev_out_ch if i == 0 else out_ch
            resnets.append(ResnetBlock2D(res_in + res_skip, out_ch, temb_ch, groups=groups))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(
            [AttentionBlock(out_ch, head_dim, groups=groups) for _ in range(layers)]) if attention else None
        self.upsamplers = nn.ModuleList([Upsample2D(out_ch)]) if upsample else None

    def forward(self, x, skips: List[torch.Tensor], temb):
        for i, resnet in enumerate(self.resnets):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNet2DTorch(nn.Module):
    """Same architecture/defaults as the reference checkpoints
    (`model_manager.py:173-194`); configurable down for tiny test fixtures."""

    def __init__(self, sample_size=128, in_channels=3, out_channels=3,
                 layers_per_block=2,
                 block_out_channels: Sequence[int] = (64, 128, 256, 256),
                 down_block_types: Sequence[str] = ("DownBlock2D", "DownBlock2D",
                                                    "AttnDownBlock2D", "DownBlock2D"),
                 up_block_types: Sequence[str] = ("UpBlock2D", "AttnUpBlock2D",
                                                  "UpBlock2D", "UpBlock2D"),
                 attention_head_dim=8, norm_num_groups=32):
        super().__init__()
        temb_ch = block_out_channels[0] * 4
        self.block_out_channels = tuple(block_out_channels)
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], temb_ch)

        self.down_blocks = nn.ModuleList()
        out_ch = block_out_channels[0]
        for i, btype in enumerate(down_block_types):
            in_ch, out_ch = out_ch, block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            self.down_blocks.append(DownBlock2D(
                in_ch, out_ch, temb_ch, layers=layers_per_block,
                downsample=not is_final, attention=btype == "AttnDownBlock2D",
                head_dim=attention_head_dim, groups=norm_num_groups))

        self.mid_block = MidBlock2D(block_out_channels[-1], temb_ch,
                                    head_dim=attention_head_dim,
                                    groups=norm_num_groups)

        self.up_blocks = nn.ModuleList()
        reversed_ch = tuple(reversed(block_out_channels))
        out_ch = reversed_ch[0]
        for i, btype in enumerate(up_block_types):
            prev_out, out_ch = out_ch, reversed_ch[i]
            in_ch = reversed_ch[min(i + 1, len(block_out_channels) - 1)]
            is_final = i == len(block_out_channels) - 1
            self.up_blocks.append(UpBlock2D(
                in_ch, prev_out, out_ch, temb_ch, layers=layers_per_block + 1,
                upsample=not is_final, attention=btype == "AttnUpBlock2D",
                head_dim=attention_head_dim, groups=norm_num_groups))

        self.conv_norm_out = nn.GroupNorm(norm_num_groups, block_out_channels[0])
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3, padding=1)

    def forward(self, sample: torch.Tensor, timesteps: torch.Tensor) -> torch.Tensor:
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.block_out_channels[0]))
        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            x, states = block(x, temb)
            skips.extend(states)
        x = self.mid_block(x, temb)
        for block in self.up_blocks:
            n = len(block.resnets)
            block_skips, skips = skips[-n:], skips[:-n]
            x = block(x, block_skips, temb)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


def tiny_config() -> dict:
    """A small config that exercises every block type but runs fast."""
    return dict(sample_size=16, in_channels=3, out_channels=3, layers_per_block=2,
                block_out_channels=(8, 16, 16), attention_head_dim=4,
                norm_num_groups=4,
                down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"))
