"""Torch oracle for the UNet2D architecture — TEST/BASELINE CODE ONLY.

A from-scratch PyTorch transcription of the same published UNet2D math the
Flax model implements (sinusoidal t-embed, FiLM ResNet blocks, per-head
spatial attention, leading skip bookkeeping). Its state_dict uses
diffusers-style key names so it doubles as a generator of realistic
`unet_<CLASS>_best.pth` fixtures for the converter/loader tests, and as the
CPU reference implementation for benchmarking (the real reference stack —
diffusers/torchvision — is not installed in this environment).

This is NOT part of the framework; nothing in `synt_isic_tpu/` imports it.
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
