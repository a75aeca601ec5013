"""Full-size (25M-param) checkpoint key/shape manifest tests.

The framework's core contract is that a real `unet_<CLASS>_best.pth` saved
by the reference stack (diffusers `UNet2DModel`, config at
`/root/reference/core/generator/model_manager.py:173-194`) loads and
samples correctly. diffusers is not installed in this environment, so
`expected_unet2d_state_shapes()` below vendors the EXACT state-dict key
set and shapes that diffusers >=0.21 (the reference's pin,
`requirements.txt:6`) produces for that config, derived from diffusers'
construction rules:

  * `UNet2DModel.__init__` (src/diffusers/models/unet_2d.py):
    conv_in 3x3, `time_proj=Timesteps(block_out_channels[0], ...)` (no
    params), `time_embedding=TimestepEmbedding(block_out_channels[0],
    time_embed_dim=4*block_out_channels[0])` with linear_1/linear_2,
    conv_norm_out GroupNorm(norm_num_groups, block_out_channels[0]),
    conv_out 3x3. Down block i: in=prev out, out=block_out_channels[i],
    add_downsample = i != last. Up block i over reversed channels:
    prev_output=previous out, output=reversed[i],
    input=reversed[min(i+1, last)], num_layers=layers_per_block+1,
    add_upsample = i != last. Mid block: UNetMidBlock2D(
    block_out_channels[-1], num_layers=1 -> resnets.0/1 + attentions.0).
  * `ResnetBlock2D` (src/diffusers/models/resnet.py): norm1, conv1 3x3,
    time_emb_proj Linear(temb, out), norm2, conv2 3x3, conv_shortcut 1x1
    iff in != out (use_in_shortcut default).
  * `Attention` with `_from_deprecated_attn_block=True`
    (src/diffusers/models/attention_processor.py, constructed by
    AttnDownBlock2D/AttnUpBlock2D/UNetMidBlock2D in unet_2d_blocks.py):
    group_norm + to_q/to_k/to_v (bias=True) + to_out.0.
  * `Downsample2D(..., name="op")` / `Upsample2D(..., name="conv")` both
    register the conv as attribute `conv` -> keys
    `downsamplers.0.conv.*` / `upsamplers.0.conv.*`.

Three closures are verified against this manifest:
  1. the torch oracle (`tests/torch_oracle/unet2d_torch.py`) emits exactly
     this state dict at FULL size (not just tiny configs);
  2. `io.convert.torch_to_flax` consumes every key and reproduces the full
     Flax `init_unet_params` tree shape-for-shape (via jax.eval_shape — no
     FLOPs);
  3. the legacy (<0.18) attention key spelling (query/key/value/proj_attn)
     converts onto the same tree.
"""
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synt_isic_tpu.io.convert import torch_to_flax
from synt_isic_tpu.io.manifest import (expected_unet2d_state_shapes,
                                       validate_state_dict)
from synt_isic_tpu.models.unet2d import UNet2D, UNet2DConfig

Shape = Tuple[int, ...]

REFERENCE_CONFIG = dict(
    sample_size=128, in_channels=3, out_channels=3, layers_per_block=2,
    block_out_channels=(64, 128, 256, 256),
    down_block_types=("DownBlock2D", "DownBlock2D", "AttnDownBlock2D",
                      "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D", "UpBlock2D"),
    attention_head_dim=8, norm_num_groups=32,
)

MANIFEST = expected_unet2d_state_shapes(**REFERENCE_CONFIG)


def test_manifest_param_count_matches_reference_checkpoint_size():
    """The reference's 7 cached checkpoints are ~101,345,019 bytes each
    (`core/cache/metadata/cache_metadata.json:6`); fp32 state dict bytes must
    land within pickle/zip overhead of that."""
    n_params = sum(int(np.prod(s)) for s in MANIFEST.values())
    assert 25_000_000 < n_params < 25_700_000
    raw_bytes = n_params * 4
    assert abs(raw_bytes - 101_345_019) / 101_345_019 < 0.01


def test_torch_oracle_full_size_matches_manifest():
    """The torch oracle emits EXACTLY the diffusers key/shape set at full
    size — i.e. oracle fixtures are structurally indistinguishable from
    real reference checkpoints."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle.unet2d_torch import UNet2DTorch

    with torch.device("meta"):  # shapes only — no 25M-param allocation
        sd = UNet2DTorch(**REFERENCE_CONFIG).state_dict()
    oracle = {k: tuple(v.shape) for k, v in sd.items()}
    assert oracle == MANIFEST


def _flax_shape_tree() -> Dict:
    model = UNet2D(config=UNet2DConfig())
    sample = jnp.zeros((1, 128, 128, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t)
    return variables["params"]


def _flatten_shapes(tree, path=()):
    flat = {}
    for k, v in tree.items():
        if hasattr(v, "shape"):
            flat[path + (k,)] = tuple(v.shape)
        else:
            flat.update(_flatten_shapes(v, path + (k,)))
    return flat


def test_torch_to_flax_consumes_full_manifest():
    """Every manifest key must be consumed by torch_to_flax and land at the
    right node with the right (transposed) shape: the converted tree must be
    IDENTICAL in structure and shapes to the full-size Flax init tree."""
    fake_state = {k: np.zeros(s, np.float32) for k, s in MANIFEST.items()}
    converted = _flatten_shapes(torch_to_flax(fake_state))
    expected = _flatten_shapes(_flax_shape_tree())
    assert set(converted) == set(expected), (
        f"missing={sorted(set(expected) - set(converted))[:5]} "
        f"extra={sorted(set(converted) - set(expected))[:5]}")
    mismatched = {k: (converted[k], expected[k])
                  for k in expected if converted[k] != expected[k]}
    assert not mismatched, dict(list(mismatched.items())[:5])


def test_torch_to_flax_consumes_legacy_attention_naming():
    """Checkpoints saved by diffusers <0.18 spell attention projections
    query/key/value/proj_attn (1-D conv-style (C,C) weights); the converter
    must map them onto the same to_q/to_k/to_v/to_out_0 nodes."""
    legacy = {}
    for k, s in MANIFEST.items():
        k = (k.replace(".to_q.", ".query.").replace(".to_k.", ".key.")
             .replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn."))
        legacy[k] = np.zeros(s, np.float32)
    converted = _flatten_shapes(torch_to_flax(legacy))
    expected = _flatten_shapes(_flax_shape_tree())
    assert converted == expected
    # and validate_state_dict accepts the legacy spelling too
    assert validate_state_dict(legacy, MANIFEST) == []


def test_validate_state_dict_reports_problems():
    good = {k: np.zeros(s, np.float32) for k, s in MANIFEST.items()}
    assert validate_state_dict(good, MANIFEST) == []

    broken = dict(good)
    del broken["mid_block.attentions.0.to_q.weight"]        # missing
    broken["conv_in.weight"] = np.zeros((64, 4, 3, 3))       # wrong shape
    broken["decoder.extra.weight"] = np.zeros((1,))          # unexpected
    problems = validate_state_dict(broken, MANIFEST)
    assert any(p.startswith("missing key: mid_block.attentions.0.to_q.weight")
               for p in problems)
    assert any(p.startswith("shape mismatch: conv_in.weight") for p in problems)
    assert any(p.startswith("unexpected key: decoder.extra.weight")
               for p in problems)
    assert len(problems) == 3


def test_model_manager_rejects_mismatched_checkpoint(tmp_path):
    """End-to-end: a checkpoint whose shapes don't match the architecture
    must FAIL to load (never silently sample garbage)."""
    from synt_isic_tpu.io.pth import save_pth
    from synt_isic_tpu.model_manager import ModelManager

    tiny = UNet2DConfig(sample_size=16, layers_per_block=1,
                        block_out_channels=(8, 16), attention_head_dim=4,
                        norm_num_groups=2,
                        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                        up_block_types=("AttnUpBlock2D", "UpBlock2D"))
    import dataclasses as _dc
    manifest = expected_unet2d_state_shapes(**_dc.asdict(tiny))
    good_state = {k: np.zeros(s, np.float32) for k, s in manifest.items()}

    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    save_pth(good_state, str(ckpt_dir / "unet_NV_best.pth"))
    bad_state = dict(good_state)
    bad_state["conv_in.weight"] = np.zeros((8, 4, 3, 3), np.float32)
    save_pth(bad_state, str(ckpt_dir / "unet_MEL_best.pth"))

    mm = ModelManager(checkpoints_dir=str(ckpt_dir), model_config=tiny)
    assert mm.load_model("NV") is True
    assert mm.load_model("MEL") is False  # rejected with a manifest error
