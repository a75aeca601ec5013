"""Torch state_dict <-> Flax param-pytree conversion.

Bridges the reference's checkpoint format (flat torch keys like
`down_blocks.0.resnets.1.conv1.weight`; reference
`core/generator/model_manager.py:130-143` loads them with
`load_state_dict`) to the nested Flax trees of `synt_isic_tpu.models`.

Rules:
  * name segments followed by an index merge: `resnets.1` -> `resnets_1`
    (matches the submodule naming convention in our Flax modules);
  * conv weights OIHW -> HWIO; linear weights (O,I) -> (I,O);
  * 1-D `weight` (Group/BatchNorm affine) -> `scale`;
  * BatchNorm `running_mean`/`running_var` -> `mean`/`var` (batch_stats);
  * legacy diffusers attention names (`query/key/value/proj_attn`) map onto
    the modern `to_q/to_k/to_v/to_out.0`.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Mapping, Tuple

import numpy as np

_LEGACY_ATTN = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out_0",
}


def _flax_path(torch_key: str) -> Tuple[List[str], str]:
    """Split a torch key into (module path, leaf name) in Flax naming."""
    parts = torch_key.split(".")
    merged: List[str] = []
    for part in parts:
        if part.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{part}"
        else:
            merged.append(part)
    leaf = merged.pop()
    merged = [_LEGACY_ATTN.get(p, p) for p in merged]
    return merged, leaf


def _leaf_name_and_value(leaf: str, value: np.ndarray,
                         parent: str = "") -> Tuple[str, np.ndarray]:
    if leaf == "weight":
        # nn.Embedding tables ((N, dim) lookup, e.g. the conditional UNet's
        # `class_embedding.weight`) are row-indexed, NOT matmul'd — flax
        # nn.Embed stores them untransposed under 'embedding'
        if parent.endswith("embedding") and value.ndim == 2:
            return "embedding", value
        if value.ndim == 4:
            return "kernel", np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        if value.ndim == 2:
            return "kernel", np.transpose(value, (1, 0))
        return "scale", value  # norm affine
    if leaf == "bias":
        return "bias", value
    if leaf == "running_mean":
        return "mean", value
    if leaf == "running_var":
        return "var", value
    return leaf, value


def torch_to_flax(state: Mapping[str, np.ndarray],
                  strip_prefixes: Iterable[str] = ("module.", "model.")) -> Dict[str, Any]:
    """Flat torch state_dict -> nested Flax tree.

    BatchNorm running statistics land next to scale/bias under the same
    module node (our ResNet treats them as frozen parameters — eval-mode
    inference, matching the reference's `model.eval()` usage).
    """
    tree: Dict[str, Any] = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        for prefix in strip_prefixes:
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        path, leaf = _flax_path(key)
        leaf, value = _leaf_name_and_value(leaf, np.asarray(value),
                                           parent=path[-1] if path else "")
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = value
    return tree


def flax_to_torch(tree: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Nested Flax tree -> flat torch state_dict (inverse of torch_to_flax)."""
    flat: Dict[str, np.ndarray] = {}
    # module names whose trailing _<digit> is literal in torch (not an index)
    literal_names = {"linear_1", "linear_2"}

    def walk(node: Mapping[str, Any], path: List[str]) -> None:
        for name, value in node.items():
            if isinstance(value, Mapping):
                walk(value, path + [name])
                continue
            value = np.asarray(value)
            # re-expand merged indices: resnets_1 -> resnets.1 (but keep
            # to_out_0 -> to_out.0 too, same rule)
            parts: List[str] = []
            for p in path:
                head, _, tail = p.rpartition("_")
                if tail.isdigit() and head and p not in literal_names:
                    parts.extend([head, tail])
                else:
                    parts.append(p)
            if name == "kernel":
                if value.ndim == 4:
                    value = np.transpose(value, (3, 2, 0, 1))
                elif value.ndim == 2:
                    value = np.transpose(value, (1, 0))
                leaf = "weight"
            elif name == "embedding":
                leaf = "weight"  # nn.Embed table — untransposed (see above)
            elif name == "scale":
                leaf = "weight"
            elif name == "mean":
                leaf = "running_mean"
            elif name == "var":
                leaf = "running_var"
            else:
                leaf = name
            flat[".".join(parts + [leaf])] = value

    walk(tree, [])
    return flat
