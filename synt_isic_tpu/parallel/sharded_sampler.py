"""Data-parallel sampling and attribution fan-out over a device mesh.

Replaces the reference's serial one-image-at-a-time loop
(`core/generator/image_generator.py:612-648`) with SPMD batches: seeds are
split across the 'data' mesh axis, model params are replicated, and the
jitted sampling scan runs as one partitioned XLA program — per-image RNG
streams (PRNGKey(seed) + fold_in) make the result independent of the
device layout, so an 8-chip batch equals eight 1-chip batches.

`sharded_scores` gives the same treatment to classifier-heavy XAI
workloads (Time-SHAP frame scoring, SHAP mask batches, fairness-corpus
audits): any per-sample pure function, vmapped and partitioned over the
mesh.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Union

import jax
import numpy as np
from jax.sharding import Mesh

from ..diffusion.sampler import DiffusionSampler
from .mesh import (batch_sharding, pad_to_multiple, replicated_sharding,
                   tp_param_shardings)


class ShardedSampler:
    """Wraps a `DiffusionSampler` with mesh placement.

    Batch size must be a multiple of the 'data' axis size; seeds are padded
    (with discarded extras) when not.

    Tensor parallelism is configured by the mesh itself: when the mesh has
    a `tp_axis` ('model') axis of size > 1, params are placed
    channel-sharded over it (`tp_param_shardings`) instead of replicated,
    and GSPMD partitions every conv/dense in the scan across that axis —
    the LATENCY scaling direction (dp scales throughput but cannot cut the
    time-to-first-image of a b1 interactive request; tp can). A 1-D 'data'
    mesh behaves exactly as before.
    """

    def __init__(self, sampler: DiffusionSampler, mesh: Mesh, axis: str = "data",
                 tp_axis: str = "model"):
        self.sampler = sampler
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.tp_axis = (tp_axis if tp_axis in mesh.axis_names
                        and mesh.shape[tp_axis] > 1 else None)

    def sample(self, model_params, seeds: Union[int, np.ndarray],
               capture_trajectory: bool = False,
               class_labels: Union[int, np.ndarray, None] = None) -> Dict[str, Any]:
        seeds_arr = np.atleast_1d(np.asarray(seeds, dtype=np.uint32))
        n = len(seeds_arr)
        padded = pad_to_multiple(n, self.n_shards)
        if class_labels is not None:
            # per-image labels ride with the seeds (conditional sampler);
            # scalars broadcast, arrays pad cyclically like the seeds so
            # the pad rows stay (seed, label)-consistent
            class_labels = np.broadcast_to(
                np.atleast_1d(np.asarray(class_labels, np.int32)), (n,))
            if padded != n:
                class_labels = np.resize(class_labels, padded)
        if padded != n:
            # np.resize tiles cyclically, so the pad reaches `padded` rows
            # even when padded - n > n (e.g. 1 seed on an 8-chip mesh —
            # a single concat of seeds_arr[:padded-n] would come up short
            # and device_put would reject the uneven shard)
            seeds_arr = np.resize(seeds_arr, padded)  # pad, drop later
        if jax.process_count() > 1:
            if self.tp_axis is not None:
                # TP shards weights over ICI within a host's chips; across
                # DCN the all-gather per layer would dominate — refuse
                # loudly rather than run a silently-degenerate layout
                raise NotImplementedError(
                    "tensor-parallel sampling is single-process (ICI) only; "
                    "use a 1-D 'data' mesh across hosts")
            # mesh spans hosts: plain device_put cannot target
            # non-addressable devices — assemble from per-process slices.
            # Noise is per-seed-independent, so each process computes ONLY
            # its own seeds' noise
            from .multihost import (global_batch_array, local_batch_bounds,
                                    replicated_global)

            start, stop = local_batch_bounds(len(seeds_arr))
            noise = global_batch_array(
                np.asarray(self.sampler.initial_noise(seeds_arr[start:stop])),
                self.mesh, self.axis)
            params = replicated_global(model_params, self.mesh)
        else:
            noise = self.sampler.initial_noise(seeds_arr)
            noise = jax.device_put(noise, batch_sharding(self.mesh, self.axis))
            if self.tp_axis is not None:
                params = jax.device_put(
                    model_params,
                    tp_param_shardings(model_params, self.mesh, self.tp_axis))
            else:
                params = jax.device_put(model_params,
                                        replicated_sharding(self.mesh))
        out = self.sampler.sample(params, seeds_arr, capture_trajectory,
                                  initial_noise=noise,
                                  class_labels=class_labels)
        if padded != n:
            out["images"] = out["images"][:n]
            out["noise_hashes"] = out["noise_hashes"][:n]
            out["seeds"] = out["seeds"][:n]
            if capture_trajectory:
                out["trajectory"] = out["trajectory"][:, :n]
        return out


def sharded_scores(fn: Callable, batch: np.ndarray, mesh: Mesh,
                   axis: str = "data", extra_args=()) -> np.ndarray:
    """Run `fn(batch, *extra_args)` (a jittable batched function) with the
    batch sharded over the mesh. Pads the batch to the axis size."""
    n = batch.shape[0]
    shards = mesh.shape[axis]
    padded = pad_to_multiple(n, shards)
    if padded != n:
        # cyclic tiling (see ShardedSampler.sample): a short batch — fewer
        # rows than the pad amount — must still reach `padded` rows
        batch = np.resize(batch, (padded,) + batch.shape[1:])
    placed = jax.device_put(batch, batch_sharding(mesh, axis))
    out = np.asarray(fn(placed, *extra_args))
    return out[:n]
