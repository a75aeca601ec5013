"""Sanity checks for attribution methods.

Parity with reference `sanity_check_comprehensive` (`xai/XAI.py:2008-2210`):
  1. weight-randomization: IG maps from a weight-randomized classifier must
     decorrelate from the originals (|r| < 0.1);
  2. input-independence: IG maps of independent noise inputs must not
     correlate (< 0.3);
  3. class-sensitivity: IG maps for different target classes must differ
     (< 0.8);
  plus the aggregate sanity score and interpretation.

TPU-native: the classifier is functional (params are data), so "randomize
weights" is building a perturbed params pytree — no stateful mutation or
try/finally weight restore needed (the reference mutates the live module
and restores in `finally`, `XAI.py:2201-2208`).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.classifier import LesionClassifier


def _randomized_params(params, key, strength: float = 0.01):
    """Replace every >1-dim leaf (weights, not biases) with small noise."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        jax.random.normal(k, leaf.shape, leaf.dtype) * strength
        if hasattr(leaf, "ndim") and leaf.ndim > 1 else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _corr(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel(), b.ravel()
    if np.any(np.isnan(a)) or np.any(np.isnan(b)):
        return 0.0
    if a.std() == 0 or b.std() == 0:
        return 0.0
    c = float(np.corrcoef(a, b)[0, 1])
    return 0.0 if np.isnan(c) else c


def sanity_check_comprehensive(classifier: LesionClassifier,
                               test_image: jnp.ndarray,
                               target_class: int,
                               xai_analyzer,
                               n_trials: int = 3,
                               randomization_strength: float = 0.01,
                               seed: int = 0) -> Dict[str, Any]:
    key = jax.random.PRNGKey(seed)
    results: Dict[str, Any] = {
        "weight_randomization_test": {},
        "input_independence_test": {},
        "model_sensitivity_test": {},
        "overall_sanity_score": 0.0,
    }
    original_params = classifier.params

    original_attr = np.asarray(
        xai_analyzer.compute_integrated_gradients(test_image, target_class, n_steps=20))

    # 1. weight randomization
    correlations = []
    for trial in range(n_trials):
        key, sub = jax.random.split(key)
        classifier.params = _randomized_params(original_params, sub,
                                               randomization_strength)
        try:
            rand_attr = np.asarray(
                xai_analyzer.compute_integrated_gradients(test_image, target_class,
                                                          n_steps=20))
            correlations.append(abs(_corr(original_attr, rand_attr)))
        except Exception:
            correlations.append(0.0)
        finally:
            classifier.params = original_params
    mean_rand = float(np.mean(correlations)) if correlations else 0.0
    results["weight_randomization_test"] = {
        "mean_correlation_with_random": mean_rand,
        "correlations_per_trial": correlations,
        "test_passed": bool(mean_rand < 0.1),
        "threshold": 0.1,
        "n_trials": n_trials,
    }

    # 2. input independence
    indep_attrs = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        noise_input = jax.random.normal(sub, test_image.shape, test_image.dtype)
        try:
            indep_attrs.append(np.asarray(
                xai_analyzer.compute_integrated_gradients(noise_input, target_class,
                                                          n_steps=15)))
        except Exception:
            continue
    indep_corrs = [abs(_corr(indep_attrs[i], indep_attrs[j]))
                   for i in range(len(indep_attrs))
                   for j in range(i + 1, len(indep_attrs))]
    mean_indep = float(np.mean(indep_corrs)) if indep_corrs else 0.0
    results["input_independence_test"] = {
        "mean_correlation_between_independent": mean_indep,
        "independence_correlations": indep_corrs,
        "test_passed": bool(mean_indep < 0.3),
        "threshold": 0.3,
        "n_independent_inputs": 3,
    }

    # 3. class sensitivity
    diff_corrs = []
    for other in range(min(3, classifier.num_classes)):
        if other == target_class:
            continue
        try:
            other_attr = np.asarray(
                xai_analyzer.compute_integrated_gradients(test_image, other, n_steps=15))
            diff_corrs.append(abs(_corr(original_attr, other_attr)))
        except Exception:
            continue
    mean_diff = float(np.mean(diff_corrs)) if diff_corrs else 1.0
    results["model_sensitivity_test"] = {
        "mean_correlation_different_classes": mean_diff,
        "different_class_correlations": diff_corrs,
        "test_passed": bool(mean_diff < 0.8),
        "threshold": 0.8,
        "classes_tested": len(diff_corrs),
    }

    passed = [results["weight_randomization_test"]["test_passed"],
              results["input_independence_test"]["test_passed"],
              results["model_sensitivity_test"]["test_passed"]]
    score = sum(passed) / len(passed)
    results["overall_sanity_score"] = float(score)
    results["overall_interpretation"] = ("good" if score >= 0.67 else
                                         "moderate" if score >= 0.33 else "poor")
    return results
