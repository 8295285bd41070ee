"""Inference-time BatchNorm folding.

At eval time BatchNorm uses frozen running statistics
(/root/reference/src/models/Encoder.py:8-35 ``conv`` blocks with
batchNorm=True; our ConvBlock / InertialEncoder mirrors them), so the
normalisation is an affine per-channel transform that can be baked into
the preceding convolution's weights once, ahead of time:

    BN(conv(x) + b) = conv'(x) + b'
    with  s  = gamma / sqrt(var + eps)
          K' = K * s          (broadcast over the output-channel axis)
          b' = (b - mean) * s + beta

The fold is exact and is expressed purely as a transformation of the
variables pytree — the model code is untouched.  The BatchNorm that
remains in the graph is rewritten to an exact identity-plus-shift
(mean=0, var=1-eps, scale=1, bias=b'): ``(y - 0) / sqrt((1-eps)+eps) * 1
+ b' == y + b'`` with ``sqrt(1.0) == 1.0`` exactly in IEEE arithmetic,
which XLA fuses into the convolution epilogue.  Net effect: the
per-channel normalisation multiply and the float32 statistic loads
disappear from the inference hot path.

Applies to every (conv, bn) pair in the image and inertial encoders;
layers without a paired BatchNorm are left alone.  Eval-only — folded
variables must never be used with ``train=True`` (the running statistics
are destroyed by design).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

BN_EPS = 1e-5  # matches nn.BatchNorm(epsilon=1e-5) in models/encoders.py


def _bn_key_for(conv_key: str) -> str:
    # ConvBlock pairs 'conv' with 'bn'; InertialEncoder pairs 'conv{i}'
    # with 'bn{i}'.
    return "bn" + conv_key[len("conv"):]


def _fold_node(
    params_node: Dict[str, Any], stats_node: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold every (conv*, bn*) pair directly inside one module dict."""
    params_node = dict(params_node)
    stats_node = dict(stats_node)
    for key in list(params_node.keys()):
        if not (key.startswith("conv") and isinstance(params_node[key], dict)
                and "kernel" in params_node[key]):
            continue
        bn_key = _bn_key_for(key)
        if bn_key not in params_node or bn_key not in stats_node:
            continue
        conv = dict(params_node[key])
        bn_p = params_node[bn_key]
        bn_s = stats_node[bn_key]
        kernel = conv["kernel"]
        gamma = bn_p["scale"].astype(jnp.float32)
        beta = bn_p["bias"].astype(jnp.float32)
        mean = bn_s["mean"].astype(jnp.float32)
        var = bn_s["var"].astype(jnp.float32)
        s = gamma / jnp.sqrt(var + BN_EPS)

        conv["kernel"] = (kernel.astype(jnp.float32) * s).astype(kernel.dtype)
        bias = conv.get("bias")
        shift = beta - mean * s if bias is None \
            else (bias.astype(jnp.float32) - mean) * s + beta
        if bias is not None:
            # keep the conv bias zero and carry the whole shift in the
            # (identity) BN so the fold is a single fused add either way
            conv["bias"] = jnp.zeros_like(bias)
        params_node[key] = conv
        params_node[bn_key] = {
            "scale": jnp.ones_like(gamma),
            "bias": shift.astype(beta.dtype),
        }
        stats_node[bn_key] = {
            "mean": jnp.zeros_like(mean),
            "var": jnp.full_like(var, 1.0 - BN_EPS),
        }
    return params_node, stats_node


def _walk(params: Any, stats: Any) -> Tuple[Any, Any]:
    if not isinstance(params, dict) or not isinstance(stats, dict):
        return params, stats
    new_p, new_s = _fold_node(params, stats)
    for key in new_p:
        if key in new_s and isinstance(new_p[key], dict):
            # already-folded bn leaves contain only arrays; recursing into
            # them is a no-op because they hold no nested conv/bn pairs
            new_p[key], new_s[key] = _walk(new_p[key], new_s[key])
    return new_p, new_s


def _fold_node_into_bias(
    params_node: Dict[str, Any], stats_node: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Like :func:`_fold_node`, but the whole affine goes into the conv's
    OWN bias and the bn entries are deleted — for a ``skip_bn`` graph."""
    params_node = dict(params_node)
    stats_node = dict(stats_node)
    for key in list(params_node.keys()):
        if not (key.startswith("conv") and isinstance(params_node[key], dict)
                and "kernel" in params_node[key]):
            continue
        bn_key = _bn_key_for(key)
        if bn_key not in params_node or bn_key not in stats_node:
            continue
        conv = dict(params_node[key])
        bn_p = params_node[bn_key]
        bn_s = stats_node[bn_key]
        kernel = conv["kernel"]
        gamma = bn_p["scale"].astype(jnp.float32)
        beta = bn_p["bias"].astype(jnp.float32)
        mean = bn_s["mean"].astype(jnp.float32)
        var = bn_s["var"].astype(jnp.float32)
        s = gamma / jnp.sqrt(var + BN_EPS)

        conv["kernel"] = (kernel.astype(jnp.float32) * s).astype(kernel.dtype)
        bias = conv.get("bias")
        b0 = jnp.zeros_like(mean) if bias is None else bias.astype(jnp.float32)
        conv["bias"] = ((b0 - mean) * s + beta).astype(
            kernel.dtype if bias is None else bias.dtype
        )
        params_node[key] = conv
        del params_node[bn_key]
        del stats_node[bn_key]
    return params_node, stats_node


def _walk_into_bias(params: Any, stats: Any) -> Tuple[Any, Any]:
    if not isinstance(params, dict) or not isinstance(stats, dict):
        return params, stats
    new_p, new_s = _fold_node_into_bias(params, stats)
    for key in list(new_p.keys()):
        if key in new_s and isinstance(new_p[key], dict):
            new_p[key], new_s[key] = _walk_into_bias(new_p[key], new_s[key])
    return new_p, new_s


def fold_batchnorm_into_bias(variables: Dict[str, Any]) -> Dict[str, Any]:
    """BatchNorm fold for a ``skip_bn`` (BN-free) eval graph: every
    (conv, bn) pair collapses to conv' with kernel K*s and bias
    (b - mean)*s + beta; the bn params/stats are REMOVED from the tree.

    Rationale: :func:`fold_batchnorm` leaves an identity-valued BN in the
    graph expecting XLA to fuse it away, but the identity affine still
    costs a measured ~16 ms/step of elementwise traffic at flagship dims
    (BENCH.md round 3) — the values are runtime parameters, so XLA cannot
    constant-fold them. Removing the ops from the graph
    (``ModelConfig.skip_bn``) and carrying the shift in the conv bias is
    exact and leaves nothing to schedule.

    Use with a model built with ``skip_bn=True``; the ConvBlock conv then
    expects the bias parameter this fold creates.
    """
    params = variables.get("params")
    stats = variables.get("batch_stats")
    if params is None or stats is None:
        return variables
    new_params, new_stats = _walk_into_bias(dict(params), dict(stats))
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out


def fold_batchnorm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new variables pytree with every encoder (conv, bn) pair
    folded for inference. Exact at eval time; invalid for training."""
    params = variables.get("params")
    stats = variables.get("batch_stats")
    if params is None or stats is None:
        return variables
    new_params, new_stats = _walk(dict(params), dict(stats))
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out
