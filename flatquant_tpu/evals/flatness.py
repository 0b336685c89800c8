"""Flatness analysis: per-channel magnitude distributions under transforms.

Parity target: flatquant/flatness.py:21-283 + plot_flatness.py — collect
per-channel l2 norms of the quantized-linear inputs (activations) and
weights under {vanilla, FlatQuant, Hadamard, SmoothQuant-diag} transforms,
and plot the sorted-magnitude curves that visualize why flat distributions
quantize well.

Matplotlib is optional; the numeric API returns plain arrays so the tool
doubles as a debugging probe for calibration quality.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.core.hadamard import matmul_hadU
from flatquant_tpu.core.transforms import apply_decompose
from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import causal_mask, llama_layer, rope_tables
from flatquant_tpu.quantize.state import slice_layer


def channel_norms(x2d) -> np.ndarray:
    """Per-channel l2 norm over tokens (flatness.py's metric)."""
    return np.asarray(jnp.linalg.norm(x2d.astype(jnp.float32), axis=0))


def _sq_diag(act, weight, alpha=0.5):
    """act [T, H], weight [rows, H] -> per-in-channel diag [H]."""
    a_max = jnp.max(jnp.abs(act), axis=0)
    w_max = jnp.max(jnp.abs(weight), axis=0)
    return jnp.clip(w_max ** (1 - alpha) / jnp.clip(a_max, 1e-5) ** alpha, 1e-5)


def layer_flatness(
    cfg: LlamaConfig,
    lp: dict,
    fq_layer,
    x,
    cos,
    sin,
    mask,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-channel norms of the attention input (post-ln) under each
    transform family. Returns {method: {"act": [C], "weight": [C]}}."""
    from flatquant_tpu.models.llama import rms_norm

    h = rms_norm(x, lp["ln1_w"], cfg.rms_eps).reshape(-1, cfg.hidden_size)
    w = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=0).astype(jnp.float32)

    # per-channel == per in-feature: weights [rows, H] reduce over rows
    out = {
        "vanilla": {"act": channel_norms(h), "weight": channel_norms(w)},
        "hadamard": {
            "act": channel_norms(matmul_hadU(h)),
            "weight": channel_norms(matmul_hadU(w)),
        },
    }
    diag = _sq_diag(h, w)
    out["smoothquant"] = {
        "act": channel_norms(h * diag),
        "weight": channel_norms(w / diag[None, :]),
    }
    if fq_layer is not None and fq_layer.attn.ln_trans is not None:
        t = fq_layer.attn.ln_trans
        out["flatquant"] = {
            "act": channel_norms(apply_decompose(t, h)),
            "weight": channel_norms(apply_decompose(t, w, inv_t=True)),
        }
    return out


def model_flatness(cfg, params, fq_state, tokens, layers=(0,), compute_dtype=jnp.float32):
    """Flatness data for selected layers given a token batch [B, S]."""
    S = tokens.shape[1]
    cos, sin = rope_tables(cfg, jnp.arange(S))
    mask = causal_mask(S)
    x = params["embed"][tokens].astype(compute_dtype)
    results = {}
    for i in range(max(layers) + 1):
        lp = slice_layer(params["layers"], i)
        if i in layers:
            fq_l = None if fq_state is None else slice_layer(fq_state, i)
            results[i] = layer_flatness(cfg, lp, fq_l, x, cos, sin, mask)
        x = llama_layer(cfg, None, "fp", lp, None, x, cos, sin, mask)
    return results


def plot_flatness(results, out_path: str):
    """Sorted-magnitude curves per layer/method (plot_flatness.py analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(results)
    fig, axes = plt.subplots(n, 2, figsize=(10, 4 * n), squeeze=False)
    for row, (layer, methods) in enumerate(sorted(results.items())):
        for col, kind in enumerate(("act", "weight")):
            ax = axes[row][col]
            for method, data in methods.items():
                vals = np.sort(data[kind])[::-1]
                ax.plot(vals, label=method)
            ax.set_yscale("log")
            ax.set_title(f"layer {layer} {kind} channel norms")
            ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
