"""Perplexity evaluation.

Parity target: flatquant/eval_utils.py:4-30 — stride-seqlen NLL over the
concatenated test stream: split into floor(N / seqlen) chunks, mean NLL per
chunk * seqlen summed, ppl = exp(total / (nchunks * seqlen)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import llama_forward


def _chunk_nll(cfg, params, chunk, fq, fq_cfg, mode, compute_dtype):
    logits = llama_forward(
        cfg, params, chunk, fq=fq, fq_cfg=fq_cfg, mode=mode, compute_dtype=compute_dtype
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = chunk[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def ppl_eval(
    cfg: LlamaConfig,
    params,
    test_tokens: np.ndarray,
    fq=None,
    fq_cfg=None,
    mode: str = "fp",
    seqlen: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
) -> float:
    """Perplexity of the concatenated stream [1, N] at stride seqlen."""
    seqlen = seqlen or cfg.seqlen
    n = test_tokens.shape[1] // seqlen
    assert n > 0, "test stream shorter than one seqlen chunk"
    @jax.jit
    def step(params, fq, chunk):
        return _chunk_nll(cfg, params, chunk, fq, fq_cfg, mode, compute_dtype)

    total = 0.0
    for i in range(n):
        chunk = jnp.asarray(test_tokens[:, i * seqlen : (i + 1) * seqlen])
        total += float(step(params, fq, chunk)) * seqlen
    return float(np.exp(total / (n * seqlen)))
