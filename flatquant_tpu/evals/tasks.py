"""Zero-shot QA evaluation (lm-eval integration).

The reference runs lm_eval.simple_evaluate over a HFLM wrapper
(main.py:72-91). Here the core capability — batched (context,
continuation) loglikelihood under any of our model modes — is implemented
natively, and an `lm_eval.api.model.LM` adapter is provided when the
lm-eval package (and its task data) is available. In zero-egress
environments the adapter raises a clear error instead of half-working.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import llama_forward


def batched_loglikelihood(
    cfg: LlamaConfig,
    params,
    fq,
    fq_cfg,
    mode: str,
    pairs: Sequence[Tuple[List[int], List[int]]],
    batch_size: int = 8,
    max_len: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
) -> List[Tuple[float, bool]]:
    """For each (context_tokens, continuation_tokens) return
    (sum logprob of continuation, is_greedy). The lm-eval loglikelihood
    contract."""
    max_len = max_len or cfg.seqlen
    results = []

    @jax.jit
    def fwd(params, fq, toks):
        return llama_forward(
            cfg, params, toks, fq=fq, fq_cfg=fq_cfg, mode=mode,
            compute_dtype=compute_dtype,
        )

    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i : i + batch_size]
        toks_batch = np.zeros((len(chunk), max_len), np.int32)
        meta = []
        for j, (ctx, cont) in enumerate(chunk):
            ctx, cont = list(ctx), list(cont)
            if not ctx:
                # lm-eval can issue empty-context requests; score from a
                # BOS-like token (HFLM prepends EOT) so logits[start-1]
                # never negative-indexes into the wrong position
                ctx = [0]
            seq = (ctx + cont)[-(max_len):]
            start = len(seq) - len(cont)
            if start < 1:
                raise ValueError(
                    f"continuation of {len(cont)} tokens leaves no context "
                    f"within max_len={max_len}; raise max_len"
                )
            toks_batch[j, : len(seq)] = seq
            meta.append((start, len(seq)))
        logits = np.asarray(fwd(params, fq, jnp.asarray(toks_batch)))
        for j, (start, end) in enumerate(meta):
            lp = jax.nn.log_softmax(jnp.asarray(logits[j, start - 1 : end - 1]), axis=-1)
            cont_toks = toks_batch[j, start:end]
            token_lp = np.asarray(jnp.take_along_axis(lp, jnp.asarray(cont_toks)[:, None], axis=-1))[:, 0]
            greedy = bool((np.argmax(np.asarray(lp), axis=-1) == cont_toks).all())
            results.append((float(token_lp.sum()), greedy))
    return results


def make_lm_eval_adapter(cfg, params, fq, fq_cfg, mode, tokenizer, batch_size=8):
    """Build an lm_eval LM adapter (requires the lm-eval package)."""
    try:
        from lm_eval.api.model import LM
        from lm_eval.api.instance import Instance
    except ImportError as e:
        raise ImportError(
            "lm-eval is not installed in this environment; "
            "batched_loglikelihood() provides the same capability for "
            "custom task data"
        ) from e

    class FlatQuantLM(LM):
        def __init__(self):
            super().__init__()
            self.tokenizer = tokenizer

        def _encode_pair(self, context: str, continuation: str):
            whole = self.tokenizer.encode(context + continuation)
            ctx = self.tokenizer.encode(context)
            return ctx, whole[len(ctx):]

        def loglikelihood(self, requests):
            pairs = [self._encode_pair(r.args[0], r.args[1]) for r in requests]
            return batched_loglikelihood(
                cfg, params, fq, fq_cfg, mode, pairs, batch_size=batch_size
            )

        def loglikelihood_rolling(self, requests):
            out = []
            for r in requests:
                toks = self.tokenizer.encode(r.args[0])
                res = batched_loglikelihood(
                    cfg, params, fq, fq_cfg, mode, [([toks[0]], toks[1:])],
                    batch_size=1,
                )
                out.append((res[0][0],))
            return out

        def generate_until(self, requests):
            raise NotImplementedError("generation tasks not supported yet")

    return FlatQuantLM()


def run_lm_eval(cfg, params, fq, fq_cfg, tasks, tokenizer, batch_size=8,
                log: Callable[[str], None] = print):
    """lm_eval.simple_evaluate over our model (needs lm-eval + task data)."""
    import lm_eval

    mode = "eval" if fq is not None else "fp"
    lm = make_lm_eval_adapter(cfg, params, fq, fq_cfg, mode, tokenizer, batch_size)
    results = lm_eval.simple_evaluate(model=lm, tasks=list(tasks))
    summary = {t: results["results"][t] for t in tasks if t in results.get("results", {})}
    log(f"lm-eval results: {summary}")
    return summary
