"""Native loglikelihood evaluator tests (lm-eval capability core)."""

import numpy as np
import jax.numpy as jnp

from flatquant_tpu.evals.tasks import batched_loglikelihood
from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward


def test_loglikelihood_matches_forward():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    ctx = rng.integers(0, cfg.vocab_size, 6).tolist()
    cont = rng.integers(0, cfg.vocab_size, 3).tolist()

    res = batched_loglikelihood(
        cfg, params, None, None, "fp", [(ctx, cont)], batch_size=1,
        max_len=16, compute_dtype=jnp.float32,
    )
    assert len(res) == 1
    ll, greedy = res[0]

    # manual recomputation
    toks = np.zeros((1, 16), np.int32)
    seq = ctx + cont
    toks[0, : len(seq)] = seq
    logits = llama_forward(cfg, params, jnp.asarray(toks), compute_dtype=jnp.float32)
    lp = jnp.log(jnp.exp(logits[0]) / jnp.sum(jnp.exp(logits[0]), -1, keepdims=True))
    want = sum(float(lp[len(ctx) - 1 + i, cont[i]]) for i in range(len(cont)))
    np.testing.assert_allclose(ll, want, rtol=1e-4, atol=1e-4)
    assert isinstance(greedy, bool)


def test_loglikelihood_prefers_likely_continuation():
    """Construct a model-biased continuation and check it scores higher."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    ctx = rng.integers(0, cfg.vocab_size, 5).tolist()
    # greedy continuation = by definition the highest-likelihood 1-token cont
    toks = np.zeros((1, 8), np.int32)
    toks[0, :5] = ctx
    logits = llama_forward(cfg, params, jnp.asarray(toks), compute_dtype=jnp.float32)
    best = int(jnp.argmax(logits[0, 4]))
    worst = int(jnp.argmin(logits[0, 4]))

    res = batched_loglikelihood(
        cfg, params, None, None, "fp", [(ctx, [best]), (ctx, [worst])],
        batch_size=2, max_len=8, compute_dtype=jnp.float32,
    )
    assert res[0][0] > res[1][0]
    assert res[0][1] is True  # greedy flag for the argmax continuation


def test_loglikelihood_empty_context():
    """lm-eval can issue empty-context requests; a BOS-like token is
    prepended so logits are never sliced with a negative start index."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    cont = rng.integers(0, cfg.vocab_size, 3).tolist()

    res = batched_loglikelihood(
        cfg, params, None, None, "fp", [([], cont)], batch_size=1,
        max_len=8, compute_dtype=jnp.float32,
    )
    ll, greedy = res[0]
    # must equal scoring cont behind an explicit token-0 context
    want = batched_loglikelihood(
        cfg, params, None, None, "fp", [([0], cont)], batch_size=1,
        max_len=8, compute_dtype=jnp.float32,
    )[0][0]
    np.testing.assert_allclose(ll, want, rtol=1e-5, atol=1e-5)
    assert np.isfinite(ll)
