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


def _served():
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0  # sharpen to avoid argmax ties
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)
    return cfg, fq_cfg, baked, baked_fq, sp


def test_loglikelihood_real_matches_fake():
    """lm-eval scoring through the real-quant serving stack matches the
    fake-quant eval path (the reference's fake-vs-real metric-parity gate,
    REALQUANT.md Tables 1-2 / benchmark_lm_eval.py).

    KV16 config: exact parity (same math, packed weights). KV4: close but
    not exact — serving prefill deliberately attends UNQUANTIZED K/V
    (modeling_llama.py:125-137 accuracy trick) while the fake path
    quantizes, the same gap the reference reports (real 6.93 vs fake 6.98
    PPL on Llama-3-8B)."""
    from flatquant_tpu.evals.tasks import batched_loglikelihood as bll
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4, W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    pairs = [
        (rng.integers(0, cfg.vocab_size, 5).tolist(),
         rng.integers(0, cfg.vocab_size, 3).tolist())
        for _ in range(4)
    ] + [([], rng.integers(0, cfg.vocab_size, 2).tolist())]

    from flatquant_tpu.quantize.bake import rtn_quantize_params

    for fq_cfg, atol in ((W4A4, 2e-3), (W4A4KV4, 0.2)):
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
        eval_params = rtn_quantize_params(fq_cfg, baked)
        sp = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                  dtype=jnp.float32, eval_params=eval_params)
        fake = bll(cfg, eval_params, baked_fq, fq_cfg, "eval", pairs,
                   batch_size=3, max_len=16, compute_dtype=jnp.float32)
        real = bll(cfg, None, None, fq_cfg, "eval", pairs, batch_size=3,
                   max_len=16, compute_dtype=jnp.float32, serving_params=sp)
        for (lf, gf), (lr, gr) in zip(fake, real):
            np.testing.assert_allclose(lr, lf, atol=atol, rtol=5e-3)
            if fq_cfg is W4A4:
                assert gf == gr


def test_batched_generate_matches_engine():
    """generate_until capability: batched greedy generation through the
    serving engine matches per-prompt generate(), and stop sequences trim."""
    from flatquant_tpu.evals.tasks import batched_generate
    from flatquant_tpu.serving.engine import generate

    cfg, fq_cfg, _, _, sp = _served()
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, cfg.vocab_size, n).tolist() for n in (4, 6)]

    outs = batched_generate(cfg, fq_cfg, sp, prompts, max_new_tokens=5,
                            max_len=32)
    for p, got in zip(prompts, outs):
        want = generate(cfg, fq_cfg, sp, np.asarray(p, np.int32)[None],
                        max_new_tokens=5, max_len=32, use_kernel=False,
                        compute_dtype=jnp.float32)
        assert got == want[0].tolist()

    # stop trimming: stop at the first generated token -> empty output
    stop = [[outs[0][0]]]
    trimmed = batched_generate(cfg, fq_cfg, sp, prompts[:1], max_new_tokens=5,
                               max_len=32, stop_token_sets=[stop])
    assert trimmed[0] == []
