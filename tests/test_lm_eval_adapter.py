"""Offline proof of the lm-eval adapter contract (VERDICT r4 item 9).

The lm-eval package is absent in this zero-egress environment, so
`make_lm_eval_adapter` normally raises. This test vendors the MINIMAL
surface the adapter imports (`lm_eval.api.model.LM`,
`lm_eval.api.instance.Instance`) as mock modules and drives the
adapter's three entry points — loglikelihood, loglikelihood_rolling,
generate_until — over a local lambada-style micro-task, checking the
results against the native batched_loglikelihood / engine generate the
adapter is contracted to wrap (reference analog: HFLM through
lm_eval.simple_evaluate, main.py:72-91 + benchmark_lm_eval.py)."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.quantized import build_serving_params


class _CharTokenizer:
    """Char-level toy tokenizer over the tiny model's 256-id vocab."""

    eos_token_id = None

    def encode(self, s):
        return [ord(c) % 256 for c in s]

    def decode(self, ids):
        return "".join(chr(int(i) % 128) for i in ids)


@pytest.fixture()
def mock_lm_eval():
    """Install a minimal lm_eval package surface; remove it afterwards."""
    pkg = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    model = types.ModuleType("lm_eval.api.model")
    instance = types.ModuleType("lm_eval.api.instance")

    class LM:
        def __init__(self):
            pass

    class Instance:
        def __init__(self, args):
            self.args = args

    model.LM = LM
    instance.Instance = Instance
    pkg.api = api
    api.model = model
    api.instance = instance
    mods = {"lm_eval": pkg, "lm_eval.api": api,
            "lm_eval.api.model": model, "lm_eval.api.instance": instance}
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    yield Instance
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


@pytest.fixture(scope="module")
def served():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    baked, baked_fq = bake_model(cfg, W4A4KV4, params, fq)
    sp = build_serving_params(cfg, W4A4KV4, baked, baked_fq,
                              dtype=jnp.float32)
    return cfg, baked, baked_fq, sp


def test_adapter_loglikelihood_and_generate(mock_lm_eval, served):
    from flatquant_tpu.evals.tasks import (
        batched_loglikelihood,
        make_lm_eval_adapter,
    )

    Instance = mock_lm_eval
    cfg, baked, baked_fq, sp = served
    tok = _CharTokenizer()
    lm = make_lm_eval_adapter(cfg, baked, baked_fq, W4A4KV4, "eval", tok,
                              batch_size=4, serving_params=sp,
                              use_kernel=False, max_gen_tokens=8)

    # lambada-style (context, continuation) micro-task, local data only
    task = [("the quick brown", " fox"), ("hello wor", "ld"),
            ("abcde", "fg")]
    reqs = [Instance((c, t)) for c, t in task]
    got = lm.loglikelihood(reqs)
    assert len(got) == 3
    for ll, greedy in got:
        assert np.isfinite(ll)
        assert isinstance(greedy, (bool, np.bool_))

    # contract: identical to the native loglikelihood path it wraps
    pairs = [(tok.encode(c), tok.encode(c + t)[len(tok.encode(c)):])
             for c, t in task]
    want = batched_loglikelihood(cfg, baked, baked_fq, W4A4KV4, "eval",
                                 pairs, batch_size=4, serving_params=sp)
    for (a, ag), (b, bg) in zip(got, want):
        assert abs(a - b) < 1e-6 and ag == bg

    # rolling loglikelihood runs and returns one float per request
    roll = lm.loglikelihood_rolling([Instance(("hello there",))])
    assert len(roll) == 1 and np.isfinite(roll[0][0])

    # generate_until: per-request max_gen_toks trimming + decoding
    greq = [Instance(("abc", {"max_gen_toks": 4})),
            Instance(("hi", {"max_gen_toks": 2, "until": []}))]
    outs = lm.generate_until(greq)
    assert len(outs) == 2
    assert isinstance(outs[0], str) and len(outs[0]) == 4
    assert len(outs[1]) == 2


def test_adapter_raises_clearly_without_package(served):
    from flatquant_tpu.evals.tasks import make_lm_eval_adapter

    cfg, baked, baked_fq, sp = served
    if "lm_eval" in sys.modules:  # real package present: nothing to prove
        pytest.skip("lm_eval installed")
    with pytest.raises(ImportError, match="lm-eval is not installed"):
        make_lm_eval_adapter(cfg, baked, baked_fq, W4A4KV4, "eval",
                             _CharTokenizer())
