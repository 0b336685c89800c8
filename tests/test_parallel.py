"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.parallel.mesh import (
    llama_param_specs,
    make_mesh,
    replicated_specs,
    shard_tree,
)
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh({"dp": 2, "tp": 4})


def test_sharded_forward_matches_single_device(mesh8):
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)

    ref = llama_forward(cfg, params, jnp.asarray(tokens), fq=fq, fq_cfg=W4A4KV4,
                        mode="calib", compute_dtype=jnp.float32)

    sharded_params = shard_tree(params, llama_param_specs(cfg, params), mesh8)
    sharded_fq = shard_tree(fq, replicated_specs(fq), mesh8)
    toks = jax.device_put(jnp.asarray(tokens), NamedSharding(mesh8, P("dp", None)))

    @jax.jit
    def fwd(p, f, t):
        return llama_forward(cfg, p, t, fq=f, fq_cfg=W4A4KV4, mode="calib",
                             compute_dtype=jnp.float32)

    out = fwd(sharded_params, sharded_fq, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_graft_entry_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[2].shape[0]
    mod.dryrun_multichip(8)


def test_deepseek_sharded_forward_matches():
    """dp x ep x tp mesh: MLA heads tp-sharded, experts ep-sharded."""
    from flatquant_tpu.models.deepseek import (
        TINY_DEEPSEEK,
        deepseek_forward,
        init_ds_fq,
        init_ds_params,
    )
    from flatquant_tpu.parallel.mesh import deepseek_param_specs
    from flatquant_tpu.quantize.spec import W4A4

    cfg = TINY_DEEPSEEK
    params = init_ds_params(cfg, seed=0)
    fq = init_ds_fq(cfg, W4A4, seed=0)
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)
    ref = deepseek_forward(cfg, params, jnp.asarray(tokens), fq=fq, fq_cfg=W4A4,
                           mode="calib", compute_dtype=jnp.float32)

    mesh = make_mesh({"dp": 2, "ep": 2, "tp": 2})
    sp = shard_tree(params, deepseek_param_specs(cfg, params), mesh)
    sfq = shard_tree(fq, replicated_specs(fq), mesh)
    toks = jax.device_put(jnp.asarray(tokens), NamedSharding(mesh, P("dp", None, )))

    @jax.jit
    def fwd(p, f, t):
        return deepseek_forward(cfg, p, t, fq=f, fq_cfg=W4A4, mode="calib",
                                compute_dtype=jnp.float32)

    out = fwd(sp, sfq, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


def test_shard_aligned_transforms_tp2(mesh8):
    """tp>1 shard-aligned (block-diagonal) down/o transforms: invariance,
    serving parity, and sharded==single on a dp2/tp4... (tp=2 here to
    divide tiny heads)."""
    import dataclasses as _dc

    from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.serving.engine import init_cache, serving_prefill
    from flatquant_tpu.serving.quantized import build_serving_params

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
    fq = init_model_fq(cfg, W4A4KV4, seed=0, tp=2)
    assert fq.attn.o_trans.factor.d.shape[-1] == cfg.num_heads // 2
    assert fq.mlp.down_trans.diag_scale.shape[-1] == cfg.intermediate_size // 2

    # calib == baked eval
    lc = llama_forward(cfg, params, jnp.asarray(toks), fq=fq, fq_cfg=W4A4KV4,
                       mode="calib", compute_dtype=jnp.float32)
    bp, bfq = bake_model(cfg, W4A4KV4, params, fq)
    ep = rtn_quantize_params(W4A4KV4, bp)
    le = llama_forward(cfg, ep, jnp.asarray(toks), fq=bfq, fq_cfg=W4A4KV4,
                       mode="eval", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(le), np.asarray(lc), atol=5e-3, rtol=5e-3)

    # real-quant serving parity (kv16 config: serving prefill attends
    # unquantized by design, so exact parity needs k/v at 16 bits)
    from flatquant_tpu.quantize.spec import W4A4

    fq16 = init_model_fq(cfg, W4A4, seed=0, tp=2)
    lc16 = llama_forward(cfg, params, jnp.asarray(toks), fq=fq16, fq_cfg=W4A4,
                         mode="calib", compute_dtype=jnp.float32)
    bp16, bfq16 = bake_model(cfg, W4A4, params, fq16)
    sp = build_serving_params(cfg, W4A4, bp16, bfq16, dtype=jnp.float32)
    lr, _ = serving_prefill(cfg, W4A4, sp, jnp.asarray(toks),
                            init_cache(cfg, 2, 16, dtype=jnp.float32),
                            use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lc16[:, -1]), atol=1e-4)

    # sharded forward matches single-device
    sharded_params = shard_tree(params, llama_param_specs(cfg, params), mesh8)
    sharded_fq = shard_tree(fq, replicated_specs(fq), mesh8)
    tk = jax.device_put(jnp.asarray(toks), NamedSharding(mesh8, P("dp", None)))

    @jax.jit
    def fwd(p, f, t):
        return llama_forward(cfg, p, t, fq=f, fq_cfg=W4A4KV4, mode="calib",
                             compute_dtype=jnp.float32)

    out = fwd(sharded_params, sharded_fq, tk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lc), rtol=3e-4, atol=3e-4)
