"""Checkpoint roundtrips and the CLI pipeline smoke test."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.quantized import build_serving_params
from flatquant_tpu.utils import checkpoint as ckpt


def _trees_equal(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))


def test_flat_parameters_roundtrip(tmp_path):
    cfg = get_config("tiny-llama")
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    ckpt.save_flat_parameters(str(tmp_path), fq)
    template = init_model_fq(cfg, W4A4KV4, seed=99)  # different values, same structure
    loaded = ckpt.load_flat_parameters(str(tmp_path), template)
    assert _trees_equal(fq, loaded)


def test_flat_matrices_roundtrip(tmp_path):
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    _, baked_fq = bake_model(cfg, W4A4KV4, params, fq)
    ckpt.save_flat_matrices(str(tmp_path), baked_fq)
    _, template = bake_model(cfg, W4A4KV4, params, init_model_fq(cfg, W4A4KV4, seed=7))
    loaded = ckpt.load_flat_matrices(str(tmp_path), template)
    assert _trees_equal(baked_fq, loaded)


def test_packed_safetensors_roundtrip(tmp_path):
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    baked, baked_fq = bake_model(cfg, W4A4KV4, params, fq)
    sp = build_serving_params(cfg, W4A4KV4, baked, baked_fq)
    path = ckpt.save_packed_safetensors(str(tmp_path), sp, {"w_bits": 4})
    assert os.path.exists(path)
    # template with different values, same structure
    sp2 = build_serving_params(
        cfg, W4A4KV4, *bake_model(cfg, W4A4KV4, init_params(cfg, seed=5),
                                  init_model_fq(cfg, W4A4KV4, seed=5))
    )
    loaded = ckpt.load_packed_safetensors(path, sp2)
    assert _trees_equal(sp, loaded)


def test_hf_loader_roundtrip(tmp_path):
    """Export a random model in HF naming, reload, compare."""
    from safetensors.numpy import save_file

    from flatquant_tpu.models.loader import load_hf_llama

    cfg = get_config("tiny-qwen")
    params = init_params(cfg, seed=0)
    tensors = {
        "model.embed_tokens.weight": np.asarray(params["embed"]),
        "model.norm.weight": np.asarray(params["final_norm_w"]),
    }
    name_map = {
        "ln1_w": "input_layernorm.weight",
        "ln2_w": "post_attention_layernorm.weight",
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "bq": "self_attn.q_proj.bias",
        "bk": "self_attn.k_proj.bias",
        "bv": "self_attn.v_proj.bias",
        "wgate": "mlp.gate_proj.weight",
        "wup": "mlp.up_proj.weight",
        "wdown": "mlp.down_proj.weight",
    }
    for key, hf in name_map.items():
        arr = np.asarray(params["layers"][key])
        for i in range(cfg.num_layers):
            tensors[f"model.layers.{i}.{hf}"] = arr[i]
    save_file(tensors, str(tmp_path / "model.safetensors"))
    loaded = load_hf_llama(str(tmp_path), cfg)
    assert _trees_equal(params, loaded)


def test_cli_pipeline_smoke(tmp_path):
    env = dict(os.environ)
    cmd = [
        sys.executable, "main.py", "--platform", "cpu", "--model", "tiny-llama",
        "--w_bits", "4", "--a_bits", "4", "--cali_trans", "--lwc",
        "--epochs", "1", "--nsamples", "4", "--cali_bsz", "2", "--seqlen", "16",
        "--eval_ppl", "--output_dir", str(tmp_path),
        "--quantized_save", "--generate_demo", "4", "--perm_transforms",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PPL" in r.stderr or "PPL" in r.stdout


def test_packed_export_reload_serves_identically(tmp_path):
    """Export packed int4 -> reload -> serving logits identical."""
    import jax.numpy as jnp

    from flatquant_tpu.quantize.spec import W4A4KV4 as _CFG
    from flatquant_tpu.serving.engine import init_cache, serving_prefill

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, _CFG, seed=0)
    baked, baked_fq = bake_model(cfg, _CFG, params, fq)
    sp = build_serving_params(cfg, _CFG, baked, baked_fq, dtype=jnp.float32)
    path = ckpt.save_packed_safetensors(str(tmp_path), sp, {"w_bits": 4})

    # reload into a template built from DIFFERENT weights
    template = build_serving_params(
        cfg, _CFG, *bake_model(cfg, _CFG, init_params(cfg, seed=9),
                               init_model_fq(cfg, _CFG, seed=9)),
        dtype=jnp.float32,
    )
    loaded = ckpt.load_packed_safetensors(path, template)

    toks = np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    l1, _ = serving_prefill(cfg, _CFG, sp, jnp.asarray(toks),
                            init_cache(cfg, 1, 16, dtype=jnp.float32),
                            use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    l2, _ = serving_prefill(cfg, _CFG, loaded, jnp.asarray(toks),
                            init_cache(cfg, 1, 16, dtype=jnp.float32),
                            use_kernel=False, max_len=16, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_save_reload_matrices_roundtrip():
    """--save_matrix writes the pre-fold matrices form; --reload_matrix
    loads it onto raw weights and re-bakes to the identical eval model."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flatquant_tpu.models.config import get_config
    from flatquant_tpu.models.llama import init_params, llama_forward
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.utils import checkpoint as ckpt
    from flatquant_tpu.utils.reference_convert import (
        matrices_fq_template,
        matrices_state,
    )

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=3)

    baked_params, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
    want = llama_forward(cfg, baked_params, toks, fq=baked_fq, fq_cfg=fq_cfg,
                         mode="eval", compute_dtype=jnp.float32)

    with tempfile.TemporaryDirectory() as d:
        ckpt.save_flat_matrices(d, matrices_state(fq))
        template = matrices_fq_template(cfg, fq_cfg, seed=99)
        loaded = ckpt.load_flat_matrices(d, template)

    baked2_params, baked2_fq = bake_model(cfg, fq_cfg, params, loaded)
    got = llama_forward(cfg, baked2_params, toks, fq=baked2_fq, fq_cfg=fq_cfg,
                        mode="eval", compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=0)


def test_hf_loader_bf16_checkpoint(tmp_path):
    """Real HF Llama/Qwen shards ship BF16 — the native mmap reader must
    widen them exactly (safetensors' numpy framework cannot even represent
    bf16; this used to be a loader blind spot)."""
    import torch
    from safetensors.torch import save_file as save_pt

    from flatquant_tpu.models.loader import load_hf_llama

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=4)
    name_map = {
        "ln1_w": "input_layernorm.weight",
        "ln2_w": "post_attention_layernorm.weight",
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "wgate": "mlp.gate_proj.weight",
        "wup": "mlp.up_proj.weight",
        "wdown": "mlp.down_proj.weight",
    }
    tensors = {
        "model.embed_tokens.weight": torch.tensor(
            np.asarray(params["embed"])).bfloat16(),
        "model.norm.weight": torch.tensor(
            np.asarray(params["final_norm_w"])).bfloat16(),
        "lm_head.weight": torch.tensor(
            np.asarray(params["lm_head"])).bfloat16(),
    }
    for key, hf in name_map.items():
        arr = np.asarray(params["layers"][key])
        for i in range(cfg.num_layers):
            tensors[f"model.layers.{i}.{hf}"] = torch.tensor(arr[i]).bfloat16()
    save_pt(tensors, str(tmp_path / "model.safetensors"))
    loaded = load_hf_llama(str(tmp_path), cfg)
    # bf16 write is lossy; the *read-back widening* must be exact
    for i in range(cfg.num_layers):
        want = tensors[f"model.layers.{i}.self_attn.q_proj.weight"].float().numpy()
        got = np.asarray(loaded["layers"]["wq"][i])
        assert np.array_equal(got, want)


def test_packed_safetensors_sharded_roundtrip(tmp_path):
    """Sharded packed export (HF shard convention: numbered files +
    index.json weight map — the reference releases 5 GB shards,
    flat_utils.py:97-204) roundtrips exactly; a tiny max_shard_bytes
    forces multiple shards."""
    import jax.numpy as jnp
    import numpy as np

    from flatquant_tpu.models.config import get_config
    from flatquant_tpu.models.llama import init_params
    from flatquant_tpu.quantize.bake import bake_model
    from flatquant_tpu.quantize.spec import W4A4KV4
    from flatquant_tpu.quantize.state import init_model_fq
    from flatquant_tpu.serving.quantized import build_serving_params
    from flatquant_tpu.utils import checkpoint as ckpt

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4KV4, seed=0)
    bp, bfq = bake_model(cfg, W4A4KV4, params, fq)
    sp = build_serving_params(cfg, W4A4KV4, bp, bfq, dtype=jnp.bfloat16)

    idx = ckpt.save_packed_safetensors_sharded(
        str(tmp_path), sp, {"w_bits": 4}, max_shard_bytes=64 * 1024)
    assert idx.endswith(".index.json")
    import glob
    import json as _json
    import os

    shards = sorted(glob.glob(os.path.join(str(tmp_path), "*.safetensors")))
    assert len(shards) > 1, "tiny shard size must force multiple shards"
    with open(idx) as fh:
        index = _json.load(fh)
    assert set(index["weight_map"].values()) == {
        os.path.basename(s) for s in shards}

    loaded = ckpt.load_packed_safetensors_sharded(idx, sp)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(sp)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # big shard budget -> single-file fallback, loadable via both entries
    single = ckpt.save_packed_safetensors_sharded(
        str(tmp_path / "one"), sp, max_shard_bytes=1 << 40)
    assert single.endswith(".safetensors")
    loaded1 = ckpt.load_packed_safetensors_sharded(single, sp)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(loaded1)[0]),
        np.asarray(jax.tree.leaves(sp)[0]))
