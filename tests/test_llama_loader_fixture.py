"""HF-layout Llama/Qwen fixture checkpoint smoke (VERDICT r3 item 5).

Generates a BF16 safetensors checkpoint at real HF tensor names/dtypes
(the only dtype real Llama/Qwen shards ship — exercising the native mmap
reader's BF16 widening), then drives the FULL CLI pipeline against it:
load -> calibrate -> bake -> RTN -> PPL -> packed export -> generate.

Reference analog: flatquant/model_utils.py:76 (get_model from HF),
flat_utils.py:97-204 (packed export).
"""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.loader import (
    config_from_hf_json,
    load_hf_llama,
    write_hf_llama_fixture,
)

torch = pytest.importorskip("torch")


def _load_cli():
    """Import THIS repo's main.py by path — a bare `import main` can be
    shadowed by other repos on sys.path (the reference has a main.py
    too, appended by the parity harness at collection time)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "flatquant_tpu_cli", os.path.join(root, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

FIX_LLAMA = LlamaConfig(
    name="fixture-llama", vocab_size=256, hidden_size=64,
    intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
    head_dim=16,
)
FIX_QWEN = dataclasses.replace(
    FIX_LLAMA, name="fixture-qwen", attn_bias=True, tie_embeddings=True)


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_llama")
    write_hf_llama_fixture(str(d), FIX_LLAMA, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def qwen_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_qwen")
    write_hf_llama_fixture(str(d), FIX_QWEN, seed=1)
    return str(d)


def test_config_roundtrip(llama_dir, qwen_dir):
    cfg = config_from_hf_json(llama_dir, name="fixture-llama")
    for f in ("vocab_size", "hidden_size", "intermediate_size",
              "num_layers", "num_heads", "num_kv_heads", "head_dim",
              "rope_theta", "rms_eps", "attn_bias", "tie_embeddings"):
        assert getattr(cfg, f) == getattr(FIX_LLAMA, f), f
    cq = config_from_hf_json(qwen_dir, name="fixture-qwen")
    assert cq.attn_bias and cq.tie_embeddings


def test_native_bf16_widening_matches_torch(llama_dir):
    """The native mmap reader's BF16->f32 conversion must equal torch's
    own bf16->f32 cast, tensor for tensor."""
    from safetensors.torch import load_file

    ref = load_file(os.path.join(llama_dir, "model.safetensors"))
    cfg = config_from_hf_json(llama_dir, name="fixture-llama")
    params = load_hf_llama(llama_dir, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["embed"]),
        ref["model.embed_tokens.weight"].float().numpy())
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wdown"][1]),
        ref["model.layers.1.mlp.down_proj.weight"].float().numpy())
    assert params["layers"]["wq"].shape == (2, 64, 64)


def test_main_end_to_end_llama(llama_dir, tmp_path):
    """main.py --hf_path: native reader -> calib (1 epoch) -> bake -> RTN
    -> PPL -> packed int4 export -> generate, all on the fixture."""
    cli = _load_cli()

    out = str(tmp_path / "out")
    cli.main([
        "--hf_path", llama_dir, "--model", "fixture-llama",
        "--w_bits", "4", "--a_bits", "4", "--k_bits", "4", "--v_bits", "4",
        "--k_asym", "--v_asym",
        "--cali_trans", "--add_diag", "--lwc", "--lac",
        "--epochs", "1", "--nsamples", "2", "--cali_bsz", "1",
        "--seqlen", "64", "--cali_dataset", "synthetic",
        "--eval_ppl", "--save_matrix", "--quantized_save",
        "--generate_demo", "3",
        "--output_dir", out, "--exp_name", "fix",
    ])
    exp = os.path.join(out, "fixture-llama", "w4a4", "fix")
    assert os.path.exists(os.path.join(exp, "model_packed_int4.safetensors"))
    assert os.path.exists(os.path.join(exp, "flat_matrices.msgpack")) or \
        glob.glob(os.path.join(exp, "flat_matrices*"))
    logs = glob.glob(os.path.join(exp, "*.log")) + \
        glob.glob(os.path.join(exp, "log*"))
    text = "".join(open(f).read() for f in logs)
    assert "PPL" in text and "generated tokens" in text
    # PPL through the full pipeline must be finite (parse the logged value)
    import re

    m = re.search(r"PPL: ([0-9.]+)", text)
    assert m and np.isfinite(float(m.group(1)))


def test_main_end_to_end_qwen(qwen_dir, tmp_path):
    """Qwen-style fixture (qkv bias + tied embeddings) through the same
    pipeline — the bias path and the no-lm_head path."""
    cli = _load_cli()

    out = str(tmp_path / "out")
    cli.main([
        "--hf_path", qwen_dir, "--model", "fixture-qwen",
        "--w_bits", "4", "--a_bits", "4",
        "--cali_trans", "--add_diag", "--lwc", "--lac",
        "--epochs", "1", "--nsamples", "2", "--cali_bsz", "1",
        "--seqlen", "64", "--cali_dataset", "synthetic",
        "--eval_ppl", "--output_dir", out, "--exp_name", "fix",
    ])
    exp = os.path.join(out, "fixture-qwen", "w4a4", "fix")
    logs = glob.glob(os.path.join(exp, "*.log")) + \
        glob.glob(os.path.join(exp, "log*"))
    text = "".join(open(f, errors="replace").read() for f in logs)
    assert "PPL" in text
