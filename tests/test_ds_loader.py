"""HF DeepSeek checkpoint loader tests (VERDICT r1 #5).

The reference loads FP8 block-scaled safetensors (deepseek_v3/model.py +
kernel.py:55-105 weight_dequant); here a tiny fixture in the official HF
layout proves the format end-to-end: write → load → forward.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flatquant_tpu.models.deepseek import TINY_DEEPSEEK, deepseek_forward
from flatquant_tpu.models.ds_loader import (
    ds_config_from_hf_json,
    load_hf_deepseek,
    write_hf_deepseek_fixture,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_ds")
    write_hf_deepseek_fixture(str(d), TINY_DEEPSEEK, seed=0, fp8=True)
    return str(d)


def test_config_roundtrip(fixture_dir):
    cfg = ds_config_from_hf_json(fixture_dir, name="tiny-deepseek")
    for f in ("vocab_size", "dim", "inter_dim", "moe_inter_dim", "n_layers",
              "n_dense_layers", "n_heads", "n_routed_experts",
              "n_shared_experts", "n_activated_experts", "n_expert_groups",
              "n_limited_groups", "score_func", "route_scale", "gate_bias",
              "q_lora_rank", "kv_lora_rank", "qk_nope_head_dim",
              "qk_rope_head_dim", "v_head_dim", "rms_eps"):
        assert getattr(cfg, f) == getattr(TINY_DEEPSEEK, f), f


def test_load_and_forward(fixture_dir):
    cfg = ds_config_from_hf_json(fixture_dir, name="tiny-deepseek",
                                 seqlen=32, max_seq_len=256,
                                 original_seq_len=64)
    params = load_hf_deepseek(fixture_dir, cfg)
    # pytree structure: stacked dense/moe layers with expert stacks
    assert params["dense_layers"]["w1"].shape == (1, cfg.inter_dim, cfg.dim)
    assert params["moe_layers"]["e_w1"].shape == (
        2, cfg.n_routed_experts, cfg.moe_inter_dim, cfg.dim)
    assert params["moe_layers"]["gate_b"].shape == (2, cfg.n_routed_experts)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)), jnp.int32)
    logits = deepseek_forward(cfg, params, toks, compute_dtype=jnp.float32)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_fp8_dequant_matches_manual(fixture_dir):
    """The loader's fused fp8_block_dequant must equal manual per-tile
    dequantization of the raw shard tensors."""
    import os
    import glob
    import torch
    from safetensors import safe_open

    f = glob.glob(os.path.join(fixture_dir, "*.safetensors"))[0]
    name = "model.layers.0.self_attn.o_proj"
    with safe_open(f, framework="pt") as sf:
        w8 = sf.get_tensor(name + ".weight").float().numpy()
        sc = sf.get_tensor(name + ".weight_scale_inv").float().numpy()
    out_d, in_d = w8.shape
    sr = np.repeat(np.repeat(sc, 128, 0)[:out_d], 128, 1)[:, :in_d]
    want = w8 * sr

    cfg = ds_config_from_hf_json(fixture_dir, name="tiny-deepseek")
    params = load_hf_deepseek(fixture_dir, cfg)
    got = np.asarray(params["dense_layers"]["wo"][0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bf16_checkpoint_loads_too(tmp_path):
    """Distilled R1 releases ship bf16 (no scale_inv); same loader path."""
    d = str(tmp_path / "hf_bf16")
    write_hf_deepseek_fixture(d, TINY_DEEPSEEK, seed=1, fp8=False)
    cfg = ds_config_from_hf_json(d, name="tiny-deepseek", seqlen=32,
                                 max_seq_len=256, original_seq_len=64)
    params = load_hf_deepseek(d, cfg)
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits = deepseek_forward(cfg, params, toks, compute_dtype=jnp.float32)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_mtp_layer_skipped(tmp_path):
    """Official V3/R1 shards carry a multi-token-prediction block at
    model.layers.<n_layers>; the loader must skip it (it used to
    IndexError on the out-of-range layer index)."""
    import os

    from flatquant_tpu.native.safetensors_io import write_safetensors

    d = str(tmp_path / "hf_mtp")
    os.makedirs(d)
    write_hf_deepseek_fixture(d, TINY_DEEPSEEK, seed=0, fp8=True)
    mtp = TINY_DEEPSEEK.n_layers  # one past the decoder stack
    write_safetensors(
        os.path.join(d, "model-mtp.safetensors"),
        {f"model.layers.{mtp}.self_attn.q_proj.weight":
             np.zeros((4, 4), np.float32),
         f"model.layers.{mtp}.input_layernorm.weight":
             np.ones((4,), np.float32)},
    )
    cfg = ds_config_from_hf_json(d, name="tiny-deepseek", seqlen=32,
                                 max_seq_len=256, original_seq_len=64)
    params = load_hf_deepseek(d, cfg)
    assert params["dense_layers"]["wkv_a"].shape[0] == cfg.n_dense_layers


def test_keep_fp8_load_serves_original_codes(fixture_dir):
    """keep_fp8=True keeps the checkpoint's fp8 codes as native serving
    dicts; the fp8 forward matches the dequantized-load forward within
    compute-precision noise (the values are the SAME dequant math)."""
    import jax

    cfg = ds_config_from_hf_json(fixture_dir, name="tiny-deepseek",
                                 seqlen=32, max_seq_len=256)
    p_deq = load_hf_deepseek(fixture_dir, cfg, dtype=jnp.float32)
    p_fp8 = load_hf_deepseek(fixture_dir, cfg, dtype=jnp.float32,
                             keep_fp8=True)
    # structure: linears became {"w8","se"}; wkv_b stayed dense
    dl = p_fp8["dense_layers"]
    assert isinstance(dl["wq_a"], dict) and "w8" in dl["wq_a"]
    assert not isinstance(dl["wkv_b"], dict)
    ml = p_fp8["moe_layers"]
    assert isinstance(ml["e_w1"], dict) and ml["e_w1"]["w8"].ndim == 4
    # codes are the checkpoint's own bytes: dequant(w8, se) == loaded dense
    w8 = dl["wq_a"]["w8"][0]
    se = dl["wq_a"]["se"][0]
    b = -(-w8.shape[1] // se.shape[0])
    sfull = jnp.repeat(se, b, axis=0)[: w8.shape[1]]
    np.testing.assert_allclose(
        np.asarray(w8.astype(jnp.float32)) * np.asarray(sfull).T,
        np.asarray(p_deq["dense_layers"]["wq_a"][0]), rtol=1e-6, atol=1e-7)

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 16)),
        jnp.int32)
    lg_deq = deepseek_forward(cfg, p_deq, toks, compute_dtype=jnp.float32)
    lg_fp8 = deepseek_forward(cfg, p_fp8, toks, compute_dtype=jnp.float32)
    # fp8 path: bf16 products vs f32 dense matmuls -> bf16-level tolerance
    np.testing.assert_allclose(np.asarray(lg_fp8, np.float32),
                               np.asarray(lg_deq, np.float32),
                               rtol=0.1, atol=0.1)
