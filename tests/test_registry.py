"""Serving registry tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.registry import get_serving_builder, list_archs


def test_registry_archs():
    archs = list_archs()
    assert "LlamaFlatQuantForCausalLM" in archs
    assert "Qwen2FlatQuantForCausalLM" in archs
    assert "LlamaQuaRotForCausalLM" in archs
    with pytest.raises(KeyError):
        get_serving_builder("NopeForCausalLM")


def test_registry_builders_produce_serving_params():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    fq = init_model_fq(cfg, W4A4, seed=0)
    baked, baked_fq = bake_model(cfg, W4A4, params, fq)

    sp = get_serving_builder("LlamaFlatQuantForCausalLM")(cfg, W4A4, baked, baked_fq)
    assert "layers" in sp and "q" in sp["layers"]
    sp_had = get_serving_builder("LlamaQuaRotForCausalLM")(cfg, W4A4, params)
    assert "layers" in sp_had and "o_t" in sp_had["layers"]
