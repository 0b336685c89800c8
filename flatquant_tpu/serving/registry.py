"""Serving model registry (vllm_custom registry.py analog).

Maps architecture names to (config, builder) pairs so a serving process can
instantiate any supported model family from a name + checkpoint:

    build = get_serving_builder("LlamaFlatQuantForCausalLM")
    sp = build(cfg, fq_cfg, baked_params, baked_fq)

The reference registers 4 architectures into vllm.ModelRegistry
(fake_quantized_models/registry.py:1-12); here builders return packed
serving params for the first-party engine, covering both the learned
FlatQuant transforms and the QuaRot/Hadamard baseline, for the Llama and
Qwen2 families (one config-driven implementation serves both).
"""

from __future__ import annotations

from typing import Callable, Dict

from flatquant_tpu.serving.quantized import (
    build_hadamard_serving_params,
    build_serving_params,
)

_REGISTRY: Dict[str, Callable] = {}


def register_arch(name: str, builder: Callable) -> None:
    _REGISTRY[name] = builder


def get_serving_builder(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown serving arch {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_archs():
    return sorted(_REGISTRY)


def _flatquant_builder(cfg, fq_cfg, baked_params, baked_fq, **kw):
    return build_serving_params(cfg, fq_cfg, baked_params, baked_fq, **kw)


def _hadamard_builder(cfg, fq_cfg, params, _baked_fq=None, **kw):
    return build_hadamard_serving_params(cfg, fq_cfg, params, **kw)


# the four architectures the reference registers (llama/qwen2 x
# flatquant/fake-quantized) — qwen2 shares the llama builders via config
for _arch in (
    "LlamaFlatQuantForCausalLM",
    "Qwen2FlatQuantForCausalLM",
):
    register_arch(_arch, _flatquant_builder)
for _arch in (
    "LlamaFakeQuantizedForCausalLM",  # no-transform baseline: pass an
    "Qwen2FakeQuantizedForCausalLM",  # untrained fq state (RTN-style W4A4)
):
    register_arch(_arch, _flatquant_builder)
register_arch("LlamaQuaRotForCausalLM", _hadamard_builder)
