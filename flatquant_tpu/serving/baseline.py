"""bf16 baseline serving engine (the FP16 comparator of the reference's
benchmarks/layer_benchmark.py / benchmark_model.py).

Same control flow as serving.engine but plain bf16 weights, no transforms,
no quantization — the denominator of every speedup number.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.models.llama import apply_rope, rms_norm, rope_tables


def build_bf16_params(cfg: LlamaConfig, params: dict) -> dict:
    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    head = params.get("lm_head", params["embed"])
    return {
        "embed": params["embed"].astype(jnp.bfloat16),
        "final_norm_w": params["final_norm_w"].astype(jnp.float32),
        "lm_head": head.astype(jnp.bfloat16),
        "layers": cast(params["layers"]),
    }


def _layer(cfg, lp, x, cos, sin, ck, cv, pos, phase):
    B, S, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lin(h, w, b=None):
        y = jnp.matmul(h, w.T.astype(h.dtype))
        return y + b.astype(y.dtype) if b is not None else y

    h = rms_norm(x, lp["ln1_w"], cfg.rms_eps)
    q = lin(h, lp["wq"], lp.get("bq")).reshape(B, S, nh, hd)
    k = lin(h, lp["wk"], lp.get("bk")).reshape(B, S, nkv, hd)
    v = lin(h, lp["wv"], lp.get("bv")).reshape(B, S, nkv, hd)
    cos_s = jax.lax.dynamic_slice_in_dim(cos, pos, S, axis=0)
    sin_s = jax.lax.dynamic_slice_in_dim(sin, pos, S, axis=0)
    q, k = apply_rope(q, k, cos_s, sin_s)
    ck = jax.lax.dynamic_update_slice_in_dim(ck, k.astype(ck.dtype), pos, axis=1)
    cv = jax.lax.dynamic_update_slice_in_dim(cv, v.astype(cv.dtype), pos, axis=1)

    n_rep = nh // nkv
    if phase == "prefill":
        # same flash routing as the quant engine — the baseline must not be
        # handicapped with O(S^2) attention (reference FP16 baseline uses
        # flash-attn2, modeling_llama.py:125-137)
        from flatquant_tpu.kernels.prefill_attention import prefill_attention

        use_kernel = jax.default_backend() == "tpu"
        attn = prefill_attention(q, k, v, 1.0 / float(np.sqrt(hd)),
                                 use_kernel, q.dtype)
    else:
        k_att, v_att = ck, cv
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ck.shape[1]), 3)
        bias = jnp.where(ids <= pos + S - 1, 0.0, -1e9)
        if n_rep > 1:
            k_att = jnp.repeat(k_att, n_rep, axis=2)
            v_att = jnp.repeat(v_att, n_rep, axis=2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_att.astype(q.dtype))
        scores = scores.astype(jnp.float32) / np.sqrt(hd) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_att.astype(q.dtype))
    x = x + lin(attn.reshape(B, S, nh * hd), lp["wo"])

    h2 = rms_norm(x, lp["ln2_w"], cfg.rms_eps)
    up = lin(h2, lp["wup"])
    gate = lin(h2, lp["wgate"])
    x = x + lin(jax.nn.silu(gate) * up, lp["wdown"])
    return x, ck, cv


def unstack_bf16_layers(bp: dict) -> dict:
    n = jax.tree.leaves(bp["layers"])[0].shape[0]
    out = dict(bp)
    out["layers"] = [jax.tree.map(lambda a: a[i], bp["layers"]) for i in range(n)]
    return out


def _forward(cfg, bp, tokens, cache, pos, phase, max_len):
    B, S = tokens.shape
    x = bp["embed"][tokens].astype(jnp.bfloat16)
    cos, sin = rope_tables(cfg, jnp.arange(max_len))

    if isinstance(bp["layers"], (list, tuple)):
        # unrolled (see serving.engine: avoids scan's weight slice-copies);
        # tuple-valued caches (engine.unstack_cache) round-trip without the
        # per-step jnp.stack full-cache copy, same as the quant engine
        tup = isinstance(cache["k"], (list, tuple))
        repack = (lambda xs: tuple(xs)) if tup else jnp.stack
        cks, cvs = [], []
        for i, lp in enumerate(bp["layers"]):
            x, ck_i, cv_i = _layer(cfg, lp, x, cos, sin, cache["k"][i],
                                   cache["v"][i], pos, phase)
            cks.append(ck_i); cvs.append(cv_i)
        x = rms_norm(x, bp["final_norm_w"], cfg.rms_eps)
        logits = jnp.matmul(x[:, -1], bp["lm_head"].T.astype(x.dtype))
        return logits.astype(jnp.float32), {"k": repack(cks), "v": repack(cvs)}

    def body(carry, xs):
        lp, ck, cv = xs
        x, ck, cv = _layer(cfg, lp, carry, cos, sin, ck, cv, pos, phase)
        return x, (ck, cv)

    x, (ck, cv) = jax.lax.scan(body, x, (bp["layers"], cache["k"], cache["v"]))
    x = rms_norm(x, bp["final_norm_w"], cfg.rms_eps)
    logits = jnp.matmul(x[:, -1], bp["lm_head"].T.astype(x.dtype))
    return logits.astype(jnp.float32), {"k": ck, "v": cv}


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def bf16_prefill(cfg, bp, tokens, cache, max_len=2048):
    return _forward(cfg, bp, tokens, cache, 0, "prefill", max_len)


@partial(jax.jit, static_argnames=("cfg", "max_len"), donate_argnames=("cache",))
def bf16_decode_step(cfg, bp, token, cache, pos, max_len=2048):
    return _forward(cfg, bp, token, cache, pos, "decode", max_len)
