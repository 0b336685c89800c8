"""Whole-model benchmark: PPL and latency through the real-quant stack.

benchmark_model.py analog (reference: PPL + per-sequence latency with
loaded quantized weights, plus --random_mode for paper-style speedups,
benchmarks/benchmark_model.py:66-116,357-480). Zero-egress environment,
so weights are synthetic: an outlier-heavy random model is RTN-baked and
evaluated three ways on the same synthetic token stream —

  fp        bf16 forward                      (FP16 baseline)
  fake      fake-quant eval forward           (research path)
  real      packed-int4 serving stack         (deploy path, Pallas kernels)

The fake-vs-real PPL agreement is the reference's Table 1/2 cross-check
(REALQUANT.md:112-126, e.g. 6.98 fake vs 6.93 real on Llama-3-8B) run as
a benchmark instead of a unit test; per-sequence latency compares the
real stack against the bf16 forward.

Usage: python benchmarks/model_benchmark.py [--size mid|7b] [--calib]
  mid: CPU-runnable in minutes; 7b: llama-2-7b dims on the TPU chip.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flatquant_tpu.calib.data import get_loaders
from flatquant_tpu.models.config import LlamaConfig, get_config
from flatquant_tpu.models.llama import init_params, llama_forward
from flatquant_tpu.quantize.bake import bake_model, rtn_quantize_params
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.engine import serving_all_logits
from flatquant_tpu.serving.quantized import build_serving_params


def outlier_params(cfg, seed=0):
    """Random init with a few amplified channels + sparse weight spikes —
    the quantization-hostile fixture the e2e tests calibrate on."""
    rng = np.random.default_rng(seed)
    params = init_params(cfg, seed=seed)
    ch = rng.choice(cfg.hidden_size, max(4, cfg.hidden_size // 32), replace=False)
    emb = np.array(params["embed"])
    emb[:, ch] *= 25.0
    params["embed"] = jnp.asarray(emb)
    return params


def real_ppl(cfg, fq_cfg, sp, test_tokens, seqlen, use_kernel,
             compute_dtype=jnp.bfloat16):
    n = test_tokens.shape[1] // seqlen

    @jax.jit
    def step(sp, chunk):
        logits = serving_all_logits(cfg, fq_cfg, sp, chunk,
                                    use_kernel=use_kernel,
                                    compute_dtype=compute_dtype)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = chunk[:, 1:]
        return jnp.mean(-jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0])

    total = 0.0
    for i in range(n):
        chunk = jnp.asarray(test_tokens[:, i * seqlen : (i + 1) * seqlen])
        total += float(step(sp, chunk)) * seqlen
    return float(np.exp(total / (n * seqlen)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=["mid", "7b"], default="mid")
    p.add_argument("--calib", action="store_true",
                   help="run a short calibration before baking")
    p.add_argument("--seqlen", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (parity-check mode)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.size == "mid":
        cfg = LlamaConfig(name="mid", vocab_size=512, hidden_size=256,
                          intermediate_size=704, num_layers=4, num_heads=8,
                          num_kv_heads=4, head_dim=32, seqlen=64)
    else:
        cfg = dataclasses.replace(get_config("llama-2-7b"), vocab_size=4096,
                                  num_layers=8)
    seqlen = args.seqlen or cfg.seqlen

    build_dev = jax.devices("cpu")[0] if on_tpu else None
    ctx = jax.default_device(build_dev) if build_dev else _null()
    with ctx:
        params = outlier_params(cfg)
        fq_cfg = dataclasses.replace(W4A4KV4, epochs=5, cali_bsz=4, nsamples=16)
        fq = init_model_fq(cfg, fq_cfg, seed=0)
        data = get_loaders("synthetic", cfg.vocab_size, nsamples=16,
                           seqlen=seqlen, seed=0, n_test_tokens=8 * seqlen)
        if args.calib:
            from flatquant_tpu.calib.trainer import calibrate
            fq = calibrate(cfg, fq_cfg, params, fq, data.train,
                           compute_dtype=jnp.float32, log=print)
        bp, bfq = bake_model(cfg, fq_cfg, params, fq)
        qp = rtn_quantize_params(fq_cfg, bp)
        sp = build_serving_params(cfg, fq_cfg, bp, bfq, eval_params=qp)
    if on_tpu:
        params, bp, qp, sp = jax.device_put((params, bp, qp, sp))
        fq, bfq = jax.device_put((fq, bfq))

    cd = jnp.bfloat16 if on_tpu else jnp.float32
    from flatquant_tpu.evals.ppl import ppl_eval

    ppl_fp = ppl_eval(cfg, params, data.test, mode="fp", seqlen=seqlen,
                      compute_dtype=cd)
    ppl_fake = ppl_eval(cfg, qp, data.test, fq=bfq, fq_cfg=fq_cfg,
                        mode="eval", seqlen=seqlen, compute_dtype=cd)
    ppl_real = real_ppl(cfg, fq_cfg, sp, data.test, seqlen,
                        use_kernel=on_tpu, compute_dtype=cd)
    out = {
        "size": args.size,
        "seqlen": seqlen,
        "ppl_fp": round(ppl_fp, 4),
        "ppl_fake": round(ppl_fake, 4),
        "ppl_real": round(ppl_real, 4),
        "fake_real_rel_diff": round(abs(ppl_fake - ppl_real) / ppl_fake, 5),
    }

    # per-sequence latency, chained over the test chunks (wall; on the
    # tunnel only multi-chunk chains are meaningful — see utils/benchmark)
    chunk = jnp.asarray(data.test[:, :seqlen])

    @jax.jit
    def fwd_fp(params, chunk):
        return llama_forward(cfg, params, chunk, compute_dtype=cd)

    @jax.jit
    def fwd_real(sp, chunk):
        return serving_all_logits(cfg, fq_cfg, sp, chunk, use_kernel=on_tpu,
                                  compute_dtype=cd)

    for name, f, a in (("fp", fwd_fp, params), ("real", fwd_real, sp)):
        jax.block_until_ready(f(a, chunk))
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            r = f(a, chunk)
        jax.block_until_ready(r)
        out[f"latency_{name}_ms_per_seq"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 2)
    out["latency_speedup"] = round(
        out["latency_fp_ms_per_seq"] / out["latency_real_ms_per_seq"], 3)
    print(json.dumps(out))


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
