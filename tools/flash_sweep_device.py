"""Block-size sweep for the flash prefill attention kernel on device.

VERDICT r3 #3: flash prefill measured ~470 us at llama-2-7b dims
(S=2048, 32 MHA heads, hd=128) vs a ~190 us bf16 roofline — find the
(blk_q, blk_k) frontier after the r4 VPU-economy rework (exp2 domain,
fold-scale-into-q, mask only on diagonal blocks).

Timing: per-call DEVICE time from jax.profiler traces
(utils/benchmark.device_compare) — chained wall-clock loops are biased
low here (XLA keeps the loop carry VMEM-resident; see
benchmarks/roofline_report.py header). jax's own
pallas.ops.tpu.flash_attention runs as the platform reference bar.

Usage: python tools/flash_sweep_device.py [--s 2048] [--gqa]
"""

import argparse
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.kernels.prefill_attention import flash_prefill_attention
from flatquant_tpu.utils.benchmark import device_compare


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--gqa", action="store_true", help="nkv=8 (llama-3)")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    B, nh, hd = 1, 32, 128
    nkv = 8 if args.gqa else 32
    S = args.s
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, nh, hd))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, hd))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, hd))).astype(jnp.bfloat16)
    sm = 1.0 / float(np.sqrt(hd))
    flops = 2 * 2 * B * nh * (S * S / 2) * hd

    cases = {}
    for bq in (128, 256, 512):
        for bk in (256, 512, 1024, 2048):
            if bk > S or bq > S:
                continue
            cases[f"ours_q{bq}_k{bk}"] = (
                partial(flash_prefill_attention, sm_scale=sm, blk_q=bq,
                        blk_k=bk),
                (q, k, v))

    # platform reference: jax's own TPU flash attention (head-major layout;
    # its relayout cost is excluded by transposing outside the timed fn? no
    # — include it, the engine would pay it too if we adopted the kernel)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        qh = jnp.transpose(q, (0, 2, 1, 3))  # [B, nh, S, hd]
        kh = jnp.transpose(k, (0, 2, 1, 3))
        vh = jnp.transpose(v, (0, 2, 1, 3))
        if nkv != nh:
            kh = jnp.repeat(kh, nh // nkv, axis=1)
            vh = jnp.repeat(vh, nh // nkv, axis=1)

        def jf(qh, kh, vh):
            return jax_flash(qh, kh, vh, causal=True, sm_scale=sm)

        cases["jax_flash_headmajor"] = (jf, (qh, kh, vh))
    except Exception as e:  # pragma: no cover
        print(f"# jax flash unavailable: {e}")

    res = device_compare(cases, iters=args.iters,
                         trace_dir="/tmp/fq_flash_sweep")
    print(f"# S={S} nh={nh} nkv={nkv} hd={hd}  (device us | TFLOPs)")
    for name, t in sorted(res.items(), key=lambda kv: kv[1]):
        print(f"{name:24s} {t*1e6:8.1f} us   {flops/t/1e12:6.1f} TFLOPs")


if __name__ == "__main__":
    main()
