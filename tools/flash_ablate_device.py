"""Ablation: which op limits the flash prefill kernel?

Runs kernel variants that DELETE one softmax component each (wrong math,
right cost) and reads device time from traces — isolating the VPU cost
of exp, the reduces, masking, and the correction chain at llama dims
(S=2048, 32 MHA heads, hd=128). Also runs splash attention (jax's
production TPU kernel) as the achievable bar.

Usage: python tools/flash_ablate_device.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from flatquant_tpu.utils.benchmark import device_compare

_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, blk_q, blk_k, hd,
            n_rep, drop):
    qi = pl.program_id(2)
    mxu_dt = q_ref.dtype
    q_start = qi * blk_q
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    n_full = q_start // blk_k
    n_kblk = (q_start + blk_q + blk_k - 1) // blk_k

    for r in range(n_rep):
        q = (q_ref[0, :, r * hd:(r + 1) * hd].astype(jnp.float32)
             * (sm_scale * _LOG2E)).astype(mxu_dt)

        def tile(ki, carry, masked):
            m, l, acc = carry
            k_start = ki * blk_k
            kblk = k_ref[0, pl.ds(k_start, blk_k), :]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked and "mask" not in drop:
                col_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, blk_k), 1)
                s = jnp.where(row_pos >= col_pos, s, -jnp.inf)
            if "max" in drop:
                m_new = m
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            if "exp" in drop:
                p = (s - m_new) * 1e-3
            else:
                p = jnp.exp2(s - m_new)
            if "corr" in drop:
                corr = 1.0
            else:
                corr = jnp.exp2(m - m_new)
            if "sum" in drop:
                l_new = l
            elif "mxsum" in drop:
                # rowsum on the MXU instead of a VPU lane reduce
                ones = jnp.ones((blk_k, 1), mxu_dt)
                l_new = l * corr + jax.lax.dot_general(
                    p.astype(mxu_dt), ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vblk = v_ref[0, pl.ds(k_start, blk_k), :]
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(mxu_dt), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((blk_q, 1), -1e4, jnp.float32)
        l0 = jnp.zeros((blk_q, 1), jnp.float32)
        acc0 = jnp.zeros((blk_q, hd), jnp.float32)
        carry = jax.lax.fori_loop(
            0, n_full, lambda ki, c: tile(ki, c, False), (m0, l0, acc0))
        m, l, acc = jax.lax.fori_loop(
            n_full, n_kblk, lambda ki, c: tile(ki, c, True), carry)
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, r * hd:(r + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("drop",))
def variant(q, k, v, drop=()):
    B, S, nh, hd = q.shape
    nkv = k.shape[2]
    n_rep = nh // nkv
    bq, bk = 256, 512
    q3 = q.reshape(B, S, nh * hd)
    k3 = k.reshape(B, S, nkv * hd)
    v3 = v.reshape(B, S, nkv * hd)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=1.0 / np.sqrt(hd), blk_q=bq,
                          blk_k=bk, hd=hd, n_rep=n_rep, drop=drop),
        out_shape=jax.ShapeDtypeStruct((B, S, nh * hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nkv, S // bq),
            in_specs=[
                pl.BlockSpec((1, bq, n_rep * hd), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec((1, bq, n_rep * hd),
                                   lambda b, h, i: (b, i, h)),
        ),
    )(q3, k3, v3)
    return out.reshape(B, S, nh, hd)


def _kernel_kt(q_ref, kt_ref, v_ref, o_ref, *, sm_scale, blk_q, blk_k, hd,
               n_rep, drop):
    """K arrives TRANSPOSED [hd, S]: the QK dot's stationary operand then
    has its contraction dim on sublanes — no per-tile Mosaic transpose."""
    qi = pl.program_id(2)
    mxu_dt = q_ref.dtype
    q_start = qi * blk_q
    row_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    n_full = q_start // blk_k
    n_kblk = (q_start + blk_q + blk_k - 1) // blk_k

    for r in range(n_rep):
        q = (q_ref[0, :, r * hd:(r + 1) * hd].astype(jnp.float32)
             * (sm_scale * _LOG2E)).astype(mxu_dt)

        def tile(ki, carry, masked):
            m, l, acc = carry
            k_start = ki * blk_k
            kblk = kt_ref[0, 0, :, pl.ds(k_start, blk_k)]  # [hd, bk]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if masked and "mask" not in drop:
                col_pos = k_start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, blk_k), 1)
                s = jnp.where(row_pos >= col_pos, s, -jnp.inf)
            if "max" in drop:
                m_new = m
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            if "exp" in drop:
                p = (s - m_new) * 1e-3
            else:
                p = jnp.exp2(s - m_new)
            corr = 1.0 if "corr" in drop else jnp.exp2(m - m_new)
            if "sum" in drop:
                l_new = l
            else:
                l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vblk = v_ref[0, pl.ds(k_start, blk_k), :]
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(mxu_dt), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((blk_q, 1), -1e4, jnp.float32)
        l0 = jnp.zeros((blk_q, 1), jnp.float32)
        acc0 = jnp.zeros((blk_q, hd), jnp.float32)
        carry = jax.lax.fori_loop(
            0, n_full, lambda ki, c: tile(ki, c, False), (m0, l0, acc0))
        m, l, acc = jax.lax.fori_loop(
            n_full, n_kblk, lambda ki, c: tile(ki, c, True), carry)
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, :, r * hd:(r + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("drop", "bq", "bk"))
def variant_kt(q, kt, v, drop=(), bq=256, bk=512):
    """kt: [B, nkv, hd, S] pre-transposed K."""
    B, S, nh, hd = q.shape
    nkv = kt.shape[1]
    n_rep = nh // nkv
    q3 = q.reshape(B, S, nh * hd)
    v3 = v.reshape(B, S, nkv * hd)
    out = pl.pallas_call(
        functools.partial(_kernel_kt, sm_scale=1.0 / np.sqrt(hd), blk_q=bq,
                          blk_k=bk, hd=hd, n_rep=n_rep, drop=drop),
        out_shape=jax.ShapeDtypeStruct((B, S, nh * hd), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nkv, S // bq),
            in_specs=[
                pl.BlockSpec((1, bq, n_rep * hd), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, 1, hd, S), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((1, S, hd), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=pl.BlockSpec((1, bq, n_rep * hd),
                                   lambda b, h, i: (b, i, h)),
        ),
    )(q3, kt, v3)
    return out.reshape(B, S, nh, hd)


def main():
    B, S, nh, nkv, hd = 1, 2048, 32, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, nh, hd))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, hd))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, hd))).astype(jnp.bfloat16)
    flops = 2 * 2 * B * nh * (S * S / 2) * hd

    kt = jnp.transpose(k, (0, 2, 3, 1))  # [B, nkv, hd, S]
    cases = {
        "kt_full": (functools.partial(variant_kt, drop=()), (q, kt, v)),
        "kt_bare": (functools.partial(
            variant_kt, drop=("exp", "max", "sum", "corr", "mask")),
            (q, kt, v)),
        "kt_q512_k1024": (functools.partial(variant_kt, drop=(), bq=512,
                                            bk=1024), (q, kt, v)),
        "kt_q256_k1024": (functools.partial(variant_kt, drop=(), bq=256,
                                            bk=1024), (q, kt, v)),
        "kt_q512_k2048": (functools.partial(variant_kt, drop=(), bq=512,
                                            bk=2048), (q, kt, v)),
        "full": (functools.partial(variant, drop=()), (q, k, v)),
        "no_exp": (functools.partial(variant, drop=("exp",)), (q, k, v)),
        "no_max": (functools.partial(variant, drop=("max",)), (q, k, v)),
        "no_sum": (functools.partial(variant, drop=("sum",)), (q, k, v)),
        "mxu_sum": (functools.partial(variant, drop=("mxsum",)), (q, k, v)),
        "no_corr": (functools.partial(variant, drop=("corr",)), (q, k, v)),
        "no_mask": (functools.partial(variant, drop=("mask",)), (q, k, v)),
        "mxu_nomax": (functools.partial(variant, drop=("mxsum", "max")),
                      (q, k, v)),
        "bare_mxu": (functools.partial(
            variant, drop=("exp", "max", "sum", "corr", "mask")), (q, k, v)),
    }

    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm_mod,
        )

        mask = sm_mod.MultiHeadMask(
            [sm_mod.CausalMask((S, S)) for _ in range(nh)])
        kernel = sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1)
        qh = jnp.transpose(q, (0, 2, 1, 3))[0] / np.sqrt(hd)
        kh = jnp.transpose(k, (0, 2, 1, 3))[0]
        vh = jnp.transpose(v, (0, 2, 1, 3))[0]

        def splash(qh, kh, vh):
            return kernel(qh, kh, vh)

        cases["splash_mha"] = (splash, (qh, kh, vh))
    except Exception as e:
        print(f"# splash unavailable: {type(e).__name__}: {e}")

    res = device_compare(cases, iters=12, trace_dir="/tmp/fq_flash_ablate")
    print(f"# S={S} nh={nh} hd={hd}  (device us | TFLOPs)")
    for name, t in sorted(res.items(), key=lambda kv: kv[1]):
        print(f"{name:14s} {t*1e6:8.1f} us   {flops/t/1e12:6.1f} TFLOPs")


if __name__ == "__main__":
    main()
