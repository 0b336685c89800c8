"""Block-table (paged) int4 KV cache: kernel parity, write paths, engine
and batcher bit-parity with the slot cache, allocator accounting.

Reference behavior being replaced: deploy/transformers/kv_cache.py:206-225
(page growth) with the uniform-page-count restriction (367-368); here the
pool is static and per-slot tables are independent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flatquant_tpu.kernels.kv_cache import pack_kv_transposed
from flatquant_tpu.kernels.paged_kv import (
    gather_kv_paged,
    init_paged_pool,
    paged_decode_attention_int4,
    paged_decode_attention_ref,
    write_prompt_paged,
    write_token_paged,
)
from flatquant_tpu.models.config import get_config
from flatquant_tpu.models.llama import init_params
from flatquant_tpu.quantize.bake import bake_model
from flatquant_tpu.quantize.spec import W4A4KV4
from flatquant_tpu.quantize.state import init_model_fq
from flatquant_tpu.serving.batcher import ContinuousBatcher
from flatquant_tpu.serving.engine import generate
from flatquant_tpu.serving.paged import BlockAllocator, blocks_needed
from flatquant_tpu.serving.quantized import build_serving_params

BS = 128  # pool block size (min lane tile)


def _random_pool_state(seed, B, nkv, hd, mb, n_blocks, S_per_slot,
                       tbl=None):
    """Pool + table + the equivalent v4 slot-cache tensors, built by
    writing random K through both paths. Pass tbl to reuse a table
    (k and v pools of one cache share the table)."""
    rng = np.random.default_rng(seed)
    pool = init_paged_pool(1, n_blocks, nkv, hd, BS)
    kp, kparam = pool["kp"][0], pool["kparam"][0]
    if tbl is None:
        # distinct random blocks per slot
        perm = rng.permutation(np.arange(1, n_blocks))
        t = np.zeros((B, mb), np.int32)
        need = [-(-s // BS) for s in S_per_slot]
        taken = 0
        for b in range(B):
            t[b, : need[b]] = perm[taken : taken + need[b]]
            taken += need[b]
        tbl = jnp.asarray(t)

    Smax = mb * BS
    slot_codes = jnp.zeros((B, nkv, hd // 2, Smax), jnp.uint8)
    slot_params = jnp.zeros((B, nkv, 2, Smax), jnp.float32)
    for b in range(B):
        S = S_per_slot[b]
        k = jnp.asarray(rng.normal(size=(1, S, nkv, hd)).astype(np.float32))
        codes, params = pack_kv_transposed(k)
        kp, kparam = write_prompt_paged(kp, kparam, codes, params,
                                        tbl[b : b + 1])
        slot_codes = slot_codes.at[b, :, :, :S].set(codes[0])
        slot_params = slot_params.at[b, :, :, :S].set(params[0])
    return kp, kparam, tbl, slot_codes, slot_params


def test_write_prompt_gather_roundtrip():
    """Prompt writes through the table, gathered back, equal the slot
    layout — including a mid-block tail and untouched trash block reads
    masked by valid_len (checked via the ref attention below)."""
    B, nkv, hd, mb = 3, 2, 16, 3
    S_per_slot = [BS + 40, 2 * BS, 70]  # tail, exact blocks, sub-block
    kp, kparam, tbl, slot_codes, slot_params = _random_pool_state(
        0, B, nkv, hd, mb, n_blocks=1 + 6, S_per_slot=S_per_slot)
    g_codes, g_params = gather_kv_paged(kp, kparam, tbl)
    for b, S in enumerate(S_per_slot):
        np.testing.assert_array_equal(
            np.asarray(g_codes[b, :, :, :S]),
            np.asarray(slot_codes[b, :, :, :S]))
        np.testing.assert_array_equal(
            np.asarray(g_params[b, :, :, :S]),
            np.asarray(slot_params[b, :, :, :S]))


def test_write_token_paged_lands_in_right_block():
    nkv, hd = 2, 16
    pool = init_paged_pool(1, 4, nkv, hd, BS)
    kp, kparam = pool["kp"][0], pool["kparam"][0]
    tbl = jnp.asarray([[2, 3]], np.int32)
    rng = np.random.default_rng(1)
    k1 = jnp.asarray(rng.normal(size=(1, 1, nkv, hd)).astype(np.float32))
    codes, params = pack_kv_transposed(k1)
    pos = jnp.asarray([BS + 5], np.int32)  # second block, offset 5
    kp, kparam = write_token_paged(kp, kparam, codes[..., 0], params[..., 0],
                                   tbl, pos)
    np.testing.assert_array_equal(np.asarray(kp[3, :, :, 5]),
                                  np.asarray(codes[0, :, :, 0]))
    assert int(jnp.sum(kp[2])) == 0  # first block untouched


@pytest.mark.parametrize("valid", [[1, 200, 129], [0, 256, 40]])
def test_paged_decode_kernel_matches_ref(valid):
    """Pallas paged decode (interpret on CPU) == gather + reference
    attention, across empty / mid-block / full-block valid lengths."""
    B, nkv, hd, mb = 3, 2, 16, 2
    nh = 4
    S_per_slot = [max(v, 1) for v in valid]
    kp, kparam, tbl, _, _ = _random_pool_state(
        2, B, nkv, hd, mb, n_blocks=1 + 6, S_per_slot=S_per_slot)
    vp, vparam, _, _, _ = _random_pool_state(
        3, B, nkv, hd, mb, n_blocks=1 + 6, S_per_slot=S_per_slot, tbl=tbl)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(B, nh, hd)).astype(np.float32))
    vl = jnp.asarray(valid, np.int32)
    sm = 1.0 / np.sqrt(hd)
    want = paged_decode_attention_ref(q, kp, kparam, vp, vparam, tbl, vl, sm)
    got = paged_decode_attention_int4(q, kp, kparam, vp, vparam, tbl, vl, sm,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.fixture(scope="module")
def served():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=0)
    params["lm_head"] = params["lm_head"] * 6.0  # sharpen to avoid ties
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=0)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp = build_serving_params(cfg, fq_cfg, baked, baked_fq, dtype=jnp.float32)
    return cfg, fq_cfg, sp


def test_generate_paged_matches_slot_cache(served):
    """generate() greedy tokens identical between the int4 slot cache and
    the paged cache (same quantization math, different storage)."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, (1, 9)).astype(np.int32)
    want = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=8, max_len=256,
                    use_kernel=False, cache_mode="int4")
    got = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=8, max_len=256,
                   use_kernel=False, cache_mode="paged")
    np.testing.assert_array_equal(got, want)


def test_generate_paged_multiblock(served):
    """A prompt spanning multiple pool blocks (S > block_size) decodes
    identically to the slot cache — exercises the full-block + tail
    prompt scatter and cross-block decode reads."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, cfg.vocab_size, (1, 150)).astype(np.int32)
    want = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=5, max_len=384,
                    use_kernel=False, cache_mode="int4")
    got = generate(cfg, fq_cfg, sp, prompt, max_new_tokens=5, max_len=384,
                   use_kernel=False, cache_mode="paged")
    np.testing.assert_array_equal(got, want)


def test_batcher_paged_matches_int4(served):
    """Mixed-length requests through a POOL SMALLER than slots x max_len
    reproduce the slot-cache batcher exactly; blocks free on completion
    and deferred admissions drain."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 150, 4, 40)]
    n_new = [6, 4, 5, 3]

    plain = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=256,
                              cache_mode="int4")
    for p, n in zip(prompts, n_new):
        plain.submit(p, n)
    want = plain.run(max_steps=400)

    # full capacity would be 2 slots x 2 blocks; 1 trash + 3 real blocks
    # is enough for the largest pair but forces deferrals
    paged = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=256,
                              cache_mode="paged", n_blocks=4, block_size=BS)
    free0 = paged.alloc.free_count
    for p, n in zip(prompts, n_new):
        paged.submit(p, n)
    got = paged.run(max_steps=400)

    assert got == want
    assert paged.alloc.free_count == free0  # every block returned
    # pool HBM: 3 real blocks < the slot cache's 2 x (256/128) blocks of
    # capacity — the memory win the block table exists for
    assert paged.cache["kp"].shape[1] == 4


def test_write_chunk_paged_matches_prompt_write():
    """A prompt written in chunks (traced start offsets, straddling block
    boundaries) equals the one-shot prompt write."""
    from flatquant_tpu.kernels.paged_kv import write_chunk_paged

    B, nkv, hd, mb = 2, 2, 16, 2
    rng = np.random.default_rng(8)
    S = 200  # straddles the 128-token block boundary
    k = jnp.asarray(rng.normal(size=(B, S, nkv, hd)).astype(np.float32))
    codes, params = pack_kv_transposed(k)
    tbl = jnp.asarray([[1, 2], [3, 4]], np.int32)

    pool = init_paged_pool(1, 5, nkv, hd, BS)
    want_c, want_p = write_prompt_paged(pool["kp"][0], pool["kparam"][0],
                                        codes, params, tbl)
    got_c, got_p = pool["kp"][0], pool["kparam"][0]
    C = 80  # chunk length straddles blocks at start=80 (80+80 > 128)
    for start in range(0, S, C):
        n = min(C, S - start)
        got_c, got_p = write_chunk_paged(
            got_c, got_p, codes[..., start:start + n],
            params[..., start:start + n], tbl, jnp.int32(start))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_paged_chunk_kernel_matches_ref():
    """Pallas paged chunk attention (interpret) == gather + masked-softmax
    oracle, with real history before the chunk and per-row causal limits."""
    from flatquant_tpu.kernels.paged_kv import (
        paged_chunk_attention_int4,
        paged_chunk_attention_ref,
        write_chunk_paged,
    )

    B, nkv, hd, mb, nh = 2, 2, 16, 3, 4
    S_hist, sq = 130, 64
    kp, kparam, tbl, _, _ = _random_pool_state(
        9, B, nkv, hd, mb, n_blocks=1 + 6, S_per_slot=[S_hist, S_hist])
    vp, vparam, _, _, _ = _random_pool_state(
        10, B, nkv, hd, mb, n_blocks=1 + 6, S_per_slot=[S_hist, S_hist],
        tbl=tbl)
    rng = np.random.default_rng(11)
    # write the chunk's own K/V at [S_hist, S_hist + sq)
    kc = jnp.asarray(rng.normal(size=(B, sq, nkv, hd)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(B, sq, nkv, hd)).astype(np.float32))
    ck, pk = pack_kv_transposed(kc)
    cv, pv = pack_kv_transposed(vc)
    kp, kparam = write_chunk_paged(kp, kparam, ck, pk, tbl, jnp.int32(S_hist))
    vp, vparam = write_chunk_paged(vp, vparam, cv, pv, tbl, jnp.int32(S_hist))
    q = jnp.asarray(rng.normal(size=(B, sq, nh, hd)).astype(np.float32))
    pos = jnp.full((B,), S_hist, np.int32)
    sm = 1.0 / np.sqrt(hd)
    want = paged_chunk_attention_ref(q, kp, kparam, vp, vparam, tbl, pos, sm)
    got = paged_chunk_attention_int4(q, kp, kparam, vp, vparam, tbl, pos, sm,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_batcher_paged_chunked_matches_slot_chunked(served):
    """chunk x paged == chunk x slot-cache bit-for-bit: the same chunked
    decode-semantics attention, storage through the block table."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (150, 70)]
    n_new = [5, 4]

    slot = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=256,
                             cache_mode="int4", prefill_chunk=64)
    for p, n in zip(prompts, n_new):
        slot.submit(p, n)
    want = slot.run(max_steps=400)

    paged = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=2, max_len=256,
                              cache_mode="paged", prefill_chunk=64,
                              n_blocks=5, block_size=BS)
    free0 = paged.alloc.free_count
    for p, n in zip(prompts, n_new):
        paged.submit(p, n)
    got = paged.run(max_steps=400)
    assert got == want
    assert paged.alloc.free_count == free0


def test_batcher_paged_default_pool_is_half_capacity(served):
    """n_blocks=0 sizes the pool at half the slots x max_len worst case
    (the memory win), and serving still drains via deferred admission."""
    cfg, fq_cfg, sp = served
    rng = np.random.default_rng(13)
    b = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=4, max_len=256,
                          cache_mode="paged", block_size=BS)
    full = 4 * (256 // BS)
    assert b.cache["kp"].shape[1] == 1 + (full + 1) // 2
    plain = ContinuousBatcher(cfg, fq_cfg, sp, batch_slots=4, max_len=256,
                              cache_mode="int4")
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 130, 4, 40, 7)]
    for p in prompts:
        b.submit(p, 4)
        plain.submit(p, 4)
    assert b.run(max_steps=500) == plain.run(max_steps=500)


def test_batcher_paged_tp_matches_single():
    """paged x TP: the paged batcher under a tp=2 mesh (pool kv heads
    sharded, tables replicated) reproduces the single-device paged
    batcher exactly."""
    from flatquant_tpu.parallel.mesh import make_mesh

    cfg = get_config("tiny-llama")
    params = init_params(cfg, seed=3)
    params["lm_head"] = params["lm_head"] * 6.0
    fq_cfg = W4A4KV4
    fq = init_model_fq(cfg, fq_cfg, seed=3, tp=2)
    baked, baked_fq = bake_model(cfg, fq_cfg, params, fq)
    sp1 = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                               dtype=jnp.float32, merge_projections=True)
    sp_tp = build_serving_params(cfg, fq_cfg, baked, baked_fq,
                                 dtype=jnp.float32, merge_projections=True,
                                 tp=2)
    rng = np.random.default_rng(14)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (9, 140, 30)]

    plain = ContinuousBatcher(cfg, fq_cfg, sp1, batch_slots=2, max_len=256,
                              cache_mode="paged", n_blocks=5, block_size=BS)
    for p in prompts:
        plain.submit(p, 4)
    want = plain.run(max_steps=400)

    mesh = make_mesh({"tp": 2}, devices=jax.devices()[:2])
    tp = ContinuousBatcher(cfg, fq_cfg, sp_tp, batch_slots=2, max_len=256,
                           cache_mode="paged", n_blocks=5, block_size=BS,
                           mesh=mesh)
    for p in prompts:
        tp.submit(p, 4)
    got = tp.run(max_steps=400)
    assert got == want


def test_tp_paged_engine_parity():
    """Engine-level paged x TP: prefill + decode over the sharded pool
    match single-device logits (helpers shared with test_serving_tp)."""
    import test_serving_tp as tsp
    from flatquant_tpu.parallel.mesh import make_mesh

    cfg, sp1, sp_tp = tsp._packed_pair("tiny-llama", W4A4KV4, tp=2)
    toks = np.random.default_rng(15).integers(
        0, cfg.vocab_size, (2, 12)).astype(np.int32)
    ref = tsp._single_device_run(cfg, W4A4KV4, sp1, toks, "paged",
                                 max_len=256)
    mesh = make_mesh({"tp": 2}, devices=jax.devices()[:2])
    out = tsp._tp_run(cfg, W4A4KV4, sp_tp, toks, "paged", 256, mesh, None)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_allocator_accounting():
    a = BlockAllocator(6)
    assert a.free_count == 5
    got = a.alloc(3)
    assert len(set(got)) == 3 and all(0 < b < 6 for b in got)
    assert a.alloc(3) is None  # only 2 left
    a.free(got)
    assert a.free_count == 5
    assert blocks_needed(1, 1, 128) == 1
    assert blocks_needed(128, 1, 128) == 2
    assert blocks_needed(100, 28, 128) == 1
