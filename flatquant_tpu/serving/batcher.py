"""Continuous batching scheduler over the quantized serving engine.

The reference delegates serving to vLLM (vllm_custom/, TP/PP fake-quant
models); here continuous batching is first-party and TPU-shaped:

  - a fixed pool of B batch slots shares one static-shape KV cache (XLA
    never re-specializes on batch composition)
  - every decode step advances ALL active slots in one jitted call with a
    per-slot position vector
  - when a slot finishes (EOS / max_new_tokens) the next queued request is
    prefilled directly into that slot (its prompt cache scatters into the
    slot's rows) while other slots' state is untouched

Greedy results are bit-identical to single-request generation — slot
isolation is tested on exactly that property.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from flatquant_tpu.models.config import LlamaConfig
from flatquant_tpu.quantize.spec import FQConfig
from flatquant_tpu.serving.engine import _forward, init_cache


import functools


@functools.lru_cache(maxsize=32)
def _batcher_programs(cfg, fq_cfg, use_kernel, max_len, compute_dtype,
                      forward_fn=None):
    """Jitted (prefill_one, decode_multi, chunk_one) for a batcher config.

    forward_fn: engine hook with _forward's signature — pass a module-level
    function (hashable, stable across instances) to serve another model
    family through the same scheduler (e.g. models.deepseek.ds_batch_forward)."""
    fwd = forward_fn if forward_fn is not None else _forward

    # the cache argument is DONATED: the batcher immediately rebinds
    # self.cache (or cache1) to the program's output, and donation is
    # what lets write_token_v4's windowed DMA update the buffers in
    # place — without it XLA inserts a defensive full-cache copy per
    # call (r5 measurement: 131 vs 16.9 us per layer write-set at B=4)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill_one(sp, tokens, cache1, last_idx):
        return fwd(cfg, fq_cfg, sp, tokens, cache1, 0, "prefill",
                   use_kernel, max_len, compute_dtype, last_idx=last_idx)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_multi(sp, toks, cache, pos_vec):
        return fwd(cfg, fq_cfg, sp, toks, cache, pos_vec, "decode",
                   use_kernel, max_len, compute_dtype)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def chunk_one(sp, tokens, cache1, pos, last_idx):
        return fwd(cfg, fq_cfg, sp, tokens, cache1, pos, "chunk",
                   use_kernel, max_len, compute_dtype, last_idx=last_idx)

    return prefill_one, decode_multi, chunk_one


@functools.lru_cache(maxsize=16)
def _pp_batcher_programs(cfg, fq_cfg, use_kernel, max_len, compute_dtype,
                         mesh, n_microbatches):
    """Jitted batcher programs with the layer loop pipelined over the
    mesh's "pp" axis (parallel/pipeline.pipeline_serving_forward) — the
    vLLM continuous-batching-under-PP analog (llama_flatquant.py:400-460;
    VERDICT r4 item 4). Single-slot prefill/chunk run at M=1 (pure
    bubble, correctness-first); multi-slot decode pipelines its slots
    over n_microbatches."""
    from flatquant_tpu.parallel.pipeline import pipeline_serving_forward

    @jax.jit
    def prefill_one(sp, tokens, cache1, last_idx):
        return pipeline_serving_forward(
            cfg, fq_cfg, sp, tokens, cache1, jnp.int32(0), "prefill", mesh,
            1, use_kernel, max_len, compute_dtype, last_idx=last_idx)

    @jax.jit
    def decode_multi(sp, toks, cache, pos_vec):
        return pipeline_serving_forward(
            cfg, fq_cfg, sp, toks, cache, pos_vec, "decode", mesh,
            n_microbatches, use_kernel, max_len, compute_dtype)

    @jax.jit
    def chunk_one(sp, tokens, cache1, pos, last_idx):
        return pipeline_serving_forward(
            cfg, fq_cfg, sp, tokens, cache1, pos, "chunk", mesh,
            1, use_kernel, max_len, compute_dtype, last_idx=last_idx)

    return prefill_one, decode_multi, chunk_one


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray  # [S] int32
    max_new_tokens: int
    eos_id: Optional[int] = None
    out_tokens: Optional[List[int]] = None


class ContinuousBatcher:
    def __init__(
        self,
        cfg: LlamaConfig,
        fq_cfg: FQConfig,
        serving_params: dict,
        batch_slots: int = 4,
        max_len: int = 2048,
        use_kernel: bool = False,
        compute_dtype=jnp.float32,
        cache_mode: str = "bf16",
        prefill_bucket: int = 0,
        prefill_chunk: int = 0,
        mesh=None,
        tp_axis: str = "tp",
        n_blocks: int = 0,
        block_size: int = 256,
        forward_fn=None,
        init_cache_fn=None,
        pp_mesh=None,
        pp_microbatches: int = 2,
    ):
        """cache_mode="int4": packed int4 KV cache + Pallas flash-decode
        (the flagship cache under continuous batching; per-slot positions
        feed the kernel's per-batch valid_len). prefill_bucket > 0 pads
        each prompt up to a multiple of the bucket before prefill so a
        realistic request mix compiles one prefill program per bucket
        instead of one per distinct length (pad rows write garbage cache
        entries past the true length, but decode overwrites row `pos`
        before valid_len ever covers it, so results are unchanged).

        prefill_chunk > 0 enables chunked prefill (vLLM-style): a long
        prompt is processed `prefill_chunk` tokens per scheduler step,
        with active slots decoding one token between chunks — bounding
        decode latency by one chunk instead of one full prompt. Chunk
        attention reads the (quantized) cache for history — decode
        semantics — while one-shot prefill keeps the reference's
        unquantized-prompt trick; greedy outputs on calibrated models
        agree, and all chunk shapes compile once (prompts pad to a chunk
        multiple).

        mesh: a jax Mesh with a `tp_axis` axis runs every program
        tensor-parallel through parallel/serving_tp.py shard_map wrappers
        (serving_params must come from build_serving_params(tp=tp) and
        shard-aligned transforms); the KV cache shards over kv heads.
        Greedy outputs stay bit-identical to the unsharded batcher — the
        reference instead delegates TP serving to vLLM workers
        (vllm_custom/, per-rank transform remap).

        forward_fn / init_cache_fn: engine hooks (signatures of
        engine._forward / engine.init_cache) that serve another model
        family through this scheduler — models.deepseek.ds_batch_forward
        + ds_init_batch_cache run DeepSeek (packed int4 MoE, absorbed-MLA
        latent caches) under continuous batching; the reference has no
        batched DS serving at all (main_dpskv3.py:46-82 is a fixed-batch
        generate loop). Hooks must be module-level functions so the
        program cache stays shared across instances.

        cache_mode="paged": block-table int4 cache (kernels/paged_kv.py +
        serving/paged.py) — mixed-length requests share one block pool,
        HBM proportional to reserved blocks instead of slots x max_len; a
        finished request's blocks free immediately. n_blocks sizes the
        pool; the default is HALF the slots x max_len worst case (the
        memory win the design exists for) — admission defers a request
        when its reservation (ceil((S + max_new)/block_size) blocks)
        doesn't fit yet, trading occupancy, never correctness. Composes
        with `mesh` (pool kv heads shard over tp, tables replicate) and
        with `prefill_chunk` (chunks scatter through the slot's table;
        paged_chunk_attention kernel reads history through it). Greedy
        outputs match the "int4" slot cache bit-for-bit."""
        self.cfg = cfg
        self.fq_cfg = fq_cfg
        self.sp = serving_params
        self.B = batch_slots
        self.max_len = max_len
        self.use_kernel = use_kernel
        self.compute_dtype = compute_dtype

        self.cache_mode = cache_mode
        self.prefill_bucket = prefill_bucket
        self.prefill_chunk = prefill_chunk
        if prefill_chunk > 0:
            # chunk-multiple padding must never extend past the cache:
            # dynamic_update_slice CLAMPS out-of-range starts, which would
            # silently overwrite history rows and misalign rope
            assert max_len % prefill_chunk == 0, (max_len, prefill_chunk)
        self.pending = None  # in-flight chunked prefill state
        # explicitly COMMIT fresh caches to the device: jit specializes its
        # executable on argument committed-ness, so an uncommitted zeros
        # cache would compile one program for the first call and a second
        # one when the (committed) outputs feed back — device-traced as a
        # 3.8 s mid-serving stall on the second prefill chunk
        self.mesh = mesh
        self.tp_axis = tp_axis
        self._dev = jax.devices()[0]
        self.block_size = block_size
        self._forward_fn = forward_fn
        self._init_cache = init_cache_fn if init_cache_fn is not None else init_cache
        # pp_mesh: pipeline the layer loop over the mesh's "pp" axis
        # (parallel/pipeline.py) — vLLM serves continuous batching under
        # TP *and* PP (llama_flatquant.py:400-460); here pp composes with
        # every cache mode (bf16 / int4 / paged block pool): layer-axis
        # leaves (stacked weights, slot caches, paged pools) shard
        # P("pp") so each stage owns its layers' weights and cache shard.
        # Greedy outputs stay bit-identical to the unsharded batcher.
        self.pp_mesh = pp_mesh
        self.pp_microbatches = pp_microbatches
        if pp_mesh is not None:
            assert mesh is None, (
                "pp_mesh uses GSPMD layer-axis sharding; shard_map TP "
                "(mesh=) is a separate program set — tp-within-stage "
                "belongs to the GSPMD specs (PARALLELISM.md)")
            assert forward_fn is None, "pp runs the Llama engine layers"
            assert batch_slots % pp_microbatches == 0, (
                batch_slots, pp_microbatches)
            assert cfg.num_layers % pp_mesh.shape["pp"] == 0
        if forward_fn is not None:
            assert mesh is None and cache_mode == "bf16", (
                "engine hooks run the plain bf16-cache scheduler; paged/"
                "int4/TP modes are Llama-engine specific")
        if pp_mesh is not None:
            # stage-shard the stacked weights; embed/head/norm replicate
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.sp = dict(serving_params)
            self.sp["layers"] = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(pp_mesh, P("pp"))),
                serving_params["layers"])
            for k, v in self.sp.items():
                if k != "layers":
                    self.sp[k] = jax.device_put(
                        v, NamedSharding(pp_mesh, P()))
        if cache_mode == "paged":
            from flatquant_tpu.serving.paged import BlockAllocator

            self._mb = -(-max_len // block_size)
            if n_blocks <= 0:
                # default: HALF the slots x max_len worst case (+ trash
                # block) — the memory win the paged design exists for.
                # Admission defers a request whose reservation doesn't fit,
                # so a smaller pool trades batch occupancy, never
                # correctness. Pass n_blocks explicitly to size for a
                # known workload.
                n_blocks = 1 + max(1, (batch_slots * self._mb + 1) // 2)
            pool = init_cache(cfg, batch_slots, max_len, mode="paged",
                              n_blocks=n_blocks, block_size=block_size)
            pool.pop("tbl")  # the batcher manages tables host-side
            if pp_mesh is not None:
                self.cache = self._pp_put(pool)
            elif mesh is None:
                self.cache = jax.device_put(pool, self._dev)
            else:
                # paged x TP: pool kv heads shard over the tp axis, block
                # table replicates (parallel/serving_tp.serving_cache_specs)
                from flatquant_tpu.parallel import serving_tp as stp
                from jax.sharding import NamedSharding, PartitionSpec as P

                self.sp, sp_specs = stp.shard_serving_params(
                    serving_params, mesh, tp_axis)
                cache_specs = stp.serving_cache_specs(
                    {**pool, "tbl": np.zeros((1, 1), np.int32)}, tp_axis)
                self.cache = {
                    k: jax.device_put(v, NamedSharding(mesh, cache_specs[k]))
                    for k, v in pool.items()}
                self._tp_specs = (sp_specs, cache_specs)
            self.alloc = BlockAllocator(n_blocks)
            self.tbl = np.zeros((batch_slots, self._mb), np.int32)
            self.slot_blocks = [[] for _ in range(batch_slots)]
        elif pp_mesh is not None:
            self.cache = self._pp_put(
                self._init_cache(cfg, batch_slots, max_len,
                                 dtype=compute_dtype, mode=cache_mode))
        elif mesh is None:
            self.cache = self._commit(
                self._init_cache(cfg, batch_slots, max_len,
                                 dtype=compute_dtype, mode=cache_mode))
        else:
            from flatquant_tpu.parallel import serving_tp as stp

            self.sp, sp_specs = stp.shard_serving_params(
                serving_params, mesh, tp_axis)
            self.cache, cache_specs = stp.make_sharded_cache(
                cfg, batch_slots, max_len, mesh, mode=cache_mode,
                dtype=compute_dtype, tp_axis=tp_axis)
            self._tp_specs = (sp_specs, cache_specs)
        self.pos = np.zeros(batch_slots, np.int32)  # current length per slot
        self.remaining = np.zeros(batch_slots, np.int32)
        self.slot_req: List[Optional[Request]] = [None] * batch_slots
        self.next_tok = np.zeros((batch_slots, 1), np.int32)
        self.queue: List[Request] = []
        self.finished: Dict[int, List[int]] = {}
        self._rid = 0

        # module-level program cache: configs are frozen dataclasses, so
        # two batcher instances with the same (cfg, fq_cfg, flags) share
        # the SAME jit wrappers — a fresh instance (restart, benchmark
        # scenario, new tenant) costs zero re-traces (~0.6 s/program
        # otherwise, paid mid-serving)
        if pp_mesh is not None:
            self._prefill_one, self._decode_multi, self._chunk_one = \
                _pp_batcher_programs(cfg, fq_cfg, use_kernel, max_len,
                                     compute_dtype, pp_mesh,
                                     pp_microbatches)
        elif mesh is None:
            self._prefill_one, self._decode_multi, self._chunk_one = \
                _batcher_programs(cfg, fq_cfg, use_kernel, max_len,
                                  compute_dtype, forward_fn)
        else:
            from flatquant_tpu.parallel import serving_tp as stp

            self._prefill_one, self._decode_multi, self._chunk_one = \
                stp.tp_serving_programs(
                    cfg, fq_cfg, mesh, *self._tp_specs,
                    use_kernel=use_kernel, max_len=max_len,
                    compute_dtype=compute_dtype, tp_axis=tp_axis)

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: np.ndarray, max_new_tokens: int, eos_id=None) -> int:
        rid = self._rid
        self._rid += 1
        self.queue.append(Request(rid, np.asarray(prompt, np.int32),
                                  max_new_tokens, eos_id, []))
        return rid

    @property
    def idle(self) -> bool:
        return (not self.queue and self.pending is None
                and all(r is None for r in self.slot_req))

    def run(self, max_steps: int = 10**6) -> Dict[int, List[int]]:
        steps = 0
        while not self.idle and steps < max_steps:
            self.step()
            steps += 1
        return self.finished

    # -- internals ----------------------------------------------------------

    def _admit(self):
        pending_slot = self.pending["slot"] if self.pending else None
        for slot in range(self.B):
            if slot == pending_slot or self.slot_req[slot] is not None:
                continue
            if not self.queue:
                break
            if self.cache_mode == "paged":
                from flatquant_tpu.serving.paged import blocks_needed

                need = blocks_needed(len(self.queue[0].prompt),
                                     self.queue[0].max_new_tokens,
                                     self.block_size)
                if need > self.alloc.free_count:
                    break  # FIFO: wait until the reservation fits
            if self.prefill_chunk > 0:
                if self.pending is not None:
                    break  # one in-flight chunked prefill at a time
                self._start_pending(slot, self.queue.pop(0))
                pending_slot = slot
            else:
                self._prefill_into_slot(slot, self.queue.pop(0))

    def _commit(self, tree):
        """Commit fresh cache buffers next to the serving params: to the
        single device normally, or REPLICATED over the params' GSPMD mesh
        when the caller handed pre-sharded params (the DeepSeek ep x tp
        serving path shards packed expert weights via
        mesh.deepseek_serving_specs and runs the batcher's plain jitted
        programs under GSPMD — no shard_map needed; a device-0-committed
        cache would clash with the multi-device params)."""
        from jax.sharding import NamedSharding, PartitionSpec

        lead = jax.tree.leaves(self.sp)[0]
        sh = getattr(lead, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.size > 1:
            mesh = sh.mesh
            return jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(
                    mesh, PartitionSpec(*([None] * a.ndim)))), tree)
        return jax.device_put(tree, self._dev)

    def _pp_put(self, tree):
        """Stage-shard a cache pytree over the pp mesh: layer-leading
        leaves (slot caches, paged pools) P("pp"), the block table
        (no layer axis) replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return {
            k: jax.device_put(v, NamedSharding(
                self.pp_mesh, P() if k == "tbl" else P("pp")))
            for k, v in tree.items()
        }

    def _put_tbl(self, arr):
        """Device copy of a host block table — replicated over the mesh
        when tensor-parallel or pipelined (every shard gathers the same
        pool indices)."""
        mesh = self.mesh or self.pp_mesh
        if mesh is None:
            return jax.device_put(arr, self._dev)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(mesh, P(None, None)))

    def _new_cache1(self):
        """Committed single-slot prefill cache (sharded when under a mesh)."""
        if self.pp_mesh is not None:
            return self._pp_put(
                self._init_cache(self.cfg, 1, self.max_len,
                                 dtype=self.compute_dtype,
                                 mode=self.cache_mode))
        if self.mesh is None:
            return self._commit(
                self._init_cache(self.cfg, 1, self.max_len,
                                 dtype=self.compute_dtype,
                                 mode=self.cache_mode))
        from flatquant_tpu.parallel import serving_tp as stp

        c, _ = stp.make_sharded_cache(
            self.cfg, 1, self.max_len, self.mesh, mode=self.cache_mode,
            dtype=self.compute_dtype, tp_axis=self.tp_axis)
        return c

    def _start_pending(self, slot: int, req: Request):
        S = len(req.prompt)
        assert S + req.max_new_tokens <= self.max_len
        C = self.prefill_chunk
        S_pad = min(-(-S // C) * C, self.max_len)
        toks = np.pad(req.prompt, (0, S_pad - S))
        if self.cache_mode == "paged":
            # chunk x paged: chunks write straight into the shared pool
            # through this slot's block table (no staging cache, no final
            # scatter). Chunk padding past the reservation lands in the
            # trash block; padding inside it is overwritten by decode
            # before valid_len covers it — the slot-cache bucket argument.
            from flatquant_tpu.serving.paged import blocks_needed

            need = blocks_needed(S, req.max_new_tokens, self.block_size)
            blocks = self.alloc.alloc(need)
            assert blocks is not None, "admission checked the reservation"
            self.slot_blocks[slot] = blocks
            self.tbl[slot, :] = 0
            self.tbl[slot, :need] = blocks
            cache1 = None
        else:
            cache1 = self._new_cache1()
        self.pending = {"slot": slot, "req": req, "toks": toks, "S": S,
                        "cache1": cache1, "ci": 0, "n": S_pad // C}

    def _advance_pending(self):
        """Run ONE chunk of the in-flight prefill (decode interleaves
        between calls — that's the point of chunking)."""
        p = self.pending
        C = self.prefill_chunk
        start = p["ci"] * C
        chunk = p["toks"][start : start + C]
        final = p["ci"] == p["n"] - 1
        last = (p["S"] - 1 - start) if final else (C - 1)
        if self.cache_mode == "paged":
            cache_in = dict(self.cache)
            cache_in["tbl"] = self._put_tbl(
                self.tbl[p["slot"]:p["slot"] + 1])
            logits, cache_out = self._chunk_one(
                self.sp, jnp.asarray(chunk[None, :]), cache_in,
                jnp.int32(start), jnp.asarray([last], np.int32),
            )
            cache_out.pop("tbl")
            self.cache = cache_out
        else:
            logits, p["cache1"] = self._chunk_one(
                self.sp, jnp.asarray(chunk[None, :]), p["cache1"],
                jnp.int32(start), jnp.asarray([last], np.int32),
            )
        p["ci"] += 1
        if not final:
            return
        slot, req, S = p["slot"], p["req"], p["S"]
        if self.cache_mode != "paged":
            self.cache = {
                key: self.cache[key].at[:, slot].set(p["cache1"][key][:, 0])
                for key in self.cache
            }
        tok = int(jnp.argmax(logits[0]))
        req.out_tokens.append(tok)
        self.slot_req[slot] = req
        self.pos[slot] = S
        self.remaining[slot] = req.max_new_tokens - 1
        self.next_tok[slot, 0] = tok
        self.pending = None
        self._maybe_finish(slot)

    def _prefill_into_slot(self, slot: int, req: Request):
        S = len(req.prompt)
        assert S + req.max_new_tokens <= self.max_len
        toks = req.prompt
        if self.prefill_bucket > 0:
            S_pad = -(-S // self.prefill_bucket) * self.prefill_bucket
            S_pad = min(S_pad, self.max_len)
            toks = np.pad(toks, (0, S_pad - S))
        if self.cache_mode == "paged":
            from flatquant_tpu.serving.paged import blocks_needed

            need = blocks_needed(S, req.max_new_tokens, self.block_size)
            blocks = self.alloc.alloc(need)
            assert blocks is not None, "admission checked the reservation"
            self.slot_blocks[slot] = blocks
            self.tbl[slot, :] = 0
            self.tbl[slot, :need] = blocks
            # the prompt writes straight into the shared pool through this
            # slot's table — no post-hoc scatter into a slot row
            cache_in = dict(self.cache)
            cache_in["tbl"] = self._put_tbl(self.tbl[slot:slot + 1])
            logits, cache_out = self._prefill_one(
                self.sp, jnp.asarray(toks[None, :]), cache_in,
                jnp.asarray([S - 1], np.int32),
            )
            cache_out.pop("tbl")
            self.cache = cache_out
        else:
            cache1 = self._new_cache1()
            logits, cache1 = self._prefill_one(
                self.sp, jnp.asarray(toks[None, :]), cache1,
                jnp.asarray([S - 1], np.int32),
            )
            # scatter the prompt cache rows into this slot
            self.cache = {
                key: self.cache[key].at[:, slot].set(cache1[key][:, 0])
                for key in self.cache
            }
        tok = int(jnp.argmax(logits[0]))
        req.out_tokens.append(tok)
        self.slot_req[slot] = req
        self.pos[slot] = S
        self.remaining[slot] = req.max_new_tokens - 1
        self.next_tok[slot, 0] = tok
        self._maybe_finish(slot)

    def _maybe_finish(self, slot: int):
        req = self.slot_req[slot]
        if req is None:
            return
        done = self.remaining[slot] <= 0 or (
            req.eos_id is not None and req.out_tokens and req.out_tokens[-1] == req.eos_id
        )
        if done:
            self.finished[req.rid] = req.out_tokens
            self.slot_req[slot] = None
            self.remaining[slot] = 0
            if self.cache_mode == "paged" and self.slot_blocks[slot]:
                self.alloc.free(self.slot_blocks[slot])
                self.slot_blocks[slot] = []
                self.tbl[slot, :] = 0

    def step(self):
        self._admit()
        if self.pending is not None:
            self._advance_pending()
        active = [s for s in range(self.B) if self.slot_req[s] is not None]
        if not active:
            return
        cache_in = self.cache
        if self.cache_mode == "paged":
            cache_in = dict(self.cache)
            # inactive slots (no request, or a chunked prefill still in
            # flight) decode garbage tokens by construction; route their
            # writes to the trash block — a pending slot's table already
            # points at real blocks holding freshly written chunk K/V,
            # which the garbage write would otherwise clobber (the slot
            # cache tolerates this because its staging row is overwritten
            # by the end-of-prefill scatter)
            mask = np.array([r is not None for r in self.slot_req])
            cache_in["tbl"] = self._put_tbl(
                np.where(mask[:, None], self.tbl, 0).astype(np.int32))
        logits, cache_out = self._decode_multi(
            self.sp, jnp.asarray(self.next_tok), cache_in, jnp.asarray(self.pos)
        )
        if self.cache_mode == "paged":
            cache_out.pop("tbl")
        self.cache = cache_out
        toks = np.asarray(jnp.argmax(logits, axis=-1))
        for slot in active:
            req = self.slot_req[slot]
            tok = int(toks[slot])
            req.out_tokens.append(tok)
            self.pos[slot] += 1
            self.remaining[slot] -= 1
            self.next_tok[slot, 0] = tok
            self._maybe_finish(slot)
