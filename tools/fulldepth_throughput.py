"""Full-depth BATCHED decode throughput of the packed serving stack
(quant-only: the bf16 contender at B=8 needs a 9.6 GB cache next to its
13.5 GB weights and cannot fit the 16 GB HBM — the quant stack's 4 GB
weights + 0.6 GB int4 cache can, which is itself the capability point).

Reference context: FlatQuant's GPU decode crosses 1x only at bsz≈16
(README.md:304-310); here decode is already 2.7x at bsz 1, and this tool
records how tokens/s scale with batch on the real chip. Uses the
fulldepth_bench param cache; run AFTER bench.py (single-tenant chip)."""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.fulldepth_bench import MAX_LEN, _full_cfg, _full_fq, _get_params


def main(batches=(1, 4, 8)):
    from flatquant_tpu.serving.engine import (
        init_cache,
        serving_decode_step,
        unstack_cache,
        unstack_serving_layers,
    )
    

    cfg, fq_cfg = _full_cfg(), _full_fq()
    sp_host, _bp = _get_params()
    del _bp
    tpu = jax.devices()[0]
    sp = jax.device_put(unstack_serving_layers(sp_host), tpu)
    del sp_host

    from flatquant_tpu.utils.benchmark import device_time_loop

    rows = []
    for B in batches:
        cache = unstack_cache(init_cache(cfg, B, MAX_LEN, mode="int4"))
        tok = jnp.zeros((B, 1), jnp.int32)
        # per-slot positions: the continuous-batching decode contract
        pos = jnp.asarray(
            np.full((B,), 2176, np.int32) - np.arange(B, dtype=np.int32))

        # DONATED carried cache — the batcher's serving regime (and what
        # lets write_token_v4 update windows in place; an undonated
        # device_compare run measures a defensive full-cache copy)
        dec = jax.jit(
            lambda sp, tok, cache, pos: serving_decode_step.__wrapped__(
                cfg, fq_cfg, sp, tok, cache, pos, True, MAX_LEN,
                jnp.bfloat16),
            donate_argnums=(2,))
        _, cache = dec(sp, tok, cache, pos)
        jax.block_until_ready(jax.tree.leaves(cache)[0])

        def run():
            nonlocal cache
            out = None
            for _ in range(8):
                out, cache = dec(sp, tok, cache, pos)
            jax.block_until_ready(out)

        tt, n = device_time_loop(run, f"/tmp/fq_fd_tp_b{B}")
        t = tt / n
        rows.append({"batch": B, "ms_per_step": round(t * 1e3, 3),
                     "tok_s": round(B / t, 1)})
        print(f"# B={B}: {t*1e3:.3f} ms/step, {B/t:.0f} tok/s",
              file=sys.stderr)
        del cache
    print(json.dumps({"full_depth_decode_throughput": rows}))


if __name__ == "__main__":
    main()
