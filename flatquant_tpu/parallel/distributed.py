"""Multi-host initialization + profiling hooks.

The reference launches DeepSeek calibration with
`torchrun --nnodes 2 --nproc-per-node 8` + `dist.init_process_group("nccl")`
(main_dpskv3.py:389-390, scripts/deepseek/*.sh). The TPU equivalent is a
single `jax.distributed.initialize()` per host: every process then sees the
global device set and the same `Mesh` code from parallel.mesh spans hosts —
ICI inside a slice, DCN across slices — with no explicit process groups.

Typical multi-host layout for DeepSeek-V3 calibration on 2 hosts x 8 chips
(matching the reference's 2x8 GPUs):

    init_distributed()                       # once per host process
    mesh = make_mesh({"dp": 1, "ep": 8, "tp": 2})   # 16 global devices
    # shard with deepseek_param_specs; run calibrate_deepseek unchanged

Per-rank checkpoint shards (model{rank}-mp{ws}.safetensors,
flat_matrices_{rank}.pth) are replaced by sharding-aware single artifacts:
jax arrays carry their sharding, and utils.checkpoint saves the host-local
view after a `jax.device_get` (full-array) or per-shard via
`jax.experimental.multihost_utils`.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """jax.distributed.initialize with env fallbacks; returns process index.

    No-op in single-process environments (returns 0).
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("FLATQUANT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("FLATQUANT_COORDINATOR", "localhost:12355"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("FLATQUANT_PROCESS_ID", "0")),
    )
    return jax.process_index()


@contextlib.contextmanager
def profile(trace_dir: Optional[str]):
    """jax.profiler trace context (no-op when trace_dir is None).

    The reference has no profiler integration (SURVEY §5); on TPU the
    profiler trace is the basis for the per-kernel roofline accounting in
    utils.benchmark.
    """
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
