"""Multi-process (DCN-analog) proof: 2 jax.distributed CPU processes run
one GSPMD-sharded calibration step on a mesh that SPANS the processes,
then orbax-restore under a different topology (VERDICT r4 item 5).

The reference's multi-node story is `torchrun --nnodes 2` + NCCL process
groups (main_dpskv3.py:386-397, scripts/deepseek/*.sh); ours is
parallel/distributed.init_distributed + one global device set — this
test actually exercises it: each worker owns 4 virtual CPU devices, the
{dp:2, tp:4} mesh crosses the process boundary (the batch-gradient psum
rides the coordinator transport), and the stepped FQ state saved by BOTH
processes' shard writers restores into a single-process {tp:8} mesh —
the topology-changing restore the per-rank reference checkpoints can't
do (model{rank}-mp{ws}.safetensors)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_calib_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    port = _free_port()
    out_dir = str(tmp_path)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["FLATQUANT_NUM_PROCESSES"] = "2"
        env["FLATQUANT_COORDINATOR"] = f"localhost:{port}"
        env["FLATQUANT_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, worker, out_dir], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0 and "WORKER_OK" in out, (rc, out, err[-2000:])

    # reference: the SAME step (shared code, tests/_dist_step.py) computed
    # in-process — GSPMD only distributes the math, so values must agree
    # to reduction-order tolerance
    from tests._dist_step import make_step_inputs, one_calib_step

    cfg, fq_cfg, lp, fq_l, x, teacher = make_step_inputs()
    import jax.numpy as jnp

    ref, _ = one_calib_step(cfg, fq_cfg, fq_l, lp, jnp.asarray(x),
                            jnp.asarray(teacher))

    # topology-changing restore: 2-process {dp:2, tp:4} shards -> this
    # single process's {tp:8} mesh, replicated
    import jax
    from jax.sharding import PartitionSpec as P

    from flatquant_tpu.parallel.mesh import make_mesh
    from flatquant_tpu.utils.dist_checkpoint import load_sharded

    mesh = make_mesh({"tp": 8})
    got = load_sharded(os.path.join(out_dir, "fq_step"), ref, mesh=mesh,
                       specs=P())
    flat_ref = jax.tree.leaves(ref)
    flat_got = jax.tree.leaves(got)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)
