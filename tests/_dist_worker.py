"""Worker for tests/test_distributed_2proc.py — NOT collected by pytest.

Each of 2 processes owns 4 virtual CPU devices; jax.distributed joins
them into one 8-device system, a {dp:2, tp:4} mesh spans both processes
(parallel/distributed.py's torchrun-analog story, main_dpskv3.py:386-397),
and ONE real calibration train step (llama_layer fp teacher + fq
calib student, the trainer's own step math) runs GSPMD-sharded with the
batch split over dp — the gradient psum crosses the process boundary.
The stepped FQ layer state is saved with orbax (every process writes its
shards) for the parent to restore under a DIFFERENT topology.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatquant_tpu.parallel.distributed import init_distributed  # noqa: E402

pid = init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from tests._dist_step import make_step_inputs, one_calib_step  # noqa: E402

out_dir = sys.argv[1]

devs = np.array(jax.devices()).reshape(2, 4)
mesh = Mesh(devs, ("dp", "tp"))

cfg, fq_cfg, lp, fq_l, x, teacher = make_step_inputs()

# global batch sharded over dp (each process contributes its local half);
# weights/FQ state replicated — identical on both hosts by seed
B = x.shape[0]
lo = pid * (B // 2)
x_g = multihost_utils.host_local_array_to_global_array(
    np.asarray(x[lo:lo + B // 2]), mesh, P("dp"))
t_g = multihost_utils.host_local_array_to_global_array(
    np.asarray(teacher[lo:lo + B // 2]), mesh, P("dp"))
lp_g = multihost_utils.host_local_array_to_global_array(
    jax.tree.map(np.asarray, lp), mesh, P())
fq_g = multihost_utils.host_local_array_to_global_array(
    jax.tree.map(np.asarray, fq_l), mesh, P())

fq_new, mse = one_calib_step(cfg, fq_cfg, fq_g, lp_g, x_g, t_g)

from flatquant_tpu.utils.dist_checkpoint import save_sharded  # noqa: E402

save_sharded(os.path.join(out_dir, "fq_step"), fq_new)
print(f"WORKER_OK {pid} mse={float(mse):.8f}", flush=True)
