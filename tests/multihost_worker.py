"""Subprocess worker for the 2-process CPU multi-host test (run by
test_multihost.py, not directly by pytest). argv: <process_id> <coordinator_port>."""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from representationlearning_tpu.parallel.mesh import (  # noqa: E402
    initialize_multihost, process_local_slice)

assert initialize_multihost() is True
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 4

# DistributedSampler replacement: process-strided host sharding
sl = process_local_slice(np.arange(10))
assert sl.tolist() == list(range(pid, 10, 2)), sl

# a cross-process collective over the global mesh (grad-allreduce analog)
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices())
mesh = Mesh(devs, ("data",))
arr = jax.device_put(
    jnp.arange(16, dtype=jnp.float32).reshape(4, 4),
    NamedSharding(mesh, P("data")),
)
f = jax.jit(shard_map(lambda a: jax.lax.psum(a, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P()))
r = np.asarray(jax.device_get(f(arr)))[0]
assert r.tolist() == [24.0, 28.0, 32.0, 36.0], r
print(f"WORKER{pid}_OK")
