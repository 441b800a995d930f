"""Multi-process (DCN-emulated) dryrun: 2 localhost processes, one global mesh.

Exercises `parallel.distributed.initialize_distributed` for real — the JAX
equivalent of the reference's Lightning multi-node spawn (SURVEY.md §5.8):
two OS processes each own 4 virtual CPU devices, join one runtime via
`jax.distributed.initialize`, and drive ONE global 8-device data-parallel
train step whose gradient pmean crosses the process boundary (the
DCN-collective path on real multi-host TPU).

Run:  python scripts/dcn_dryrun.py          (parent: spawns both workers)
      python scripts/dcn_dryrun.py WORKER N (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys


def worker(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from xmm_superres_denoise_tpu.parallel.distributed import (
        initialize_distributed,
        is_primary,
    )

    initialize_distributed(f"localhost:{port}", num_processes=2,
                           process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xmm_superres_denoise_tpu.config import LossCfg
    from xmm_superres_denoise_tpu.models import GeneratorRRDB_SR
    from xmm_superres_denoise_tpu.parallel import make_mesh
    from xmm_superres_denoise_tpu.train import (
        TrainState,
        create_loss,
        make_train_step,
    )

    mesh = make_mesh(data=8)  # global: 4 devices from each process
    model = GeneratorRRDB_SR(num_filters=8, num_res_blocks=1, num_upsample=1)
    loss_fn = create_loss(None, LossCfg(l1=1.0))
    tx = optax.adam(1e-4)

    def apply_fn(p, x):
        return jnp.clip(model.apply(p, x), 0.0, 1.0)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))

    def globalize(tree, spec):
        def put(x):
            x = np.asarray(x)
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_process_local_data(sh, x)

        return jax.tree_util.tree_map(put, tree)

    state = TrainState.create(params, tx)
    state = globalize(state, P())

    # each process holds HALF the global batch (4 samples of 8)
    g = np.random.default_rng(100 + process_id)
    local_lr = g.uniform(0, 1, (4, 16, 16, 1)).astype(np.float32)
    local_hr = g.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32)
    sh = NamedSharding(mesh, P("data"))
    batch = {
        "lr": jax.make_array_from_process_local_data(sh, local_lr),
        "hr": jax.make_array_from_process_local_data(sh, local_hr),
    }

    step = make_train_step(apply_fn, loss_fn, tx, mesh, donate=False)
    state2, loss = step(state, batch)
    loss = float(loss)  # pmean'd over ALL 8 shards -> identical everywhere
    assert np.isfinite(loss)
    print(f"proc{process_id} loss={loss:.8f} "
          f"primary={is_primary()}", flush=True)


def _run_workers(port: int):
    """Spawn both ranks against `port`; returns (ok, outs, last_stderr)."""
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "WORKER",
                 str(pid), str(port)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    err = ""
    ok = True
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
        outs.append(out)
    return ok, outs, err


def main() -> int:
    import socket

    # Ephemeral-port discovery is inherently racy (the socket must close
    # before the coordinator can bind it), so retry with a fresh port if a
    # collision steals it in the window.
    outs = []
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        ok, outs, err = _run_workers(port)
        if ok:
            break
        if "address" not in err.lower() or attempt == 2:
            print(err[-3000:], file=sys.stderr)
            return 1
        print(f"port {port} stolen, retrying", file=sys.stderr)
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if "loss=" in line:
                print(line)
                losses.add(line.split("loss=")[1].split()[0])
    if len(losses) != 1:
        print(f"FAIL: processes disagree on the pmean'd loss: {losses}",
              file=sys.stderr)
        return 1
    print("DCN dryrun OK: one global mesh, identical cross-process loss")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "WORKER":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        raise SystemExit(main())
