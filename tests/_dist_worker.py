"""Worker process for the multi-host (2-process CPU) distributed test.

Run as ``python tests/_dist_worker.py <data_root> <out_json>``.  In distributed
mode (GT_DIST_* env set by the test) it joins the 2-process gloo cluster; with
the env unset it runs the identical computation single-process to produce the
golden values.  Writes a JSON record with the host's train-file shard, the
step loss, and a post-update parameter checksum.
"""

import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(root: str, out_json: str) -> None:
    from generative_turbulence_tpu.parallel.distributed import initialize_distributed

    distributed = initialize_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.training.train_state import TrainState
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from generative_turbulence_tpu.data.dataset import shard_files_by_host
    from generative_turbulence_tpu.data.schema import find_data_files
    from generative_turbulence_tpu.diffusion import GaussianDiffusion

    import __graft_entry__ as graft

    # --- per-host train-file sharding -------------------------------------
    files = find_data_files(Path(root) / "train")
    mine = shard_files_by_host(files, enabled=distributed)

    # --- one data-parallel training step over the global mesh -------------
    batch = 2
    model, params, grid, x, t = graft._build(batch=batch)
    gd = GaussianDiffusion.create(beta_schedule="log-snr-linear", timesteps=10)
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.radam(1e-4))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    x_np = np.asarray(x)
    if distributed:
        local = x_np[jax.process_index() :: jax.process_count()]
        x = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("dp")), local
        )
    state = jax.device_put(state, NamedSharding(mesh, P()))
    grid = jax.device_put(grid, NamedSharding(mesh, P()))

    @jax.jit
    def train_step(state, x, rng):
        def loss_fn(params):
            def eps_fn(x_t, t):
                return model.apply(params, x_t, t, grid.cell_types)

            return gd.loss(eps_fn, x, grid, rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss = train_step(state, x, jax.random.PRNGKey(0))
    checksum = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + float(jnp.sum(jnp.abs(leaf))), state.params, 0.0
    )

    # The REAL task construction must work on every rank (non-primary ranks
    # get a no-op SampleStore writer instead of the old hard crash).
    from generative_turbulence_tpu.training import parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            f"data.root={root}",
            "data.discard_first_seconds=-1",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            "model.batch_size=2",
        ]
    ).resolved()
    _, task = instantiate_data_and_task(cfg)
    store_file = task.val_sample_store.samples_file.name

    record = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "files": sorted(str(f) for f in mine),
        "n_total_files": len(files),
        "loss": float(loss),
        "checksum": float(checksum),
        "store_file": store_file,
    }
    Path(out_json).write_text(json.dumps(record))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
