"""Worker for the distributed-EVALUATION equivalence test.

Run as ``python tests/_dist_eval_worker.py <data_root> <out_dir> <out_json>``.
With GT_DIST_* set it joins the 2-process cluster and runs a full validate
with ``data.shard_eval=true`` (per-host case shards, per-rank sample stores,
all-gathered metric merge); with the env unset it runs the identical validate
single-process.  The test asserts the merged metrics are identical — the
capability the reference forbids itself (``turbdiff/models/metrics.py:41-43``).
"""

import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(root: str, out_dir: str, out_json: str) -> None:
    from generative_turbulence_tpu.parallel.distributed import initialize_distributed

    distributed = initialize_distributed()

    import jax

    from generative_turbulence_tpu.training import Trainer, parse_cli_overrides
    from generative_turbulence_tpu.training.factory import instantiate_data_and_task

    rank = jax.process_index()
    cfg = parse_cli_overrides(
        [
            "model=diffusion",
            f"data.root={root}",
            "data.discard_first_seconds=-1",
            "model.dim=8",
            "model.u_net_levels=1",
            "model.timesteps=4",
            "model.batch_size=2",
            "model.eval_batch_size=2",
            "data.val_samples=2",
            f"data.shard_eval={'true' if distributed else 'false'}",
            # per-rank run dirs (logs/checkpoints); SHARED samples root so the
            # per-rank store-file suffixing is what prevents write collisions
            f"trainer.out_dir={out_dir}/rank{rank}",
            f"trainer.samples_root={out_dir}/samples",
            "trainer.use_wandb=false",
        ]
    ).resolved()

    dm, task = instantiate_data_and_task(cfg)
    trainer = Trainer(cfg, task, dm)

    example = next(iter(dm.val_batches()))
    state = task.init_state(jax.random.PRNGKey(0), example)
    metrics = trainer.validate(state, jax.random.PRNGKey(7), expensive=False)

    record = {
        "process_index": rank,
        "process_count": jax.process_count(),
        "metrics": metrics,
        "store_file": str(task.val_sample_store.samples_file),
        "store_cases": sorted(task.val_sample_store.case_names),
    }
    Path(out_json).write_text(json.dumps(record))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
