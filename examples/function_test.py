"""Interactive engine smoke script (reference Function_test.py parity).

The reference ships a manual exploration harness that runs one real scene
through individual scn ops and prints per-layer feature/spatial sizes
(Function_test.py:1-244).  This is the tdwss equivalent on a synthetic
scene: voxelize -> per-level rulebooks -> stem conv -> each encoder body ->
devoxelize, printing shapes and active-site counts per level.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/function_test.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tdwss.config import (
    Config,
    EngineConfig,
    LossConfig,
    PointcloudDataConfig,
    PointcloudModelConfig,
)
from tdwss.data.collate import train_collate
from tdwss.data.plans import attach_host_plans
from tdwss.data.synthetic import make_dataset
from tdwss.models import build_model
from tdwss.ops.sparse_conv import subm_conv_apply
from tdwss.ops.voxelize import devoxelize


def main() -> None:
    cfg = Config(
        training_name="function_test",
        model_name="MultiLabel",
        label="scene_level",
        has_text=False,
        pointcloud_data=PointcloudDataConfig(scale=20, batch_size=1),
        pointcloud_model=PointcloudModelConfig(
            name="SparseConvFCNetDirectUpPool", m=16, full_scale=2048,
            block_reps=1, residual_blocks=False,
        ),
        loss=LossConfig(Classification=True),
        engine=EngineConfig(max_points=65536, min_level_capacity=2048),
    )
    rng = np.random.default_rng(0)
    scenes = make_dataset(1, num_points=30000, seed=0, with_text=False)
    batch = attach_host_plans(train_collate(scenes, cfg, rng), cfg)

    print("=== input ===")
    print("points:", batch.coords.shape, "valid:", int(batch.valid.sum()))

    plans = batch.plans
    for li, lvl in enumerate(plans.levels):
        active = int(np.asarray(lvl.grid.valid).sum())
        print(f"level {li}: capacity {lvl.grid.capacity}, active {active}, "
              f"subm_rb {lvl.subm_rb.shape}, "
              f"windowed={'yes' if lvl.win is not None else 'no'}")

    # one raw submanifold conv through the stem geometry
    vfeats = jnp.asarray(batch.vox_feats)
    w = jnp.asarray(rng.normal(size=(27, vfeats.shape[1], 16)).astype(np.float32))
    h = subm_conv_apply(vfeats, jnp.asarray(plans.levels[0].subm_rb), w)
    print("stem conv:", vfeats.shape, "->", h.shape)

    # full encoder forward (eval path)
    model = build_model(cfg)
    b = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(jax.random.PRNGKey(0), b, istrain=False)
    logits = model.apply(variables, b, istrain=False)
    print("per-point logits:", logits.shape)
    pts = devoxelize(h, jnp.asarray(batch.point2voxel))
    print("devoxelized stem features:", pts.shape)
    print("OK")


if __name__ == "__main__":
    main()
