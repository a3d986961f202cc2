"""End-to-end weak-supervision loop through the real CLI drivers.

Mirrors the reference's run recipe (README.md:6-11): train -> threshold
statistics -> pseudo-label generation -> FullySupervised retrain ->
multi-view validation, all via ``python -m tdwss.cli.*`` subprocesses on a
tiny synthetic config.  Slow (~3 min on CPU) but it is the one test that
exercises every driver the way a user does.
"""

import os
import shutil
import subprocess
import sys

import pytest

_TINY = """\
GENERAL:
  training_name: cli_loop
  model_name: {model}
DATA:
  pointcloud_data: {{scale: 10, val_reps: 1, batch_size: 2, elastic_deformation: false}}
  label: {label}
  {pseudo}
  has_text: false
STRUCTURE:
  pointcloud_model:
    name: SparseConvFCNet
    m: 4
    dimension: 3
    full_scale: 128
    block_reps: 1
    residual_blocks: false
    depth: 2
  loss: {{Classification: true}}
Training:
  epochs: 2
PSEUDO_LABEL:
  threshold: 0.62
  path: {pseudo_dir}
  suffix: _pseudo_label.npy
ENGINE:
  engine: {{max_points: 8192, min_level_capacity: 256}}
"""


def _run(module, config, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    return subprocess.run(
        [sys.executable, "-m", module, "--config", config],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=500)


@pytest.mark.slow
def test_full_weak_supervision_loop(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = tmp_path / "run"
    workdir.mkdir()
    pseudo_dir = workdir / "pseudo"
    cfg_scene = workdir / "scene.yaml"
    cfg_scene.write_text(_TINY.format(
        model="MultiLabel", label="scene_level", pseudo="",
        pseudo_dir=pseudo_dir))
    # Drivers resolve tdwss from the repo; exp/ outputs land in workdir.
    env_path = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = repo + os.pathsep + env_path
    try:
        r = _run("tdwss.cli.train", str(cfg_scene), str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "mean IOU" in r.stdout

        r = _run("tdwss.cli.statistics", str(cfg_scene), str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Thresh=" in r.stdout

        r = _run("tdwss.cli.pseudo_label_generation", str(cfg_scene),
                 str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]
        gen_dirs = [d for d in os.listdir(workdir / "pseudo")] if (
            workdir / "pseudo").exists() else []
        assert gen_dirs, r.stdout[-2000:]
        label_dir = workdir / "pseudo" / gen_dirs[0]

        cfg_pseudo = workdir / "pseudo.yaml"
        cfg_pseudo.write_text(_TINY.format(
            model="FullySupervised", label="pseudo",
            pseudo=(f"pseudo_label_path: {label_dir}\n"
                    f"  pseudo_label_suffix: _pseudo_label.npy"),
            pseudo_dir=pseudo_dir).replace(
                "training_name: cli_loop", "training_name: cli_loop_pseudo"))
        r = _run("tdwss.cli.train", str(cfg_pseudo), str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]

        r = _run("tdwss.cli.validation", str(cfg_pseudo), str(workdir))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "mean IOU" in r.stdout
    finally:
        os.environ["PYTHONPATH"] = env_path
        shutil.rmtree(workdir, ignore_errors=True)
