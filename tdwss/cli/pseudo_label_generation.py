"""Pseudo-label generation (reference pseudoLabelGeneration.py parity):
one threshold, per-scene label files under cfg.path/<name>_thresh<t>."""

from tdwss.cli.common import parse_config
from tdwss.engine.pseudo import generate_pseudo_labels
from tdwss.engine.train import Trainer


def main() -> None:
    cfg = parse_config("Point Cloud Segmentation — pseudo label generation")
    trainer = Trainer(cfg, use_checkpoints=True)
    generate_pseudo_labels(cfg, trainer.model, trainer.state.params,
                           trainer.state.batch_stats, trainer.train_scenes)


if __name__ == "__main__":
    main()
