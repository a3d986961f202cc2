"""Pseudo-label threshold sweep (reference statistics.py parity):
linspace(0.6, 0.8, 9) over the train set, plot to
visualization/Statistics.jpg."""

from tdwss.cli.common import parse_config
from tdwss.engine.pseudo import threshold_sweep
from tdwss.engine.train import Trainer


def main() -> None:
    cfg = parse_config("Point Cloud Segmentation — threshold statistics")
    trainer = Trainer(cfg, use_checkpoints=True)
    threshold_sweep(cfg, trainer.model, trainer.state.params,
                    trainer.state.batch_stats, trainer.train_scenes)


if __name__ == "__main__":
    main()
