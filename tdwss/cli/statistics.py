"""Pseudo-label threshold sweep (reference statistics.py parity):
linspace(0.6, 0.8, 9) over the train set, plot to
visualization/Statistics.jpg.

``--train-augmented`` sweeps the train-augmented loader exactly like the
reference (statistics.py:41-56); the default sweeps deterministic val-style
views — full coverage of every point at generation's operating point.
"""

import argparse
import sys

from tdwss.cli.common import parse_config
from tdwss.engine.pseudo import threshold_sweep
from tdwss.engine.train import Trainer


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--train-augmented", action="store_true")
    flags, rest = pre.parse_known_args()
    sys.argv = [sys.argv[0]] + rest
    cfg = parse_config("Point Cloud Segmentation — threshold statistics")
    trainer = Trainer(cfg, use_checkpoints=True)
    threshold_sweep(cfg, trainer.model, trainer.state.params,
                    trainer.state.batch_stats, trainer.train_scenes,
                    train_augmented=flags.train_augmented)


if __name__ == "__main__":
    main()
