"""Standalone validation (reference validation.py parity: restore latest
checkpoint, 9 multi-view voting reps, mIoU after each)."""

from tdwss.cli.common import parse_config
from tdwss.engine.evaluate import validate
from tdwss.engine.train import Trainer


def main() -> None:
    cfg = parse_config("Point Cloud Segmentation — validation")
    trainer = Trainer(cfg, use_checkpoints=True)
    validate(cfg, trainer.model, trainer.state.params, trainer.state.batch_stats,
             trainer.val_scenes, reps=9)


if __name__ == "__main__":
    main()
