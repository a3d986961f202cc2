"""Training entry point (reference train.py CLI parity).

    python -m tdwss.cli.train --config configs/<experiment>.yaml
"""

from tdwss.cli.common import parse_config
from tdwss.engine.train import Trainer


def main() -> None:
    cfg = parse_config("Point Cloud Segmentation — training")
    Trainer(cfg).fit()


if __name__ == "__main__":
    main()
