"""Shared CLI plumbing (reference utils/config.py get_parser parity,
without the import-time global)."""

from __future__ import annotations

import argparse

from tdwss.config import Config, load_config


def parse_config(description: str, default_config: str = "configs/3DUNetWithText_scannet_default.yaml") -> Config:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, default=default_config,
                        help="path to config file")
    parser.add_argument("--pretrain", type=str, default="",
                        help="path to pretrain model")
    parser.add_argument("--epochs", type=int, default=None)
    args = parser.parse_args()
    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.pretrain:
        overrides["pretrain"] = args.pretrain
    return load_config(args.config, **overrides)
