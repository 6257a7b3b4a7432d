"""Two-stage config parsing: --config YAML sets argparse defaults, CLI
overrides (the reference's utils/parser.py:328-343 contract).

Returns (args, args_text) where args_text is the resolved YAML dump for the
reproducibility record (args.yaml, reference main.py:502-503).
"""
from __future__ import annotations

import argparse
from typing import Optional, Sequence, Tuple

try:
    import yaml
    HAS_YAML = True
except ImportError:  # pragma: no cover
    HAS_YAML = False


def parse_args_with_config(
    parser: argparse.ArgumentParser,
    argv: Optional[Sequence[str]] = None,
) -> Tuple[argparse.Namespace, str]:
    config_parser = argparse.ArgumentParser(add_help=False)
    config_parser.add_argument("-c", "--config", default=None, metavar="FILE")
    cfg_args, remaining = config_parser.parse_known_args(argv)
    if cfg_args.config:
        if not HAS_YAML:
            raise RuntimeError("pyyaml unavailable; cannot load --config")
        with open(cfg_args.config) as f:
            cfg = yaml.safe_load(f) or {}
        known = {a.dest for a in parser._actions}
        unknown = set(cfg) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        parser.set_defaults(**cfg)
    args = parser.parse_args(remaining)
    args.config = cfg_args.config
    text = yaml.safe_dump(vars(args), default_flow_style=False) if HAS_YAML \
        else str(vars(args))
    return args, text
