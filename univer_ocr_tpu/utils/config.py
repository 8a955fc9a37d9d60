"""Runtime configuration.

The reference has no config system — paths/curricula/hyperparams are
hard-coded constants and positional string-bool CLI args (SURVEY §5.6).
This module centralizes the tunables the TPU build adds (shape buckets,
worker counts, native-kernel toggles, cache dir) with env-var overrides
(`UNIVOCR_<NAME>`), while the reference CLI surface stays unchanged.
"""

import json
import os
from dataclasses import asdict, dataclass, field, fields
from pathlib import Path


@dataclass
class Config:
    # shape buckets (multiples of 16; see models/bucketing.py)
    paragraph_bucket: int = 64
    line_width_bucket: int = 64
    train_bucket: int = 128

    # host parallelism
    crop_workers: int = 4
    line_workers: int = 8

    # native kernels
    native_label: bool = True
    native_rotate: bool = False

    # decoding
    collapse_runs: bool = False     # reference-faithful off by default

    # persistent XLA compilation cache
    cache_dir: str = ''

    @classmethod
    def from_env(cls):
        cfg = cls()
        for f in fields(cls):
            env = os.environ.get(f'UNIVOCR_{f.name.upper()}')
            if env is None:
                continue
            if f.type is bool or isinstance(getattr(cfg, f.name), bool):
                setattr(cfg, f.name, env.lower() in ('1', 'true', 'yes'))
            elif isinstance(getattr(cfg, f.name), int):
                setattr(cfg, f.name, int(env))
            else:
                setattr(cfg, f.name, env)
        return cfg

    @classmethod
    def from_file(cls, path):
        data = json.loads(Path(path).read_text())
        cfg = cls()
        for key, value in data.items():
            if hasattr(cfg, key):
                setattr(cfg, key, value)
        return cfg

    def to_dict(self):
        return asdict(self)


_config = None


def get_config():
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(cfg):
    global _config
    _config = cfg
