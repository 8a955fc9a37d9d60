"""Checkpointing.

The reference checkpoints weights only, as nested JSON lists in
model_weights.json, reloaded at every stage start (SURVEY §5.4) — that
format and path are preserved by Model.get_weights/set_weights.  This
module adds what the reference lacks:

  * optimizer-state checkpointing (`.opt.npz` beside the weights file), so
    a resumed run continues the same Adam trajectory instead of resetting
    moments;
  * a combined save/load with atomic replace (write-temp + rename), so a
    preemption mid-save can't corrupt the checkpoint.
"""

import json
import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp


def _flatten_state(opt_state, prefix=''):
    flat = {}
    for key, value in opt_state.items():
        path = f'{prefix}{key}' if not prefix else f'{prefix}|{key}'
        if isinstance(value, dict):
            flat.update(_flatten_state(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _unflatten_state(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split('|')
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_weights(models, path):
    """Merge-save all models' weights into the JSON checkpoint atomically
    (same read-merge-write behavior as reference train.py:132-141)."""
    path = Path(path)
    try:
        weights = json.load(open(path))
    except OSError:
        weights = {}
    for model in models.values():
        weights.update(model.get_weights())
    tmp = path.with_suffix('.tmp')
    with open(tmp, 'w') as f:
        json.dump(weights, f, separators=(',', ':'))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_weights(models, path):
    try:
        weights = json.load(open(path))
    except OSError:
        return False
    for model in models.values():
        model.set_weights(weights)
    return True


def opt_state_path(weights_path):
    return Path(weights_path).with_suffix('.opt.npz')


def save_optimizer_state(models, weights_path):
    """Save every model's optimizer state beside the weights file."""
    flat = {}
    for name, model in models.items():
        if model.opt_state is None:
            continue
        for key, value in _flatten_state(model.opt_state).items():
            flat[f'{name}|{key}'] = value
    if not flat:
        return False
    path = opt_state_path(weights_path)
    tmp = path.with_suffix('.tmp.npz')
    with open(tmp, 'wb') as f:
        np.savez(f, **flat)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return True


def load_optimizer_state(models, weights_path):
    path = opt_state_path(weights_path)
    if not path.exists():
        return False
    data = np.load(path)
    per_model = {}
    for key in data.files:
        model_name, rest = key.split('|', 1)
        per_model.setdefault(model_name, {})[rest] = data[key]
    loaded = False
    for name, model in models.items():
        if name in per_model:
            model.opt_state = _unflatten_state(per_model[name])
            loaded = True
    return loaded
