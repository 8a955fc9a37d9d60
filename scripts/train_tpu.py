"""TPU training driver: configurable curriculum.

    python scripts/train_tpu.py MONO PARA LINE CHAR [ALL] [--batched]
        [--batch=N] [--dp=N] [--train-size=N] [--val-size=N]
        [--predicted] [--eval-gate]

--batched routes the single-model stages through the batched trainer
(models/dp_train.py): host CV runs once per stage, epochs are a handful
of fixed-shape weighted-batch launches.  --dp=N additionally shards each
batch over an N-device 'data' mesh (requires N visible devices; use
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for
a virtual mesh).  --predicted materializes Line/Char samples from the
serving crop distribution (predicted masks in, GT labels out).
--eval-gate gates every checkpoint overwrite on end-to-end decoded-text
accuracy (models/evaluation.py).
"""
import os
import sys
import _bootstrap  # noqa: F401  (repo-root import shim)

flags = [a for a in sys.argv[1:] if a.startswith('--')]
args = [a for a in sys.argv[1:] if not a.startswith('--')]

from univer_ocr_tpu.models.train import train_model
from univer_ocr_tpu.models.model import Modes


def arg(i, default):
    return int(args[i]) if len(args) > i else default


#: --lr-scale=X multiplies every stage lr (fine-tuning passes want a
#: gentler step than the reference's from-scratch 0.0015)
LR_SCALE = next((float(f.split('=')[1]) for f in flags
                 if f.startswith('--lr-scale=')), 1.0)


CURRICULUM = [
    (Modes.TRAIN_MONOCHROME, 0.0015, 0.995, arg(0, 12)),
    (Modes.TRAIN_PARAGRAPH, 0.0015, 0.995, arg(1, 12)),
    (Modes.TRAIN_LINE, 0.0015, 0.995, arg(2, 12)),
    (Modes.TRAIN_CHAR, 0.0015, 0.97, arg(3, 4)),
    (Modes.TRAIN_ALL, 0.001, 0.97, arg(4, 0)),
]
CURRICULUM = [(m, lr * LR_SCALE, step, ep)
              for m, lr, step, ep in CURRICULUM if ep > 0]

batched = '--batched' in flags or any(f.startswith('--dp=') for f in flags)
batch = next((int(f.split('=')[1]) for f in flags
              if f.startswith('--batch=')), 16)
train_size = next((int(f.split('=')[1]) for f in flags
                   if f.startswith('--train-size=')), 50)
val_size = next((int(f.split('=')[1]) for f in flags
                 if f.startswith('--val-size=')), 5)
mesh = None
dp = next((int(f.split('=')[1]) for f in flags if f.startswith('--dp=')), 0)
if dp:
    import numpy as np
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:dp]), ('data',))

use_gpu = '--cpu' not in flags
if not use_gpu:
    # pin the host CPU backend BEFORE jax initializes the axon TPU
    # plugin: local XLA:CPU compiles take seconds (every fresh TPU
    # program is a minutes-long remote compile on this tunnel, and the
    # batched Paragraph train step reproducibly kills the remote
    # compile helper) and host training leaves the chip free for
    # serving/bench work; the zoo is small enough that CPU epochs are
    # competitive
    import jax
    jax.config.update('jax_platforms', 'cpu')

predicted = next((f.split('=', 1)[1] if '=' in f else True
                  for f in flags if f.startswith('--predicted')), False)
train_model(use_gpu=use_gpu, curriculum=CURRICULUM, batched=batched,
            batch=batch, mesh=mesh, train_size=train_size,
            val_size=val_size, predicted=predicted,
            eval_gate='--eval-gate' in flags)
print('TRAINING DONE')
