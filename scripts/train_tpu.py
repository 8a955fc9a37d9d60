"""TPU training driver: configurable curriculum.

    python scripts/train_tpu.py MONO PARA LINE CHAR [ALL]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from univer_ocr_tpu.models.train import train_model
from univer_ocr_tpu.models.model import Modes

def arg(i, default):
    return int(sys.argv[i]) if len(sys.argv) > i else default

CURRICULUM = [
    (Modes.TRAIN_MONOCHROME, 0.0015, 0.995, arg(1, 12)),
    (Modes.TRAIN_PARAGRAPH, 0.0015, 0.995, arg(2, 12)),
    (Modes.TRAIN_LINE, 0.0015, 0.995, arg(3, 12)),
    (Modes.TRAIN_CHAR, 0.0015, 0.97, arg(4, 4)),
    (Modes.TRAIN_ALL, 0.001, 0.97, arg(5, 0)),
]
CURRICULUM = [c for c in CURRICULUM if c[3] > 0]

train_model(use_gpu=True, curriculum=CURRICULUM)
print('TRAINING DONE')
