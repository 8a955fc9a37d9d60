"""Round-1 TPU training driver: reduced curriculum to produce a working
model_weights.json for the end-to-end benchmark."""
import sys
sys.path.insert(0, '/root/repo')

from univer_ocr_tpu.models.train import train_model
from univer_ocr_tpu.models.model import Modes

CURRICULUM = [
    (Modes.TRAIN_MONOCHROME, 0.0015, 0.995, int(sys.argv[1]) if len(sys.argv) > 1 else 12),
    (Modes.TRAIN_PARAGRAPH, 0.0015, 0.995, int(sys.argv[2]) if len(sys.argv) > 2 else 12),
    (Modes.TRAIN_LINE, 0.0015, 0.995, int(sys.argv[3]) if len(sys.argv) > 3 else 12),
    (Modes.TRAIN_CHAR, 0.0015, 0.9, int(sys.argv[4]) if len(sys.argv) > 4 else 4),
]
CURRICULUM = [c for c in CURRICULUM if c[3] > 0]

train_model(use_gpu=True, curriculum=CURRICULUM)
print('TRAINING DONE')
