"""OCR application: the 4-model cascade, datasets, trainer, CLI entries.

The analog of the reference's `web_app/components/my_model` package: model
factories (Monochrome/Paragraph/Line/Char), the ModelSystem assembly per
training mode, datasets and the parallel page generator, the curriculum
trainer with NaN rollback, and predict/generate_data entry points.
"""

from .constants import (LAYER_NAMES, LAYER_NAMES_PLAIN, LAYER_TAGS,
                        MODEL_WEIGHTS_FILE_PATH, TRAIN_DATASET_LENGTH,
                        VALIDATION_DATASET_LENGTH)
from .model import (CHAR_FIXED_WIDTH, CHAR_INPUT_HEIGHT, Modes,
                    make_char, make_context_maker, make_divisible_by,
                    make_line, make_model_system, make_monochrome,
                    make_paragraph)
