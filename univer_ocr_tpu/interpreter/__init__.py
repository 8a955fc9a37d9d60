from .interpreter import (CropAndRotateParagraphs, CropRotateAndZoomLines,
                          LabelChar, PredToText, interpret)
from .parallelism import MP
