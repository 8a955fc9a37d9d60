"""Framework layer: layer objects, the DAG Model container, optimizers.

Mirrors the *surface* of the reference's `web_app/components/nn` package
(layer zoo, `Model(layers, relations, loss)`, ModelSystem, optimizers,
progress tracker, gradient checker) while the compute path is the
functional `univer_ocr_tpu.ops` package jitted by XLA: layers are
config + pure `apply(params, inputs)`, models own a params pytree and
trace to single jitted train/test/predict steps.
"""

from .backend import DB
from .layers import (BaseLayer, Concat, Conv2DToBatchedFixedWidthed,
                     Convolutional2D, Flatten, FullyConnected, LeakyRelu,
                     MaxPool2D, Noop, Param, Relu, Sigmoid, Upsample2D)
from .losses import (BaseLoss, SegmentationDice2D, SegmentationJaccard2D,
                     SigmoidCrossEntropy, SoftmaxCrossEntropy)
from .model_system import (BaseComponent, IterableSelector, ModelComponent,
                           ModelSystem, RawFunctionComponent, StringSelector,
                           WrappedFunctionComponent)
from .models import Model, Sequential
from .optimizers import Adagrad, Adam, BaseOptimizer, Momentum, RMSProp
from .progress_tracker import (BaseProgressTracker, Event, ProgressTracker,
                               track_function, track_method)
from .regularizations import L1, L2
