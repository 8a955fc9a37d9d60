from .mesh import make_mesh
from .data_parallel import (make_dp_train_step, make_tp_char_train_step,
                            shard_batch)
