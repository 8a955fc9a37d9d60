"""MXU precision policy for the compute ops.

Two modes:

  * 'highest' — full f32 MXU precision (`lax.Precision.HIGHEST`, i.e.
    3-pass bf16 emulation of f32 matmuls).  Required by the 1e-5
    accelerator-vs-CPU parity gate (test_identity) and used for training.
  * 'bf16'    — inputs cast to bfloat16, single MXU pass, float32
    accumulation (`preferred_element_type`).  The serving fast path:
    ~3x the matmul throughput of 'highest' on the MXU at ~1e-3 relative
    error, far below the cascade's detection thresholds (SURVEY §7 step 7
    planned exactly this split; it is the TPU analog of the reference's
    CUDA-vs-CPU dual path).

The module-level default applies to code that doesn't thread a policy
(training, the per-page parity path).  Serving pipelines pass their policy
explicitly into their jitted programs, so two pipelines with different
modes coexist safely (the mode is bound at trace time).
"""

VALID_MODES = ('highest', 'bf16')

_default_mode = 'highest'


def set_default_precision(mode):
    global _default_mode
    assert mode in VALID_MODES, mode
    _default_mode = mode


def resolve(mode=None):
    """The effective mode: an explicit policy or the module default."""
    if mode is None:
        return _default_mode
    assert mode in VALID_MODES, mode
    return mode
