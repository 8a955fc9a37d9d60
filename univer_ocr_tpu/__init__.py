"""univer_ocr_tpu — a TPU-native OCR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
KerkDovan/univer-ocr reference (synthetic-page OCR with a 4-model CNN
cascade, classical-CV interpreter stages, bit-plane character encoding,
training curriculum, and a web dashboard).

Design stance (TPU-first, not a port):
  * compute path: pure-functional ops (`ops/`) compiled by XLA, hot paths
    fused with Pallas MXU kernels (`ops/pallas/`);
  * model layer (`nn/`): the reference's `layers`/`relations` DAG schema is
    kept as the *checkpoint namespace* (model_weights.json key parity), but
    each model traces to a single jitted train/test/predict step over a
    params pytree — no per-layer mutable backprop;
  * scaling (`parallel/`): `jax.sharding.Mesh` + data-parallel shard_map,
    XLA collectives over ICI (the reference is single-device);
  * host runtime (`interpreter/`, `models/`): vectorized NumPy + worker
    pools for the classical-CV stages between models.
"""

__version__ = "0.1.0"
