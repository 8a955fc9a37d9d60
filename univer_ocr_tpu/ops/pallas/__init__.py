"""Pallas TPU kernels for the cascade's hot paths.

XLA fuses elementwise ops into convolutions but materializes every conv's
output in HBM; these kernels keep multi-layer blocks resident in VMEM:

  * `fused_monochrome`: the whole Monochrome block (conv3x3 1->16 +
    LeakyReLU + conv3x3 16->1 + sigmoid) in one pass over the page — one
    HBM read of the input and one write of the output instead of four
    (the intermediate 16-channel map is 16x the page's bytes).
  * `fused_char_head`: unfold(8) + flatten + dense(512->1024) + LeakyReLU
    fused — skips materializing the unfolded tensor, which duplicates the
    conv output 8x in HBM.

Each kernel has an exact XLA-composed reference implementation and a parity
test (tests/test_pallas.py, interpret mode on CPU; the TPU identity
battery covers the compiled path).
"""

from .fused_conv import fused_monochrome, fused_monochrome_reference
from .char_head import fused_char_head, fused_char_head_reference
