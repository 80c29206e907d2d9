"""Pallas TPU kernels and compiled-op dispatch.

``config.fused_multislice``: "auto" (default — use the fused Pallas
multislice step on TPU when the grid qualifies), "on" (require it; error if
unsupported), or "off" (always the XLA/matfft path).
"""


class config:
    fused_multislice = "auto"
