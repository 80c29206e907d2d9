"""Pallas TPU kernels and compiled-op dispatch.

``config.fused_multislice``: "auto" (default — use the fused Pallas
multislice step on TPU when the grid qualifies), "on" (require it; error if
unsupported), or "off" (always the XLA/matfft path).

``config.scrambled_fft``: "auto" (default — on TPU, run the unfused
multislice loop's FFT pairs in digit-scrambled frequency order for composite
non-power-of-two axes; see ops.matfft), "on" (use scrambled order on any
backend whenever an axis is composite — used by CPU tests), or "off".
"""


class config:
    fused_multislice = "auto"
    scrambled_fft = "auto"
    # "auto" (default): prefer the VMEM-resident kernel (fused_step_resident
    # — the whole slice loop in one pallas_call) below the measured
    # dispatch crossover; "off": always the two-pass fused_step chain.
    #
    # NOTE: flags are read when a program is TRACED. physics.propagate
    # resolves them outside its jit boundary, so plain multislice() calls
    # always honor the current value; engine.pipeline bakes the decision
    # into each SimSpec's trace — build a fresh SimSpec after flipping a
    # flag (SimSpecs are identity-hashed, so a new instance retraces).
    resident_multislice = "auto"
