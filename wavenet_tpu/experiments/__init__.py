"""Retired Pallas training-kernel generations (negative results, kept).

Four generations of fused dilated-stack training kernels were built and
measured in rounds 1-2; all lose to the XLA shifted-matmul stack at the
paper config's shapes (K=32/64 matmuls — see docs/performance.md, "why
a Pallas training stack cannot beat XLA", with bisect data). The
production path is the XLA stack; the documented frontier kernels
(v3 ``kernels/fused_stack3.py`` and the fat-matmul variant
``kernels/fat.py``) stay in the main package as the
``use_pallas_stack`` alternates.

This subpackage holds the retired generations — v1 block-buffered
(``fused_stack.py``), v2 streamed-DMA (``fused_stack2.py``), and the
round-1 per-layer kernel (``dilated_layer.py``) — still importable and
parity-testable (tests are opt-in via WAVENET_RUN_EXPERIMENTS=1), but
out of the production surface and the default CI wall time.
"""
