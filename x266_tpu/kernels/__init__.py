"""T1 TPU compute kernels (JAX/XLA, Pallas where it pays).

All normative math is exact int32 (SURVEY.md §7 hard-part #3): transforms
and intra prediction are integer matmuls (MXU-friendly), element-wise ops
ride the VPU.  Every kernel here has a NumPy oracle in
``x266_tpu.specmodel`` and a differential test in ``tests/``.
"""
