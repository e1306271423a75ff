"""x266-tpu: a TPU-native H.266/VVC-class (HEVC-profile subset) video codec.

A from-scratch encode/decode engine targeting TPUs via JAX/XLA/Pallas for the
compute path and native C++ for the serial entropy layer, with the capability
envelope of the reference ``chenm001/x266`` project (see ``SURVEY.md``).

NOTE ON CITATIONS: the reference mount ``/root/reference`` was empty in every
session so far (``SURVEY.md`` §0 documents the evidence), so docstrings cite
``SURVEY.md`` sections / BASELINE.json lines and the ITU-T H.265/H.266
standards ([STD]) instead of reference ``file:line``.

Layering (SURVEY.md §1.2):
    core/     T0  bit I/O, NAL/RBSP, headers, YUV I/O, MD5
    kernels/  T1  TPU kernels: intra pred, transforms, quant, filters, costs
    cabac/    T2  context-modeled binary range coder (C++ core + Python mirror)
    engine/   T3  mode decision, normative wavefront reconstruction, pictures
    shard/    T4  device mesh, tile sharding, halo exchange, GOP distribution
    api/      T5  Encoder / Decoder
    cli/      T5  command line front-end
    specmodel/    NumPy scalar "golden" model used as the test oracle
"""

__version__ = "0.1.0"

from x266_tpu.config import CodecConfig, Profile  # noqa: F401
