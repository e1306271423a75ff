"""T3 engine: mode decision, normative reconstruction, picture pipeline.

TPU-first encoder structure (SURVEY.md §3.3 [PLAN]):
  Pass A (``mode_decision``): fully parallel RD search over every block of
    every size with original-pixel references (the hardware-encoder trick
    the reference's RTL pipeline implies [PK]) — batched MXU matmuls.
  Pass B (``recon``): the *normative* reconstruction scan in coding order,
    shared verbatim between encoder and decoder, producing the coded
    coefficients (encoder) or the output picture (decoder).  Bit-exact
    encode->decode reconstruction holds by construction and is enforced
    by tests (SURVEY.md §4).
"""
