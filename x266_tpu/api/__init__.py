"""T5 public API: Encoder / Decoder (SURVEY.md §1.2)."""

from x266_tpu.api.encoder import Encoder, EncodeResult  # noqa: F401
from x266_tpu.api.decoder import Decoder  # noqa: F401
