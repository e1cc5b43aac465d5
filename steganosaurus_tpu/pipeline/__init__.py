"""Embed / extract / gen-key orchestration."""

from steganosaurus_tpu.pipeline.embed import embed
from steganosaurus_tpu.pipeline.extract import extract
from steganosaurus_tpu.pipeline.errors import StegoError

__all__ = ["embed", "extract", "StegoError"]
