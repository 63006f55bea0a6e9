from .encoder import EncoderConfig, TransformerStack  # noqa: F401
