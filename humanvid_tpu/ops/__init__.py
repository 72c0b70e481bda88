from .attention import MultiHeadAttention, dot_product_attention
from .embeddings import sinusoidal_timestep_embedding, sinusoidal_positional_encoding
from .conv import pixel_unshuffle

__all__ = [
    "MultiHeadAttention",
    "dot_product_attention",
    "sinusoidal_timestep_embedding",
    "sinusoidal_positional_encoding",
    "pixel_unshuffle",
]
