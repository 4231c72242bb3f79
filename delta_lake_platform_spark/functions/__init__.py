from .hashing import row_fingerprint
from .vectors import cosine_similarity, dot, l2_norm

__all__ = ["row_fingerprint", "cosine_similarity", "dot", "l2_norm"]
