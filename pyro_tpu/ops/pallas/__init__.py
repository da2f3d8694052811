from .log_einsum import logmatmulexp

__all__ = ["logmatmulexp"]
