from .returns import discounted_returns

__all__ = ["discounted_returns"]
