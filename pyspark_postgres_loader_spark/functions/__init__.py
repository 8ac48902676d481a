from .deterministic import davg, dsum

__all__ = ["dsum", "davg"]
