from .timer import timer

__all__ = ["timer"]
