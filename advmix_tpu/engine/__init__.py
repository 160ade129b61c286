from . import optim, state, steps

__all__ = ["optim", "state", "steps"]
