from .refenv import IllegalMoveError, ParityEnv

__all__ = ["IllegalMoveError", "ParityEnv"]
