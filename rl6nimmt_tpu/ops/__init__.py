from .step_kernel import make_turn_resolver, make_turn_resolver_t

__all__ = ["make_turn_resolver", "make_turn_resolver_t"]
