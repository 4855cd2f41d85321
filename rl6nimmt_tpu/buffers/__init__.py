from .per import (
    PERState,
    per_add,
    per_add_batch,
    per_capacity,
    per_init,
    per_sample,
    per_update,
)
from .ring import RingState, ring_add, ring_add_batch, ring_capacity, ring_clear, ring_init, ring_sample
from .sequence import SeqState, seq_capacity, seq_flush, seq_init, seq_latest, seq_sample, seq_store

__all__ = [
    "PERState",
    "per_add",
    "per_add_batch",
    "per_capacity",
    "per_init",
    "per_sample",
    "per_update",
    "RingState",
    "ring_add",
    "ring_add_batch",
    "ring_capacity",
    "ring_clear",
    "ring_init",
    "ring_sample",
    "SeqState",
    "seq_capacity",
    "seq_flush",
    "seq_init",
    "seq_latest",
    "seq_sample",
    "seq_store",
]
