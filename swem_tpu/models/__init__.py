from swem_tpu.models import em
from swem_tpu.models.em import (
    Bases,
    VOSMemory,
    em_update,
    fresh_memory,
    gather_memory,
    init_bases,
    memorize,
    memory_write,
    read_memory,
)

__all__ = [
    "em",
    "Bases",
    "VOSMemory",
    "em_update",
    "fresh_memory",
    "gather_memory",
    "init_bases",
    "memorize",
    "memory_write",
    "read_memory",
]
