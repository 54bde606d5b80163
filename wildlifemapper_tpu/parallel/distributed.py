"""Multi-host initialization + cross-process helpers.

Behavioral parity target: train_utils.py:6-69 + misc.py:118-220 — env-driven
process-group init, rank helpers, rank-0-only printing, object all_gather.
TPU-natively: jax.distributed.initialize (coordinator discovery is automatic
on TPU pods), jax.process_index/count, and multihost_utils.process_allgather
replacing the pickle-over-NCCL gather (misc.py:180-220).
"""

from __future__ import annotations

import builtins
import functools
from typing import Any, List, Optional

import jax


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX. No-op (returns False) for single-process
    runs — mirroring the reference's graceful fallback
    (train_utils.py:14-19)."""
    if num_processes is None and coordinator_address is None:
        try:
            if jax.process_count() > 1:
                return True
        except RuntimeError:
            pass
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(fn, *args, **kwargs):
    if is_main_process():
        return fn(*args, **kwargs)
    return None


def setup_for_distributed(is_master: bool):
    """Patch print to main-process only (train_utils.py:30-42)."""
    orig_print = builtins.print

    @functools.wraps(orig_print)
    def print_(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            orig_print(*args, **kwargs)

    builtins.print = print_


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary pytree of host values from every process
    (replaces misc.py:180-220's pickle/ByteTensor dance)."""
    if get_world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(obj)
    # process_allgather stacks along a new leading axis per leaf
    n = get_world_size()
    return [jax.tree.map(lambda x: x[i], gathered) for i in range(n)]
