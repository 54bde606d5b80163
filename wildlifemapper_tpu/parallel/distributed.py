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


def _pack_object(obj: Any) -> "np.ndarray":
    """Serialize an arbitrary host object to a uint8 array."""
    import pickle

    import numpy as np

    return np.frombuffer(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL),
                         dtype=np.uint8)


def _unpack_object(buf, length: int) -> Any:
    """Inverse of _pack_object for a possibly right-padded buffer."""
    import pickle

    import numpy as np

    return pickle.loads(np.asarray(buf[:length], dtype=np.uint8).tobytes())


def _pad_to(buf, length: int):
    import numpy as np

    out = np.zeros(length, np.uint8)
    out[: buf.size] = buf
    return out


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary host object from every process.

    Parity target: misc.py:180-220 (pickle → ByteTensor → pad-to-max →
    all_gather → unpickle). multihost_utils.process_allgather requires an
    IDENTICAL pytree structure on every process, but callers pass ragged
    per-process data (e.g. the COCO evaluator's per-image-id dicts), so we
    gather (a) a fixed-shape length scalar, then (b) a fixed-shape padded
    byte buffer — both structurally identical across processes by
    construction.
    """
    if get_world_size() == 1:
        return [obj]
    import numpy as np
    from jax.experimental import multihost_utils

    local = _pack_object(obj)
    lengths = multihost_utils.process_allgather(
        np.asarray([local.size], np.int64))          # (n_proc, 1)
    lengths = np.asarray(lengths).reshape(-1)
    max_len = int(lengths.max())
    padded = multihost_utils.process_allgather(
        _pad_to(local, max_len))                     # (n_proc, max_len)
    padded = np.asarray(padded)
    return [_unpack_object(padded[i], int(lengths[i]))
            for i in range(get_world_size())]
