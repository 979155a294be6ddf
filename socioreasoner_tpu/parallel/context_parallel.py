"""Context parallelism: zigzag sequence layout + CP plumbing.

The reference plumbs CP end-to-end: `context_parallel_size`
(mcore_adapter/training_args.py:35), zigzag 2-chunk ranges per rank
(mcore_adapter/models/qwen2_5_vl/modeling_qwen2_5_vl.py:452-480, matching
Megatron's `get_batch_on_this_cp_rank`), loss-side gather with backward
(mcore_adapter/parallel_functions/context_parallel.py:6-35).

TPU-native: the sequence axis is sharded over the mesh's `sp` axis and
attention runs as ring attention over ICI (parallel/ring_attention.py). The
zigzag layout balances CAUSAL work: with contiguous chunks, rank r's queries
attend only chunks 0..r (rank 0 nearly idle while rank cp-1 does full work
every synchronous ring step); with each rank holding chunks (r, 2cp-1-r) every
rank sees the same unmasked area.

Everything here is host/trace-time index math; the permutation itself is a
static gather inside jit (XLA turns it into one cheap all-to-all of the small
token-level arrays — the hidden states never move).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
from jax.sharding import Mesh


def zigzag_indices(L: int, cp: int) -> np.ndarray:
    """Permutation `perm` such that x[..., perm] lays the sequence out in
    zigzag order: contiguous shard r (size L/cp) holds original chunks
    r and 2*cp-1-r, each ascending — exactly the reference's
    `get_input_ranges` (modeling_qwen2_5_vl.py:464-480: [C*r, C*(r+1)) then
    [L-C*(r+1), L-C*r) with C = L // (2*cp))."""
    if L % (2 * cp):
        raise ValueError(f"sequence length {L} not divisible by 2*cp={2 * cp}")
    C = L // (2 * cp)
    parts = []
    for r in range(cp):
        parts.append(np.arange(C * r, C * (r + 1)))
        parts.append(np.arange(L - C * (r + 1), L - C * r))
    return np.concatenate(parts)


def inverse_zigzag_indices(L: int, cp: int) -> np.ndarray:
    perm = zigzag_indices(L, cp)
    inv = np.empty(L, np.int64)
    inv[perm] = np.arange(L)
    return inv


@dataclasses.dataclass(frozen=True)
class CPConfig:
    """Context-parallel plan threaded through forward/train/logprob steps.

    impl == "ring": zigzag layout + ring attention (K/V rotate over ICI).
    impl == "ulysses": head-axis all-to-all (parallel/ulysses.py) — every rank
    attends the FULL sequence over a head slice, so the layout stays natural
    order (perm = identity; no zigzag load-balancing needed)."""
    mesh: Mesh
    size: int
    axis: str = "sp"
    impl: str = "ring"

    def __post_init__(self):
        ax = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if ax.get(self.axis, 1) != self.size:
            raise ValueError(
                f"context_parallel_size={self.size} but mesh axis "
                f"{self.axis!r} has size {ax.get(self.axis, 1)}")
        if self.impl not in ("ring", "ulysses"):
            raise ValueError(f"context_parallel_impl must be 'ring' or "
                             f"'ulysses', got {self.impl!r}")

    def perm(self, L: int) -> np.ndarray:
        if self.impl == "ulysses":
            return np.arange(L)
        return zigzag_indices(L, self.size)

    def inv_perm(self, L: int) -> np.ndarray:
        if self.impl == "ulysses":
            return np.arange(L)
        return inverse_zigzag_indices(L, self.size)


def make_cp_config(mesh: Optional[Mesh], context_parallel_size: int,
                   axis: str = "sp", impl: str = "ring") -> Optional[CPConfig]:
    if context_parallel_size <= 1:
        return None
    if mesh is None:
        raise ValueError("context_parallel_size > 1 requires an explicit mesh "
                         "with an 'sp' axis")
    return CPConfig(mesh=mesh, size=context_parallel_size, axis=axis,
                    impl=impl)
