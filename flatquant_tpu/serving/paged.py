"""Host-side block allocation for the paged int4 KV cache.

The reference grows its page tensor with torch.cat on demand
(deploy/transformers/kv_cache.py:206-225) and requires every batch entry
to hold the same page count (kv_cache.py:367-368). Here the pool is a
static-shape device array (kernels/paged_kv.py) and allocation is pure
host bookkeeping: a free list of pool block indices plus a per-slot
table. Per-slot page counts are independent — a 100-token request next
to a 4000-token one holds 1 block, not 16.

Admission policy: a request RESERVES ceil((len(prompt) + max_new_tokens)
/ block_size) blocks up front. That keeps scheduling deadlock-free (an
admitted request can always finish) at the cost of reserving the worst
case; HBM still scales with sum(per-request need) instead of
batch_slots x max_len. Block 0 is the sacrificial trash block: table
entries outside a slot's reservation point at it, so bucket-padding
writes land harmlessly (positions >= the true length are never attended
— the same argument the slot cache's bucket padding relies on).
"""

from __future__ import annotations

import numpy as np


class BlockAllocator:
    """Free-list over pool blocks [1, n_blocks) — block 0 is reserved as
    the trash block."""

    def __init__(self, n_blocks: int):
        assert n_blocks >= 2, "need at least one real block beyond trash"
        self.n_blocks = n_blocks
        self._free = list(range(n_blocks - 1, 0, -1))  # pop() yields 1 first

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self, n: int):
        """Return n distinct block indices, or None if unavailable."""
        if n > len(self._free):
            return None
        return [self._free.pop() for _ in range(n)]

    def free(self, blocks) -> None:
        for b in blocks:
            assert 0 < b < self.n_blocks
            self._free.append(int(b))


def blocks_needed(prompt_len: int, max_new_tokens: int,
                  block_size: int) -> int:
    """Blocks covering every position the request can ever write
    (prompt + generated tokens)."""
    return -(-(prompt_len + max_new_tokens) // block_size)
