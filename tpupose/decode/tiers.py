"""Runtime adaptive-capacity tier selection (shared cond-chain builder).

Static shapes under jit price the worst case; the decode recovers the
average case with nested runtime ``lax.cond``s that drop to the smallest
capacity whose static bound holds every runtime count — bitwise
identical whenever selected. Used by the pair-capacity tiers
(``api._two_tier_post_peaks``) and the peak-compaction tiers
(``peaks.peak_tables_tiered``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax


def cond_chain(
    caps: Sequence[int],
    count,
    at_cap: Callable[[int], Callable],
    fallback: Callable,
    operand,
):
    """``cond(count <= caps[0], at_cap(caps[0]), cond(count <= caps[1],
    ..., fallback))`` applied to ``operand``.

    ``caps`` must be ascending; ``at_cap(cap)`` returns the branch
    function for that capacity. MUST be called OUTSIDE any ``vmap`` —
    under vmap a ``cond`` lowers to a ``select`` and every branch
    executes, defeating the point.
    """
    chain = fallback
    for cap in reversed(tuple(caps)):
        chain = partial(
            lambda cap, inner, x: jax.lax.cond(
                count <= cap, at_cap(cap), inner, x
            ),
            cap,
            chain,
        )
    return chain(operand)
