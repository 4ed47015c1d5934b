"""Seeding utilities.

The reference draws seeds in [0, 2^32) and returns them as *strings* over
RPC to dodge JS integer overflow (reference functional.py:37-40,
anvil_utils.py:36-39).  JAX's counter-based PRNG replaces torch's stateful
`set_seed` (functional.py:105-111): a seed becomes a PRNGKey and every
consumer folds in its own stream id, so per-chip/per-batch independence is
structural rather than global-state-based.
"""

from __future__ import annotations

import secrets


def random_seed() -> int:
    """Uniform in [0, 2^32) (reference functional.py:37-40)."""
    return secrets.randbelow(2**32)


def seed_as_string() -> str:
    """RPC-safe string form (reference anvil_utils.py:36-39)."""
    return str(random_seed())
