"""Packed witness: advice columns as a raw 16-bit-limb numpy plane instead
of python-int lists.

The witness-tape replay (ivc/tape_runner.py) produces cell values as packed
words straight from the native VM; keeping them packed all the way into the
Montgomery encode (fields/limbs.py encode_raw16) removes the two big
host-side conversions of the SPS hot path — int->limb encode
(ints_to_limbs' per-int to_bytes) and the VM-output->int scatter.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..fields.limbs import NUM_LIMBS, limbs_to_ints


class PackedWitness:
    """Advice table as one (num_cols * nrow, 16) uint32 plain-limb array
    (row-major per column, zero-padded to nrow — the layout
    encode_padded produces).

    `used_rows` bounds the nonzero extent of every column: rows beyond it
    are zero, and zero is its own Montgomery form, so the encode only has
    to convert the used prefixes (most tables are short circuits in tall
    2^k tables)."""

    __slots__ = ("raw16", "num_cols", "nrow", "used_rows")

    def __init__(
        self, raw16: np.ndarray, num_cols: int, nrow: int, used_rows: int = -1
    ):
        assert raw16.shape == (num_cols * nrow, NUM_LIMBS)
        self.raw16 = raw16
        self.num_cols = num_cols
        self.nrow = nrow
        self.used_rows = nrow if used_rows < 0 else min(used_rows, nrow)

    def encode_mont(self, lf):
        """Montgomery device encode of the whole table, converting only the
        used prefix of each column."""
        import jax.numpy as jnp

        used = self.used_rows
        if used >= self.nrow:
            return lf.encode_raw16(self.raw16)
        view = self.raw16.reshape(self.num_cols, self.nrow, NUM_LIMBS)
        enc = lf.encode_raw16(
            np.ascontiguousarray(view[:, :used]).reshape(-1, NUM_LIMBS)
        )
        out = np.zeros_like(self.raw16)
        out_v = out.reshape(self.num_cols, self.nrow, NUM_LIMBS)
        out_v[:, :used] = np.asarray(enc).reshape(
            self.num_cols, used, NUM_LIMBS
        )
        return jnp.asarray(out)

    def __len__(self):  # len(witness) == number of advice columns
        return self.num_cols

    def to_int_cols(self) -> List[List[int]]:
        """Fallback for consumers that need python-int columns (lookup
        coefficient evaluation)."""
        flat = limbs_to_ints(self.raw16)
        return [
            flat[c * self.nrow : (c + 1) * self.nrow]
            for c in range(self.num_cols)
        ]


def _last_nonzero(col: List[int]) -> int:
    """Index-after of the last nonzero entry, scanning coarse chunks with
    C-speed any() first (tall sparse tables: 2^22 rows, ~1% used)."""
    last = len(col)
    chunk = 4096
    while last > 0:
        lo = max(0, last - chunk)
        if any(col[lo:last]):
            for i in range(last - 1, lo - 1, -1):
                if col[i]:
                    return i + 1
        last = lo
    return 0


def pack_int_cols(cols: List[List[int]], nrow: int) -> PackedWitness:
    """Python-int columns -> PackedWitness (one-time, at tape capture);
    only the nonzero prefixes are converted."""
    from ..fields.limbs import ints_to_limbs

    raw = np.zeros((len(cols) * nrow, NUM_LIMBS), dtype=np.uint32)
    for c, col in enumerate(cols):
        last = _last_nonzero(col)
        if last:
            raw[c * nrow : c * nrow + last] = ints_to_limbs(col[:last])
    return PackedWitness(raw, len(cols), nrow)
