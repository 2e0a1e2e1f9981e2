"""DIA layouts (full and symmetric half-band storage) — the stencil-
pattern containers whose diagonals stream without gathers."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import LinearOperator, _cdiv

from .csr import CSRMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DIAMatrix(LinearOperator):
    """Diagonal (DIA) sparse layout — the TPU-ideal format for banded SPD
    matrices.

    Storage: ``diags[d, i] = A[i, i + offsets[d]]`` for each stored diagonal
    offset (``offsets`` is static metadata, so the SpMV loop over diagonals
    unrolls at trace time).  Slots that fall outside the matrix are zero.

    SpMV is ``y = sum_d diags[d] * shift(x, offsets[d])`` — no index arrays,
    no gathers: ndiag+2 contiguous vector streams that XLA fuses into one
    pass at HBM bandwidth.  The reference's CSR kernel
    (VectorOperations.hpp:438-466) does one serial dot per row with random
    access into x; DIA removes both the index traffic (nnz ints in CSR) and
    the irregular access entirely.  With RCM reordering (reorder.py), most
    SuiteSparse SPD problems become banded enough for this layout.
    """

    diags: jax.Array  # (ndiag, n)
    offsets: Tuple[int, ...]  # static
    shape: Tuple[int, int]
    nnz: int  # true nnz (pre-padding), static metadata
    # Optional pre-blocked copy (ng, ndiag, bl) for the Pallas windowed
    # kernel: a (ndiag, bl) BlockSpec block of the row-major (ndiag, n)
    # array is ndiag strided row segments and XLA inserts a PER-ITERATION
    # relayout in front of the custom call when the operator is a jit
    # argument (measured 3.2× at 99 diagonals); each blocked slice is one
    # contiguous tiled region, which streams clean.  Built once by
    # :meth:`with_blocked`; `ops/spmv.dia_spmv` prefers it when present.
    diags_blocked: Optional[jax.Array] = None

    def tree_flatten(self):
        if self.diags_blocked is None:
            return (self.diags,), (self.offsets, self.shape, self.nnz, False)
        return (self.diags, self.diags_blocked), (
            self.offsets, self.shape, self.nnz, True,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocked = children[1] if aux[3] else None
        return cls(children[0], aux[0], aux[1], aux[2], blocked)

    def with_blocked(self, block_len: int = 16384) -> "DIAMatrix":
        """Return a copy carrying the Pallas-blocked diagonal layout (one
        device pass; do this ONCE per operator, outside jit)."""
        if self.diags_blocked is not None:
            return self
        ndiag, n_stored = self.diags.shape
        # Mosaic's 1-D memref slices must be 1024-aligned, so the block
        # length (and hence every scratch-window offset) must be a 1024
        # multiple — round up rather than fail in lowering
        bl = -(-min(block_len, max(n_stored, 1)) // 1024) * 1024
        n_pad = -(-n_stored // bl) * bl
        dp = self.diags
        if n_pad != n_stored:
            dp = jnp.pad(dp, ((0, 0), (0, n_pad - n_stored)))
        blocked = dp.reshape(ndiag, n_pad // bl, bl).transpose(1, 0, 2)
        return DIAMatrix(
            self.diags, self.offsets, self.shape, self.nnz, blocked
        )

    @staticmethod
    def from_csr_host(
        data: np.ndarray,
        indices: np.ndarray,
        indptr: np.ndarray,
        shape: Tuple[int, int],
        dtype=None,
        max_diags: Optional[int] = None,
    ) -> "DIAMatrix":
        """Host-side CSR -> DIA.  Raises ValueError if the matrix touches
        more than ``max_diags`` distinct diagonals (caller should fall back
        to blocked-ELL)."""
        n, ncols = shape
        data = np.asarray(data)
        if dtype is not None:
            data = data.astype(dtype)
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        offs = indices - row_ids
        uniq = np.unique(offs)
        if max_diags is not None and len(uniq) > max_diags:
            raise ValueError(
                f"matrix touches {len(uniq)} diagonals > max_diags={max_diags}"
            )
        slot = np.searchsorted(uniq, offs)
        diags = np.zeros((len(uniq), n), dtype=data.dtype)
        np.add.at(diags, (slot, row_ids), data)
        return DIAMatrix(
            jnp.asarray(diags),
            tuple(int(o) for o in uniq),
            (n, ncols),
            int(len(data)),
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix", max_diags: Optional[int] = None) -> "DIAMatrix":
        return DIAMatrix.from_csr_host(
            np.asarray(csr.data),
            np.asarray(csr.indices),
            np.asarray(csr.indptr),
            csr.shape,
            max_diags=max_diags,
        )

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diags.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        from ..ops.spmv import dia_spmv

        return dia_spmv(self, x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.diags[self.offsets.index(0)]
        # a zero diagonal would silently turn Jacobi's 1/diag into inf;
        # an SPD matrix always has a positive main diagonal, so a DIA
        # operator without one is a construction error — fail loudly
        raise ValueError(
            "DIAMatrix stores no main diagonal (offset 0); diagonal() is "
            "undefined for it — an SPD operator must have one"
        )

    def to_dense(self) -> jax.Array:
        n, ncols = self.shape
        out = jnp.zeros((n, ncols), dtype=self.dtype)
        rows = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            cols = rows + off
            valid = (cols >= 0) & (cols < ncols)
            out = out.at[rows[valid], cols[valid]].add(self.diags[d][valid])
        return out

    def memory_footprint(self) -> int:
        return self.diags.size * self.diags.dtype.itemsize

    def padding_ratio(self) -> float:
        """Stored slots / true nnz — the bandwidth overhead of the layout."""
        return float(self.diags.size) / max(self.nnz, 1)

    def astype(self, dtype) -> "DIAMatrix":
        return dataclasses.replace(
            self,
            diags=self.diags.astype(dtype),
            diags_blocked=(
                None if self.diags_blocked is None
                else self.diags_blocked.astype(dtype)
            ),
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SymDIAMatrix(LinearOperator):
    """Symmetric DIA: only the offsets ≥ 0 stored — the banded twin of
    :class:`SymBellMatrix`.

    A symmetric matrix's −k diagonal is its +k diagonal re-indexed
    (``A[i, i−k] = A[i−k, i] = diags₊ₖ[i−k]``), so storing both halves
    streams every off-diagonal value twice per SpMV for zero information.
    This layout keeps ``diags[d, i] = A[i, i + offsets[d]]`` for
    ``offsets[d] ≥ 0`` only and applies each stored diagonal both ways:

        y += diags[d] * shift(x, +k)          (the stored direction)
        y += shift(diags[d] * x, −k)          (its mirror — same stream,
                                               no extra diagonal read)

    Near-2× fewer operator bytes on wide bands ((w/2+1)/(w+1) of the full
    stream).  Because :func:`~conjugategradient_tpu.cg_solve`'s DIA
    constant-closure cache is matvec-generic, SymDIA rides it directly —
    and the halved constant footprint doubles the size reach of the
    320 MB relay-limit gate (a Flan-class 608 MB full-DIA operator that
    dies at the relay limit packs to ~304 MB symmetric).

    At stencil-scale offsets (max ≥ 1024, where XLA's shift formulation
    collapses) the Pallas windowed SYMMETRIC kernel takes over when the
    operator carries the halo'd pre-blocked layout (:meth:`with_blocked`;
    ``ops/pallas/dia_spmv.sym_dia_spmv_pallas_blocked``) — past the
    320 MB constant-closure gate ``cg_solve`` performs that upgrade
    automatically, so the half-band saving survives at Flan-class sizes.
    """

    diags: jax.Array  # (ndiag_nonneg, n)
    offsets: Tuple[int, ...]  # static, all >= 0, ascending
    shape: Tuple[int, int]
    nnz: int  # true nnz of the FULL (expanded) matrix, static metadata
    # Optional halo'd pre-blocked copy (ng, ndiag, hw + bl) for the Pallas
    # windowed symmetric kernel: block g's row carries
    # ``d_k[g·bl − hw + j]`` (zeros outside [0, n)) so the MIRROR term's
    # left-of-block diagonal values ship inside the block — one contiguous
    # tiled region per grid step, no per-iteration relayout when the
    # operator is a jit argument (the same reason DIAMatrix.with_blocked
    # exists).  Built once by :meth:`with_blocked`; ``ops/spmv.sym_dia_spmv``
    # prefers it on TPU at stencil-scale offsets.
    diags_blocked: Optional[jax.Array] = None
    blocked_halo: int = 0  # hw (static; 1024-aligned)

    def tree_flatten(self):
        if self.diags_blocked is None:
            return (self.diags,), (self.offsets, self.shape, self.nnz,
                                   False, 0)
        return (self.diags, self.diags_blocked), (
            self.offsets, self.shape, self.nnz, True, self.blocked_halo,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        blocked = children[1] if aux[3] else None
        return cls(children[0], aux[0], aux[1], aux[2], blocked, aux[4])

    def with_blocked(self, block_len: Optional[int] = None) -> "SymDIAMatrix":
        """Return a copy carrying the halo'd Pallas-blocked layout (one
        device pass; do this ONCE per operator, outside jit).

        ``block_len=None`` (the default every production call site uses)
        picks a halo-aware length; an explicit value is honored exactly
        (tests use small blocks to force halo-crossing coverage).
        """
        if self.diags_blocked is not None:
            return self
        ndiag, n_stored = self.diags.shape
        w = max(self.offsets) if self.offsets else 0
        # halo and block length both 1024-aligned (Mosaic 1-D memref rule;
        # also keeps every block row lane-aligned)
        hw = -(-w // 1024) * 1024 if w else 0
        if block_len is None:
            # The halo costs hw/bl EXTRA stream per diagonal.  At
            # stencil-scale bands a fixed bl=16K is smaller than the halo
            # itself — a w=20·1024 half-band would stream 2.25× its stored
            # bytes, MORE than the full layout (measured: 664 µs/iter sym
            # vs 656 full at n=2M — the symmetric win erased).  Grow bl
            # until the halo is ≤ 12.5% overhead, inside a 64 MB budget
            # for the two in-flight (ndiag, hw+bl) blocks.  Grid-blocked
            # operands normally pipeline through a 16 MB scoped-vmem stack
            # (a 48 MB budget died in AOT compile with "Scoped allocation
            # 19.69M exceeded scoped vmem limit 16.00M"), so the kernel
            # raises the cap per-call via CompilerParams(vmem_limit_bytes)
            # sized from this layout (ops/pallas/dia_spmv.py); 64 MB for
            # the diagonal blocks leaves the double-buffered x window and
            # y output blocks comfortably inside the 128 MB VMEM.
            itemsize = jnp.dtype(self.diags.dtype).itemsize
            budget = 64 * 1024 * 1024
            bl_cap = budget // (2 * max(ndiag, 1) * itemsize) - hw
            bl_cap = (bl_cap // 1024) * 1024  # floor: never exceed budget
            block_len = min(max(16384, 8 * hw), max(bl_cap, 1024))
        bl = -(-min(block_len, max(n_stored, 1)) // 1024) * 1024
        n_pad = -(-n_stored // bl) * bl
        ng = n_pad // bl
        dp = self.diags
        if n_pad != n_stored:
            dp = jnp.pad(dp, ((0, 0), (0, n_pad - n_stored)))
        dpe = jnp.pad(dp, ((0, 0), (hw, 0)))  # zeros left of row 0
        idx = (
            jnp.arange(ng, dtype=jnp.int32)[:, None] * bl
            + jnp.arange(hw + bl, dtype=jnp.int32)[None, :]
        )
        blocked = dpe[:, idx].transpose(1, 0, 2)  # (ng, ndiag, hw + bl)
        return SymDIAMatrix(
            self.diags, self.offsets, self.shape, self.nnz, blocked, hw
        )

    @staticmethod
    def from_dia(dia: "DIAMatrix", check: bool = True) -> "SymDIAMatrix":
        """Repack a full DIA operator into symmetric storage.

        ``check=True`` verifies each dropped −k diagonal equals its +k
        mirror re-indexed (vectorized, one pass); a +k diagonal whose −k
        partner is missing must itself be all-zero outside the overlap.
        """
        n, ncols = dia.shape
        if n != ncols:
            raise ValueError(f"symmetric layout needs a square system, got {dia.shape}")
        diags = np.asarray(dia.diags)
        offs = dia.offsets
        pos = [d for d, o in enumerate(offs) if o >= 0]
        by_off = {o: d for d, o in enumerate(offs)}
        if check:
            for d, o in enumerate(offs):
                if o >= 0:
                    continue
                k = -o
                dneg = diags[d]
                if k in by_off:
                    dpos = diags[by_off[k]]
                    # A[i, i−k] = A[i−k, i]: dneg[i] == dpos[i−k] for i >= k
                    if not (
                        np.allclose(dneg[k:], dpos[: n - k])
                        and not dneg[:k].any()
                    ):
                        raise ValueError(f"diagonal {o} is not symmetric")
                elif dneg.any():
                    raise ValueError(
                        f"diagonal {o} has no +{k} mirror and is nonzero"
                    )
            for d, o in enumerate(offs):
                if o > 0 and -o not in by_off and diags[d].any():
                    raise ValueError(
                        f"diagonal +{o} has no -{o} mirror and is nonzero"
                    )
        return SymDIAMatrix(
            jnp.asarray(diags[pos]),
            tuple(offs[d] for d in pos),
            dia.shape,
            dia.nnz,
        )

    @staticmethod
    def from_csr(csr: "CSRMatrix", max_diags: Optional[int] = None,
                 check: bool = True) -> "SymDIAMatrix":
        return SymDIAMatrix.from_dia(
            DIAMatrix.from_csr(csr, max_diags=max_diags), check=check
        )

    @property
    def n(self) -> int:
        return self.shape[0]

    @property
    def dtype(self):
        return self.diags.dtype

    def matvec(self, x: jax.Array) -> jax.Array:
        from ..ops.spmv import sym_dia_spmv

        return sym_dia_spmv(self, x)

    def diagonal(self) -> jax.Array:
        if 0 in self.offsets:
            return self.diags[self.offsets.index(0)]
        # same contract as DIAMatrix.diagonal(): a silent zero diagonal
        # would turn Jacobi's 1/diag into inf — fail loudly
        raise ValueError(
            "SymDIAMatrix stores no main diagonal (offset 0); diagonal() "
            "is undefined for it — an SPD operator must have one"
        )

    def to_dense(self) -> jax.Array:
        n = self.shape[0]
        out = jnp.zeros((n, n), dtype=self.dtype)
        rows = jnp.arange(n)
        for d, off in enumerate(self.offsets):
            cols = rows + off
            ok = cols < n
            out = out.at[
                jnp.where(ok, rows, 0), jnp.where(ok, cols, 0)
            ].add(jnp.where(ok, self.diags[d], 0))
            if off > 0:
                out = out.at[
                    jnp.where(ok, cols, 0), jnp.where(ok, rows, 0)
                ].add(jnp.where(ok, self.diags[d], 0))
        return out

    def memory_footprint(self) -> int:
        return self.diags.size * self.diags.dtype.itemsize

    def full_diag_bytes(self) -> int:
        """Bytes the equivalent FULL DIA layout streams per SpMV (each
        stored off-diagonal serves both halves)."""
        n_off = sum(1 for o in self.offsets if o > 0)
        ndiag_full = len(self.offsets) + n_off
        return ndiag_full * self.shape[0] * self.dtype.itemsize

    def astype(self, dtype) -> "SymDIAMatrix":
        return dataclasses.replace(
            self,
            diags=self.diags.astype(dtype),
            diags_blocked=(
                None if self.diags_blocked is None
                else self.diags_blocked.astype(dtype)
            ),
        )
